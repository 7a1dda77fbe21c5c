"""Mergeable frequency sketches, Spark-shaped (count-min).

The sketch IS a DataFrame: ``(r, c, n)`` cells of a d×w count-min table
(Cormode & Muthukrishnan 2005). That representation is what makes it a
100 TB operator:

- **construction** is one ``groupBy`` whose distinct-group count is
  bounded by d·w REGARDLESS of key cardinality, so map-side partial
  aggregation collapses an arbitrarily large key stream to at most d·w
  rows per map task before the single exchange — frequency estimation
  without ever shuffling the keys themselves;
- **estimation** probes a (small) candidate-key set: d broadcast-join
  lookups + ``min`` over the rows. CM guarantee: estimate ≥ true count,
  overcount ≤ ε·N with w = ⌈e/ε⌉ at confidence 1−δ, d = ⌈ln 1/δ⌉;
- **merge** is linear: sketches of two streams add cell-wise
  (union + re-aggregate), so per-day / per-shard sketches compose.

Hashes are the repo's cross-engine md5-prefix integer construction
(same bits in Spark and DuckDB — the driver oracle replays them
exactly). Pure Catalyst: no Python workers anywhere.

No reference-repo counterpart (the reference has no sketching); the
algorithm is from the public literature cited above.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cms_col(key_col: str, i: int, w: int, seed: int) -> F.Column:
    """Row-i column index for a key: md5-prefix integer mod w."""
    s = F.concat(F.lit(f"cms{seed}-{i}-"), F.col(key_col).cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % w


def cms_build(df: DataFrame, key_col: str, *, d: int = 4, w: int = 1024, seed: int = 42) -> DataFrame:
    """Build a d×w count-min sketch over ``df[key_col]`` → (r, c, n)."""
    cells = F.array(
        *[
            F.struct(F.lit(i).cast("int").alias("r"), _cms_col(key_col, i, w, seed).alias("c"))
            for i in range(d)
        ]
    )
    return (
        df.select(F.explode(cells).alias("rc"))
        .groupBy(F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
        .agg(F.count("*").alias("n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches (CM is a linear sketch)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "c").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame, keys: DataFrame, key_col: str, *, d: int = 4, w: int = 1024, seed: int = 42
) -> DataFrame:
    """Point-query the sketch for every key in ``keys`` → (key, n_est).

    The candidate side is small by construction (you probe suspects, not
    the stream), so it broadcasts; a key whose cell is absent counts 0.
    """
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).cast("int").alias("r"), _cms_col(key_col, i, w, seed).alias("c"))
                    for i in range(d)
                ]
            )
        ).alias("rc"),
    ).select(key_col, F.col("rc.r").alias("r"), F.col("rc.c").alias("c"))
    joined = sketch.join(F.broadcast(probes), ["r", "c"], "right")
    return joined.groupBy(key_col).agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("n_est"))
