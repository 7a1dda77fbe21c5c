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

from .spread import spread


def _cms_col(key_col: str, i: int, w: int, seed: int) -> F.Column:
    """Row-i column index for a key: md5-prefix integer mod w."""
    s = F.concat(F.lit(f"cms{seed}-{i}-"), F.col(key_col).cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long") % w


def cms_build(df: DataFrame, key_col: str, *, d: int = 4, w: int = 1024, seed: int = 42) -> DataFrame:
    """Build a d×w count-min sketch over ``df[key_col]`` → (r, c, n)."""
    df = spread(df)  # single-row-group scans serialize the map work
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


def hll_registers(df: DataFrame, key_col: str, *, m: int = 64, seed: int = 42) -> DataFrame:
    """HyperLogLog register table over ``df[key_col]`` → (bucket, max_rho).

    The distinct-count sketch (Flajolet et al. 2007), same Spark shape
    as the count-min build: ONE groupBy bounded at ``m`` groups, so
    map-side partial ``max`` collapses any key cardinality before the
    single exchange — cardinality estimation without shuffling keys.
    Registers merge by cell-wise max (union + re-agg), so per-shard
    sketches compose.

    rho (the leading-zero rank) is computed with the repo's exact
    cross-engine integer/string primitives — ``instr(lpad(bin(w)))`` —
    not float log2, so the DuckDB oracle reproduces every register
    bit-for-bit. ``m`` must be a power of two (bucket = low bits of the
    32-bit md5-prefix hash; w = the remaining high bits).
    """
    df = spread(df)  # single-row-group scans serialize the map work
    if m & (m - 1) or m < 2:
        raise ValueError("hll: m must be a power of two >= 2")
    shift = m.bit_length() - 1
    wbits = 32 - shift
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"hll{seed}-"), F.col(key_col).cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    w = F.shiftright(h, shift)
    rho = F.when(w == 0, F.lit(wbits + 1)).otherwise(
        F.instr(F.lpad(F.bin(w), wbits, "0"), "1")
    )
    return (
        df.select((h % m).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )


def hll_estimate(registers: list[int], m: int = 64) -> float:
    """Driver-side estimate from a COLLECTED register list (the register
    table is tiny — m rows — by construction; this is index math, not a
    data-plane collect). Standard bias-corrected harmonic mean with the
    small-range (linear counting) correction."""
    import math

    regs = list(registers) + [0] * (m - len(registers))
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / sum(2.0 ** -r for r in regs)
    zeros = sum(1 for r in regs if r == 0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est
