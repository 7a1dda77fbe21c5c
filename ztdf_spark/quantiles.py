"""EXACT distributed quantiles (order statistics) without a global sort —
iterative histogram refinement, the classic external-selection algorithm
(Munro & Paterson 1980 selection-in-rounds shape; public literature)
expressed as Catalyst aggregates.

Why it exists: ``approx_percentile`` trades error for one pass, and an
``orderBy`` + row_number order statistic funnels 100 TB through a global
sort. Exact selection needs neither: the k-th smallest element can be
found with a few COUNTING passes, each a partial-combine aggregate that
AQE/pushdown keep cheap:

1. One full-range pass: bucket every non-null value into ``n_buckets``
   equal-width bins (a pure ``floor((v-lo)/w)`` expression — map-side
   combine, one small exchange), cumulative-sum the bin counts on the
   driver (O(n_buckets) rows), and locate the bin holding rank k.
2. Recurse INTO that bin only. Bin membership for the next pass is the
   SAME floor expression (``bucket(v) == b``) — never a driver-recomputed
   float range, so Spark-side and driver-side arithmetic can't disagree
   at bin boundaries — plus a redundant one-bin-slop RANGE predicate
   (provably a superset: the float bucket map is monotone) that parquet
   row-group stats CAN prune, so pass 2+ reads a vanishing fraction of
   the data. An exact min/max/count over the surviving bin re-anchors the
   next histogram on actual data values.
3. Terminate when the surviving bin holds few enough DISTINCT values
   (``distinct_cap``) to enumerate: one ``groupBy(value).count()``,
   collected bounded, walked to the residual rank driver-side. Heavy
   repeated values (the skew case that defeats width-based termination)
   end here with a tiny distinct set.

All probed quantiles share pass 1 (one histogram serves every rank);
refinement then proceeds per-quantile over already-tiny filtered bins.
Rank rule: quantile p = the ``max(1, ceil(p·n))``-th smallest non-null
value (1-indexed) — matching the plain SQL order-statistic oracle
(row_number over value asc). Rank bookkeeping is exact int64 count
arithmetic; the returned value is an actual data element, bit-for-bit
identical under any partitioning.

Reference scope note: the reference (opentdf/nifi) has no quantile
operator; this extends the analytics surface (SURVEY.md §2.4) like
sketch.py's CMS/HLL — the exact counterpart to those approximations.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F



def _bucket(col: str, lo: float, w: float, n_buckets: int) -> Column:
    """Clamped equal-width bin id — the ONE float expression both the
    histogram and the refinement filter share."""
    return F.least(
        F.lit(n_buckets - 1),
        F.greatest(F.lit(0), F.floor((F.col(col) - F.lit(lo)) / F.lit(w))),
    ).cast("int")


def exact_quantiles(
    df: DataFrame,
    col: str,
    probs: list[float],
    *,
    n_buckets: int = 65536,
    distinct_cap: int = 65536,
    max_rounds: int = 8,
) -> DataFrame:
    """(p double, k long, value double, n long): for each probability,
    the exact max(1, ceil(p·n))-th smallest non-null value of ``col``.
    Never sorts: a handful of counting aggregates, range-slopped so
    parquet row-group stats prune the later passes."""
    spark = df.sparkSession
    for p in probs:
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"prob out of range: {p}")
    src = df.filter(F.col(col).isNotNull())
    head = src.agg(
        F.count(col).alias("n"), F.min(col).alias("lo"), F.max(col).alias("hi")
    ).first()
    n = int(head["n"])
    out_schema = "p double, k long, value double, n long"
    if n == 0:
        return spark.createDataFrame([], out_schema)
    glo, ghi = float(head["lo"]), float(head["hi"])

    def _histogram(cur: DataFrame, lo: float, w: float) -> list[tuple[int, int]]:
        rows = (
            cur.groupBy(_bucket(col, lo, w, n_buckets).alias("_b"))
            .agg(F.count("*").alias("_c"))
            .collect()
        )
        return sorted((int(r["_b"]), int(r["_c"])) for r in rows)

    def _enumerated(cur: DataFrame) -> list | None:
        vals = (
            cur.groupBy(F.col(col).alias("_v"))
            .agg(F.count("*").alias("_c"))
            .orderBy("_v")
            .limit(distinct_cap + 1)
            .collect()
        )
        return vals if len(vals) <= distinct_cap else None

    # pass 1 shared by every quantile
    first = _histogram(src, glo, (ghi - glo) / n_buckets) if ghi > glo else []

    def _select(k: int) -> float:
        cur, lo, hi, counts = src, glo, ghi, first
        for _ in range(max_rounds):
            if hi <= lo or not counts:
                return lo
            w = (hi - lo) / n_buckets
            cum = 0
            b = None
            for bi, c in counts:
                if cum + c >= k:
                    b, k = bi, k - cum
                    break
                cum += c
            if b is None:
                raise AssertionError("rank beyond total count")
            # exact membership = the shared bucket expression; the slopped
            # range predicate is a provable superset that parquet CAN prune
            cur = cur.filter(
                (F.col(col) >= F.lit(lo + (b - 1) * w))
                & (F.col(col) <= F.lit(lo + (b + 2) * w))
                & (_bucket(col, lo, w, n_buckets) == F.lit(b))
            )
            vals = _enumerated(cur)
            if vals is not None:
                cum = 0
                for r in vals:
                    cum += int(r["_c"])
                    if cum >= k:
                        return float(r["_v"])
                raise AssertionError("rank beyond surviving-bin count")
            stat = cur.agg(F.min(col).alias("lo"), F.max(col).alias("hi")).first()
            lo, hi = float(stat["lo"]), float(stat["hi"])
            if hi <= lo:
                return lo
            counts = _histogram(cur, lo, (hi - lo) / n_buckets)
        raise RuntimeError(
            f"exact_quantiles did not converge in {max_rounds} rounds "
            f"(distinct > {distinct_cap} in the surviving bin) — raise "
            "n_buckets/distinct_cap or max_rounds"
        )

    rows = []
    for p in sorted(set(probs)):
        k = max(1, math.ceil(p * n))
        rows.append((float(p), k, _select(k), n))
    return spark.createDataFrame(rows, out_schema)
