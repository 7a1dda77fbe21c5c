"""Scan-width guard for per-row-heavy operators.

A small parquet file (one row group) scans as ONE task no matter how many
cores the cluster has, so every operator that does heavy per-row map work
straight off the scan — shingle/gram explodes, per-token hashing, the LSH
signature UDF, route-gate expressions over a binlog — serializes onto a
single core until its first exchange (observed as the permanent 31/32-
straggler pattern on local[32]: the r6 sf1.0 fixtures are 5-15 MB
single-row-group files). ``jaccard_pairs`` carried this fix privately
since r2; r7 generalizes it.

``spread`` fires ONLY when the input is a file scan with fewer files than
the cluster has cores: shuffling the raw (narrow, pre-explode) rows once
is far cheaper than serializing the exploded work. At 100 TB the scan is
already wider than the cluster and this is a no-op — it is a small-input
guard, not a tuning constant (the driver's own sf ladder crosses exactly
this regime). Streaming and non-file sources are left untouched.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, factor: int = 2) -> DataFrame:
    """Round-robin repartition to ``factor × defaultParallelism`` when the
    source is a narrower-than-the-cluster file scan; identity otherwise.
    Deterministic (Spark sorts before round-robin repartition) and only
    ever used ahead of order-insensitive consumers (aggregates/joins)."""
    try:
        if df.isStreaming:
            return df
        p = df.sparkSession.sparkContext.defaultParallelism
        n_files = len(df.inputFiles())
    except Exception:
        return df
    if 0 < n_files < p:
        return df.repartition(factor * p)
    return df
