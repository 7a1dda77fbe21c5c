"""Embedding similarity search over the ``embeddings`` table
(vec_id long, embedding array<float>, label int).

- ``ann_topk_quantized`` — brute-force top-k by integer-quantized dot
  product, fully Catalyst-side (zip_with + aggregate), bit-exact vs a
  DuckDB oracle (no float-summation-order hazards).
- ``ann_topk_cosine``   — brute-force true-cosine top-k in double
  precision; the correctness baseline for the LSH variant.
- ``lsh_ann_topk``      — random-hyperplane LSH bucketing (seeded numpy
  pandas UDF) + exact rerank within buckets: candidate shuffle is
  O(docs × tables), not O(docs × queries) — the 100 TB scale path.
- ``embedding_near_dup_pairs`` — near-duplicate pairs by quantized cosine,
  the embedding-space analog of minhash dedup.

Scale notes: the query side is always tiny → ``F.broadcast`` it; the big
side streams through whole-stage codegen with no shuffle at all for the
brute-force scorers (top-k is a partial ``min_by``-style agg per query via
window over a pre-filtered candidate set; at 1000 executors the only
exchange is the final k×queries rows).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _quantized(col) -> "F.Column":
    """array<float> → array<long> of floor(x_double * 1000): exact integer
    arithmetic downstream, identical in Spark and DuckDB."""
    return F.transform(col, lambda x: F.floor(x.cast("double") * 1000).cast("long"))


def ann_topk_quantized(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force top-k neighbors per query by quantized integer dot
    product. Queries = vec_id < n_queries (broadcast); candidates = the
    rest. Deterministic tie-break on vec_id."""
    q = F.broadcast(
        emb.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), _quantized(F.col("embedding")).alias("qv")
        )
    )
    c = emb.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), _quantized(F.col("embedding")).alias("cv")
    )
    scored = q.crossJoin(c).withColumn(
        "dot_q",
        F.aggregate(F.zip_with("qv", "cv", lambda a, b: a * b), F.lit(0).cast("long"), lambda acc, x: acc + x),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "dot_q", F.col("rank").cast("long").alias("rank"))
    )


def _cosine(av: str, bv: str):
    dot = F.aggregate(F.zip_with(av, bv, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(F.transform(F.col(av), lambda a: a * a), F.lit(0.0), lambda s, x: s + x))
    nb = F.sqrt(F.aggregate(F.transform(F.col(bv), lambda a: a * a), F.lit(0.0), lambda s, x: s + x))
    return dot / (na * nb)


def ann_topk_cosine(emb: DataFrame, n_queries: int = 10, k: int = 5) -> DataFrame:
    """Brute-force true-cosine top-k (double precision) — the exact baseline
    the LSH variant is measured against."""
    d = F.col("embedding").cast("array<double>")
    q = F.broadcast(
        emb.filter(F.col("vec_id") < n_queries).select(F.col("vec_id").alias("query_id"), d.alias("qv"))
    )
    c = emb.filter(F.col("vec_id") >= n_queries).select(F.col("vec_id").alias("neighbor_id"), d.alias("cv"))
    scored = q.crossJoin(c).withColumn("cos", _cosine("qv", "cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplane_signs_udf(dim: int, n_planes: int, seed: int):
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))

    @F.pandas_udf(T.IntegerType())
    def _sig(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for embs in it:
            m = np.stack(embs.to_numpy())  # (batch, dim), Arrow-zero-copy per column
            bits = (m @ planes) > 0  # (batch, n_planes)
            vals = (bits * (1 << np.arange(n_planes))).sum(axis=1)
            yield pd.Series(vals.astype(np.int32))

    return _sig


def lsh_ann_topk(
    emb: DataFrame, n_queries: int = 10, k: int = 5, n_planes: int = 8, seed: int = 42, dim: int = 64
) -> DataFrame:
    """IVF/LSH-bucketed ANN: random-hyperplane signature → join queries to
    candidates in the same bucket → exact cosine rerank → top-k.

    Recall < 1.0 by construction; bucket fan-out can be widened with
    multi-probe (flip one bit) — here single-probe for determinism. The
    candidate join is an equi-join on the bucket id: shuffle O(n) instead
    of a cross join."""
    sig = _hyperplane_signs_udf(dim, n_planes, seed)
    d = F.col("embedding").cast("array<double>")
    tagged = emb.withColumn("bucket", sig("embedding"))
    q = F.broadcast(
        tagged.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), d.alias("qv"), "bucket"
        )
    )
    c = tagged.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neighbor_id"), d.alias("cv"), "bucket"
    )
    scored = q.join(c, "bucket").withColumn("cos", _cosine("qv", "cv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("rank").cast("long").alias("rank"))
    )


def embedding_near_dup_pairs(emb: DataFrame, min_dot_q: int) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs by quantized dot product
    (exact integer arithmetic; threshold in quantized units)."""
    a = emb.select(F.col("vec_id").alias("vec_a"), _quantized(F.col("embedding")).alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), _quantized(F.col("embedding")).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn(
            "dot_q",
            F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0).cast("long"), lambda s, x: s + x),
        )
        .filter(F.col("dot_q") >= min_dot_q)
        .select("vec_a", "vec_b", "dot_q")
    )
