"""Sequence packing for LLM pretraining — concat-and-chunk over the token
stream, Spark-first.

The standard GPT-style pretraining layout concatenates documents in a
deterministic global order and cuts the stream every ``context_len`` tokens,
splitting documents across chunk boundaries (the GPT-3 appendix-B /
Megatron-LM data-pipeline construction — public knowledge). The engine's
payload IS pre-tokenized training sequences (BASELINE input_hint:
``tokens:array<int32>, n_tok:int32``), so packing them into fixed
context windows is the natural last hop before a trainer.

At 100 TB the hard part is the GLOBAL running sum of token counts without a
global sort funnel. A naive ``Window.orderBy(doc)`` collapses the whole
table into ONE partition — the classic scale-killer. This module uses the
two-level distributed prefix sum instead:

1. **Deterministic order-preserving buckets.** ``width_bucket(ord, min,
   max+1, n_buckets)`` assigns each doc a bucket such that bucket i's keys
   all precede bucket i+1's. Unlike ``repartitionByRange`` +
   ``spark_partition_id()``, the bucket id is a PURE FUNCTION of the row
   (no sampled boundaries), so re-executions and retries can never skew a
   row across the offset table computed in step 2. Uniform bucketing
   assumes a roughly uniform order key (dense doc ids — the engine's
   layout); pass ``n_buckets`` to tune, or pre-map a skewed key to a dense
   rank upstream.
2. **Per-bucket totals → prefix offsets.** One narrow aggregate
   (``O(n_buckets)`` rows) collected to the driver, converted to exclusive
   prefix sums, and re-joined as a broadcast local relation.
3. **Intra-bucket running sum.** ``Window.partitionBy(bucket)
   .orderBy(ord)`` — one hash exchange on bucket + a per-partition sort;
   no single-partition stage anywhere (plan-guarded).
4. **Span arithmetic.** Each doc covers chunks ``floor(start/C) ..
   floor((start+n-1)/C)``; ``sequence()`` + ``explode`` + clamp math, all
   Catalyst-side (no Python in the pipeline).

``pack_chunks`` then materializes the packed rows: slice each document's
token array per span, group by chunk, order pieces by offset and flatten —
``array_sort(collect_list(struct))`` + ``flatten(transform(...))``, still
zero Python. Chunk rows also carry ``doc_bounds`` (where each document
starts inside the chunk) so a trainer can reset attention masks at document
boundaries.

Reference scope note: the reference (opentdf/nifi) has no packing operator;
this extends the training-data surface the same way textops/simops do
(SURVEY.md LLM-data-pipeline section).
"""

from __future__ import annotations

import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _bucketed_starts(
    docs: DataFrame, n_tok_col: str, order_col: str, n_buckets: int | None
) -> DataFrame:
    """(_ord, _n, _start) — _start is the doc's global offset in the
    concatenated token stream, via the two-level prefix sum."""
    spark = docs.sparkSession
    d = docs.select(
        F.col(order_col).cast("long").alias("_ord"),
        F.col(n_tok_col).cast("long").alias("_n"),
    ).filter(F.col("_n") > 0)
    if n_buckets is None:
        n_buckets = spark.sparkContext.defaultParallelism
    lo_hi = d.agg(F.min("_ord").alias("lo"), F.max("_ord").alias("hi")).collect()[0]
    if lo_hi["lo"] is None:  # empty input
        return d.withColumn("_start", F.lit(0).cast("long"))
    lo, hi = int(lo_hi["lo"]), int(lo_hi["hi"])
    d = d.withColumn(
        "_bkt", F.width_bucket(F.col("_ord"), F.lit(lo), F.lit(hi + 1), F.lit(n_buckets))
    )
    # per-bucket totals are O(n_buckets) rows — driver-side exclusive prefix
    totals = {
        int(r["_bkt"]): int(r["_tot"])
        for r in d.groupBy("_bkt").agg(F.sum("_n").alias("_tot")).collect()
    }
    acc = 0
    offsets = []
    for b in sorted(totals):
        offsets.append((b, acc))
        acc += totals[b]
    # pyarrow table → LocalTableScan (never a Python-RDD scan) → broadcast
    off_df = spark.createDataFrame(
        pa.table(
            {
                "_bkt": pa.array([b for b, _ in offsets], pa.int32()),
                "_off": pa.array([o for _, o in offsets], pa.int64()),
            }
        )
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy("_ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("_cum", F.sum("_n").over(w))
        .join(F.broadcast(off_df), "_bkt")
        .select("_ord", "_n", (F.col("_off") + F.col("_cum") - F.col("_n")).alias("_start"))
    )


def pack_spans(
    docs: DataFrame,
    *,
    context_len: int,
    n_tok_col: str = "n_tok",
    order_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Per-(document, chunk) span table of the concat-and-chunk layout:
    ``(doc_id, chunk_id, chunk_off, doc_off, span_len)`` — document
    ``doc_id`` contributes ``span_len`` tokens starting at its own offset
    ``doc_off`` to chunk ``chunk_id`` at offset ``chunk_off``. Deterministic
    in the ``order_col`` order and invariant to ``n_buckets``."""
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    c = F.lit(int(context_len))
    d = _bucketed_starts(docs, n_tok_col, order_col, n_buckets)
    first = F.floor(F.col("_start") / c)
    last = F.floor((F.col("_start") + F.col("_n") - 1) / c)
    s = d.select(
        "_ord", "_start", "_n", F.explode(F.sequence(first, last)).alias("chunk_id")
    )
    chunk_start = F.col("chunk_id") * c
    return s.select(
        F.col("_ord").alias("doc_id"),
        "chunk_id",
        F.greatest(F.lit(0), F.col("_start") - chunk_start).cast("long").alias("chunk_off"),
        F.greatest(F.lit(0), chunk_start - F.col("_start")).cast("long").alias("doc_off"),
        (
            F.least(F.col("_start") + F.col("_n"), chunk_start + c)
            - F.greatest(F.col("_start"), chunk_start)
        ).cast("long").alias("span_len"),
    )


def pack_chunks(
    docs: DataFrame,
    *,
    context_len: int,
    tokens_col: str = "tokens",
    order_col: str = "doc_id",
    n_buckets: int | None = None,
) -> DataFrame:
    """Materialized packed training rows: ``(chunk_id, input_ids, n_tok,
    n_docs, doc_bounds)`` where ``input_ids`` is exactly the
    ``context_len``-token slice of the concatenated stream (the final chunk
    may be shorter) and ``doc_bounds`` lists ``(doc_id, chunk_off)`` in
    order — attention-mask reset points. Entirely Catalyst: slice + group
    by chunk + sort-by-offset flatten, no Python workers."""
    spans = pack_spans(
        docs.withColumn("_ntok", F.size(F.col(tokens_col))),
        context_len=context_len,
        n_tok_col="_ntok",
        order_col=order_col,
        n_buckets=n_buckets,
    )
    toks = docs.select(
        F.col(order_col).cast("long").alias("doc_id"), F.col(tokens_col).alias("_toks")
    )
    pieces = spans.join(toks, "doc_id").select(
        "chunk_id",
        F.struct(
            F.col("chunk_off"),
            F.slice(
                F.col("_toks"), (F.col("doc_off") + 1).cast("int"), F.col("span_len").cast("int")
            ).alias("piece"),
            F.col("doc_id"),
        ).alias("_p"),
    )
    agg = pieces.groupBy("chunk_id").agg(F.array_sort(F.collect_list("_p")).alias("_ps"))
    return agg.select(
        "chunk_id",
        F.flatten(F.transform("_ps", lambda p: p["piece"])).alias("input_ids"),
        F.aggregate(
            F.transform("_ps", lambda p: F.size(p["piece"]).cast("long")),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("n_tok"),
        F.size("_ps").cast("long").alias("n_docs"),
        F.transform(
            "_ps", lambda p: F.struct(p["doc_id"].alias("doc_id"), p["chunk_off"].alias("chunk_off"))
        ).alias("doc_bounds"),
    )


def pack_bestfit(
    docs: DataFrame,
    *,
    context_len: int,
    n_tok_col: str = "n_tok",
    id_col: str = "doc_id",
    docs_per_shard: int = 4096,
    salt: str = "bfd",
) -> DataFrame:
    """Best-fit-decreasing packing WITHOUT document splitting — the layout
    for corpora whose examples must stay whole (SFT / instruction data),
    where concat-and-chunk's mid-document cuts are unacceptable and the
    cost lever is PADDING waste, not boundary resets.

    Distributed shape (the 100 TB story): global FFD/BFD is inherently
    sequential, so packing is sharded — each document is assigned to a
    shard by a pure md5 function of its id (layout-invariant, reproducible
    cross-engine), ONE hash exchange groups the shard, and best-fit-
    decreasing runs per shard in an Arrow-batched ``applyInPandas`` over
    the shard's (n_tok, id) list. Shard count grows with the corpus
    (``ceil(n / docs_per_shard)``), so per-task state stays bounded; the
    approximation cost vs a single global BFD is one partially-filled
    tail bin per shard at worst (BFD itself is a 11/9·OPT+6/9
    guarantee — Dosa 2007, public literature).

    Deterministic rule (mirrored by the independent pandas oracle): per
    shard, documents in (n_tok desc, id asc) order; each goes to the bin
    with the SMALLEST remaining capacity that still fits (ties → lowest
    bin index), else opens a new bin. Documents with ``n_tok >
    context_len`` can never fit: they are routed to ``bin = -1``
    (oversize — the caller's DLQ analog), never silently truncated.

    Returns ``(doc_id, n_tok, shard, bin, bin_off)``: bin index within
    the shard and the document's token offset inside its bin.
    """
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    n = docs.count()
    n_shards = max(1, -(-n // docs_per_shard))
    src = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(n_tok_col).cast("long").alias("n_tok"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(salt + "-"), F.col(id_col).cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % n_shards
        ).cast("int").alias("shard"),
    )
    cap = int(context_len)

    def _bfd(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["n_tok", "doc_id"], ascending=[False, True])
        fills: list = []  # fills[i] = tokens already in bin i
        bins, offs = [], []
        for ntok in pdf["n_tok"]:
            t = int(ntok)
            if t > cap:
                bins.append(-1)
                offs.append(0)
                continue
            best = -1
            for i, fl in enumerate(fills):
                if fl + t <= cap and (best < 0 or fl > fills[best]):
                    best = i
            if best < 0:
                best = len(fills)
                fills.append(0)
            bins.append(best)
            offs.append(fills[best])
            fills[best] += t
        out = pdf.copy()
        out["bin"] = pd.array(bins, dtype="int64")
        out["bin_off"] = pd.array(offs, dtype="int64")
        return out

    return src.groupBy("shard").applyInPandas(
        _bfd, "doc_id long, n_tok long, shard int, bin long, bin_off long"
    )
