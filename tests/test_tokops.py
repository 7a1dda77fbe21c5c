"""Sequence packing (tokops) — the concat-and-chunk layout vs an
independent numpy reference (concatenate → reshape), invariance to the
bucket count (the distributed-prefix-sum knob), span invariants, and the
no-global-funnel plan property."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ztdf_spark import tokops

C = 64


def _docs(spark, sizes, start_id=0, id_stride=1):
    rng = np.random.default_rng(42)
    rows = [
        (int(start_id + i * id_stride), rng.integers(0, 50257, size=int(n)).tolist())
        for i, n in enumerate(sizes)
    ]
    return rows, spark.createDataFrame(rows, "doc_id long, tokens array<int>")


def _expected_chunks(rows, c=C):
    parts = [np.asarray(t, dtype=np.int64) for _, t in sorted(rows) if len(t)]
    stream = np.concatenate(parts) if parts else np.array([], dtype=np.int64)
    return [stream[i : i + c].tolist() for i in range(0, len(stream), c)]


def test_pack_chunks_matches_numpy_reference(spark):
    sizes = list(np.random.default_rng(1).integers(1, 40, size=150))
    sizes[30] = 500  # one doc spanning many chunks
    sizes[31] = 0  # empty doc: dropped from the stream
    rows, df = _docs(spark, sizes)
    out = tokops.pack_chunks(df, context_len=C).orderBy("chunk_id").collect()
    exp = _expected_chunks(rows)
    assert [r.input_ids for r in out] == exp
    assert [r.chunk_id for r in out] == list(range(len(exp)))
    assert all(r.n_tok == len(r.input_ids) for r in out)
    assert all(len(r.input_ids) == C for r in out[:-1])  # only the tail is short
    # doc_bounds are ordered reset points within each chunk
    for r in out:
        offs = [b.chunk_off for b in r.doc_bounds]
        assert offs == sorted(offs) and len(offs) == r.n_docs


def test_bucket_count_invariance(spark):
    rows, df = _docs(spark, np.random.default_rng(2).integers(1, 30, size=80))
    exp = _expected_chunks(rows)
    for nb in (1, 3, 16, 64):
        out = tokops.pack_chunks(df, context_len=C, n_buckets=nb).orderBy("chunk_id").collect()
        assert [r.input_ids for r in out] == exp, f"n_buckets={nb} changed the layout"


def test_sparse_nonuniform_ids(spark):
    """width_bucket bucketing must stay correct (if skewed) for sparse id
    spaces — order preservation is what matters, not balance."""
    sizes = np.random.default_rng(3).integers(1, 30, size=60)
    rows, df = _docs(spark, sizes, start_id=1_000_000, id_stride=9973)
    out = tokops.pack_chunks(df, context_len=C, n_buckets=8).orderBy("chunk_id").collect()
    assert [r.input_ids for r in out] == _expected_chunks(rows)


def test_pack_spans_invariants(spark):
    sizes = list(np.random.default_rng(4).integers(1, 50, size=100))
    sizes[10] = 700
    rows, df = _docs(spark, sizes)
    spans = tokops.pack_spans(
        df.withColumn("n_tok", F.size("tokens")), context_len=C
    ).collect()
    total = sum(n for n in sizes)
    assert sum(r.span_len for r in spans) == total
    # each doc's spans tile [0, len) exactly, in consecutive chunks
    by_doc = {}
    for r in spans:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, toks in rows:
        got = sorted(by_doc[doc_id], key=lambda r: r.doc_off)
        assert got[0].doc_off == 0
        assert sum(r.span_len for r in got) == len(toks)
        assert [r.chunk_id for r in got] == list(
            range(got[0].chunk_id, got[0].chunk_id + len(got))
        )
        for a, b in zip(got, got[1:]):
            assert a.doc_off + a.span_len == b.doc_off
        # every non-boundary span starts at chunk offset 0
        assert all(r.chunk_off == 0 for r in got[1:])
        assert all(1 <= r.span_len <= C for r in got)


def test_empty_and_gates(spark):
    _, df = _docs(spark, [])
    assert tokops.pack_chunks(df, context_len=C).count() == 0
    with pytest.raises(ValueError, match="context_len"):
        tokops.pack_spans(df.withColumn("n_tok", F.size("tokens")), context_len=0)


def test_no_single_partition_funnel(spark):
    """The scale property the design exists for: the global running sum
    must never collapse into a single-partition window."""
    _, df = _docs(spark, np.random.default_rng(5).integers(1, 30, size=50))
    for frame in (
        tokops.pack_spans(df.withColumn("n_tok", F.size("tokens")), context_len=C),
        tokops.pack_chunks(df, context_len=C),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan
        assert "PythonUDF" not in plan  # pure Catalyst end to end


# ---------------------------------------------------------------- bestfit


def _ntok_docs(spark, lens):
    return spark.createDataFrame(
        [(i, int(n)) for i, n in enumerate(lens)], "doc_id long, n_tok long"
    )


def test_bestfit_single_shard_hand_checked(spark):
    # BFD over lengths [9,7,5,4,3,2] into capacity 10 (one shard):
    # 9 -> bin0; 7 -> bin1; 5 -> bin2; 4 -> bin2 would be 9<=10? 5+4=9 ok
    # but best-fit picks the TIGHTEST bin that fits: fills 9,7,5 -> 4 fits
    # only bin2(5); 3 fits bin1(7) (tightest with room); 2 fits bin2(9)?
    # 9+2=11>10 -> bin1(7+3=10)? full -> bin0(9)? 11>10 -> new bin3.
    df = _ntok_docs(spark, [9, 7, 5, 4, 3, 2])
    out = {
        r["doc_id"]: (r["bin"], r["bin_off"])
        for r in tokops.pack_bestfit(
            df, context_len=10, docs_per_shard=100
        ).collect()
    }
    assert out[0] == (0, 0)  # 9
    assert out[1] == (1, 0)  # 7
    assert out[2] == (2, 0)  # 5
    assert out[3] == (2, 5)  # 4 -> bin2 now 9
    assert out[4] == (1, 7)  # 3 -> bin1 now 10 (tightest fit over bin2)
    assert out[5] == (3, 0)  # 2 fits nowhere -> new bin


def test_bestfit_oversize_routed_not_truncated(spark):
    df = _ntok_docs(spark, [12, 4])
    out = {r["doc_id"]: r for r in tokops.pack_bestfit(
        df, context_len=10, docs_per_shard=100).collect()}
    assert out[0]["bin"] == -1 and out[0]["bin_off"] == 0
    assert out[1]["bin"] == 0


def test_bestfit_capacity_and_offsets_hold(spark):
    rng = np.random.default_rng(7)
    df = _ntok_docs(spark, rng.integers(1, 40, size=300))
    rows = tokops.pack_bestfit(df, context_len=64, docs_per_shard=64).collect()
    fills: dict = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["bin"], r["bin_off"])):
        assert r["bin"] >= 0  # nothing oversize here
        key = (r["shard"], r["bin"])
        assert r["bin_off"] == fills.get(key, 0)  # contiguous offsets
        fills[key] = r["bin_off"] + r["n_tok"]
    assert all(f <= 64 for f in fills.values())


def test_bestfit_layout_invariant(spark):
    rng = np.random.default_rng(11)
    df = _ntok_docs(spark, rng.integers(1, 40, size=200))
    a = sorted(map(tuple, tokops.pack_bestfit(
        df.coalesce(1), context_len=64, docs_per_shard=50).collect()))
    b = sorted(map(tuple, tokops.pack_bestfit(
        df.repartition(13), context_len=64, docs_per_shard=50).collect()))
    assert a == b
