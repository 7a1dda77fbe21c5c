"""ztdf_lake Structured Streaming source (Spark 4 Python Data Source API):
snapshot-version offsets, per-delta-file partitions, exactly-once resume
from checkpoint, compaction transparency, schema evolution."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ztdf_spark.lake import LakeTable
from ztdf_spark.source import ZtdfLakeDataSource

STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.dataSource.register(ZtdfLakeDataSource)


def _mk(spark, tmp_path, name):
    return LakeTable.create(
        spark, str(tmp_path / name), schema=STATE_SCHEMA, target_file_rows=200, merge_mode="mor"
    )


def _merge(t, rows, bid):
    t.merge(
        t.spark.createDataFrame(rows, "op string, doc_id string, lsn long, n_tok int, source string"),
        batch_id=bid,
    )


def _drain(spark, path, ckpt, sink_name, start_version=None):
    r = spark.readStream.format("ztdf_lake").option("path", path)
    if start_version is not None:
        r = r.option("startVersion", start_version)
    out = []
    q = (
        r.load()
        .writeStream.foreachBatch(lambda df, _bid: out.extend(df.collect()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    return out


def test_stream_source_raw_feed_and_resume(spark, tmp_path):
    t = _mk(spark, tmp_path, "src")
    _merge(t, [("I", "a", 1, 1, "web"), ("I", "b", 2, 1, "web")], 0)
    _merge(t, [("U", "a", 10, 2, "web"), ("D", "b", 11, None, None)], 1)
    ckpt = str(tmp_path / "ckpt")

    rows = _drain(spark, t.path, ckpt, "feed1")
    got = {(r["doc_id"], r["lsn"]): (r["_change_type"], r["_commit_version"]) for r in rows}
    # RAW append-scan: every committed change event, op mapped from tombstone
    assert got == {
        ("a", 1): ("upsert", 1),
        ("b", 2): ("upsert", 1),
        ("a", 10): ("upsert", 2),
        ("b", 11): ("delete", 2),
    }

    # exactly-once resume: a new commit + restart from the SAME checkpoint
    # yields only the new commit's rows
    _merge(t, [("I", "c", 20, 3, "api")], 2)
    rows2 = _drain(spark, t.path, ckpt, "feed2")
    assert {(r["doc_id"], r["lsn"], r["_change_type"]) for r in rows2} == {("c", 20, "upsert")}


def test_stream_source_skips_compaction_rewrites(spark, tmp_path):
    """compact() rewrites state without changing it — a change stream that
    re-emitted compacted rows would double-count; snapshot-chain walking
    must also survive the compaction REMOVING old delta manifests."""
    t = _mk(spark, tmp_path, "srcc")
    _merge(t, [("I", "a", 1, 1, "web"), ("I", "b", 2, 1, "web")], 0)
    _merge(t, [("U", "a", 5, 2, "web")], 1)
    t.compact()
    _merge(t, [("I", "d", 9, 4, "api")], 3)
    rows = _drain(spark, t.path, str(tmp_path / "ckptc"), "feedc")
    got = sorted((r["doc_id"], r["lsn"], r["_commit_version"]) for r in rows)
    assert got == [("a", 1, 1), ("a", 5, 2), ("b", 2, 1), ("d", 9, 4)]


def test_stream_source_start_version_and_schema_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path, "srce")
    _merge(t, [("I", "a", 1, 1, "web")], 0)
    v1 = t.current_version()
    # additive evolution: later batch carries a new column
    t.merge(
        t.spark.createDataFrame(
            [("I", "b", 2, 1, "web", "eu")],
            "op string, doc_id string, lsn long, n_tok int, source string, region string",
        ),
        batch_id=1,
    )
    # stream from v1: only the second commit, with the evolved column
    rows = _drain(spark, t.path, str(tmp_path / "ckpte"), "feede", start_version=v1)
    assert [(r["doc_id"], r["region"]) for r in rows] == [("b", "eu")]
    # stream from 0: the pre-evolution file reads the new column as null
    rows0 = _drain(spark, t.path, str(tmp_path / "ckpte0"), "feede0", start_version=0)
    got = {r["doc_id"]: r["region"] for r in rows0}
    assert got == {"a": None, "b": "eu"}


def test_stream_source_rejects_cow(spark, tmp_path):
    LakeTable.create(spark, str(tmp_path / "cowt"), schema=STATE_SCHEMA, merge_mode="cow")
    with pytest.raises(Exception, match="mor"):
        (
            spark.readStream.format("ztdf_lake")
            .option("path", str(tmp_path / "cowt"))
            .load()
            .writeStream.format("noop")
            .start()
        )


@pytest.mark.parametrize(
    "opt,val,span",
    [("maxVersionsPerTrigger", "5", 5), ("maxFilesPerTrigger", "3", 3)],
)
def test_stream_source_backpressure_bounded_batches(spark, tmp_path, opt, val, span):
    """A 20-commit backlog drains in multiple bounded micro-batches under
    maxVersionsPerTrigger / maxFilesPerTrigger (VERDICT r4 next-round #2)
    with exactly-once delivery intact — each commit here adds one delta
    file, so both options bound the per-batch commit span."""
    import time

    t = _mk(spark, tmp_path, f"bp-{opt}")
    for i in range(20):
        _merge(t, [("I", f"d{i}", i + 1, 1, "web")], i)
    batches = []
    q = (
        spark.readStream.format("ztdf_lake")
        .option("path", t.path)
        .option(opt, val)
        .load()
        .writeStream.foreachBatch(lambda df, bid: batches.append((bid, df.collect())))
        .option("checkpointLocation", str(tmp_path / f"ck-bp-{opt}"))
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline and sum(len(rs) for _, rs in batches) < 20:
        time.sleep(0.5)
    q.stop()
    rows = [r for _, rs in batches for r in rs]
    assert len(rows) == 20 and len({r["doc_id"] for r in rows}) == 20  # exactly once
    nonempty = [rs for _, rs in batches if rs]
    assert len(nonempty) >= 20 // span, f"backlog drained in {len(nonempty)} batches"
    for rs in nonempty:
        vs = {r["_commit_version"] for r in rs}
        assert max(vs) - min(vs) + 1 <= span, f"batch spans {vs}"


def test_stream_source_backpressure_survives_restart(spark, tmp_path):
    """The clamp's restart anchor (measured Spark 4.1 call order: a
    restarted query re-plans its last logged batch via partitions()
    before asking for a new latestOffset): drain 6 commits with a
    checkpoint, add a 12-commit backlog, restart with
    maxVersionsPerTrigger=4 — the backlog drains in bounded batches,
    nothing is re-emitted, nothing skipped."""
    import time

    t = _mk(spark, tmp_path, "bprestart")
    for i in range(6):
        _merge(t, [("I", f"d{i}", i + 1, 1, "web")], i)
    ckpt = str(tmp_path / "ck-bprestart")

    def run(expected_total, batches):
        q = (
            spark.readStream.format("ztdf_lake")
            .option("path", t.path)
            .option("maxVersionsPerTrigger", 4)
            .load()
            .writeStream.foreachBatch(lambda df, bid: batches.append(df.collect()))
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="50 milliseconds")
            .start()
        )
        deadline = time.time() + 120
        while time.time() < deadline and sum(len(rs) for rs in batches) < expected_total:
            time.sleep(0.5)
        q.stop()

    first: list = []
    run(6, first)
    assert sum(len(rs) for rs in first) == 6
    for i in range(6, 18):
        _merge(t, [("I", f"d{i}", i + 1, 1, "web")], i)
    second: list = []
    run(12, second)
    rows = [r for rs in second for r in rs]
    # exactly the new 12 commits, once each, in bounded batches
    assert sorted(r["doc_id"] for r in rows) == sorted(f"d{i}" for i in range(6, 18))
    nonempty = [rs for rs in second if rs]
    assert len(nonempty) >= 3  # 12 commits / 4 per trigger
    for rs in nonempty:
        vs = {r["_commit_version"] for r in rs}
        assert max(vs) - min(vs) + 1 <= 4, f"batch spans {vs}"


def test_stream_source_cow_change_feed(spark, tmp_path):
    """A COW table created with change_feed=True streams its per-commit
    recorded changes (surviving batch winners) through the ztdf_lake
    source — upsert/delete post-images per commit, stale shadowed rows
    never emitted."""
    a = LakeTable.create(
        spark, str(tmp_path / "cowstream"), schema=STATE_SCHEMA,
        target_file_rows=200, merge_mode="cow", change_feed=True,
    )
    _merge(a, [("I", "a", 1, 1, "web"), ("I", "b", 2, 1, "web")], 0)
    _merge(a, [("U", "a", 10, 2, "web"), ("D", "b", 11, None, None),
               ("U", "a", 0, 9, "web")], 1)  # lsn 0 is stale vs lsn 1? no: shadowed by 10 in-batch
    rows = _drain(spark, a.path, str(tmp_path / "ck-cowstream"), "cowstream")
    got = sorted(
        (r["_commit_version"], r["doc_id"], r["lsn"], r["_change_type"]) for r in rows
    )
    assert got == [
        (1, "a", 1, "upsert"),
        (1, "b", 2, "upsert"),
        (2, "a", 10, "upsert"),
        (2, "b", 11, "delete"),
    ]


def test_stream_sink_replicates_table(spark, tmp_path):
    """CDC replication end-to-end through the Python Data Source API: table
    A's delta commits stream out the ztdf_lake SOURCE and land in table B
    through the ztdf_lake SINK; B's latest-wins state converges to A's,
    and a checkpointed re-run ships only new commits (exactly-once)."""
    a = _mk(spark, tmp_path, "repA")
    b = _mk(spark, tmp_path, "repB")
    _merge(a, [("I", "a", 1, 1, "web"), ("I", "b", 2, 1, "web")], 0)
    _merge(a, [("U", "a", 10, 2, "web"), ("D", "b", 11, None, None)], 1)

    def replicate(ckpt):
        feed = spark.readStream.format("ztdf_lake").option("path", a.path).load()
        out = feed.selectExpr(
            "CASE WHEN _change_type = 'delete' THEN 'D' ELSE 'U' END AS op",
            "doc_id", "lsn", "n_tok", "source",
        )
        q = (
            out.writeStream.format("ztdf_lake")
            .option("path", b.path)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    ckpt = str(tmp_path / "repckpt")
    replicate(ckpt)
    state = lambda t: sorted(  # noqa: E731
        (r["doc_id"], r["lsn"], r["n_tok"], r["source"]) for r in t.read().collect()
    )
    assert state(b) == state(a) == [("a", 10, 2, "web")]

    # incremental catch-up from the same checkpoint
    _merge(a, [("I", "c", 20, 3, "api"), ("U", "a", 21, 4, "web")], 2)
    replicate(ckpt)
    assert state(b) == state(a) == [("a", 21, 4, "web"), ("c", 20, 3, "api")]
    # replay protection: a third run with nothing new is a no-op
    v_before = b.current_version()
    replicate(ckpt)
    assert b.current_version() == v_before


def test_stream_source_expired_snapshot_is_hard_error(spark, tmp_path):
    """A stream that fell behind the retention window must fail loudly
    (Iceberg semantics), not silently skip the expired commits."""
    t = _mk(spark, tmp_path, "srcexp")
    for i in range(6):
        _merge(t, [("I", f"k{i}", i + 1, 1, "web")], i)
    t.expire_snapshots(keep_last=2)
    with pytest.raises(Exception, match="expired|retention"):
        _drain(spark, t.path, str(tmp_path / "ckptexp"), "feedexp", start_version=0)


def test_stream_sink_fresh_checkpoint_not_fenced(spark, tmp_path):
    """Epoch ids restart at 0 under a NEW checkpoint; the fence key derives
    from the checkpoint location, so a second independent query into the
    same table must COMMIT its epoch-0 batch, not fence it as a replay."""
    a = _mk(spark, tmp_path, "fcA")
    b = _mk(spark, tmp_path, "fcB")
    _merge(a, [("I", "x", 1, 1, "web")], 0)

    def ship(ckpt):
        feed = (
            spark.readStream.format("ztdf_lake").option("path", a.path).load()
            .selectExpr("CASE WHEN _change_type='delete' THEN 'D' ELSE 'U' END AS op",
                        "doc_id", "lsn", "n_tok", "source")
        )
        q = (feed.writeStream.format("ztdf_lake").option("path", b.path)
             .option("checkpointLocation", ckpt).trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()

    ship(str(tmp_path / "ck1"))
    assert {r["doc_id"] for r in b.read().collect()} == {"x"}
    _merge(a, [("I", "y", 2, 1, "web")], 1)
    # a brand-new checkpoint streams from version 0 again: both commits
    # re-ship; latest-wins dedup in the table absorbs the overlap and the
    # epoch-0 batch is NOT silently fenced
    ship(str(tmp_path / "ck2"))
    assert {r["doc_id"] for r in b.read().collect()} == {"x", "y"}


def test_stream_source_v2_upgrade_no_reemission(spark, tmp_path):
    """First v3 commit over a v2-format table: the carry-over manifest
    repackages ALL historical files under the new commit — the source must
    attribute changes per commit (explicit added_at / v2 inline diff), not
    by manifest filename, or the whole history re-emits as that commit's
    changes (ADVICE r3 #1)."""
    import json
    import os

    t = _mk(spark, tmp_path, "v2up")
    _merge(t, [("I", "a", 1, 1, "web"), ("I", "b", 2, 1, "web")], 0)
    _merge(t, [("U", "a", 3, 2, "web")], 1)
    # rewrite the snapshot chain into format v2 (inline file lists)
    for v in range(t.current_version() + 1):
        p = os.path.join(t._snap_dir, f"v{v:010d}.json")
        with open(p) as f:
            snap = json.load(f)
        files = []
        for m in snap.pop("manifests", []):
            files.extend(t._read_manifest(m["path"]))
        snap["files"] = files
        snap["format_version"] = 2
        with open(p, "w") as f:
            json.dump(snap, f)
    t2 = LakeTable.load(spark, t.path)
    _merge(t2, [("I", "c", 9, 1, "api")], 2)  # upgrade commit: v2 → v3

    # stream the full history: v2 commits emit via inline file diff, the
    # upgrade commit emits ONLY its own row — nothing re-emitted
    rows = _drain(spark, t.path, str(tmp_path / "ckv2"), "feedv2", start_version=0)
    got = sorted((r["doc_id"], r["lsn"], r["_commit_version"]) for r in rows)
    assert got == [("a", 1, 1), ("a", 3, 2), ("b", 2, 1), ("c", 9, 3)]
    # stream from just before the upgrade commit: exactly one row
    rows2 = _drain(spark, t.path, str(tmp_path / "ckv2b"), "feedv2b", start_version=2)
    assert [(r["doc_id"], r["lsn"]) for r in rows2] == [("c", 9)]


def test_stream_sink_requires_fence_key(spark, tmp_path):
    """No checkpointLocation option and no explicit appId → the sink must
    refuse (a silent shared-constant fence would let two queries fence each
    other's epochs as replays, ADVICE r3 #2)."""
    a = _mk(spark, tmp_path, "fkA")
    b = _mk(spark, tmp_path, "fkB")
    _merge(a, [("I", "x", 1, 1, "web")], 0)
    feed = (
        spark.readStream.format("ztdf_lake").option("path", a.path).load()
        .selectExpr("CASE WHEN _change_type='delete' THEN 'D' ELSE 'U' END AS op",
                    "doc_id", "lsn", "n_tok", "source")
    )
    # checkpoint comes only from the conf-level default, which the data
    # source cannot see → ValueError from the writer
    spark.conf.set("spark.sql.streaming.checkpointLocation", str(tmp_path / "confck"))
    try:
        with pytest.raises(Exception, match="appId|checkpointLocation"):
            q = (feed.writeStream.format("ztdf_lake").option("path", b.path)
                 .trigger(availableNow=True).start())
            q.awaitTermination(120)
            q.stop()
        # an explicit appId is a valid fence key without any checkpoint option
        q = (feed.writeStream.format("ztdf_lake").option("path", b.path)
             .option("appId", "fence-test-app").trigger(availableNow=True).start())
        q.awaitTermination(120)
        q.stop()
    finally:
        spark.conf.unset("spark.sql.streaming.checkpointLocation")
    assert {r["doc_id"] for r in b.read().collect()} == {"x"}


def test_stream_source_reads_through_widened_schema(spark, tmp_path):
    """Type widening (int→long) between commits: the stream's schema is
    the CURRENT table schema; pre-widening delta files cast up at read."""
    t = LakeTable.create(
        spark, str(tmp_path / "widesrc"),
        schema=T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("n_tok", T.IntegerType()),
            ]
        ),
        target_file_rows=200, merge_mode="mor",
    )
    t.merge(
        spark.createDataFrame([("I", "a", 1, 5)], "op string, doc_id string, lsn long, n_tok int"),
        batch_id=0,
    )
    big = 3_000_000_000
    t.merge(
        spark.createDataFrame(
            [("I", "b", 2, big)], "op string, doc_id string, lsn long, n_tok long"
        ),
        batch_id=1,
    )
    rows = _drain(spark, t.path, str(tmp_path / "ckw"), "feedw", start_version=0)
    got = {r["doc_id"]: r["n_tok"] for r in rows}
    assert got == {"a": 5, "b": big}


def test_stream_source_and_sink_with_renamed_columns(spark, tmp_path):
    """rename/drop are metadata-only, so the streaming surfaces must
    translate: the SOURCE emits the table's LOGICAL names while reading the
    stable physical file columns; the SINK accepts logical names and stages
    files with physical names so commit_staged adopts them unchanged."""
    a = _mk(spark, tmp_path, "renA")
    _merge(a, [("I", "a", 1, 1, "web"), ("I", "b", 2, 1, "web")], 0)
    a.rename_column("n_tok", "tok_count")
    _merge_renamed = lambda rows, bid: a.merge(
        spark.createDataFrame(
            rows, "op string, doc_id string, lsn long, tok_count int, source string"
        ),
        batch_id=bid,
    )
    _merge_renamed([("U", "a", 10, 5, "web")], 1)

    rows = _drain(spark, a.path, str(tmp_path / "ck-renA"), "renA")
    assert "tok_count" in rows[0].asDict() and "n_tok" not in rows[0].asDict()
    got = {(r["doc_id"], r["lsn"]): r["tok_count"] for r in rows}
    assert got == {("a", 1): 1, ("b", 2): 1, ("a", 10): 5}

    # sink into a SECOND renamed table: logical stream columns land in the
    # physical file layer, and reads come back logical
    b = _mk(spark, tmp_path, "renB")
    b.rename_column("n_tok", "tok_count")
    feed = spark.readStream.format("ztdf_lake").option("path", a.path).load()
    out = feed.selectExpr(
        "CASE WHEN _change_type = 'delete' THEN 'D' ELSE 'U' END AS op",
        "doc_id", "lsn", "tok_count", "source",
    )
    q = (
        out.writeStream.format("ztdf_lake")
        .option("path", b.path)
        .option("checkpointLocation", str(tmp_path / "ck-renB"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    got_b = {r["doc_id"]: r["tok_count"] for r in b.read().collect()}
    assert got_b == {"a": 5, "b": 1}
    # physical file layer really is the stable name
    snap = b.snapshot()
    assert {c["logical"]: c["physical"] for c in snap["columns"]}["tok_count"] == "n_tok"
