"""LakeTable (Iceberg-semantics layer) tests: MERGE vs brute-force oracle,
exactly-once fencing, additive schema evolution, time travel, pruning,
vacuum (FIXTURES.md §5)."""

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ztdf_spark.datagen import BINLOG_DDL, BinlogSpec, expected_final_state, write_binlog
from ztdf_spark.lake import CommitConflict, LakeTable

STATE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("tokens", T.ArrayType(T.IntegerType())),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)

CH_COLS = ["op", "doc_id", "lsn", "tokens", "n_tok", "source"]


def _mk(spark, tmp_path, name="t"):
    return LakeTable.create(spark, str(tmp_path / name), schema=STATE_SCHEMA, target_file_rows=200)


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "op string, doc_id string, lsn long, tokens array<int>, n_tok int, source string"
    )


def test_create_load_and_empty_read(spark, tmp_path):
    t = _mk(spark, tmp_path)
    assert t.current_version() == 0
    assert LakeTable.load(spark, t.path).read().count() == 0
    with pytest.raises(CommitConflict):
        LakeTable.create(spark, t.path, STATE_SCHEMA)


def test_merge_upsert_delete_latest_wins(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "web")]), batch_id=0)
    t.merge(
        _changes(
            spark,
            [
                ("U", "a", 10, [10], 1, "web"),
                ("U", "a", 5, [5], 1, "web"),  # stale update in same batch → loses
                ("D", "b", 11, None, None, None),
                ("I", "c", 12, [12], 1, "code"),
            ],
        ),
        batch_id=1,
    )
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert set(got) == {"a", "c"}
    assert got["a"]["lsn"] == 10 and got["a"]["tokens"] == [10]


def test_stale_cross_batch_update_loses(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("I", "a", 100, [100], 1, "web")]), batch_id=0)
    t.merge(_changes(spark, [("U", "a", 50, [50], 1, "web")]), batch_id=1)  # older lsn arrives later
    got = t.read().collect()[0]
    assert got["lsn"] == 100 and got["tokens"] == [100]


def test_exactly_once_batch_fencing(spark, tmp_path):
    t = _mk(spark, tmp_path)
    b = _changes(spark, [("I", "a", 1, [1], 1, "web")])
    r1 = t.merge(b, batch_id=7)
    assert not r1["noop"]
    v = t.current_version()
    r2 = t.merge(b, batch_id=7)  # re-delivery → no-op
    assert r2["noop"] and t.current_version() == v
    r3 = t.merge(b, batch_id=3)  # older batch id → no-op
    assert r3["noop"]
    assert t.read().count() == 1


def test_merge_against_bruteforce_oracle(spark, tmp_path):
    spec = BinlogSpec(n_events=4_000, n_docs=300, n_files=8, seed=7)
    d = str(tmp_path / "binlog")
    write_binlog(d, spec)
    t = _mk(spark, tmp_path)
    files = sorted(os.listdir(d))
    # replay two files per merge-batch, out of order within the batch
    for bid, i in enumerate(range(0, len(files), 2)):
        batch = spark.read.schema(BINLOG_DDL).parquet(*[os.path.join(d, f) for f in files[i : i + 2]])
        # failure-routed rows (no attrs on change events) never reach MERGE
        ok = batch.filter((F.col("op") == "D") | F.col("tdf_attribute").isNotNull())
        t.merge(ok.select(*CH_COLS), batch_id=bid)
    got = t.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = expected_final_state(d)[["doc_id", "lsn", "n_tok", "source"]].sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["lsn"].tolist() == exp["lsn"].tolist()
    assert got["n_tok"].tolist() == exp["n_tok"].astype(int).tolist()


def test_copy_on_write_prunes_untouched_files(spark, tmp_path):
    t = _mk(spark, tmp_path)
    # 1000 keys over ~5 files (target_file_rows=200), range-clustered
    rows = [("I", f"doc-{i:05d}", i, [i], 1, "web") for i in range(1000)]
    t.merge(_changes(spark, rows), batch_id=0)
    n_files = len(t._files(t.snapshot()))
    assert n_files >= 4
    # touch one key at the very top of the range → only 1 file rewritten
    r = t.merge(_changes(spark, [("U", "doc-00999", 5000, [9], 1, "web")]), batch_id=1)
    assert r["files_rewritten"] == 1
    # output sizing uses a row-count *estimate* (no extra count action), so
    # the rewritten range may come back as 1-2 files; the other ~4 files of
    # the table must be untouched
    assert 1 <= r["files_added"] <= 2
    assert len(t._files(t.snapshot())) <= n_files + 1
    untouched = {f["path"] for f in t._files(t.snapshot(1))} & {f["path"] for f in t._files(t.snapshot())}
    assert len(untouched) == n_files - 1
    assert t.read().count() == 1000


def test_additive_schema_evolution(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    evolved = spark.createDataFrame(
        [("I", "b", 2, [2], 1, "web", "en")],
        "op string, doc_id string, lsn long, tokens array<int>, n_tok int, source string, lang string",
    )
    t.merge(evolved, batch_id=1)
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert got["a"]["lang"] is None  # old rows read null through evolved schema
    assert got["b"]["lang"] == "en"
    assert [f.name for f in t.schema().fields][-1] == "lang"
    # old data + old-shaped batches still merge fine after evolution
    t.merge(_changes(spark, [("U", "a", 3, [3], 1, "web")]), batch_id=2)
    assert t.read().filter("doc_id='a'").collect()[0]["lang"] is None


def test_time_travel_and_history(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    t.merge(_changes(spark, [("D", "a", 2, None, None, None)]), batch_id=1)
    assert t.read().count() == 0
    assert t.read(version=1).count() == 1  # pre-delete snapshot
    hist = t.history()
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[2]["summary"]["n_deletes"] == 1
    assert hist[2]["parent"] == 1


def test_vacuum_removes_orphans(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    orphan = os.path.join(t.path, "data", "part-orphan.parquet")
    with open(orphan, "wb") as f:
        f.write(b"junk")
    # within the grace window the young unreferenced file is protected —
    # it could be a concurrent writer's just-adopted data file whose
    # snapshot swap hasn't landed yet (ADVICE r3 #3)
    assert t.vacuum() == []
    assert os.path.exists(orphan)
    removed = t.vacuum(orphan_grace_s=0.0)
    assert removed == ["part-orphan.parquet"]
    assert t.read().count() == 1


# ---------------------------------------------------------------- merge-on-read


def _mk_mor(spark, tmp_path, name="tm"):
    return LakeTable.create(
        spark, str(tmp_path / name), schema=STATE_SCHEMA, target_file_rows=200, merge_mode="mor"
    )


BATCHES = [
    [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "web"), ("I", "c", 3, [3], 1, "code")],
    [
        ("U", "a", 10, [10], 1, "web"),
        ("U", "a", 5, [5], 1, "web"),  # stale within batch → loses at read time
        ("D", "b", 11, None, None, None),
    ],
    [
        ("U", "c", 2, [9], 1, "code"),  # stale cross-batch (lsn 2 < 3) → loses
        ("I", "d", 20, [20], 1, "web"),
        ("D", "zz", 21, None, None, None),  # delete of a never-seen key → no row
    ],
]


def _replay(t):
    for bid, rows in enumerate(BATCHES):
        t.merge(t.spark.createDataFrame(rows, "op string, doc_id string, lsn long, tokens array<int>, n_tok int, source string"), batch_id=bid)
    return sorted(
        (r["doc_id"], r["lsn"], r["tokens"], r["n_tok"], r["source"])
        for r in t.read().collect()
    )


def test_mor_final_state_matches_cow(spark, tmp_path):
    """MOR and COW are two physical strategies for ONE logical MERGE
    contract: identical final state on the same batch sequence, including
    within-batch staleness, cross-batch staleness, deletes, and deletes of
    absent keys."""
    assert _replay(_mk_mor(spark, tmp_path, "mor")) == _replay(_mk(spark, tmp_path, "cow"))
    got = {d for d, *_ in _replay(_mk_mor(spark, tmp_path, "mor2"))}
    assert got == {"a", "c", "d"}


def test_mor_merge_is_pure_append(spark, tmp_path):
    """The whole point: a MOR merge never reads or rewrites existing files —
    every prior data file survives every subsequent merge verbatim."""
    t = _mk_mor(spark, tmp_path)
    seen: set = set()
    for bid, rows in enumerate(BATCHES):
        t.merge(
            t.spark.createDataFrame(rows, "op string, doc_id string, lsn long, tokens array<int>, n_tok int, source string"),
            batch_id=bid,
        )
        files = {f["path"] for f in t._files(t.snapshot())}
        assert seen <= files  # strict append: nothing removed
        assert t.snapshot()["summary"]["files_rewritten"] == 0
        seen = files
    assert all(f.get("delta") for f in t._files(t.snapshot()))


def test_mor_compact_preserves_state(spark, tmp_path):
    t = _mk_mor(spark, tmp_path)
    before = _replay(t)
    c = t.compact()
    assert not c.get("noop")
    after = sorted(
        (r["doc_id"], r["lsn"], r["tokens"], r["n_tok"], r["source"]) for r in t.read().collect()
    )
    assert after == before
    # post-compaction: no delta files → read() takes the no-dedup fast path;
    # file rows = live rows + retained DELETE tombstone winners (b@11, zz@21
    # must keep shadowing out-of-order stale updates even after compaction)
    snap = t.snapshot()
    assert not any(f.get("delta") for f in t._files(snap))
    assert sum(f["rows"] for f in t._files(snap)) == len(after) + 2
    assert t.delta_ratio() == 0.0
    assert t.compact().get("noop")  # idempotent
    # and MOR merging continues to work on top of the compacted base
    t.merge(
        t.spark.createDataFrame([("U", "a", 99, [99], 1, "web")], "op string, doc_id string, lsn long, tokens array<int>, n_tok int, source string"),
        batch_id=len(BATCHES),
    )
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert got["a"]["lsn"] == 99


def test_mor_exactly_once_fencing(spark, tmp_path):
    t = _mk_mor(spark, tmp_path)
    b = _changes(spark, [("I", "a", 1, [1], 1, "web")])
    assert not t.merge(b, batch_id=7)["noop"]
    v = t.current_version()
    assert t.merge(b, batch_id=7)["noop"] and t.current_version() == v
    assert t.is_committed(7) and t.is_committed(3) and not t.is_committed(8)
    assert t.read().count() == 1


def test_mor_schema_evolution(spark, tmp_path):
    t = _mk_mor(spark, tmp_path)
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    evolved = spark.createDataFrame(
        [("I", "b", 2, [2], 1, "web", "en")],
        "op string, doc_id string, lsn long, tokens array<int>, n_tok int, source string, lang string",
    )
    t.merge(evolved, batch_id=1)
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert got["a"]["lang"] is None and got["b"]["lang"] == "en"


def test_mor_against_bruteforce_oracle(spark, tmp_path):
    spec = BinlogSpec(n_events=4_000, n_docs=300, n_files=8, seed=7)
    d = str(tmp_path / "binlog")
    write_binlog(d, spec)
    t = _mk_mor(spark, tmp_path)
    files = sorted(os.listdir(d))
    for bid, i in enumerate(range(0, len(files), 2)):
        batch = spark.read.schema(BINLOG_DDL).parquet(*[os.path.join(d, f) for f in files[i : i + 2]])
        ok = batch.filter((F.col("op") == "D") | F.col("tdf_attribute").isNotNull())
        t.merge(ok.select(*CH_COLS), batch_id=bid)
    t.compact()
    got = t.read().toPandas().sort_values("doc_id").reset_index(drop=True)
    exp = expected_final_state(d)[["doc_id", "lsn", "n_tok", "source"]].sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(exp)
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["lsn"].tolist() == exp["lsn"].tolist()


def test_cow_pipeline_mode_still_works(spark, tmp_path):
    """The pipeline's merge_mode='cow' path (persist + DLQ stage=udf + COW
    MERGE) stays green now that the default is MOR."""
    from ztdf_spark.datagen import BinlogSpec as BS
    from ztdf_spark.pipeline import CdcPipeline, PipelineConfig
    from ztdf_spark.settings import Settings

    d = str(tmp_path / "cowlog")
    write_binlog(d, BS(n_events=1_000, n_docs=100, n_files=4, seed=5))
    cow = CdcPipeline(spark, Settings(), PipelineConfig(root=str(tmp_path / "cowp"), merge_mode="cow", target_file_rows=500))
    mor = CdcPipeline(spark, Settings(), PipelineConfig(root=str(tmp_path / "morp"), merge_mode="mor", target_file_rows=500))
    cow.replay_in_batches(d, n_batches=2)
    mor.replay_in_batches(d, n_batches=2)
    fp = lambda p: sorted(  # noqa: E731
        (r["doc_id"], r["lsn"], bytes(r["ciphertext"])) for r in p.table.read().collect()
    )
    assert fp(cow) == fp(mor)
    assert sum(v for k, v in cow.verify_roundtrip(d).items() if k != "compared") == 0


def test_mor_read_shuffle_hash_fallback(spark, tmp_path):
    """Above spark.ztdf.broadcastKeyLimit the read-time winner join must
    degrade to a shuffled hash join with identical results."""
    t = _mk_mor(spark, tmp_path)
    ref = _replay(t)
    old = spark.conf.get("spark.ztdf.broadcastKeyLimit", None)
    spark.conf.set("spark.ztdf.broadcastKeyLimit", "1")
    try:
        got = sorted(
            (r["doc_id"], r["lsn"], r["tokens"], r["n_tok"], r["source"])
            for r in t.read().collect()
        )
        assert got == ref
    finally:
        if old is None:
            spark.conf.unset("spark.ztdf.broadcastKeyLimit")
        else:
            spark.conf.set("spark.ztdf.broadcastKeyLimit", old)


def test_expire_snapshots_retention(spark, tmp_path):
    t = _mk_mor(spark, tmp_path)
    _replay(t)  # 3 merges -> versions 0..3
    t.compact()  # version 4
    assert t.current_version() == 4
    r = t.expire_snapshots(keep_last=2)
    assert r["expired_snapshots"] == [0, 1, 2]
    # snap 3 (kept) still references every delta file -> nothing removable yet
    assert r["removed_files"] == 0
    # current state unaffected; history truncated at the horizon
    assert {x["version"] for x in t.history()} == {3, 4}
    r = t.expire_snapshots(keep_last=1)  # keep only the compacted snapshot
    assert r["expired_snapshots"] == [3]
    got = {d for d, *_ in (
        (row["doc_id"], row["lsn"]) for row in t.read().collect()
    )}
    assert got == {"a", "c", "d"}
    # pre-compaction delta files (referenced only by expired snapshots) gone
    assert r["removed_files"] > 0
    assert {x["version"] for x in t.history()} == {4}
    # exactly-once watermark survives expiry
    assert t.is_committed(len(BATCHES) - 1)
    # time travel inside the window still works
    assert t.read(version=4).count() == 3


def test_property_mor_cow_oracle_equivalence(spark, tmp_path):
    """Property test: for random CDC batch sequences (random ops, keys,
    unique lsns, arbitrary cross-batch order), MOR replay == COW replay ==
    a pure-Python latest-wins oracle."""
    from hypothesis import given, settings, strategies as st

    keys = [f"k{i}" for i in range(6)]
    event = st.tuples(st.sampled_from(["I", "U", "D"]), st.sampled_from(keys))
    seq = st.lists(st.lists(event, min_size=0, max_size=8), min_size=1, max_size=4)
    counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(seq)
    def run(batches):
        counter[0] += 1
        # assign globally-unique lsns in a shuffled (non-monotonic) order so
        # stale cross-batch updates occur
        import random

        n_ev = sum(len(b) for b in batches)
        lsns = list(range(1, n_ev + 1))
        random.Random(counter[0]).shuffle(lsns)
        it = iter(lsns)
        rows_per_batch = [
            [(op, k, next(it), [next_lsn := 0] and None or [ord(k[-1])], 1, "w") for op, k in b]
            for b in batches
        ]
        # python oracle
        events = [r for b in rows_per_batch for r in b]
        best: dict = {}
        for op, k, lsn, toks, n, src in events:
            if k not in best or lsn > best[k][2]:
                best[k] = (op, k, lsn, toks, n, src)
        expect = sorted((k, v[2]) for k, v in best.items() if v[0] != "D")

        base = tmp_path / f"prop{counter[0]}"
        results = []
        for mode in ("mor", "cow"):
            t = LakeTable.create(
                spark, str(base / mode), schema=STATE_SCHEMA, target_file_rows=200, merge_mode=mode
            )
            for bid, rows in enumerate(rows_per_batch):
                if rows:
                    t.merge(_changes(spark, rows), batch_id=bid)
            results.append(sorted((r["doc_id"], r["lsn"]) for r in t.read().collect()))
        assert results[0] == expect, f"mor != oracle: {results[0]} vs {expect}"
        assert results[1] == expect, f"cow != oracle: {results[1]} vs {expect}"

    run()


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_stale_update_cannot_resurrect_deleted_key(spark, tmp_path, mode):
    """Regression (found by the property test): after a DELETE at lsn 20,
    an out-of-order stale update at lsn 10 arriving in a LATER batch must
    NOT resurrect the key — in either merge mode, even after compaction."""
    t = LakeTable.create(spark, str(tmp_path / mode), schema=STATE_SCHEMA,
                         target_file_rows=200, merge_mode=mode)
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    t.merge(_changes(spark, [("D", "a", 20, None, None, None)]), batch_id=1)
    t.merge(_changes(spark, [("U", "a", 10, [10], 1, "web")]), batch_id=2)  # stale
    assert t.read().count() == 0
    t.compact()
    t.merge(_changes(spark, [("U", "a", 15, [15], 1, "web")]), batch_id=3)  # still stale
    assert t.read().count() == 0
    t.merge(_changes(spark, [("U", "a", 30, [30], 1, "web")]), batch_id=4)  # genuinely newer
    got = t.read().collect()
    assert len(got) == 1 and got[0]["lsn"] == 30


# ---------------------------------------------------------------------------
# Round 3: manifest-list scalability, ratio-driven compaction, concurrency,
# intra-batch duplicate defense
# ---------------------------------------------------------------------------


def _mk_mor_t(spark, tmp_path, name="mman", target_rows=200):
    return LakeTable.create(
        spark, str(tmp_path / name), schema=STATE_SCHEMA,
        target_file_rows=target_rows, merge_mode="mor",
    )


def _staged_delta(tmp_path, i, n_rows=2):
    """Write one tiny delta parquet via pyarrow (no Spark job) so many-commit
    tests measure COMMIT cost, not job scheduling."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / f"_stage-{i}"
    d.mkdir()
    tbl = pa.table(
        {
            "doc_id": [f"doc-{i:06d}-{j}" for j in range(n_rows)],
            "lsn": pa.array([i * 10 + j for j in range(n_rows)], type=pa.int64()),
            "tokens": pa.array([[1, 2]] * n_rows, type=pa.list_(pa.int32())),
            "n_tok": pa.array([2] * n_rows, type=pa.int32()),
            "source": ["web"] * n_rows,
            "_tombstone": [False] * n_rows,
        }
    )
    pq.write_table(tbl, str(d / "part-0.parquet"))
    return str(d)


def test_manifest_list_commit_cost_stays_flat(spark, tmp_path):
    """300 MOR commits: commit cost must be O(files-added), not
    O(files-total) — the late commits may not degrade vs the early ones,
    and the snapshot JSON must hold a manifest LIST, not the file
    inventory. history/time-travel/vacuum stay green afterwards."""
    import json
    import time as _time

    t = _mk_mor_t(spark, tmp_path)
    n = 300
    walls = []
    for i in range(n):
        staged = _staged_delta(tmp_path, i)
        t0 = _time.monotonic()
        r = t.commit_staged(staged, batch_id=i)
        walls.append(_time.monotonic() - t0)
        assert not r.get("noop")
    early = sorted(walls[10:60])[25]  # medians, skipping warm-up
    late = sorted(walls[-50:])[25]
    assert late < max(early * 3, early + 0.02), (early, late)
    # snapshot JSON is a manifest list: no per-file entries inline
    snap_path = os.path.join(t._snap_dir, f"v{t.current_version():010d}.json")
    raw = json.load(open(snap_path))
    assert "files" not in raw and len(raw["manifests"]) == n
    assert raw["manifests"][0]["rows"] == 2
    # totals/delta_ratio are manifest-list arithmetic
    assert t.delta_rows() == 2 * n and t.delta_ratio() == 1.0
    # read reconstructs all rows; time travel sees the prefix
    assert t.read().count() == 2 * n
    assert t.read(version=10).count() == 2 * 10
    assert len(t.history()) == n + 1
    # compaction folds the manifest list back to ONE manifest
    c = t.compact()
    assert not c.get("noop")
    assert len(t.snapshot()["manifests"]) == 1
    assert t.read().count() == 2 * n
    removed = t.vacuum()  # old delta files still referenced by old snapshots
    assert t.read().count() == 2 * n
    t.expire_snapshots(keep_last=2)
    assert t.read().count() == 2 * n


def test_ratio_driven_autocompaction_bounds_deltas(spark, tmp_path):
    """Pipeline default policy: an unattended MOR stream must keep
    delta_ratio bounded (read cost amortized) without a fixed cadence."""
    import numpy as np

    from ztdf_spark.pipeline import CdcPipeline, PipelineConfig
    from ztdf_spark.settings import Settings

    root = str(tmp_path / "auto")
    d = str(tmp_path / "binlog")
    spec = BinlogSpec(n_events=6_000, n_docs=400, n_files=12, seed=11)
    write_binlog(d, spec)
    cfg = PipelineConfig(
        root=root, compact_delta_ratio=0.5, compact_min_delta_rows=500,
        dedup_mode="never", target_file_rows=2000,
    )
    pipe = CdcPipeline(spark, Settings(), cfg)
    audits = pipe.replay_in_batches(d, n_batches=6)
    assert any(a.get("compacted") for a in audits)
    # bounded: after every batch the policy re-arms, so deltas never pile
    # beyond one threshold crossing + one batch
    assert pipe.table.delta_rows() <= 500 + 1100  # floor + one batch slack
    v = pipe.verify_roundtrip(d)
    assert sum(n for k, n in v.items() if k != "compared") == 0


def test_concurrent_merge_and_compact_converge(spark, tmp_path):
    """Optimistic concurrency: a merge and a compact racing on the same
    table — the snapshot swap is atomic (O_EXCL), the compact rebases on
    conflict, no rows are lost or duplicated, vacuum leaves no corruption."""
    import threading

    t = _mk_mor_t(spark, tmp_path, "race")
    rows0 = [("I", f"doc-{i:05d}", i, [i], 1, "web") for i in range(400)]
    t.merge(_changes(spark, rows0), batch_id=0)
    assert t.delta_ratio() == 1.0

    errs = []
    results = {}

    def do_merge():
        try:
            rows = [("U", f"doc-{i:05d}", 1000 + i, [i + 1], 1, "web") for i in range(0, 400, 4)]
            results["merge"] = t.merge(_changes(spark, rows), batch_id=1)
        except Exception as e:  # noqa: BLE001
            errs.append(("merge", e))

    def do_compact():
        try:
            results["compact"] = LakeTable.load(spark, t.path).compact()
        except Exception as e:  # noqa: BLE001
            errs.append(("compact", e))

    th = [threading.Thread(target=do_merge), threading.Thread(target=do_compact)]
    for x in th:
        x.start()
    for x in th:
        x.join()
    assert not errs, errs
    # both landed (compact possibly after a rebase retry): versions distinct
    assert results["merge"]["version"] != results["compact"]["version"]
    # final state: 400 keys, the 100 updated ones at their new lsn
    got = {r["doc_id"]: r["lsn"] for r in t.read().collect()}
    assert len(got) == 400
    for i in range(0, 400, 4):
        assert got[f"doc-{i:05d}"] == 1000 + i
    t.vacuum()
    got2 = {r["doc_id"]: r["lsn"] for r in t.read().collect()}
    assert got2 == got


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_intra_batch_duplicate_redelivery_collapses(spark, tmp_path, mode):
    """An at-least-once source re-delivering the SAME (key, lsn) event
    inside one micro-batch must yield ONE row from read() (ADVICE r2)."""
    t = LakeTable.create(
        spark, str(tmp_path / f"dup-{mode}"), schema=STATE_SCHEMA,
        target_file_rows=200, merge_mode=mode,
    )
    dup = ("I", "a", 7, [7], 1, "web")
    t.merge(_changes(spark, [dup, dup, ("I", "b", 8, [8], 1, "web")]), batch_id=0)
    rows = t.read().collect()
    assert len(rows) == 2
    assert {r["doc_id"] for r in rows} == {"a", "b"}


# ---------------------------------------------------------------------------
# Round 3: incremental change feed — changes(), the CDC OUTPUT side
# (Iceberg changelog-scan / Delta CDF analog)
# ---------------------------------------------------------------------------


def _py_state(events):
    """Latest-wins winner per key, tombstone winners included."""
    best = {}
    for op, k, lsn, *_ in events:
        if k not in best or lsn > best[k][1]:
            best[k] = (op, lsn)
    return best


def _py_changes(events_from, events_to):
    """Brute-force net change oracle: {key: (change_type, to_winner_lsn)}."""
    sa, sb = _py_state(events_from), _py_state(events_to)
    out = {}
    for k, (op_b, lsn_b) in sb.items():
        live_b = op_b != "D"
        wa = sa.get(k)
        live_a = wa is not None and wa[0] != "D"
        if live_b and not live_a:
            out[k] = ("insert", lsn_b)
        elif live_b and live_a and lsn_b != wa[1]:
            out[k] = ("update", lsn_b)
        elif not live_b and live_a:
            out[k] = ("delete", lsn_b)
    return out


def test_changes_feed_net_semantics(spark, tmp_path):
    """One row per net-changed key; intra-interval churn collapses; stale
    cross-batch updates and insert-then-delete emit nothing; delete rows
    carry the tombstone event's own seq."""
    t = _mk_mor(spark, tmp_path, "chg")
    b0 = [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "web"), ("I", "c", 3, [3], 1, "code")]
    t.merge(_changes(spark, b0), batch_id=0)
    v1 = t.current_version()
    t.merge(_changes(spark, [("U", "a", 10, [10], 1, "web"), ("D", "b", 11, None, None, None),
                             ("I", "d", 12, [12], 1, "web")]), batch_id=1)
    t.merge(_changes(spark, [("D", "d", 13, None, None, None),
                             ("U", "c", 2, [9], 1, "code")]), batch_id=2)  # stale for c
    v3 = t.current_version()
    got = {r["doc_id"]: (r["_change_type"], r["lsn"]) for r in t.changes(v1, v3).collect()}
    # c unchanged (stale update lost), d inserted+deleted inside → nothing
    assert got == {"a": ("update", 10), "b": ("delete", 11)}
    # to_version defaults to current
    got2 = {r["doc_id"]: (r["_change_type"], r["lsn"]) for r in t.changes(v1).collect()}
    assert got2 == got
    # post-image payload columns come from the to-winner
    a_row = t.changes(v1, v3).filter(F.col("doc_id") == "a").collect()[0]
    assert a_row["tokens"] == [10]
    assert t.changes(v3, v3).count() == 0
    with pytest.raises(ValueError):
        t.changes(v3, v1)


def test_changes_fast_path_is_pruned_semi_join(spark, tmp_path):
    """Delta-only intervals must take the touched-keys fast path: the plan
    carries LeftSemi probes and no full-table winner diff."""
    t = _mk_mor(spark, tmp_path, "chgplan")
    t.merge(_changes(spark, [("I", f"k{i:03d}", i, [i], 1, "web") for i in range(1, 51)]), batch_id=0)
    v1 = t.current_version()
    t.merge(_changes(spark, [("U", "k001", 100, [100], 1, "web")]), batch_id=1)
    v2 = t.current_version()
    df = t.changes(v1, v2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan
    got = {r["doc_id"]: r["_change_type"] for r in df.collect()}
    assert got == {"k001": "update"}


def test_changes_across_compaction_keeps_fast_path(spark, tmp_path):
    """Interleaved housekeeping must NOT defeat the incremental fast path:
    the per-commit chain walk attributes changed keys to the delta commits
    only, so merge → compact → merge intervals stay pruned semi-joins
    (round 3 fell back to the full O(table) diff here) — and results still
    match the brute-force oracle."""
    t = _mk_mor(spark, tmp_path, "chgcomp")
    b0 = [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "web")]
    t.merge(_changes(spark, b0), batch_id=0)
    v1 = t.current_version()
    b1 = [("U", "a", 5, [5], 1, "web"), ("D", "b", 6, None, None, None),
          ("I", "e", 7, [7], 1, "code")]
    t.merge(_changes(spark, b1), batch_id=1)
    t.compact()
    b2 = [("U", "e", 9, [9], 1, "code")]
    t.merge(_changes(spark, b2), batch_id=2)
    vN = t.current_version()
    expect = _py_changes(b0, b0 + b1 + b2)
    df = t.changes(v1, vN)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan  # fast path survived the interleaved compact
    got = {r["doc_id"]: (r["_change_type"], r["lsn"]) for r in df.collect()}
    assert got == expect
    # an interval holding ONLY housekeeping emits nothing — and cheaply
    # (no delta commits → empty local relation, no data scan at all)
    t2 = _mk_mor(spark, tmp_path, "chgcomp2")
    t2.merge(_changes(spark, b0), batch_id=0)
    va = t2.current_version()
    t2.compact()
    assert t2.changes(va, t2.current_version()).count() == 0


def test_changes_cow_interval_full_diff_correct(spark, tmp_path):
    """COW merges inside the interval cannot be attributed as pure delta
    appends → the full winner diff runs and still matches the oracle."""
    t = LakeTable.create(
        spark, str(tmp_path / "chgcow"), schema=STATE_SCHEMA,
        target_file_rows=200, merge_mode="cow",
    )
    b0 = [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "web")]
    t.merge(_changes(spark, b0), batch_id=0)
    v1 = t.current_version()
    b1 = [("U", "a", 5, [5], 1, "web"), ("D", "b", 6, None, None, None)]
    t.merge(_changes(spark, b1), batch_id=1)
    expect = _py_changes(b0, b0 + b1)
    got = {r["doc_id"]: (r["_change_type"], r["lsn"])
           for r in t.changes(v1, t.current_version()).collect()}
    assert got == expect


def test_cow_change_feed_pruned_changes_and_refs(spark, tmp_path):
    """COW table created with change_feed=True (VERDICT r4 next-round #5):
    each merge records its surviving batch winners as change manifests, so
    changes() keeps the pruned semi-join fast path on a COW interval and
    equals the brute-force diff; a batch row shadowed by newer existing
    state is NOT recorded as a change; maintenance never collects the
    referenced change files."""
    import glob as globmod

    from ztdf_spark.lake import added_delta_entries

    t = LakeTable.create(
        spark, str(tmp_path / "cowcf"), schema=STATE_SCHEMA,
        target_file_rows=200, merge_mode="cow", change_feed=True,
    )
    b0 = [("I", f"k{i:02d}", 10 + i, [i], 1, "web") for i in range(30)]
    t.merge(_changes(spark, b0), batch_id=0)
    v1 = t.current_version()
    b1 = [
        ("U", "k03", 100, [3, 3], 2, "web"),
        ("D", "k07", 101, None, None, None),
        ("I", "k99", 102, [9], 1, "web"),
        ("U", "k05", 1, [0], 1, "web"),  # STALE: older than existing lsn 15
    ]
    t.merge(_changes(spark, b1), batch_id=1)
    snap = t.snapshot()
    assert snap.get("change_manifests"), "COW merge recorded no change manifest"
    added = added_delta_entries(
        snap, read_manifest=t._read_manifest, get_parent=lambda: t.snapshot(snap["parent"])
    )
    assert added and all(e.get("delta") for e in added)
    # the stale k05 row must not appear in the recorded change files
    paths = [os.path.join(t._data_dir, e["path"]) for e in added]
    ch = spark.read.parquet(*paths)
    recorded = {r["doc_id"] for r in ch.select("doc_id").collect()}
    assert recorded == {"k03", "k07", "k99"}
    df = t.changes(v1, t.current_version())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, "COW change-feed interval fell off the pruned path"
    got = {r["doc_id"]: (r["_change_type"], r["lsn"]) for r in df.collect()}
    assert got == _py_changes(b0, b0 + b1)
    # maintenance: the change files are snapshot-referenced — not orphans
    before = set(globmod.glob(os.path.join(t._data_dir, "*.parquet")))
    t.vacuum(orphan_grace_s=0.0)
    t.expire_snapshots(keep_last=10)
    assert set(globmod.glob(os.path.join(t._data_dir, "*.parquet"))) == before
    got2 = {
        r["doc_id"]: (r["_change_type"], r["lsn"])
        for r in t.changes(v1, t.current_version()).collect()
    }
    assert got2 == got


def test_property_changes_matches_oracle_both_modes(spark, tmp_path):
    """Property: for random CDC batch sequences and a random snapshot split,
    changes(v_split, v_final) == the brute-force winner-state diff — in MOR
    (delta fast path) and COW (non-delta full path) alike."""
    from hypothesis import given, settings, strategies as st

    keys = [f"k{i}" for i in range(6)]
    event = st.tuples(st.sampled_from(["I", "U", "D"]), st.sampled_from(keys))
    seq = st.lists(st.lists(event, min_size=1, max_size=6), min_size=2, max_size=4)
    counter = [0]

    @settings(max_examples=6, deadline=None)
    @given(seq, st.data())
    def run(batches, data):
        counter[0] += 1
        import random

        n_ev = sum(len(b) for b in batches)
        lsns = list(range(1, n_ev + 1))
        random.Random(counter[0]).shuffle(lsns)
        it = iter(lsns)
        rows_per_batch = [
            [(op, k, next(it), [ord(k[-1])], 1, "w") for op, k in b] for b in batches
        ]
        split = data.draw(st.integers(min_value=1, max_value=len(rows_per_batch) - 1))
        ev_from = [r for b in rows_per_batch[:split] for r in b]
        ev_to = [r for b in rows_per_batch for r in b]
        expect = _py_changes(ev_from, ev_to)
        for mode in ("mor", "cow"):
            t = LakeTable.create(
                spark, str(tmp_path / f"chprop{counter[0]}-{mode}"), schema=STATE_SCHEMA,
                target_file_rows=200, merge_mode=mode,
            )
            versions = []
            for bid, rows in enumerate(rows_per_batch):
                t.merge(_changes(spark, rows), batch_id=bid)
                versions.append(t.current_version())
            got = {
                r["doc_id"]: (r["_change_type"], r["lsn"])
                for r in t.changes(versions[split - 1], versions[-1]).collect()
            }
            assert got == expect, f"{mode}: {got} vs {expect}"

    run()


def test_vacuum_collects_crashed_staging(spark, tmp_path):
    """A writer that crashed between staging and commit leaves files under
    _staging; vacuum removes them without touching committed state."""
    t = _mk_mor(spark, tmp_path, "vstg")
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    stage = tmp_path / "vstg" / "_staging" / "batch-99"
    stage.mkdir(parents=True)
    (stage / "orphan.parquet").write_bytes(b"junk")
    # within the grace window the in-flight file is protected
    assert not any("orphan" in r for r in t.vacuum())
    assert (stage / "orphan.parquet").exists()
    removed = t.vacuum(orphan_grace_s=0.0)
    assert any("orphan.parquet" in r for r in removed)
    assert not (tmp_path / "vstg" / "_staging" / "batch-99").exists()
    assert t.read().count() == 1


def test_read_keys_point_lookup(spark, tmp_path):
    """read_keys prunes at the metadata layer and agrees with a read()
    filter — including deleted keys (absent), unknown keys (absent), and
    time travel."""
    t = _mk_mor(spark, tmp_path, "ptlk")
    t.merge(_changes(spark, [("I", f"doc-{i:04d}", i + 1, [i], 1, "web") for i in range(200)]),
            batch_id=0)
    v1 = t.current_version()
    t.merge(_changes(spark, [("U", "doc-0005", 900, [900], 1, "web"),
                             ("D", "doc-0007", 901, None, None, None)]), batch_id=1)
    got = {r["doc_id"]: r["lsn"]
           for r in t.read_keys(["doc-0005", "doc-0007", "doc-0100", "nope"]).collect()}
    assert got == {"doc-0005": 900, "doc-0100": 101}
    # time travel: pre-update snapshot still sees the original rows
    got1 = {r["doc_id"]: r["lsn"] for r in t.read_keys(["doc-0005", "doc-0007"], version=v1).collect()}
    assert got1 == {"doc-0005": 6, "doc-0007": 8}
    # after compaction (tight per-file ranges) the same lookups hold
    t.compact()
    got2 = {r["doc_id"]: r["lsn"] for r in t.read_keys(["doc-0005", "doc-0007", "doc-0100"]).collect()}
    assert got2 == got


def test_changes_across_schema_evolution(spark, tmp_path):
    """changes() emits the TO-snapshot's evolved schema: rows updated after
    an additive evolution carry the new column; the classification join
    only needs (key, seq) from the FROM side, so pre-evolution winners
    compare fine."""
    t = _mk_mor(spark, tmp_path, "chgevo")
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "web")]),
            batch_id=0)
    v1 = t.current_version()
    t.merge(
        spark.createDataFrame(
            [("U", "a", 10, [10], 1, "web", "eu")],
            "op string, doc_id string, lsn long, tokens array<int>, n_tok int, source string, region string",
        ),
        batch_id=1,
    )
    ch = t.changes(v1)
    assert "region" in ch.columns
    got = {r["doc_id"]: (r["_change_type"], r["lsn"], r["region"]) for r in ch.collect()}
    assert got == {"a": ("update", 10, "eu")}


def test_property_read_keys_equals_filtered_read(spark, tmp_path):
    """Property: for random CDC sequences and random probe sets (hit, miss,
    and deleted keys), read_keys == read().filter(isin) — the pruned path
    never misses a row a full reconstruction would return."""
    from hypothesis import given, settings, strategies as st

    keys = [f"k{i}" for i in range(8)]
    event = st.tuples(st.sampled_from(["I", "U", "D"]), st.sampled_from(keys))
    seq = st.lists(st.lists(event, min_size=1, max_size=6), min_size=1, max_size=3)
    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(seq, st.lists(st.sampled_from(keys + ["absent1", "absent2"]), min_size=1,
                         max_size=5, unique=True))
    def run(batches, probes):
        counter[0] += 1
        import random

        n_ev = sum(len(b) for b in batches)
        lsns = list(range(1, n_ev + 1))
        random.Random(1000 + counter[0]).shuffle(lsns)
        it = iter(lsns)
        t = _mk_mor(spark, tmp_path, f"rkprop{counter[0]}")
        for bid, b in enumerate(batches):
            rows = [(op, k, next(it), [ord(k[-1])], 1, "w") for op, k in b]
            t.merge(_changes(spark, rows), batch_id=bid)
        want = sorted(
            (r["doc_id"], r["lsn"])
            for r in t.read().filter(F.col("doc_id").isin(probes)).collect()
        )
        got = sorted((r["doc_id"], r["lsn"]) for r in t.read_keys(probes).collect())
        assert got == want, f"{probes}: {got} != {want}"

    run()


def test_changes_legacy_manifests_without_added_at(spark, tmp_path):
    """Tables written by the round-3 code have manifests WITHOUT added_at:
    attribution falls back to filename inference and the incremental fast
    path still works (carry-over manifests keep their original names)."""
    import json

    t = _mk_mor(spark, tmp_path, "legacy")
    b0 = [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "web")]
    t.merge(_changes(spark, b0), batch_id=0)
    v1 = t.current_version()
    b1 = [("U", "a", 5, [5], 1, "web")]
    t.merge(_changes(spark, b1), batch_id=1)
    # strip added_at from every snapshot's manifest list (legacy format)
    for v in range(t.current_version() + 1):
        p = os.path.join(t._snap_dir, f"v{v:010d}.json")
        with open(p) as f:
            snap = json.load(f)
        for m in snap.get("manifests", []):
            m.pop("added_at", None)
        with open(p, "w") as f:
            json.dump(snap, f)
    t2 = LakeTable.load(spark, t.path)
    expect = _py_changes(b0, b0 + b1)
    df = t2.changes(v1, t2.current_version())
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan  # filename fallback still yields the fast path
    got = {r["doc_id"]: (r["_change_type"], r["lsn"]) for r in df.collect()}
    assert got == expect


def test_changes_big_keyset_materializes_to_staging(spark, tmp_path, monkeypatch):
    """Beyond the collect cap, changes() writes the distinct touched keys
    ONCE to a scratch parquet under _staging and every consumer rescans
    that file — no persisted blocks left behind, no per-consumer re-run
    of the distinct over the interval delta files (ADVICE r4 #5)."""
    import glob

    import ztdf_spark.ops as ops

    monkeypatch.setattr(ops, "broadcast_key_limit", lambda s: 5)
    t = _mk_mor(spark, tmp_path, "bigkeys")
    b0 = [("I", f"doc-{i:03d}", i + 1, [i], 1, "web") for i in range(40)]
    t.merge(_changes(spark, b0), batch_id=0)
    v1 = t.current_version()
    b1 = [("U", f"doc-{i:03d}", 100 + i, [i, i], 2, "web") for i in range(20)]
    t.merge(_changes(spark, b1), batch_id=1)
    # delta-based: earlier tests in the shared session may legitimately hold
    # persisted blocks (e.g. a lazily-consumed minhash sig cache); changes()
    # itself must not ADD any
    persisted_before = spark.sparkContext._jsc.getPersistentRDDs().size()
    df = t.changes(v1, t.current_version())
    got = {r["doc_id"]: (r["_change_type"], r["lsn"]) for r in df.collect()}
    assert got == _py_changes(b0, b0 + b1)
    assert glob.glob(os.path.join(t.path, "_staging", "changes-keys-*")), (
        "big-path key set was not materialized to _staging"
    )
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == persisted_before, (
        "changes() leaked a persisted block"
    )


def test_mor_read_is_delta_pruned_after_compaction(spark, tmp_path, monkeypatch):
    """A mostly-compacted MOR read confines the winner aggregate to the
    DELTA files only (VERDICT r4 next-round #1): base rows take one wide
    pass with a broadcast resolve-join against the delta winners — no
    shuffle, no O(table) aggregate — and the result matches both the full
    reconstruction and the latest-wins oracle."""
    t = _mk_mor(spark, tmp_path, "pruned")
    b0 = [("I", f"doc-{i:04d}", i + 1, [i], 1, "web") for i in range(300)]
    t.merge(_changes(spark, b0), batch_id=0)
    t.compact()
    # small delta touching 3 keys (one an update, one a delete, one new)
    b1 = [
        ("U", "doc-0007", 1000, [7, 7], 2, "web"),
        ("D", "doc-0100", 1001, [0], 1, "web"),
        ("I", "doc-9999", 1002, [9], 1, "web"),
    ]
    t.merge(_changes(spark, b1), batch_id=1)

    seen = {}
    orig = LakeTable._winners_df

    def spy(self, snap, files=None):
        seen["files"] = files
        return orig(self, snap, files)

    monkeypatch.setattr(LakeTable, "_winners_df", spy)
    df = t.read()
    n_total = len(t._files(t.snapshot()))
    assert seen["files"] is not None, "pruned path not taken"
    assert len(seen["files"]) < n_total, (
        f"winner aggregate saw {len(seen['files'])}/{n_total} files"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    got = {r["doc_id"]: r["lsn"] for r in df.collect()}
    expect = {
        k: lsn for k, (op, lsn) in _py_state(b0 + b1).items() if op != "D"
    }
    assert got == expect
    # and equals the unpruned reconstruction
    monkeypatch.undo()
    full = t._winners_df(t.snapshot()).filter(~F.coalesce(F.col("_tombstone"), F.lit(False)))
    assert sorted(map(tuple, df.collect())) == sorted(
        map(tuple, full.select(*df.columns).collect())
    )


def test_v2_upgrade_commit_history_not_reemitted(spark, tmp_path):
    """A round-3-era v2→v3 upgrade commit: parent snapshot is v2-format
    (inline ``files``), the upgrade commit's CARRY-OVER manifest is named
    with the NEW commit version, and nothing carries ``added_at``.
    Filename inference must REFUSE attribution there (parent is v2 → no
    manifest list to cross-check), so ``changes()`` degrades to the full
    winner diff instead of re-emitting the whole pre-upgrade history as
    that commit's changes, and the streaming source refuses rather than
    streams wrong rows (ADVICE r4 #1)."""
    import json

    from ztdf_spark.lake import added_delta_entries

    t = _mk_mor(spark, tmp_path, "upg")
    b0 = [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "web"),
          ("I", "c", 3, [3], 1, "web")]
    t.merge(_changes(spark, b0), batch_id=0)
    b1 = [("U", "a", 5, [5], 1, "web")]
    t.merge(_changes(spark, b1), batch_id=1)
    v_pre = t.current_version()
    # downgrade every snapshot to v2-format: inline file list, no manifests
    for v in range(v_pre + 1):
        p = os.path.join(t._snap_dir, f"v{v:010d}.json")
        with open(p) as f:
            snap = json.load(f)
        snap["files"] = t._files(snap)
        snap.pop("manifests", None)
        snap["format_version"] = 2
        with open(p, "w") as f:
            json.dump(snap, f)
    # the next merge IS the v2→v3 upgrade commit (carry-over manifest is
    # named with the new version); then strip added_at to simulate the
    # round-3-era writer having performed that upgrade
    t2 = LakeTable.load(spark, t.path)
    b2 = [("U", "b", 9, [9], 1, "web"), ("D", "c", 10, [10], 1, "web")]
    t2.merge(_changes(spark, b2), batch_id=2)
    v_up = t2.current_version()
    p = os.path.join(t2._snap_dir, f"v{v_up:010d}.json")
    with open(p) as f:
        snap_up = json.load(f)
    for m in snap_up["manifests"]:
        m.pop("added_at", None)
    with open(p, "w") as f:
        json.dump(snap_up, f)
    t3 = LakeTable.load(spark, t.path)
    # attribution must refuse (None), not claim the carried-over history
    added = added_delta_entries(
        snap_up,
        read_manifest=t3._read_manifest,
        get_parent=lambda: t3.snapshot(snap_up["parent"]),
    )
    assert added is None
    # changes() over the upgrade interval: full-diff fallback, CORRECT net
    # changes — exactly b2's effect, never the b0/b1 history
    got = {
        r["doc_id"]: (r["_change_type"], r["lsn"])
        for r in t3.changes(v_pre, v_up).collect()
    }
    assert got == _py_changes(b0 + b1, b0 + b1 + b2)


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_type_widening_schema_evolution(spark, tmp_path, mode):
    """int→long / float→double widening is pure metadata: a later batch
    with the wider type widens the TABLE schema; old narrow files read
    through it without rewrite, and values beyond the narrow range land
    correctly."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("score", T.FloatType()),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / f"widen-{mode}"), schema=schema,
        target_file_rows=200, merge_mode=mode,
    )
    t.merge(
        spark.createDataFrame(
            [("I", "a", 1, 5, 1.5), ("I", "b", 2, 7, 2.5)],
            "op string, doc_id string, lsn long, n_tok int, score float",
        ),
        batch_id=0,
    )
    big = 3_000_000_000  # > int32 range
    t.merge(
        spark.createDataFrame(
            [("U", "a", 10, big, 0.125), ("I", "c", 11, 42, 0.25)],
            "op string, doc_id string, lsn long, n_tok long, score double",
        ),
        batch_id=1,
    )
    got_schema = {f.name: f.dataType.typeName() for f in t.schema().fields}
    assert got_schema["n_tok"] == "long" and got_schema["score"] == "double"
    got = {r["doc_id"]: (r["n_tok"], r["score"]) for r in t.read().collect()}
    assert got == {"a": (big, 0.125), "b": (7, 2.5), "c": (42, 0.25)}
    # a NARROW batch after widening still merges (new int32 files read
    # through the wide schema)
    t.merge(
        spark.createDataFrame(
            [("U", "b", 20, 9, 3.5)],
            "op string, doc_id string, lsn long, n_tok int, score float",
        ),
        batch_id=2,
    )
    got2 = {r["doc_id"]: r["n_tok"] for r in t.read().collect()}
    assert got2 == {"a": big, "b": 9, "c": 42}
    # time travel reads the pre-widening snapshot through ITS OWN schema
    assert {f.name: f.dataType.typeName() for f in t.schema(1)}["n_tok"] == "integer"


def test_property_schema_evolution_matches_oracle(spark, tmp_path):
    """Property: random batch sequences where each batch independently may
    (a) carry an extra column and (b) widen n_tok to long — the final
    read() equals the brute-force latest-wins oracle over the union
    schema, in BOTH merge modes, with nulls exactly where the winning
    batch lacked the column."""
    from hypothesis import given, settings, strategies as st

    keys = ["a", "b", "c", "d"]
    batch = st.tuples(
        st.lists(
            st.tuples(st.sampled_from(["I", "U", "D"]), st.sampled_from(keys)),
            min_size=1, max_size=5,
        ),
        st.booleans(),  # carries the extra 'region' column
        st.booleans(),  # widens n_tok to long (values beyond int32)
    )
    counter = [0]

    @settings(max_examples=5, deadline=None)
    @given(st.lists(batch, min_size=2, max_size=4))
    def run(batches):
        counter[0] += 1
        events = []  # (op, key, lsn, n_tok, region_or_absent)
        lsn = 0
        built = []
        for ops_, extra, wide in batches:
            rows = []
            for op, k in ops_:
                lsn += 1
                n = (3_000_000_000 + lsn) if wide else lsn
                if op == "D":
                    row = (op, k, lsn, None) + ((None,) if extra else ())
                    events.append((op, k, lsn, None, None if extra else "__absent__"))
                else:
                    reg = f"r{lsn}" if extra else "__absent__"
                    row = (op, k, lsn, n) + ((reg,) if extra else ())
                    events.append((op, k, lsn, n, reg))
                rows.append(row)
            ddl = "op string, doc_id string, lsn long, n_tok " + ("long" if wide else "int")
            if extra:
                ddl += ", region string"
            built.append((rows, ddl))
        # brute-force oracle over the union schema
        expect = {}
        for op, k, ls, n, reg in events:
            cur = expect.get(k)
            if cur is None or ls > cur[0]:
                expect[k] = (ls, op, n, None if reg == "__absent__" else reg)
        expect = {
            k: (ls, n, reg) for k, (ls, op, n, reg) in expect.items() if op != "D"
        }
        any_wide = any(w for _o, _e, w in batches)
        for mode in ("mor", "cow"):
            t = LakeTable.create(
                spark, str(tmp_path / f"evoprop{counter[0]}-{mode}"),
                schema=T.StructType(
                    [
                        T.StructField("doc_id", T.StringType()),
                        T.StructField("lsn", T.LongType()),
                        T.StructField("n_tok", T.IntegerType()),
                    ]
                ),
                target_file_rows=200, merge_mode=mode,
            )
            for bid, (rows, ddl) in enumerate(built):
                t.merge(spark.createDataFrame(rows, ddl), batch_id=bid)
            fields = {f.name: f.dataType.typeName() for f in t.schema().fields}
            assert fields["n_tok"] == ("long" if any_wide else "integer")
            cols = ["doc_id", "lsn", "n_tok"] + (["region"] if "region" in fields else [])
            got = {
                r["doc_id"]: (r["lsn"], r["n_tok"], r["region"] if "region" in fields else None)
                for r in t.read().select(*cols).collect()
            }
            assert got == expect, f"{mode}: {got} vs {expect}"

    run()


# ---------------------------------------------------------------------------
# Per-delta-file key Bloom filters (create(bloom_delta_keys=True))
# ---------------------------------------------------------------------------


def _mk_bloom_mor(spark, tmp_path, name, bloom=True):
    return LakeTable.create(
        spark, str(tmp_path / name), schema=STATE_SCHEMA, target_file_rows=200,
        merge_mode="mor", bloom_delta_keys=bloom,
    )


def _interleaved_batches(n_batches=3, n=60):
    """Batch b holds keys ≡ b (mod n_batches): every delta file's [min,max]
    range spans nearly the whole key space, so range pruning keeps ALL
    files and only the bloom can skip — the worst case blooms exist for."""
    return [
        [("I", f"doc-{i:04d}", i + 1, [i], 1, "web") for i in range(b, n, n_batches)]
        for b in range(n_batches)
    ]


def test_bloom_unit_no_false_negatives_and_low_fpr():
    from ztdf_spark import bloom as B

    keys = [f"doc-{i:05d}" for i in range(1000)]
    bl = B.build_bloom(keys, len(keys))
    assert all(B.might_contain(bl, B._key_hash_pair(k)) for k in keys)  # no FNs ever
    absent = [f"miss-{i:05d}" for i in range(2000)]
    fpr = sum(B.might_contain(bl, B._key_hash_pair(k)) for k in absent) / len(absent)
    assert fpr < 0.05, fpr  # ~1% expected at 10 bits/key, k=7


def test_bloom_skips_delta_files_ranges_cannot(spark, tmp_path):
    """Interleaved batches → per-file ranges all overlap; the bloom table
    must read strictly fewer files for a key than the no-bloom table, and
    both must return identical rows."""
    tb = _mk_bloom_mor(spark, tmp_path, "blm", bloom=True)
    tn = _mk_bloom_mor(spark, tmp_path, "nob", bloom=False)
    for i, batch in enumerate(_interleaved_batches()):
        tb.merge(_changes(spark, batch), batch_id=i)
        tn.merge(_changes(spark, batch), batch_id=i)
    # delta entries carry blooms only on the opted-in table
    eb = [e for e in tb._files(tb.snapshot()) if e.get("delta")]
    en = [e for e in tn._files(tn.snapshot()) if e.get("delta")]
    assert eb and all(
        set(e["bloom"]) == {"m", "k", "bits"} and e["bloom"]["m"] >= 1024 for e in eb
    )
    assert all("bloom" not in e for e in en)
    # doc-0004 lives only in batch 1 (4 % 3 == 1); ranges overlap everywhere
    lookup = ["doc-0004"]
    rows_b = tb.read_keys(lookup)
    rows_n = tn.read_keys(lookup)
    assert rows_b.collect() == rows_n.collect()
    assert len(rows_b.inputFiles()) < len(rows_n.inputFiles()), (
        rows_b.inputFiles(), rows_n.inputFiles(),
    )
    # an all-miss lookup reads NO files at all on the bloom table
    assert tb.read_keys(["nope-1", "nope-2"]).inputFiles() == []
    assert tb.read_keys(["nope-1", "nope-2"]).count() == 0


def test_bloom_lookup_semantics_match_and_survive_load_compact(spark, tmp_path):
    """Full read_keys semantics (hits, updates, deletes, misses, time
    travel) are identical with blooms on; the property survives load();
    compact() drops the blooms with the delta files and stays correct."""
    t = _mk_bloom_mor(spark, tmp_path, "blsem")
    t.merge(_changes(spark, [("I", f"doc-{i:04d}", i + 1, [i], 1, "web") for i in range(0, 90, 3)]
                     + [("I", f"doc-{i:04d}", i + 1, [i], 1, "web") for i in range(1, 90, 3)]),
            batch_id=0)
    t.merge(_changes(spark, [("U", "doc-0003", 900, [900], 1, "web"),
                             ("D", "doc-0006", 901, None, None, None)]), batch_id=1)
    t2 = LakeTable.load(spark, t.path)  # snapshot round-trip keeps the property
    assert t2.snapshot().get("bloom_delta_keys") is True
    got = {r["doc_id"]: r["lsn"]
           for r in t2.read_keys(["doc-0003", "doc-0006", "doc-0009", "nope"]).collect()}
    assert got == {"doc-0003": 900, "doc-0009": 10}
    t2.compact()
    assert all("bloom" not in e for e in t2._files(t2.snapshot()))  # clustered base: no blooms
    got2 = {r["doc_id"]: r["lsn"]
            for r in t2.read_keys(["doc-0003", "doc-0006", "doc-0009", "nope"]).collect()}
    assert got2 == got
    # post-compact appends get blooms again
    t2.merge(_changes(spark, [("U", "doc-0009", 950, [950], 1, "web")]), batch_id=2)
    assert any(e.get("delta") and "bloom" in e for e in t2._files(t2.snapshot()))
    assert {r["doc_id"]: r["lsn"] for r in t2.read_keys(["doc-0009"]).collect()} == {"doc-0009": 950}


def test_bloom_on_commit_staged_path(spark, tmp_path):
    """The fused-pipeline fast path (commit_staged) also attaches blooms
    when the table opted in."""
    t = LakeTable.create(
        spark, str(tmp_path / "blstg"), schema=STATE_SCHEMA, target_file_rows=200,
        merge_mode="mor", bloom_delta_keys=True,
    )
    staged = str(tmp_path / "stg0")
    spark.createDataFrame(
        [(f"doc-{i:04d}", i + 1, [i], 1, "web", False) for i in range(40)],
        "doc_id string, lsn long, tokens array<int>, n_tok int, source string, _tombstone boolean",
    ).coalesce(2).write.parquet(staged)
    r = t.commit_staged(staged, batch_id=0)
    assert not r.get("noop")
    entries = [e for e in t._files(t.snapshot()) if e.get("delta")]
    assert entries and all("bloom" in e for e in entries)
    assert {r["doc_id"] for r in t.read_keys(["doc-0001", "doc-0039", "no"]).collect()} == {
        "doc-0001", "doc-0039",
    }


# ---------------------------------------------------------------------------
# rollback
# ---------------------------------------------------------------------------


def _rows(t, version=None):
    return sorted(
        (r["doc_id"], r["lsn"]) for r in t.read(version).select("doc_id", "lsn").collect()
    )


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_rollback_restores_old_state_as_new_commit(spark, tmp_path, mode):
    t = LakeTable.create(
        spark, str(tmp_path / f"rb-{mode}"), schema=STATE_SCHEMA,
        target_file_rows=200, merge_mode=mode,
    )
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "web")]), batch_id=0)
    v1 = t.current_version()
    state_v1 = _rows(t)
    t.merge(_changes(spark, [("U", "a", 10, [10], 1, "web"), ("D", "b", 11, None, None, None),
                             ("I", "c", 12, [3], 1, "code")]), batch_id=1)
    v2 = t.current_version()
    r = t.rollback(v1)
    assert r["noop"] is False and r["to_version"] == v1 and r["version"] == v2 + 1
    # state equals v1 exactly; the undone commit remains time-travelable
    assert _rows(t) == state_v1
    assert _rows(t, v2) != state_v1
    assert t.history()[-1]["summary"]["operation"] == "rollback"
    # rollback of the current state is a no-op commit
    assert t.rollback(t.current_version())["noop"] is True
    # the batch watermark survives: re-delivering fenced batch 1 is a no-op
    fenced = t.merge(_changes(spark, [("I", "z", 99, [9], 1, "web")]), batch_id=1)
    assert fenced.get("noop") is True and _rows(t) == state_v1
    # a NEW batch on top of the rolled-back state works normally
    t.merge(_changes(spark, [("I", "d", 20, [4], 1, "web")]), batch_id=2)
    assert ("d", 20) in _rows(t)
    # changes() across the rollback interval = correct net diff via the
    # full-winner-diff fallback (rollback is deliberately unattributable)
    ch = {
        (r["doc_id"], r["_change_type"])
        for r in t.changes(v2, v2 + 1).select("doc_id", "_change_type").collect()
    }
    assert ch == {("a", "update"), ("b", "insert"), ("c", "delete")}


def test_rollback_expire_keeps_target_files_live(spark, tmp_path):
    t = _mk_mor(spark, tmp_path, "rb-exp")
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    v1 = t.current_version()
    want = _rows(t)
    t.merge(_changes(spark, [("U", "a", 5, [5], 1, "web")]), batch_id=1)
    t.rollback(v1)
    # retire everything but the rollback commit, then sweep: the carried
    # manifests/files are referenced by the surviving snapshot and survive
    t.expire_snapshots(keep_last=1)
    t.vacuum(orphan_grace_s=0.0)
    assert _rows(LakeTable.load(spark, t.path)) == want
    with pytest.raises(FileNotFoundError):
        t.rollback(v1)  # target expired → explicit error, not silent wrong state


# ---------------------------------------------------------------------------
# branches / tags / write-audit-publish
# ---------------------------------------------------------------------------


def test_branch_write_audit_publish(spark, tmp_path):
    t = _mk_mor(spark, tmp_path, "wap")
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    main_v = t.current_version()
    main_state = _rows(t)
    t.create_branch("audit")
    # stage two batches on the branch: main is untouched
    t.merge(_changes(spark, [("I", "b", 2, [2], 1, "web")]), batch_id=1, branch="audit")
    t.merge(_changes(spark, [("U", "a", 3, [3], 1, "web")]), batch_id=2, branch="audit")
    assert t.current_version() == main_v and _rows(t) == main_state
    head = t.ref_version("audit")
    assert sorted(r[0] for r in _rows(t)) == ["a"]
    branch_rows = sorted(
        (r["doc_id"], r["lsn"]) for r in t.read(ref="audit").select("doc_id", "lsn").collect()
    )
    assert branch_rows == [("a", 3), ("b", 2)]
    # publish fast-forwards main onto the branch; exactly-once watermark
    # rides along (branch batch 2 is fenced on main afterwards)
    r = t.publish("audit")
    assert r["published"] == head and r["previous"] == main_v
    # publish lands as a MARKER snapshot (exclusive version claim — the
    # race-safe alternative to rewriting CURRENT in place): state equals
    # the branch head exactly, parent chain routes through the branch
    assert t.current_version() == r["version"] > head
    assert t.history()[-1]["summary"]["operation"] == "publish"
    assert _rows(t) == branch_rows
    # the interval across the publish attributes per BRANCH commit (marker
    # adds nothing): pruned changes equal the two staged batches' net
    ch = {(x["doc_id"], x["_change_type"]) for x in t.changes(main_v).collect()}
    assert ch == {("b", "insert"), ("a", "update")}
    assert t.merge(_changes(spark, [("I", "z", 9, [9], 1, "web")]), batch_id=2).get("noop")
    # a main commit AFTER the fork makes publish a non-fast-forward
    t.create_branch("audit2")
    t.merge(_changes(spark, [("I", "c", 4, [4], 1, "web")]), batch_id=3, branch="audit2")
    t.merge(_changes(spark, [("I", "d", 5, [5], 1, "web")]), batch_id=4)  # main moves
    with pytest.raises(CommitConflict):
        t.publish("audit2")
    # tags are immutable: no merge onto them, duplicate names refused
    t.create_tag("v-golden")
    with pytest.raises(ValueError):
        t.merge(_changes(spark, [("I", "e", 6, [6], 1, "web")]), batch_id=5, branch="v-golden")
    with pytest.raises(CommitConflict):
        t.create_tag("v-golden")


def test_branch_commits_invisible_to_main_changes_and_stream(spark, tmp_path):
    """The regression the parent-chain walk prevents: a branch commit whose
    version lands NUMERICALLY between two main commits must not leak into
    main-interval changes() or the streaming source."""
    t = _mk_mor(spark, tmp_path, "wap2")
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    v1 = t.current_version()
    t.create_branch("side")
    t.merge(_changes(spark, [("I", "POISON", 7, [7], 1, "web")]), batch_id=1, branch="side")
    t.merge(_changes(spark, [("I", "b", 2, [2], 1, "web")]), batch_id=1)  # main
    v_main = t.current_version()
    assert v_main > t.ref_version("side")  # branch version sits inside the range
    got = {r["doc_id"] for r in t.changes(v1, v_main).collect()}
    assert got == {"b"}
    # streaming source over the same interval: one commit, no POISON rows
    from ztdf_spark.source import ZtdfLakeDataSource

    spark.dataSource.register(ZtdfLakeDataSource)
    q = (
        spark.readStream.format("ztdf_lake")
        .option("path", t.path)
        .option("startVersion", v1)
        .load()
        .writeStream.format("memory")
        .queryName("wap_stream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    seen = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM wap_stream").collect()}
    assert seen == {"b"}


def test_branch_retention_and_ref_gc(spark, tmp_path):
    t = _mk_mor(spark, tmp_path, "wap3")
    for i in range(4):
        t.merge(_changes(spark, [("I", f"k{i}", i + 1, [i], 1, "web")]), batch_id=i)
    t.create_tag("pin", version=1)
    t.create_branch("wip")
    t.merge(_changes(spark, [("I", "w", 99, [9], 1, "web")]), batch_id=0, app_id="wip", branch="wip")
    wip_head = t.ref_version("wip")
    r = t.expire_snapshots(keep_last=2)
    # tag + branch head survive retention; old untagged main snapshots go
    assert 1 not in r["expired_snapshots"] and wip_head not in r["expired_snapshots"]
    assert t.read(version=1).count() == 1  # tag target readable
    assert t.read(ref="wip").count() == 5  # branch head readable
    t.delete_ref("pin")
    r2 = t.expire_snapshots(keep_last=2)
    assert 1 in r2["expired_snapshots"]  # un-pinned → expired
    with pytest.raises(KeyError):
        t.ref_version("pin")


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_delete_where_predicate_tombstones(spark, tmp_path, mode):
    t = LakeTable.create(
        spark, str(tmp_path / f"dw-{mode}"), schema=STATE_SCHEMA,
        target_file_rows=200, merge_mode=mode,
    )
    t.merge(_changes(spark, [
        ("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 1, "code"),
        ("I", "c", 3, [3], 1, "web"), ("I", "d", 4, [4], 1, "forum"),
    ]), batch_id=0)
    r = t.delete_where("source = 'web'", batch_id=1)
    assert not r.get("noop")
    assert sorted(x[0] for x in _rows(t)) == ["b", "d"]
    # a LATER CDC event resurrects a deleted key (tombstone is not forever)
    t.merge(_changes(spark, [("U", "a", 10, [10], 1, "web2")]), batch_id=2)
    assert ("a", 10) in _rows(t)
    # predicate over the CURRENT winner, not history: doc a's winner is now
    # web2, so a second source='web' delete matches nothing
    before = t.current_version()
    t.delete_where("source = 'web'", batch_id=3)
    assert _rows(t) == _rows(t, before) and sorted(x[0] for x in _rows(t)) == ["a", "b", "d"]
    # change feed classifies the predicate delete as ordinary deletes
    ch = {(r["doc_id"], r["_change_type"]) for r in t.changes(1, 2).collect()}
    assert ch == {("a", "delete"), ("c", "delete")}


# ------------------------------------------------- rename/drop/add (alter ops)


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_rename_drop_readd_columns(spark, tmp_path, mode):
    """Metadata-only schema changes (Iceberg field-id semantics via stable
    physical names): rename/drop touch no data file, time travel keeps the
    old names, and a re-added name can never resurrect dropped values."""
    t = LakeTable.create(
        spark, str(tmp_path / f"alter-{mode}"), schema=STATE_SCHEMA,
        target_file_rows=200, merge_mode=mode,
    )
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 2, "code")]), batch_id=0)
    v1 = t.current_version()

    t.rename_column("n_tok", "tok_count")
    # metadata-only: identical manifest list, no file touched
    assert t.snapshot()["manifests"] == t.snapshot(v1)["manifests"]
    assert [f.name for f in t.schema().fields] == ["doc_id", "lsn", "tokens", "tok_count", "source"]
    got = {r["doc_id"]: r.asDict() for r in t.read().collect()}
    assert got["a"]["tok_count"] == 1 and "n_tok" not in got["a"]
    # time travel to the pre-rename snapshot sees the OLD name
    assert "n_tok" in t.read(version=v1).columns and "tok_count" not in t.read(version=v1).columns

    # merges speak the NEW logical name; the physical file column is stable
    t.merge(
        spark.createDataFrame(
            [("U", "a", 10, [10], 5, "web")],
            "op string, doc_id string, lsn long, tokens array<int>, tok_count int, source string",
        ),
        batch_id=1,
    )
    assert {r["doc_id"]: r["tok_count"] for r in t.read().collect()} == {"a": 5, "b": 2}
    assert t.read_keys(["a"]).columns == ["doc_id", "lsn", "tokens", "tok_count", "source"]
    ch = t.changes(v1)
    assert "tok_count" in ch.columns and "n_tok" not in ch.columns
    assert {(r["doc_id"], r["_change_type"], r["tok_count"]) for r in ch.collect()} == {("a", "update", 5)}

    # drop: no logical column reads the bytes any more
    t.drop_column("source")
    assert "source" not in t.read().columns
    # re-add via a merge batch carrying the same name → FRESH physical column
    t.merge(
        spark.createDataFrame(
            [("I", "c", 20, [20], 7, "fresh")],
            "op string, doc_id string, lsn long, tokens array<int>, tok_count int, source string",
        ),
        batch_id=2,
    )
    got = {r["doc_id"]: r.asDict() for r in t.read().collect()}
    assert got["c"]["source"] == "fresh"
    # dropped values never resurface through the re-added column
    assert got["a"]["source"] is None and got["b"]["source"] is None
    phys = {c["logical"]: c["physical"] for c in t.snapshot()["columns"]}
    assert phys["source"] != "source" and phys["tok_count"] == "n_tok"

    # an OLD producer still sending the pre-rename name creates a NEW
    # column (Iceberg semantics: names rebind, ids don't)
    t.merge(
        spark.createDataFrame(
            [("U", "b", 30, [30], 9)],
            "op string, doc_id string, lsn long, tokens array<int>, n_tok int",
        ),
        batch_id=3,
    )
    got = {r["doc_id"]: r.asDict() for r in t.read().collect()}
    assert got["b"]["n_tok"] == 9 and got["b"]["tok_count"] is None
    assert got["a"]["n_tok"] is None  # pre-existing rows: new column is null
    assert {c["logical"] for c in t.snapshot()["columns"]} >= {"tok_count", "n_tok", "source"}
    assert len({c["physical"] for c in t.snapshot()["columns"]}) == len(t.snapshot()["columns"])

    # validation: collisions / reserved columns refuse
    with pytest.raises(ValueError):
        t.rename_column("tok_count", "lsn")
    with pytest.raises(ValueError):
        t.rename_column("ghost", "x")
    with pytest.raises(ValueError):
        t.drop_column("doc_id")
    with pytest.raises(ValueError):
        t.add_column("lsn", "long")


def test_alter_interacts_with_maintenance_and_time_travel(spark, tmp_path):
    """compact/rollback/delete_where/add_column compose with the mapping."""
    t = LakeTable.create(
        spark, str(tmp_path / "alter-maint"), schema=STATE_SCHEMA,
        target_file_rows=200, merge_mode="mor",
    )
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web"), ("I", "b", 2, [2], 2, "code")]), batch_id=0)
    v1 = t.current_version()
    t.rename_column("source", "origin")
    t.add_column("lang", "string")
    assert {r["doc_id"]: r["lang"] for r in t.read().collect()} == {"a": None, "b": None}

    # delete_where predicate speaks the CURRENT logical names
    t.delete_where("origin = 'web'", batch_id=1)
    assert [r["doc_id"] for r in t.read().collect()] == ["b"]

    # compaction rewrites data files but keeps the mapping (and the state)
    r = t.compact()
    assert not r.get("noop")
    assert t.read().columns == ["doc_id", "lsn", "tokens", "n_tok", "origin", "lang"]
    assert [r["doc_id"] for r in t.read().collect()] == ["b"]

    # rollback to the pre-alter snapshot restores the OLD logical schema
    t.rollback(v1)
    assert "source" in t.read().columns and "origin" not in t.read().columns
    assert sorted(r["doc_id"] for r in t.read().collect()) == ["a", "b"]


# ----------------------------------------------------- minor (delta) compaction


def test_minor_compaction_folds_small_deltas(spark, tmp_path):
    """compact_deltas folds small delta files into fewer clustered delta
    files at O(delta) cost: state identical, delta ratio unchanged,
    housekeeping for the change feed, point lookups intact."""
    t = LakeTable.create(
        spark, str(tmp_path / "minor"), schema=STATE_SCHEMA,
        target_file_rows=200, merge_mode="mor", bloom_delta_keys=True,
    )
    rows = []
    for b in range(4):
        batch = [("I", f"d{b}-{i}", b * 100 + i, [i], i, "web") for i in range(10)]
        batch.append(("U", "shared", 1000 + b, [b], b, "web"))  # cross-batch churn
        t.merge(_changes(spark, batch), batch_id=b)
        rows += batch
    v_before = t.current_version()
    before = sorted(tuple(r) for r in t.read().collect())
    n_delta_before = sum(1 for f in t._files(t.snapshot()) if f.get("delta"))
    assert n_delta_before >= 4

    r = t.compact_deltas()
    assert not r.get("noop") and r["mode"] == "minor"
    assert r["files_removed"] == n_delta_before and r["files_added"] < n_delta_before
    files_after = t._files(t.snapshot())
    assert all(f.get("delta") for f in files_after)  # still ALL delta (minor!)
    assert sorted(tuple(x) for x in t.read().collect()) == before
    # the fold itself is a no-change commit for the feed
    assert t.changes(v_before).count() == 0
    # an interval SPANNING the fold still attributes per original commit
    ch = {r["doc_id"] for r in t.changes(3).collect()}
    assert ch == {f"d3-{i}" for i in range(10)} | {"shared"}
    # point lookup (bloom re-attached on folded files) still exact
    got = {r["doc_id"]: r["lsn"] for r in t.read_keys(["shared", "d2-3"]).collect()}
    assert got == {"shared": 1003, "d2-3": 203}

    # composes with a FULL compact + later deltas (pruned-read path)
    t.compact()
    t.merge(_changes(spark, [("U", "shared", 2000, [9], 9, "web")]), batch_id=10)
    t.merge(_changes(spark, [("U", "d0-1", 2001, [8], 8, "web")]), batch_id=11)
    r2 = t.compact_deltas()
    assert not r2.get("noop") and r2["files_removed"] == 2
    got = {r["doc_id"]: r["lsn"] for r in t.read().collect()}
    assert got["shared"] == 2000 and got["d0-1"] == 2001 and len(got) == 41


def test_minor_compaction_preserves_cseq_tie_break(spark, tmp_path):
    """The directed regression for the stored-_cseq design: fold ONLY the
    older of two commits holding the SAME (key, seq); the unfolded newer
    commit must still win. (Filename-derived commit sequence would stamp
    the folded row with the compaction version and flip the tie.)"""
    t = LakeTable.create(
        spark, str(tmp_path / "minor-tie"), schema=STATE_SCHEMA,
        target_file_rows=500, merge_mode="mor",
    )
    t.merge(_changes(spark, [("I", "a", 5, [1], 1, "old")]), batch_id=0)  # v1, 1 row
    big = [("U", "a", 5, [2], 2, "new")] + [
        ("I", f"f{i}", i, [i], i, "web") for i in range(150)
    ]
    t.merge(_changes(spark, big), batch_id=1)  # v2, 151 rows — same (a, 5)

    # sanity: newer commit wins the equal-seq tie before folding
    assert t.read_keys(["a"]).collect()[0]["source"] == "new"

    r = t.compact_deltas(max_rows=100, min_files=1)  # folds ONLY v1's file
    assert not r.get("noop") and r["files_removed"] == 1
    got = t.read_keys(["a"]).collect()[0]
    assert got["source"] == "new" and got["tokens"] == [2]
    full = {x["doc_id"]: x["source"] for x in t.read().collect()}
    assert full["a"] == "new" and len(full) == 151

    # and the mirrored case: fold the NEWER commit, it must still win
    t2 = LakeTable.create(
        spark, str(tmp_path / "minor-tie2"), schema=STATE_SCHEMA,
        target_file_rows=500, merge_mode="mor",
    )
    big = [("I", "a", 5, [1], 1, "old")] + [
        ("I", f"f{i}", i, [i], i, "web") for i in range(150)
    ]
    t2.merge(_changes(spark, big), batch_id=0)  # v1, large
    t2.merge(_changes(spark, [("U", "a", 5, [2], 2, "new")]), batch_id=1)  # v2, small
    r = t2.compact_deltas(max_rows=100, min_files=1)  # folds ONLY v2's file
    assert not r.get("noop") and r["files_removed"] == 1
    assert t2.read_keys(["a"]).collect()[0]["source"] == "new"


# ------------------------------------------------------------ key-range scan


@pytest.mark.parametrize("mode", ["mor", "cow"])
def test_read_range_matches_filtered_read(spark, tmp_path, mode):
    t = LakeTable.create(
        spark, str(tmp_path / f"range-{mode}"), schema=STATE_SCHEMA,
        target_file_rows=50, merge_mode=mode,
    )
    t.merge(_changes(spark, [
        ("I", f"k{i:03d}", i, [i], i, "web") for i in range(200)
    ]), batch_id=0)
    t.merge(_changes(spark, [
        ("U", "k050", 1000, [50], 99, "web"),
        ("D", "k060", 1001, None, None, None),
        ("I", "k300", 1002, [3], 3, "web"),
    ]), batch_id=1)
    lo, hi = "k040", "k070"
    exp = sorted(
        tuple(r) for r in t.read().filter(f"doc_id >= '{lo}' and doc_id <= '{hi}'").collect()
    )
    got = sorted(tuple(r) for r in t.read_range(lo, hi).collect())
    assert got == exp and len(got) == 30  # 31 keys in band, k060 deleted
    # boundaries inclusive
    ids = {r[0] for r in got}
    assert "k040" in ids and "k070" in ids and "k060" not in ids
    with pytest.raises(ValueError):
        t.read_range("z", "a")


def test_read_range_prunes_files_on_clustered_table(spark, tmp_path):
    """After compaction (key-clustered files, tight footer ranges) a narrow
    range scans a strict subset of the table's files."""
    t = LakeTable.create(
        spark, str(tmp_path / "rangeprune"), schema=STATE_SCHEMA,
        target_file_rows=100, merge_mode="mor",
    )
    t.merge(_changes(spark, [
        ("I", f"k{i:04d}", i, [i], i, "web") for i in range(1000)
    ]), batch_id=0)
    t.compact()
    n_files = len(t._files(t.snapshot()))
    assert n_files >= 4
    df = t.read_range("k0100", "k0150")
    assert len(df.inputFiles()) < n_files
    assert df.count() == 51


def test_property_minor_compaction_interleaved_equivalence(spark, tmp_path):
    """Property test for compact_deltas: random CDC batch sequences with
    random MINOR compactions (random max_rows fold thresholds) interleaved
    between merges still equal the pure-python latest-wins oracle — the
    stored-_cseq tie-break must hold for EVERY fold subset hypothesis
    picks, including repeated (key, lsn) collisions across commits."""
    from hypothesis import given, settings, strategies as st

    keys = [f"k{i}" for i in range(5)]
    event = st.tuples(st.sampled_from(["I", "U", "D"]), st.sampled_from(keys))
    # per-batch events + a fold decision after each batch:
    # None = no fold; int = compact_deltas(max_rows=that, min_files=1)
    batch = st.tuples(
        st.lists(event, min_size=0, max_size=6),
        st.one_of(st.none(), st.integers(min_value=1, max_value=8)),
    )
    seq = st.lists(batch, min_size=1, max_size=4)
    counter = [0]

    @settings(max_examples=6, deadline=None)
    @given(seq, st.data())
    def run(batches, data):
        counter[0] += 1
        import random

        n_ev = sum(len(b) for b, _ in batches)
        # duplicate (key, lsn) across batches allowed: draw lsns WITH a
        # small range so equal-seq cross-commit ties actually happen
        rng = random.Random(counter[0])
        t = LakeTable.create(
            spark, str(tmp_path / f"mprop{counter[0]}"), schema=STATE_SCHEMA,
            target_file_rows=200, merge_mode="mor",
        )
        applied = []  # (commit_order, op, key, lsn)
        order = 0
        for bid, (evs, fold) in enumerate(batches):
            rows = []
            seen = set()
            for op, k in evs:
                lsn = rng.randint(1, max(4, n_ev))
                if (k, lsn) in seen:  # merge dedups intra-batch (key,seq)
                    continue
                seen.add((k, lsn))
                rows.append((op, k, lsn, [1], 1, "w"))
            if rows:
                t.merge(_changes(spark, rows), batch_id=bid)
                order += 1
                applied += [(order, op, k, lsn) for op, k, lsn, *_ in rows]
            if fold is not None:
                t.compact_deltas(max_rows=fold, min_files=1)
        # python oracle: winner per key = max (lsn, commit_order)
        best: dict = {}
        for c, op, k, lsn in applied:
            if k not in best or (lsn, c) > (best[k][1], best[k][2]):
                best[k] = (op, lsn, c)
        expect = sorted((k, v[1]) for k, v in best.items() if v[0] != "D")
        got = sorted((r["doc_id"], r["lsn"]) for r in t.read().collect())
        assert got == expect, f"after folds: {got} vs {expect}"

    run()


def test_publish_expired_intermediate_raises_commit_conflict(spark, tmp_path):
    """ADVICE r5 #2: expire_snapshots keeps only ref HEADS; publishing a
    branch whose intermediate snapshots expired must surface the documented
    CommitConflict (ancestry unprovable), not a bare FileNotFoundError."""
    t = _mk_mor(spark, tmp_path, "pubexp")
    t.merge(_changes(spark, [("I", "a", 1, [1], 1, "web")]), batch_id=0)
    main_v = t.current_version()
    t.create_branch("stage")
    t.merge(_changes(spark, [("I", "b", 2, [2], 1, "web")]), batch_id=1, branch="stage")
    mid = t.ref_version("stage")
    t.merge(_changes(spark, [("I", "c", 3, [3], 1, "web")]), batch_id=2, branch="stage")
    # retention keeps main's head + the branch HEAD; the branch's
    # intermediate commit expires normally
    t.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        t.snapshot(mid)  # precondition: the intermediate really expired
    with pytest.raises(CommitConflict, match="expired"):
        t.publish("stage")
    # main untouched by the refused publish
    assert t.current_version() == main_v


def test_changes_scratch_swept_by_next_call(spark, tmp_path, monkeypatch):
    """ADVICE r5 #3: beyond-cap changes() scratch key-set files no longer
    accumulate until a vacuum — the next beyond-cap changes() call reclaims
    dirs older than the scratch grace window and leaves fresh ones alone."""
    import glob
    import time as _time

    import ztdf_spark.ops as ops

    monkeypatch.setattr(ops, "broadcast_key_limit", lambda s: 5)
    t = _mk_mor(spark, tmp_path, "sweep")
    b0 = [("I", f"doc-{i:03d}", i + 1, [i], 1, "web") for i in range(40)]
    t.merge(_changes(spark, b0), batch_id=0)
    v1 = t.current_version()
    b1 = [("U", f"doc-{i:03d}", 100 + i, [i, i], 2, "web") for i in range(20)]
    t.merge(_changes(spark, b1), batch_id=1)

    t.changes(v1, t.current_version()).collect()
    old = glob.glob(os.path.join(t.path, "_staging", "changes-keys-*"))
    assert len(old) == 1
    # age the first scratch dir past the grace window, then run another
    # beyond-cap changes(): the stale dir is reclaimed, the new one stays
    past = _time.time() - 2 * 3600
    os.utime(old[0], (past, past))
    df = t.changes(v1, t.current_version())
    got = {r["doc_id"]: (r["_change_type"], r["lsn"]) for r in df.collect()}
    assert got == _py_changes(b0, b0 + b1)  # result unaffected by the sweep
    now = glob.glob(os.path.join(t.path, "_staging", "changes-keys-*"))
    assert old[0] not in now and len(now) == 1


# ---------------------------------------------------------------------------
# Z-order clustering + secondary-column pruned scans
# ---------------------------------------------------------------------------


def _mk_zorder_table(spark, tmp_path, n=4000, name="tz"):
    import random

    t = LakeTable.create(
        spark, str(tmp_path / name), schema=STATE_SCHEMA,
        target_file_rows=250, merge_mode="mor",
    )
    rng = random.Random(11)
    rows = [
        ("U", f"doc-{i:05d}", rng.randrange(1_000_000), [1], rng.randrange(10_000), "web")
        for i in range(n)
    ]
    t.merge(_changes(spark, rows), batch_id=0)
    return t, rows


def test_zorder_compact_prunes_secondary_columns(spark, tmp_path):
    """compact(zorder_by=...) records per-file ranges for BOTH named
    columns and a band scan on either one reads a strict file subset with
    results identical to read()+filter."""
    t, _rows = _mk_zorder_table(spark, tmp_path)
    r = t.compact(zorder_by=["lsn", "n_tok"])
    assert not r.get("noop") and r["zorder_by"] == ["lsn", "n_tok"]
    for col, lo, hi in (("n_tok", 1000, 2000), ("lsn", 0, 150_000)):
        st = t.scan_stats(col, lo, hi)
        assert st["pruned"] and st["files_read"] < st["files_total"]
        got = sorted(
            (x["doc_id"], x["lsn"], x["n_tok"]) for x in t.read_where(col, lo, hi).collect()
        )
        want = sorted(
            (x["doc_id"], x["lsn"], x["n_tok"])
            for x in t.read().filter((F.col(col) >= lo) & (F.col(col) <= hi)).collect()
        )
        assert got == want and len(got) > 0


def test_zorder_dirty_table_falls_back_soundly(spark, tmp_path):
    """Any delta file disables secondary pruning (a pruned base file could
    hide a key's winner from the latest-wins join) — but read_where stays
    CORRECT: a delta update moving a row INTO the band and one moving a
    row OUT of it are both honored."""
    t, rows = _mk_zorder_table(spark, tmp_path, n=1000)
    t.compact(zorder_by=["lsn", "n_tok"])
    in_band = next(r for r in rows if 1000 <= r[4] <= 2000)
    out_band = next(r for r in rows if r[4] > 5000)
    t.merge(
        _changes(spark, [
            ("U", in_band[1], 2_000_000, [1], 9_999, "web"),   # leaves the band
            ("U", out_band[1], 2_000_001, [1], 1_500, "web"),  # enters the band
        ]),
        batch_id=1,
    )
    st = t.scan_stats("n_tok", 1000, 2000)
    assert not st["pruned"] and st["files_read"] == st["files_total"]
    got = {x["doc_id"]: x["n_tok"] for x in t.read_where("n_tok", 1000, 2000).collect()}
    assert in_band[1] not in got and got[out_band[1]] == 1500
    want = {
        x["doc_id"]: x["n_tok"]
        for x in t.read().filter((F.col("n_tok") >= 1000) & (F.col("n_tok") <= 2000)).collect()
    }
    assert got == want
    # re-compacting with zorder restores pruning and the same results
    t.compact(zorder_by=["lsn", "n_tok"])
    st2 = t.scan_stats("n_tok", 1000, 2000)
    assert st2["pruned"] and st2["files_read"] < st2["files_total"]
    assert {x["doc_id"]: x["n_tok"] for x in t.read_where("n_tok", 1000, 2000).collect()} == want


def test_zorder_shadows_tombstones_and_stale_updates(spark, tmp_path):
    """The z-order rewrite is still a WINNER rewrite: tombstone winners
    shadow out-of-order stale updates exactly as a plain compact does."""
    t = _mk_mor(spark, tmp_path, name="tzd")
    t.merge(_changes(spark, [
        ("I", "a", 1, [1], 100, "web"), ("I", "b", 2, [2], 200, "web"),
    ]), batch_id=0)
    t.merge(_changes(spark, [("D", "b", 10, None, None, None)]), batch_id=1)
    t.compact(zorder_by=["n_tok"])
    # stale update below the tombstone's lsn must NOT resurrect b
    t.merge(_changes(spark, [("U", "b", 5, [5], 500, "web")]), batch_id=2)
    assert {r["doc_id"] for r in t.read().collect()} == {"a"}
    assert {r["doc_id"] for r in t.read_where("n_tok", 0, 10_000).collect()} == {"a"}


def test_zorder_noop_rules_and_missing_stats(spark, tmp_path):
    """Plain compact on a delta-free table stays a no-op; zorder compact of
    the same table is a real rewrite; scanning a column with no recorded
    stats reads everything (never pruned != never wrong)."""
    t, _ = _mk_zorder_table(spark, tmp_path, n=600, name="tzn")
    t.compact()
    assert t.compact().get("noop")
    r = t.compact(zorder_by=["n_tok"])
    assert not r.get("noop")
    st = t.scan_stats("lsn", 0, 1000)  # lsn stats were not recorded
    assert st["pruned"] and st["files_read"] == st["files_total"]
    got = t.read_where("lsn", 0, 1000).count()
    want = t.read().filter(F.col("lsn") <= 1000).count()
    assert got == want
