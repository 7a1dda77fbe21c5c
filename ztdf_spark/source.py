"""The lake as a Structured Streaming SOURCE (Spark 4 Python Data Source
API): ``spark.readStream.format("ztdf_lake").option("path", ...)`` streams
every MOR delta commit as raw CDC rows — the Iceberg incremental
append-scan analog, and the streaming complement of the batch net-diff
``LakeTable.changes()``.

Design:

- **Offsets ARE snapshot versions** (``{"version": N}``). Spark's offset
  log + the table's atomic snapshot chain give exactly-once consumption
  with no extra bookkeeping: a restarted stream resumes from the last
  committed version.
- ``partitions(start, end)`` walks the HISTORICAL snapshots
  ``start+1..end`` (driver-side, O(#commits) tiny JSON reads) and emits
  one input partition per delta file added by each commit — so a later
  ``compact()`` removing those manifests from the CURRENT snapshot cannot
  lose in-flight stream data (snapshots are immutable until
  ``expire_snapshots``; falling behind retention is a hard error, same as
  Iceberg).
- ``read(partition)`` runs ON EXECUTORS and yields pyarrow RecordBatches
  straight from the delta parquet (no Python row loop): data columns plus
  ``_change_type`` ('upsert' / 'delete' from the tombstone flag) and
  ``_commit_version``. Compaction commits are skipped — they rewrite
  state, they don't change it.
- Raw append-scan semantics: per-commit change rows in commit order,
  including intra-interval churn (downstream stateful ops want the full
  feed). For NET changes between two versions use ``LakeTable.changes()``.

Streamable tables: merge_mode='mor' (delta commits ARE the change log) or
COW tables created with ``change_feed=True`` (each merge records its
surviving batch winners as change manifests, the Delta-CDF analog). A
plain COW table rewrites change rows in place, so the file set alone
cannot identify them — refused at source construction, not mid-stream.

Retention caveat: the source reads HISTORICAL snapshots; if the stream
falls behind ``expire_snapshots`` retention, the missing snapshot is a
hard error on every trigger (same as Iceberg's incremental scan). Recover
by restarting with a fresh checkpoint from a live version and resyncing
state via ``LakeTable.read()``; size ``keep_last`` to the maximum expected
consumer lag.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamArrowWriter,
    DataSourceStreamReader,
    InputPartition,
    WriterCommitMessage,
)

from .lake import _DATA_DIR, _MANIFEST_DIR, _SNAP_DIR, _TOMBSTONE, columns_map

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"


def _read_snapshot(table_path: str, version: int) -> dict:
    p = os.path.join(table_path, _SNAP_DIR, f"v{version:010d}.json")
    try:
        with open(p) as f:
            return json.load(f)
    except FileNotFoundError:
        raise RuntimeError(
            f"snapshot v{version} of {table_path} is expired or missing — the "
            "stream fell behind the table's retention window (expire_snapshots)"
        ) from None


def _main_chain(table_path: str, from_version: int, to_version: int) -> list[dict]:
    """Snapshots on the parent chain ``(from, to]``, ascending commit
    order. Versions are allocated globally across branches (lake.py
    ``_next_version``), so the main chain may SKIP numbers — walking the
    numeric range would pull a branch commit's snapshot into the stream.
    Raises RuntimeError if ``from_version`` is not an ancestor (offset
    regression / published-branch fork) or a link has been expired."""
    chain: list[dict] = []
    v: int | None = to_version
    while v != from_version:
        if v is None or v < from_version:
            raise RuntimeError(
                f"offset v{from_version} is not an ancestor of v{to_version} "
                f"on {table_path} — the offset log does not match this "
                "table's history (rollback or branch publish rewrote it); "
                "restart with a fresh checkpoint and resync state"
            )
        snap = _read_snapshot(table_path, v)
        chain.append(snap)
        v = snap["parent"]
    return list(reversed(chain))


def _current_version(table_path: str) -> int:
    with open(os.path.join(table_path, _SNAP_DIR, "CURRENT")) as f:
        return int(f.read().strip())


def _check_streamable(snap: dict, table_path: str) -> None:
    """Fail FAST (at source construction, not mid-stream) for tables whose
    commits can never be change-attributed: a COW table without the
    change_feed property has no per-commit change file set, so every merge
    commit would poison ``partitions()`` with an unrecoverable error on
    each trigger (ADVICE r4 #2). MOR tables stream their delta commits;
    COW tables stream their recorded change manifests."""
    if snap.get("merge_mode") != "mor" and not snap.get("change_feed"):
        raise ValueError(
            f"table {table_path} is not streamable: the ztdf_lake source needs "
            "a merge_mode='mor' table (delta commits ARE the change log) or a "
            "COW table created with change_feed=True (per-commit change "
            "manifests); a plain COW table rewrites state in place and its "
            "merge commits cannot be attributed to change rows"
        )


class DeltaFilePartition(InputPartition):
    def __init__(self, file_path: str, version: int):
        self.file_path = file_path
        self.version = version


class LakeChangeStreamReader(DataSourceStreamReader):
    """``max_versions`` / ``max_files``: per-trigger admission control (the
    analog of the binlog source's maxFilesPerTrigger and the reference's
    per-connection backpressure, deploy/Example_ZTDF_NanoTDF.xml:19-20;
    VERDICT r4 next-round #2). ``latestOffset`` clamps how far past the
    last planned offset a micro-batch may reach, so a stream restarted
    against a long backlog drains it in bounded batches instead of one
    giant one. The file budget is summed from manifest-LIST stats — no
    manifest is opened.

    The Python Data Source API has no admission-control
    ``latestOffset(start, limit)`` variant, so the clamp anchors to a
    reader-side cursor. Measured call order (Spark 4.1): a FRESH stream
    calls latestOffset before initialOffset (cursor still None → anchor at
    ``start_version``, which IS the consumption start); a RESTARTED stream
    re-plans the last logged batch via ``partitions(start, end)`` before
    asking for a new latestOffset, so the cursor is already at the logged
    offset. Either way the clamp can never regress below what Spark has
    logged; ``partitions`` additionally hard-fails on an end < start
    regression rather than silently re-emitting consumed commits."""

    def __init__(
        self,
        table_path: str,
        start_version: int,
        schema: T.StructType,
        max_versions: int | None = None,
        max_files: int | None = None,
        l2p: dict[str, str] | None = None,
    ):
        self.table_path = table_path
        self.start_version = start_version
        self.schema = schema
        # logical→physical column names (rename/drop support): files carry
        # stable physical names; the query schema is logical
        self.l2p = l2p or {}
        self.max_versions = max_versions
        self.max_files = max_files
        self._cursor: int | None = None  # highest offset this reader has
        # initialized/planned/committed — None until the run reveals one

    def _advance_cursor(self, version: int) -> None:
        if self._cursor is None or version > self._cursor:
            self._cursor = version

    def initialOffset(self) -> dict:
        self._advance_cursor(self.start_version)
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        cur = _current_version(self.table_path)
        base = self._cursor if self._cursor is not None else self.start_version
        if (self.max_versions is None and self.max_files is None) or cur <= base:
            return {"version": cur}
        try:
            chain = _main_chain(self.table_path, base, cur)
        except RuntimeError:
            # regression/fork: surface through partitions()' documented
            # error path rather than silently clamping
            return {"version": cur}
        if self.max_versions is not None:
            chain = chain[: self.max_versions]
        if self.max_files is not None:
            budget = self.max_files
            admitted = 0
            for snap in chain:
                n = sum(
                    m.get("n_files", 0)
                    for m in snap.get("manifests", [])
                    if m.get("added_at") == snap["version"]
                ) + sum(
                    m.get("n_files", 0) for m in snap.get("change_manifests", []) or []
                )
                budget -= n
                if budget < 0 and admitted > 0:
                    break  # always admit ≥1 commit so the stream progresses
                admitted += 1
                if budget <= 0:
                    break
            chain = chain[:admitted]
        end = chain[-1]["version"] if chain else base
        return {"version": max(end, base)}

    def partitions(self, start: dict, end: dict):
        # per-commit change attribution shared with LakeTable.changes():
        # explicit manifest added_at (filename fallback for legacy round-3
        # manifests), v2 snapshots via inline file-list diff vs parent —
        # so a v2→v3 upgrade's carry-over manifest is NEVER re-emitted as
        # that commit's changes (ADVICE r3 #1)
        from .lake import added_delta_entries

        def read_manifest(name: str) -> list[dict]:
            with open(os.path.join(self.table_path, _MANIFEST_DIR, name)) as f:
                return json.load(f)["entries"]

        if end["version"] < start["version"]:
            raise RuntimeError(
                f"offset regression: batch end v{end['version']} precedes "
                f"start v{start['version']} — refusing to advance the offset "
                "log backwards (would re-emit consumed commits)"
            )
        self._advance_cursor(end["version"])  # restart replay reveals the
        # true planned offset — the backpressure clamp anchors here
        out: list[DeltaFilePartition] = []
        for snap in _main_chain(self.table_path, start["version"], end["version"]):
            v = snap["version"]

            def get_parent(snap=snap):
                if snap.get("parent") is None:
                    return None
                try:
                    return _read_snapshot(self.table_path, snap["parent"])
                except RuntimeError:
                    return None

            added = added_delta_entries(snap, read_manifest=read_manifest, get_parent=get_parent)
            if added is None:
                raise RuntimeError(
                    f"commit v{v} of {self.table_path} cannot be attributed to "
                    "change rows (a COW merge without change_feed, an expired "
                    "parent snapshot, or an unverifiable legacy manifest) — "
                    "the stream cannot advance past it. Recover by restarting "
                    "the stream with a fresh checkpoint from a later version "
                    "(accepting a state resync via LakeTable.read())."
                )
            for e in added:
                out.append(
                    DeltaFilePartition(os.path.join(self.table_path, _DATA_DIR, e["path"]), v)
                )
        return out

    def read(self, partition: DeltaFilePartition):
        # executor-side: stream Arrow batches straight off the delta
        # parquet — no per-row Python
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_schema

        out_schema = to_arrow_schema(self.schema)
        f = pq.ParquetFile(partition.file_path)
        have = set(f.schema_arrow.names)
        for batch in f.iter_batches():
            dead = pc.fill_null(batch.column(_TOMBSTONE), False)
            arrays = []
            for field in out_schema:
                if field.name == CHANGE_TYPE_COL:
                    arrays.append(pc.if_else(dead, pa.scalar("delete"), pa.scalar("upsert")))
                elif field.name == COMMIT_VERSION_COL:
                    arrays.append(pa.array([partition.version] * batch.num_rows, type=pa.int64()))
                elif self.l2p.get(field.name, field.name) in have:
                    arrays.append(
                        batch.column(self.l2p.get(field.name, field.name)).cast(field.type)
                    )
                else:
                    # file written before an additive schema evolution: the
                    # new column reads as null, Iceberg-style
                    arrays.append(pa.nulls(batch.num_rows, type=field.type))
            yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    def commit(self, end: dict) -> None:
        # Spark's offset log is the consumption watermark; track it for
        # the backpressure clamp's anchor
        self._advance_cursor(end["version"])


class StagedFileMessage(WriterCommitMessage):
    def __init__(self, path: str, rows: int):
        self.path = path
        self.rows = rows


class LakeStreamWriter(DataSourceStreamArrowWriter):
    """Streaming SINK: ``df.writeStream.format("ztdf_lake")`` lands each
    micro-batch as a MOR delta commit — making the table writable from ANY
    Structured Streaming pipeline, not just the engine's own fused sink.

    Executor side (``write``): Arrow batches stream straight to ONE staged
    parquet per partition (op → ``_tombstone``, no per-row Python). Driver
    side (``commit``): the staged files are adopted by ``commit_staged`` —
    a pure-metadata O(files-added) commit — fenced on Spark's epoch id, so
    a replayed micro-batch after crash recovery is a recorded no-op
    (exactly-once, same contract as the pipeline). ``abort`` deletes the
    batch's staged files.

    Caller contract (inherited from ``commit_staged``): (key, seq) unique
    within a micro-batch — true for WAL/binlog feeds; dedup upstream
    otherwise. Distinct concurrent streaming queries into ONE table must
    set distinct ``.option("appId", ...)`` values — the exactly-once fence
    is a per-app epoch watermark, and two queries sharing an app id would
    fence each other's (independently numbered) epochs as replays.
    """

    def __init__(
        self,
        table_path: str,
        schema: T.StructType,
        app_id: str,
        l2p: dict[str, str] | None = None,
    ):
        self.table_path = table_path
        self.schema = schema
        self.app_id = app_id
        # logical→physical (non-identity entries only): the stream sends
        # logical names, staged files must carry the table's stable
        # physical names (commit_staged cannot rename files in place)
        self.l2p = l2p or {}
        self.stage_root = os.path.join(table_path, "_staging")

    def write(self, iterator):
        import uuid

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        os.makedirs(self.stage_root, exist_ok=True)
        path = os.path.join(self.stage_root, f"stream-{uuid.uuid4().hex}.parquet")
        writer = None
        rows = 0
        for batch in iterator:
            if "op" in batch.schema.names:
                dead = pc.equal(pc.fill_null(batch.column("op"), "U"), pa.scalar("D"))
                keep = [n for n in batch.schema.names if n != "op"]
                batch = pa.RecordBatch.from_arrays(
                    [batch.column(n) for n in keep] + [dead], keep + [_TOMBSTONE]
                )
            elif _TOMBSTONE not in batch.schema.names:
                batch = pa.RecordBatch.from_arrays(
                    [batch.column(n) for n in batch.schema.names]
                    + [pa.array([False] * batch.num_rows, type=pa.bool_())],
                    list(batch.schema.names) + [_TOMBSTONE],
                )
            if self.l2p:
                batch = pa.RecordBatch.from_arrays(
                    list(batch.columns),
                    [self.l2p.get(n, n) for n in batch.schema.names],
                )
            if writer is None:
                writer = pq.ParquetWriter(path, batch.schema)
            writer.write_batch(batch)
            rows += batch.num_rows
        if writer is None:
            return StagedFileMessage("", 0)
        writer.close()
        return StagedFileMessage(path, rows)

    def _batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.stage_root, f"batch-{batch_id}")

    def commit(self, messages, batchId: int) -> None:
        import shutil
        import uuid

        from pyspark.sql import SparkSession

        from .lake import LakeTable

        d = self._batch_dir(batchId)
        shutil.rmtree(d, ignore_errors=True)  # idempotent re-execution
        os.makedirs(d)
        n = 0
        for m in messages:
            if m is not None and m.rows:
                os.replace(m.path, os.path.join(d, f"{uuid.uuid4().hex}.parquet"))
                n += m.rows
        t = LakeTable.load(SparkSession.getActiveSession(), self.table_path)
        data_fields = [
            T.StructField(self.l2p.get(f.name, f.name), f.dataType, True)
            for f in self.schema.fields
            if f.name not in ("op", _TOMBSTONE)
        ]
        try:
            if n:
                t.commit_staged(
                    d, batch_id=batchId, app_id=self.app_id,
                    batch_schema=T.StructType(data_fields),
                    extra_summary={"sink": "ztdf_lake_stream"},
                )
        finally:
            shutil.rmtree(d, ignore_errors=True)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and m.path:
                try:
                    os.remove(m.path)
                except FileNotFoundError:
                    pass


class ZtdfLakeDataSource(DataSource):
    """Register once per session::

        spark.dataSource.register(ZtdfLakeDataSource)

        # source: stream the table's delta commits
        df = (spark.readStream.format("ztdf_lake")
              .option("path", table_path)
              .option("startVersion", 0)   # default: from the beginning
              .option("maxVersionsPerTrigger", 8)   # backpressure: commits/batch
              .option("maxFilesPerTrigger", 64)     # backpressure: files/batch
              .load())
        # emits data columns + _change_type + _commit_version

        # sink: land any streaming DF (op + data columns) as MOR commits
        q = (changes.writeStream.format("ztdf_lake")
             .option("path", table_path)
             .option("checkpointLocation", ckpt).start())
    """

    @classmethod
    def name(cls) -> str:
        return "ztdf_lake"

    def _table_path(self) -> str:
        p = self.options.get("path")
        if not p:
            raise ValueError("ztdf_lake source requires .option('path', <table dir>)")
        return p

    def schema(self) -> T.StructType:
        snap = _read_snapshot(self._table_path(), _current_version(self._table_path()))
        _check_streamable(snap, self._table_path())
        # LOGICAL names (post rename/drop); files keep stable physical
        # names, translated per batch in the reader/writer
        phys = T.StructType.fromJson(snap["schema"])
        fields = [
            T.StructField(c["logical"], phys[c["physical"]].dataType, True)
            for c in columns_map(snap)
        ]
        fields.append(T.StructField(CHANGE_TYPE_COL, T.StringType()))
        fields.append(T.StructField(COMMIT_VERSION_COL, T.LongType()))
        return T.StructType(fields)

    def streamReader(self, schema: T.StructType) -> LakeChangeStreamReader:
        path = self._table_path()
        # re-validate here: a caller-supplied schema bypasses self.schema()
        _check_streamable(_read_snapshot(path, _current_version(path)), path)
        start = int(self.options.get("startversion", 0))
        mv = self.options.get("maxversionspertrigger")
        mf = self.options.get("maxfilespertrigger")
        snap = _read_snapshot(path, _current_version(path))
        return LakeChangeStreamReader(
            self._table_path(),
            start,
            schema,
            max_versions=int(mv) if mv is not None else None,
            max_files=int(mf) if mf is not None else None,
            l2p={
                c["logical"]: c["physical"]
                for c in columns_map(snap)
                if c["logical"] != c["physical"]
            },
        )

    def streamWriter(self, schema: T.StructType, overwrite: bool) -> LakeStreamWriter:
        import hashlib

        path = self._table_path()
        snap = _read_snapshot(path, _current_version(path))
        if snap.get("merge_mode") != "mor":
            raise ValueError("ztdf_lake streaming sink requires a merge_mode='mor' table")
        # exactly-once fence key: epoch ids are scoped to a CHECKPOINT (a
        # fresh checkpoint restarts at 0), so the default app id derives
        # from the checkpoint location — same checkpoint restart → same
        # fence (replays no-op); new checkpoint → new fence (epoch 0 is
        # real data, not a replay); concurrent queries → distinct fences.
        app_id = self.options.get("appid")
        if not app_id:
            ckpt = self.options.get("checkpointlocation")
            if not ckpt:
                # a silent shared-constant fallback would let two queries
                # (e.g. relying on the spark.sql.streaming.checkpointLocation
                # conf default) share ONE epoch fence and drop each other's
                # batches as replays (ADVICE r3 #2) — refuse instead
                raise ValueError(
                    "ztdf_lake sink needs .option('checkpointLocation', ...) or an "
                    "explicit .option('appId', ...) to derive its exactly-once "
                    "fence key (a conf-level default checkpoint dir is not "
                    "visible to the data source)"
                )
            app_id = "ztdf_lake_sink-" + hashlib.sha1(ckpt.encode()).hexdigest()[:12]
        return LakeStreamWriter(
            path,
            schema,
            app_id,
            l2p={
                c["logical"]: c["physical"]
                for c in columns_map(snap)
                if c["logical"] != c["physical"]
            },
        )
