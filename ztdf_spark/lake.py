"""LakeTable — a minimal Iceberg-v2-semantics table format over Parquet.

No Iceberg/Delta jars ship in this environment (SURVEY.md §7), so the five
semantics the north rule needs are implemented from scratch behind this
interface (a real Iceberg catalog slots in when jars are available):

1. **Atomic snapshot commits** — versioned JSON manifests written
   temp+rename; a reader pins one snapshot for its whole scan.
2. **Copy-on-write MERGE** (upsert + delete, latest-wins by a sequence
   column) that rewrites only the data files whose key range overlaps the
   batch — DIY file pruning from per-file min/max key stats, the moral
   equivalent of Iceberg manifest-entry pruning.
3. **Additive schema evolution** — new nullable columns appended to the
   table schema; old files are read through the evolved schema (missing
   columns → null).
4. **Snapshot lineage / time travel** — every commit records parent,
   operation summary, and the batch id that produced it; ``read(version=k)``
   reads any historical snapshot.
5. **Exactly-once batch fencing** — per-writer-app high-watermark batch id
   in the snapshot; re-delivered ``foreachBatch`` invocations are no-ops
   (the Delta-style idempotent-writer txn pattern).

Scale notes (100 TB / 1000 executors): all manifest operations are
driver-side over O(#files) metadata — data never moves through the driver.
The MERGE's only shuffles are (a) the map-side-combined ``max_by`` dedup of
the batch and (b) the union+max_by rewrite agg, both hash-partitioned on the
table key; AQE handles skew splitting, and hot keys are pre-reduced by
partial aggregation before the exchange. Rewrite output is
``repartitionByRange(key)`` so data files stay key-clustered, keeping
per-file min/max ranges tight → future merges prune more files.

Crash safety: data files are written before the snapshot commit; a crash
between the two leaves unreferenced orphans (cleaned by ``vacuum()``), never
a corrupt table. Concurrent writers are excluded by O_EXCL snapshot-file
creation (single-writer optimistic concurrency, like Iceberg's atomic
swap).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .ops import latest_wins_join

FORMAT_VERSION = 2
_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"


class CommitConflict(RuntimeError):
    pass


def _atomic_write(path: str, payload: str, *, exclusive: bool = False) -> None:
    tmp = f"{path}.tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    if exclusive:
        try:
            os.link(tmp, path)  # atomic fail-if-exists
        except FileExistsError as e:
            os.unlink(tmp)
            raise CommitConflict(f"snapshot already exists: {path}") from e
        os.unlink(tmp)
    else:
        os.replace(tmp, path)


def _file_key_stats(path: str, key_col: str) -> tuple[str | None, str | None, int]:
    """Per-file (min, max, rows) for the key column from parquet footer stats."""
    md = pq.ParquetFile(path).metadata
    idx = md.schema.names.index(key_col)
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None, None, md.num_rows  # stats missing → never prune this file
        mn = st.min.decode() if isinstance(st.min, bytes) else str(st.min)
        mx = st.max.decode() if isinstance(st.max, bytes) else str(st.max)
        lo = mn if lo is None or mn < lo else lo
        hi = mx if hi is None or mx > hi else hi
    return lo, hi, md.num_rows


class LakeTable:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self._snap_dir = os.path.join(path, _SNAP_DIR)
        self._data_dir = os.path.join(path, _DATA_DIR)

    # ------------------------------------------------------------------ meta

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        *,
        key_col: str = "doc_id",
        seq_col: str = "lsn",
        target_file_rows: int = 500_000,
    ) -> "LakeTable":
        t = cls(spark, path)
        os.makedirs(t._snap_dir, exist_ok=True)
        os.makedirs(t._data_dir, exist_ok=True)
        if t.current_version() is not None:
            raise CommitConflict(f"table already exists at {path}")
        snap = {
            "format_version": FORMAT_VERSION,
            "version": 0,
            "parent": None,
            "schema": json.loads(schema.json()),
            "key_col": key_col,
            "seq_col": seq_col,
            "target_file_rows": target_file_rows,
            "files": [],
            "last_batch": {},
            "summary": {"operation": "create"},
            "timestamp_ms": int(time.time() * 1000),
        }
        t._commit(snap)
        return t

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakeTable":
        t = cls(spark, path)
        if t.current_version() is None:
            raise FileNotFoundError(f"no lake table at {path}")
        return t

    @classmethod
    def exists(cls, path: str) -> bool:
        return os.path.exists(os.path.join(path, _SNAP_DIR, "CURRENT"))

    def current_version(self) -> int | None:
        cur = os.path.join(self._snap_dir, "CURRENT")
        if not os.path.exists(cur):
            return None
        with open(cur) as f:
            return int(f.read().strip())

    def snapshot(self, version: int | None = None) -> dict:
        v = self.current_version() if version is None else version
        with open(os.path.join(self._snap_dir, f"v{v:010d}.json")) as f:
            return json.load(f)

    def history(self) -> list[dict]:
        v = self.current_version()
        out = []
        while v is not None:
            s = self.snapshot(v)
            out.append(s)
            v = s["parent"]
        return list(reversed(out))

    def schema(self, version: int | None = None) -> T.StructType:
        return T.StructType.fromJson(self.snapshot(version)["schema"])

    def _commit(self, snap: dict) -> None:
        _atomic_write(
            os.path.join(self._snap_dir, f"v{snap['version']:010d}.json"),
            json.dumps(snap, indent=1),
            exclusive=True,
        )
        _atomic_write(os.path.join(self._snap_dir, "CURRENT"), str(snap["version"]))

    # ------------------------------------------------------------------ read

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot-pinned scan through the (possibly evolved) schema:
        files written before an additive evolution read the new columns as
        null — Iceberg-style schema projection."""
        snap = self.snapshot(version)
        schema = T.StructType.fromJson(snap["schema"])
        paths = [os.path.join(self._data_dir, f["path"]) for f in snap["files"]]
        if not paths:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*paths)

    # ----------------------------------------------------------------- merge

    def _evolve_schema(self, snap: dict, batch_schema: T.StructType) -> T.StructType:
        """Additive evolution: batch columns absent from the table schema are
        appended as nullable fields (north rule: 'handles additive schema
        evolution (new attribute/assertion columns)')."""
        table = T.StructType.fromJson(snap["schema"])
        have = {f.name for f in table.fields}
        added = [
            T.StructField(f.name, f.dataType, True)
            for f in batch_schema.fields
            if f.name not in have and f.name != "op"
        ]
        if not added:
            return table
        return T.StructType(list(table.fields) + added)

    def _matched_files(self, snap: dict, batch_keys: DataFrame, key_col: str) -> list[dict]:
        """Prune: keep only data files whose [min,max] key range contains at
        least one batch key. File ranges are O(#files) driver-side metadata,
        broadcast to a range join against the batch's distinct keys."""
        files = snap["files"]
        if not files:
            return []
        unprunable = [f for f in files if f["min_key"] is None]
        ranged = [f for f in files if f["min_key"] is not None]
        matched = list(unprunable)
        if ranged:
            ranges = self.spark.createDataFrame(
                [(f["path"], f["min_key"], f["max_key"]) for f in ranged],
                "path string, min_key string, max_key string",
            )
            hit = (
                batch_keys.alias("b")
                .join(
                    F.broadcast(ranges).alias("r"),
                    (F.col(f"b.{key_col}") >= F.col("r.min_key"))
                    & (F.col(f"b.{key_col}") <= F.col("r.max_key")),
                )
                .select("r.path")
                .distinct()
            )
            hit_paths = {r["path"] for r in hit.collect()}
            matched += [f for f in ranged if f["path"] in hit_paths]
        return matched

    def _write_files(self, df: DataFrame, version: int, key_col: str, target_rows: int, n_rows: int) -> list[dict]:
        """Write key-range-clustered parquet files; return manifest entries.

        Output partition count is the max of (rows/target) and the cluster
        parallelism floor — a rewrite must never serialize onto fewer cores
        than the cluster has just because the target file size is large
        (parquet encode is CPU-bound; one-file-per-task would cap the write
        at #files tasks)."""
        parallel_floor = min(4 * self.spark.sparkContext.defaultParallelism, max(1, n_rows // 100_000))
        n_files = max(1, -(-n_rows // target_rows), parallel_floor) if n_rows else 1
        staged = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
        (df.repartitionByRange(n_files, F.col(key_col)).write.mode("overwrite").parquet(staged))
        entries = []
        i = 0
        for name in sorted(os.listdir(staged)):
            if not name.endswith(".parquet"):
                continue
            src = os.path.join(staged, name)
            dst_name = f"part-v{version:010d}-{i:05d}-{uuid.uuid4().hex[:8]}.parquet"
            os.replace(src, os.path.join(self._data_dir, dst_name))
            lo, hi, rows = _file_key_stats(os.path.join(self._data_dir, dst_name), key_col)
            if rows == 0:
                os.unlink(os.path.join(self._data_dir, dst_name))
                continue
            entries.append({"path": dst_name, "rows": rows, "min_key": lo, "max_key": hi})
            i += 1
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        return entries

    def merge(
        self,
        changes: DataFrame,
        *,
        batch_id: int | None = None,
        app_id: str = "default",
        extra_summary: dict | None = None,
    ) -> dict:
        """Latest-wins MERGE of a CDC batch (columns: ``op`` I/U/D + key +
        seq + payload columns) into the table. Copy-on-write: only key-range-
        matched files are rewritten; unmatched files carry over untouched.

        Exactly-once: if ``batch_id`` ≤ the committed high-watermark for
        ``app_id``, the call is a recorded no-op (idempotent re-delivery,
        north rule 'exactly-once sink'; the Spark analog of NiFi's atomic
        session commit, SURVEY.md §3.1 step 6).
        """
        snap = self.snapshot()
        key_col, seq_col = snap["key_col"], snap["seq_col"]
        target_rows = snap.get("target_file_rows", 500_000)

        if batch_id is not None and batch_id <= snap["last_batch"].get(app_id, -1):
            return {
                "version": snap["version"],
                "noop": True,
                "reason": f"batch {batch_id} already committed (watermark {snap['last_batch'][app_id]})",
            }

        schema = self._evolve_schema(snap, changes.schema)
        data_cols = [f.name for f in schema.fields]

        # 1. narrow per-key change summary: winning op per key, column-pruned
        #    to (key, op, seq) — feeds stats AND file pruning without ever
        #    shuffling the wide payload columns. Map-side partial max_by
        #    pre-reduces hot keys before the exchange.
        key_ops = (
            changes.select(key_col, "op", seq_col)
            .groupBy(key_col)
            .agg(F.max_by("op", F.col(seq_col)).alias("op"))
            .persist()
        )
        try:
            counts = key_ops.agg(
                F.count("*").alias("n"),
                F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("d"),
            ).collect()[0]
            n_batch, n_del = int(counts["n"]), int(counts["d"] or 0)
            if n_batch == 0:
                return {"version": snap["version"], "noop": True, "reason": "empty batch"}

            # 2. prune: which data files does this batch touch?
            matched = self._matched_files(snap, key_ops.select(key_col), key_col)
            matched_names = {f["path"] for f in matched}

            # 3. copy-on-write rewrite with NO wide-row aggregation or sort:
            #    batch winners via narrow hash-agg + join-back, then two
            #    anti-joins on narrow (key, seq) sets decide survivorship.
            #    Wide rows flow scan → (broadcast) join → range-clustered
            #    write; they are only ever shuffled once, for file clustering.
            conformed = changes
            for f in schema.fields:  # conform batch to evolved schema
                if f.name not in conformed.columns:
                    conformed = conformed.withColumn(f.name, F.lit(None).cast(f.dataType))
            conformed = conformed.select("op", *data_cols)

            # within-batch latest-wins ((key,seq) unique per CDC batch: LSNs).
            # Narrow (key, seq) sets broadcast up to ~16M keys (~0.5 GB,
            # well under Spark's 8 GB cap; one copy per executor) — beyond
            # that, shuffled HASH joins (never sort-merge: sorting the
            # full-width rows is the cost this design eliminates).
            from .ops import broadcast_key_limit

            key_limit = broadcast_key_limit(self.spark)
            bcast_batch = n_batch <= key_limit
            bw = latest_wins_join(conformed, key=key_col, seq=seq_col, broadcast_keys=bcast_batch)
            bk = bw.select(F.col(key_col).alias("_bk"), F.col(seq_col).alias("_bseq"))
            bk = F.broadcast(bk) if bcast_batch else bk.hint("shuffle_hash")

            matched_paths = [os.path.join(self._data_dir, f["path"]) for f in matched]
            n_existing = sum(f["rows"] for f in matched)
            if matched:
                existing = self.spark.read.schema(schema).parquet(*matched_paths)
                # existing row survives unless a batch change with seq >= its
                # seq targets its key (ties → the batch row wins: identical
                # payload by deterministic encryption, plus evolved columns)
                preserved = existing.join(
                    bk,
                    (existing[key_col] == F.col("_bk")) & (F.col("_bseq") >= existing[seq_col]),
                    "left_anti",
                )
                # batch winner survives unless the table already holds a
                # strictly newer row for its key (stale cross-batch update)
                ek = self.spark.read.schema(schema).parquet(*matched_paths).select(
                    F.col(key_col).alias("_ek"), F.col(seq_col).alias("_eseq")
                )
                ek = F.broadcast(ek) if n_existing <= key_limit else ek.hint("shuffle_hash")
                batch_final = bw.join(
                    ek,
                    (bw[key_col] == F.col("_ek")) & (F.col("_eseq") > bw[seq_col]),
                    "left_anti",
                )
                merged_src = preserved.unionByName(batch_final.filter(F.col("op") != "D").drop("op"))
            else:
                merged_src = bw.filter(F.col("op") != "D").drop("op")
            result = merged_src.select(*data_cols).persist()

            new_version = snap["version"] + 1
            # size files from manifest stats (no extra count action): upper
            # bound = rows already in matched files + new distinct keys
            est_rows = sum(f["rows"] for f in matched) + n_batch
            new_entries = self._write_files(result, new_version, key_col, target_rows, est_rows)
            result.unpersist()
            carried = [f for f in snap["files"] if f["path"] not in matched_names]
            last_batch = dict(snap["last_batch"])
            if batch_id is not None:
                last_batch[app_id] = batch_id
            new_snap = {
                "format_version": FORMAT_VERSION,
                "version": new_version,
                "parent": snap["version"],
                "schema": json.loads(schema.json()),
                "key_col": key_col,
                "seq_col": seq_col,
                "target_file_rows": target_rows,
                "files": carried + new_entries,
                "last_batch": last_batch,
                "summary": {
                    "operation": "merge",
                    "batch_id": batch_id,
                    "app_id": app_id,
                    "n_batch": n_batch,
                    "n_deletes": n_del,
                    "n_upserts": n_batch - n_del,
                    "files_rewritten": len(matched),
                    "files_added": len(new_entries),
                    "total_rows": sum(f["rows"] for f in carried + new_entries),
                    **(extra_summary or {}),
                },
                "timestamp_ms": int(time.time() * 1000),
            }
            self._commit(new_snap)
            return {"version": new_version, "noop": False, **new_snap["summary"]}
        finally:
            key_ops.unpersist()

    # --------------------------------------------------------------- vacuum

    def vacuum(self) -> list[str]:
        """Delete data files not referenced by any snapshot (crash orphans)."""
        referenced: set[str] = set()
        for name in os.listdir(self._snap_dir):
            if name.startswith("v") and name.endswith(".json"):
                with open(os.path.join(self._snap_dir, name)) as f:
                    referenced |= {e["path"] for e in json.load(f)["files"]}
        removed = []
        for name in os.listdir(self._data_dir):
            if name.endswith(".parquet") and name not in referenced:
                os.unlink(os.path.join(self._data_dir, name))
                removed.append(name)
        return removed
