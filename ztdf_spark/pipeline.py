"""CDC ingest pipeline: binlog tail → dedup → encrypt → MERGE → audit.

The Spark re-expression of the reference's flow graph
(deploy/Example_ZTDF_NanoTDF.xml; SURVEY.md §2.2, §3.4):

- NiFi source processor + queue  → Structured Streaming file tail with
  ``maxFilesPerTrigger`` backpressure (template's per-connection
  back-pressure: 10,000 objects / 1 GB, Example_ZTDF_NanoTDF.xml:19-20)
- UpdateAttribute policy stamp   → Catalyst projection (caller-side)
- ConvertToZTDF + routing        → ``ops.encrypt_batch`` inside
  ``foreachBatch``
- failure relationship → LogMessage → DLQ parquet append (idempotent,
  keyed by batch id), original content preserved
- NiFi session commit            → idempotent ``LakeTable.merge`` fenced on
  the streaming batch id + checkpointed source offsets: a re-executed
  batch is a no-op, so exactly-once end-to-end
- NiFi provenance                → sidecar audit table: one row per
  committed batch with per-source-partition lineage (input file, offset
  range, event counts), commit snapshot id, wall-clock and throughput
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import ops
from .datagen import BINLOG_DDL
from .lake import LakeTable, _atomic_write
from .settings import Settings

# binlog columns consumed by the encrypt/route stage; anything else on the
# batch is treated as an additively-evolved payload column and flows into
# the lake table schema (north rule: 'new attribute/assertion columns')
_CORE_COLS = {
    "lsn", "op", "doc_id", "tokens", "n_tok", "source",
    "kas_url", "tdf_attribute", "assertions",
}

STATE_BASE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ciphertext", T.BinaryType()),
        T.StructField("mime_type", T.StringType()),
        T.StructField("n_tok", T.IntegerType()),
        T.StructField("source", T.StringType()),
    ]
)


@dataclass
class PipelineConfig:
    root: str
    fmt: str = "ztdf"
    app_id: str = "ztdf-cdc"
    max_files_per_trigger: int = 4
    target_file_rows: int = 500_000
    # merge-on-read is the CDC-scale default: per-batch merge cost is
    # O(batch), never O(table) — the round-1 COW rewrite was the measured
    # scaling-efficiency killer. 'cow' remains available for small tables
    # where read-path simplicity wins.
    merge_mode: str = "mor"
    # MOR delta compaction policy. Compaction is maintenance, not ingest:
    # it runs AFTER the batch commit, off the exactly-once path.
    #   compact_every=k     — fixed cadence (every k batches)
    #   compact_every=None  — RATIO-DRIVEN (default): compact when the
    #       snapshot's delta_ratio ≥ compact_delta_ratio AND at least
    #       compact_min_delta_rows delta rows have accumulated (the floor
    #       keeps small tables / short benches from thrashing; both checks
    #       are O(#manifests) snapshot arithmetic, no I/O). An unattended
    #       MOR stream therefore has BOUNDED read()-reconstruction cost:
    #       delta rows never exceed max(compact_min_delta_rows,
    #       ratio_bound(table)) between compactions.
    #   compact_delta_ratio=None — never auto-compact (caller-scheduled)
    compact_every: int | None = None
    compact_delta_ratio: float | None = 0.5
    compact_min_delta_rows: int = 4_000_000
    # pre-encrypt latest-wins dedup policy (MOR only — COW always dedups):
    #   'always' — dedup every batch (hot-key streams: crypto only on winners)
    #   'never'  — shuffle-free map-only ingest; read-time latest-wins is
    #              authoritative, superseded rows just cost their encryption
    #   'auto'   — batch 0 dedups, then dedup only while the batch's
    #              measured update amplification (events per distinct key,
    #              from approx_count_distinct in the same job's observe)
    #              stays ≥ dedup_min_amplification. The dedup machinery
    #              (narrow winner-keys job + broadcast hash build) is a
    #              near-fixed per-batch cost — the measured N→4N scaling
    #              drag — so it must only run when amplification pays for it.
    # Threshold calibration (measured, BENCH/BASELINE.md): the machinery is
    # a ~3-4 s near-fixed cost per batch (narrow job + broadcast build),
    # while skipping dedup costs (1 - 1/amp) × ~21.5 µs/event of extra
    # crypto spread across all cores — at amp ≤ ~3 the machinery loses on
    # any cluster size, and MOR correctness never depends on it.
    dedup_mode: str = "auto"
    dedup_min_amplification: float = 3.0
    binlog_schema: str = field(default=BINLOG_DDL)
    # WAL segment encoding: 'parquet' (columnar segments) or 'json'
    # (JSON-lines, the debezium-style wire format) — same schema contract
    source_format: str = "parquet"
    # UpdateAttribute-with-EL properties: {column: template}. Templates may
    # use the NiFi expression-language subset (ztdf_spark/el.py) over the
    # batch's columns; non-EL values become constants. Stamped BEFORE
    # routing, so stamped columns ride the whole pipeline as data
    # attributes (DLQ rows keep them; the lake's additive schema evolution
    # admits new names).
    attribute_properties: dict[str, str] | None = None

    @property
    def lake_path(self) -> str:
        return os.path.join(self.root, "lake")

    @property
    def dlq_path(self) -> str:
        return os.path.join(self.root, "dlq")

    @property
    def audit_path(self) -> str:
        return os.path.join(self.root, "audit")

    @property
    def checkpoint_path(self) -> str:
        return os.path.join(self.root, "checkpoint")


def _file_lineage(batch: DataFrame) -> list[dict]:
    """Per-source-file lineage (NiFi provenance analog: source offset range
    + event count per WAL segment) straight from parquet footer metadata —
    driver-side, O(#files), no Spark job. Falls back to an empty list for
    non-file-backed batches (the global offset range is still recorded from
    the observe() metrics)."""
    entries = []
    try:
        files = batch.inputFiles()
    except Exception:
        files = []
    if files and not all(f.endswith(".parquet") for f in files):
        files = []  # non-parquet WAL segments (e.g. JSON): no footer stats →
        # fall through to the one-pass aggregation below
    if not files:
        # streaming micro-batch plans don't expose inputFiles(): fall back
        # to one column-pruned aggregation job over input_file_name()
        rows = (
            batch.groupBy(F.input_file_name().alias("f"))
            .agg(F.count("*").alias("n"), F.min("lsn").alias("lo"), F.max("lsn").alias("hi"))
            .collect()
        )
        return [
            {
                "source_file": os.path.basename(r["f"] or ""),
                "n_events": r["n"],
                "min_lsn": r["lo"],
                "max_lsn": r["hi"],
            }
            for r in sorted(rows, key=lambda r: (r["lo"] is None, r["lo"]))
        ]
    import pyarrow.parquet as pq

    for uri in sorted(files):
        path = uri[len("file:"):] if uri.startswith("file:") else uri
        try:
            md = pq.ParquetFile(path).metadata
            idx = md.schema.names.index("lsn")
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is not None and st.has_min_max:
                    lo = st.min if lo is None or st.min < lo else lo
                    hi = st.max if hi is None or st.max > hi else hi
            entries.append(
                {
                    "source_file": os.path.basename(path),
                    "n_events": md.num_rows,
                    "min_lsn": lo,
                    "max_lsn": hi,
                }
            )
        except Exception:
            entries.append({"source_file": os.path.basename(path), "n_events": None,
                            "min_lsn": None, "max_lsn": None})
    return entries


def warm_python_workers(spark: SparkSession, rounds: int = 3) -> None:
    """Populate the Python-worker pool before steady-state work.

    The first pandas-UDF stages of a session pay worker fork + interpreter +
    import cost per task slot (measured: a 64-task UDF stage goes 42s → 2s
    between a cold and a fully-warm pool on local[32]). A real deployment
    runs thousands of micro-batches so only the first pays; benchmarks and
    latency-sensitive starts should call this once up front (BASELINE.md
    measures steady-state replay excluding session startup).
    """
    cores = spark.sparkContext.defaultParallelism

    @F.pandas_udf("long")
    def _touch(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import numpy as np  # noqa: F401
        import pandas as _pd  # noqa: F401
        from cryptography.hazmat.primitives.ciphers.aead import AESGCM  # noqa: F401

        from ztdf_spark import tdf  # noqa: F401

        for s in it:
            yield s

    for _ in range(rounds):
        spark.range(0, cores * 4, 1, cores * 2).select(F.sum(_touch("id"))).collect()


class CdcPipeline:
    def __init__(self, spark: SparkSession, settings: Settings, cfg: PipelineConfig):
        self.spark = spark
        self.settings = settings
        self.cfg = cfg
        self.table = self._ensure_table()
        # last observed update amplification (events / distinct keys) for
        # dedup_mode='auto'; None → batch 0 dedups conservatively
        self._last_amp: float | None = None
        # UpdateAttribute-with-EL stage: property templates compile ONCE per
        # pipeline into Catalyst Column trees (reference evaluates EL per
        # FlowFile, AbstractTDFProcessor.java:113-115 — here the compiled
        # expression runs per row inside whole-stage codegen)
        if cfg.attribute_properties:
            from .el import el_columns

            self._attr_cols = el_columns(cfg.attribute_properties)
        else:
            self._attr_cols = None

    def _ensure_table(self) -> LakeTable:
        if LakeTable.exists(self.cfg.lake_path):
            return LakeTable.load(self.spark, self.cfg.lake_path)
        return LakeTable.create(
            self.spark,
            self.cfg.lake_path,
            STATE_BASE_SCHEMA,
            key_col="doc_id",
            seq_col="lsn",
            target_file_rows=self.cfg.target_file_rows,
            merge_mode=self.cfg.merge_mode,
        )

    # ------------------------------------------------------------- one batch

    def _dlq_cols(self, extra_cols: list[str]) -> list[str]:
        """One shared DLQ/staging column set for both failure stages (pre-
        gate and in-UDF), so every parquet under the DLQ root reads with a
        single schema: original event content + error + (null on failure)
        encrypt outputs."""
        return [
            "lsn", "op", "doc_id", "tokens", "n_tok", "source",
            "kas_url", "tdf_attribute", "assertions", *extra_cols,
            "error", "ciphertext", "mime_type", "_tombstone",
        ]

    def process_batch(self, batch: DataFrame, batch_id: int) -> dict:
        """Route → DLQ → dedup → encrypt winners → MERGE → audit.

        Stage order is the engine's key scale win over the reference's
        record-at-a-time loop: ALL failure modes (no KAS / no attrs /
        malformed assertions / oversize) are detected Catalyst-side per
        event (``ops.with_pre_route``), so the expensive crypto UDF runs
        only on the per-key latest-wins winners — on a hot-key CDC stream
        that is 10-100× fewer rows, and the wide shuffle moves plaintext
        token arrays instead of (larger) ciphertexts. Per-event routing
        parity with the reference is preserved: every invalid event lands
        in the DLQ with its original content (including the rare rows that
        pass the Catalyst gate but fail INSIDE the encrypt UDF — they land
        in ``stage=udf``). Note the one intentional divergence: a winner
        that fails in the UDF is DLQ'd but does NOT resurrect the older
        event it shadowed in dedup (the reference, processing per-event,
        would leave the older state in place); the Catalyst gate mirrors
        every reference failure mode precisely so this path is reachable
        only by a gate/SDK divergence bug, and such rows are never silently
        lost.

        With a merge-on-read table the whole batch costs exactly TWO Spark
        jobs, and the wide token arrays are decoded exactly ONCE:
        (1) a NARROW winner-keys pass (column-pruned scan — no tokens read —
        → hash-agg max(lsn) per key, persisted + counted), (2) one fused
        wide pass: scan → broadcast winner-key join (wide rows stay on
        their scan partitions; no wide shuffle, no AQE-coalesced
        under-parallelism in the crypto stage) → encrypt → write partitioned
        by route. The success partition is adopted as lake delta files by a
        pure-metadata commit; failure partitions (pre-gate AND in-UDF) are
        moved into the DLQ. Route counts piggyback on the same job via
        observe. Nothing reads or rewrites existing table data — per-batch
        cost is O(batch) regardless of table size, which is what makes
        N→4N executor scaling hold (BENCH/BASELINE.md).

        Idempotent: every side effect is keyed by ``batch_id`` (DLQ dir
        overwrite, staging dir overwrite, merge fence, audit file
        overwrite), so foreachBatch re-execution after a crash replays to
        the identical end state.
        """
        import shutil

        t0 = time.monotonic()
        if self._attr_cols:
            batch = batch.withColumns(self._attr_cols)
        extra_cols = [c for c in batch.columns if c not in _CORE_COLS]
        mor = self.table.snapshot().get("merge_mode", "cow") == "mor"

        # NOT persisted: each consumer re-reads the (columnar, pruned,
        # codegen'd) parquet scan — measured cheaper and far lighter on GC
        # than materializing a deserialized 1M-row object cache
        routed = ops.with_pre_route(batch, self.settings, self.cfg.fmt).withColumn(
            "route",
            F.when(F.col("pre_error") == ops.ERR_OVERSIZE, F.lit(ops.ROUTE_OVERSIZE))
            .when(F.col("pre_error").isNotNull(), F.lit(ops.ROUTE_FAILURE))
            .otherwise(F.lit(ops.ROUTE_SUCCESS)),
        )

        from pyspark.sql import Observation

        obs = Observation(f"routes-{batch_id}-{uuid.uuid4().hex[:6]}")
        route_metrics = [
            F.count(F.lit(1)).alias("n_events"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
            F.sum(F.when(F.col("route") == ops.ROUTE_SUCCESS, 1).otherwise(0)).alias("n_success"),
            F.sum(F.when(F.col("route") == ops.ROUTE_FAILURE, 1).otherwise(0)).alias("n_failure"),
            F.sum(F.when(F.col("route") == ops.ROUTE_OVERSIZE, 1).otherwise(0)).alias("n_oversize"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_delete"),
            F.approx_count_distinct("doc_id").alias("n_keys_approx"),
        ]
        dlq_batch_dir = os.path.join(self.cfg.dlq_path, f"batch_id={batch_id}")
        shutil.rmtree(dlq_batch_dir, ignore_errors=True)
        lineage_parts = _file_lineage(batch)
        t_lineage = time.monotonic()

        if mor:
            do_dedup = self.cfg.dedup_mode == "always" or (
                self.cfg.dedup_mode == "auto"
                and (self._last_amp is None or self._last_amp >= self.cfg.dedup_min_amplification)
            )
            wk = None
            if do_dedup:
                # job 1 (NARROW): winner keys = max(lsn) per key over valid
                # events. Column-pruned scan — the route gate never
                # references `tokens` — so the dominant-width column is not
                # decoded here.
                wk = (
                    routed.filter(F.col("route") == ops.ROUTE_SUCCESS)
                    .select("doc_id", "lsn")
                    .groupBy("doc_id")
                    .agg(F.max("lsn").alias("lsn"))
                    .persist()
                )
                n_keys = wk.count()
            t_dlq = time.monotonic()  # narrow-pass timing (cow: dlq job)
            try:
                # the only WIDE pass: every event is scanned once; bad rows
                # (and, when deduping, only the latest-wins winners) flow
                # into encrypt + the fused route-partitioned write. Without
                # dedup the batch is fully map-only: zero shuffle, zero
                # broadcast — read-time latest-wins resolves supersessions.
                observed = routed.observe(obs, *route_metrics)
                if do_dedup:
                    wk_m = wk.withColumn("_w", F.lit(True))
                    wk_m = (
                        F.broadcast(wk_m)
                        if n_keys <= ops.broadcast_key_limit(self.spark)
                        else wk_m.hint("shuffle_hash")
                    )
                    marked = observed.join(wk_m, ["doc_id", "lsn"], "left")
                    keep = marked.filter(
                        (F.col("route") != ops.ROUTE_SUCCESS) | F.col("_w").isNotNull()
                    ).drop("_w", "pre_error", "route")
                else:
                    keep = observed.drop("pre_error", "route")
                enc = ops.encrypt_batch(keep, self.settings, self.cfg.fmt)
                mstats, sink_counts = self._sink_mor(enc, batch_id, extra_cols)
            finally:
                if wk is not None:
                    wk.unpersist()
            counts = obs.get
            n_events = int(counts["n_events"] or 0)
            if n_events == 0:
                return {"batch_id": batch_id, "n_events": 0, "noop": True}
            n_keys_approx = int(counts["n_keys_approx"] or 0)
            self._last_amp = n_events / max(1, n_keys_approx)
            sink_counts["dedup"] = do_dedup
            sink_counts["amplification_est"] = round(self._last_amp, 3)
            # rows in failure partitions = pre-gate bad + in-UDF failures
            pre_bad = int(counts["n_failure"] or 0) + int(counts["n_oversize"] or 0)
            sink_counts["n_udf_failure"] = max(0, sink_counts["n_fail_rows"] - pre_bad)
            sink_counts.pop("n_fail_rows", None)
        else:
            # COW path: pre-gate DLQ write job, then dedup → encrypt → MERGE
            observed = routed.observe(obs, *route_metrics)
            bad = (
                observed.filter(F.col("route") != ops.ROUTE_SUCCESS)
                .withColumnRenamed("pre_error", "error")
                .withColumn("ciphertext", F.lit(None).cast("binary"))
                .withColumn("mime_type", F.lit(None).cast("string"))
                .withColumn("_tombstone", F.lit(None).cast("boolean"))
                .select(*self._dlq_cols(extra_cols))
            )
            bad.write.mode("overwrite").parquet(os.path.join(dlq_batch_dir, "stage=pre"))
            counts = obs.get
            n_events = int(counts["n_events"] or 0)
            t_dlq = time.monotonic()
            if n_events == 0:
                return {"batch_id": batch_id, "n_events": 0, "noop": True}
            winners = ops.latest_wins_join(
                routed.filter(F.col("route") == ops.ROUTE_SUCCESS).drop("pre_error", "route"),
                broadcast_keys=int(counts["n_success"] or 0) <= ops.broadcast_key_limit(self.spark),
            )
            enc = ops.encrypt_batch(winners, self.settings, self.cfg.fmt)
            mstats, sink_counts = self._sink_cow(enc, batch_id, extra_cols)
        t_sink = time.monotonic()

        compacted = False
        if not mstats.get("noop"):
            if self.cfg.compact_every:
                do_compact = (batch_id + 1) % self.cfg.compact_every == 0
            elif self.cfg.compact_delta_ratio is not None:
                # ratio-driven (default): both signals are manifest-list
                # arithmetic — no file I/O, no Spark job, on the no-compact
                # path this costs one snapshot JSON read
                do_compact = (
                    self.table.delta_rows() >= self.cfg.compact_min_delta_rows
                    and self.table.delta_ratio() >= self.cfg.compact_delta_ratio
                )
            else:
                do_compact = False
            if do_compact:
                cstats = self.table.compact()
                compacted = not cstats.get("noop")
                if compacted:
                    mstats = {**mstats, "version": cstats["version"]}

        dt = time.monotonic() - t0
        audit = {
            "batch_id": batch_id,
            "app_id": self.cfg.app_id,
            "config_fingerprint": self.settings.fingerprint(),
            "fmt": self.cfg.fmt,
            "n_events": n_events,
            "min_lsn": int(counts["min_lsn"]),
            "max_lsn": int(counts["max_lsn"]),
            "n_success": int(counts["n_success"] or 0),
            "n_failure": int(counts["n_failure"] or 0),
            "n_oversize": int(counts["n_oversize"] or 0),
            "n_delete": int(counts["n_delete"] or 0),
            **sink_counts,
            "snapshot_version": mstats["version"],
            "merge_noop": bool(mstats.get("noop")),
            "compacted": compacted,
            # per-phase wall attribution (scaling forensics): which phase
            # fails to shrink with executor count is the next bottleneck
            "phase_s": {
                "lineage": round(t_lineage - t0, 3),
                # mor: the narrow winner-keys job; cow: the pre-gate DLQ job
                "narrow_or_dlq": round(t_dlq - t_lineage, 3),
                "sink": round(t_sink - t_dlq, 3),
                "compact": round(time.monotonic() - t_sink, 3),
            },
            "duration_s": round(dt, 4),
            "events_per_sec": round(n_events / dt, 2) if dt > 0 else None,
            "partitions": lineage_parts,
        }
        os.makedirs(self.cfg.audit_path, exist_ok=True)
        _atomic_write(
            os.path.join(self.cfg.audit_path, f"batch-{batch_id:010d}.json"), json.dumps(audit)
        )
        return audit

    def _sink_mor(self, enc: DataFrame, batch_id: int, extra_cols: list[str]):
        """The fused sink write: encrypted winners + failed events → ONE
        parquet write partitioned by route. success → adopted as MOR delta
        files (pure-metadata commit, no second job); failure routes
        (pre-gate and in-UDF alike, with original content) → moved into the
        batch's DLQ dir. Plaintext token arrays are nulled on success rows —
        lake files never store plaintext."""
        import shutil

        from pyspark.sql import Observation
        from pyspark.sql import types as T

        lake_cols = ["doc_id", "lsn", "ciphertext", "mime_type", "n_tok", "source", *extra_cols]
        is_fail = F.col("route") != ops.ROUTE_SUCCESS
        out = (
            enc.withColumn("_tombstone", (~is_fail) & (F.col("op") == "D"))
            .withColumn("tokens", F.when(is_fail, F.col("tokens")))
            .withColumn("kas_url", F.when(is_fail, F.col("kas_url")))
            .withColumn("tdf_attribute", F.when(is_fail, F.col("tdf_attribute")))
            .withColumn("assertions", F.when(is_fail, F.col("assertions")))
            .select(*self._dlq_cols(extra_cols), "route")
        )
        obs = Observation(f"sink-{batch_id}-{uuid.uuid4().hex[:6]}")
        out = out.observe(
            obs,
            F.count(F.lit(1)).alias("n_out"),
            F.sum(F.when(F.col("route") != ops.ROUTE_SUCCESS, 1).otherwise(0)).alias("n_fail_rows"),
            F.sum(F.when(F.col("_tombstone"), 1).otherwise(0)).alias("n_del"),
        )
        staging = os.path.join(self.cfg.root, f"_ingest-{batch_id:010d}")
        shutil.rmtree(staging, ignore_errors=True)
        t_w0 = time.monotonic()
        out.write.partitionBy("route").mode("overwrite").parquet(staging)
        t_w1 = time.monotonic()
        c = obs.get
        n_fail_rows = int(c["n_fail_rows"] or 0)
        sink_counts = {
            "n_winners": int(c["n_out"] or 0) - n_fail_rows,
            "n_fail_rows": n_fail_rows,
            "n_delete_winners": int(c["n_del"] or 0),
            "sink_write_s": round(t_w1 - t_w0, 3),
        }

        # failure routes → DLQ, original content kept
        dlq_dir = os.path.join(self.cfg.dlq_path, f"batch_id={batch_id}")
        for name in sorted(os.listdir(staging)):
            if name.startswith("route=") and name != f"route={ops.ROUTE_SUCCESS}":
                os.makedirs(dlq_dir, exist_ok=True)
                for fname in sorted(os.listdir(os.path.join(staging, name))):
                    if fname.endswith(".parquet"):
                        os.replace(
                            os.path.join(staging, name, fname),
                            os.path.join(dlq_dir, f"{name[len('route='):]}-{fname}"),
                        )

        succ_dir = os.path.join(staging, f"route={ops.ROUTE_SUCCESS}")
        batch_schema = T.StructType([out.schema[cn] for cn in lake_cols])
        if os.path.isdir(succ_dir):
            mstats = self.table.commit_staged(
                succ_dir,
                batch_id=batch_id,
                app_id=self.cfg.app_id,
                batch_schema=batch_schema,
                extra_summary={"n_deletes": sink_counts["n_delete_winners"]},
            )
        else:
            mstats = {"version": self.table.current_version(), "noop": True, "reason": "no winners"}
        shutil.rmtree(staging, ignore_errors=True)
        sink_counts["sink_commit_s"] = round(time.monotonic() - t_w1, 3)
        return mstats, sink_counts

    def _sink_cow(self, enc: DataFrame, batch_id: int, extra_cols: list[str]):
        """Copy-on-write sink: persist the (small) encrypted winner set —
        the COW merge traverses its input several times (key stats, union,
        write) and must not recompute the dedup shuffle + crypto — write
        in-UDF failures to DLQ stage=udf, then MERGE."""
        from pyspark.sql import Observation

        enc_slim = (
            enc.withColumn("_tombstone", F.lit(None).cast("boolean"))
            .select(*self._dlq_cols(extra_cols), "route")
            .persist()
        )
        try:
            obs = Observation(f"udfbad-{batch_id}-{uuid.uuid4().hex[:6]}")
            udf_bad = enc_slim.filter(F.col("route") != ops.ROUTE_SUCCESS).drop("route")
            udf_bad = udf_bad.observe(obs, F.count(F.lit(1)).alias("n_udf_failure"))
            udf_bad.write.mode("overwrite").parquet(
                os.path.join(self.cfg.dlq_path, f"batch_id={batch_id}", "stage=udf")
            )
            n_udf_failure = int(obs.get["n_udf_failure"] or 0)
            good = enc_slim.filter(F.col("route") == ops.ROUTE_SUCCESS).select(
                "op", "doc_id", "lsn", "ciphertext", "mime_type", "n_tok", "source", *extra_cols
            )
            mstats = self.table.merge(
                good,
                batch_id=batch_id,
                app_id=self.cfg.app_id,
                extra_summary={"n_udf_failure": n_udf_failure},
            )
        finally:
            enc_slim.unpersist()
        return mstats, {"n_udf_failure": n_udf_failure}


    def _read_source(self, *paths: str):
        """Batch read of WAL segments in the configured source format."""
        return (
            self.spark.read.schema(self.cfg.binlog_schema)
            .format(self.cfg.source_format)
            .load(list(paths) if len(paths) > 1 else paths[0])
        )

    # ------------------------------------------------------------- streaming

    def run_stream(
        self,
        binlog_dir: str,
        *,
        available_now: bool = True,
        fail_after: int | None = None,
        fail_point: str = "before",
    ):
        """Tail the binlog directory as a Structured Streaming source.

        ``available_now=True`` drains everything currently available in
        micro-batches of ``max_files_per_trigger`` files and stops —
        checkpointed, so a later call resumes where this one left off.

        ``fail_after=k`` injects a crash at batch k (resume tests):
        ``fail_point='before'`` crashes before any side effect;
        ``'after'`` crashes *after* the merge commit but before the
        checkpoint advances — the re-delivered batch must then be fenced
        to a no-op for exactly-once to hold.
        """
        seen = {"n": 0}

        def _sink(df: DataFrame, batch_id: int) -> None:
            if fail_after is not None and seen["n"] >= fail_after and fail_point == "before":
                raise RuntimeError("injected crash for resume test")
            self.process_batch(df, batch_id)
            seen["n"] += 1
            if fail_after is not None and seen["n"] > fail_after and fail_point == "after":
                raise RuntimeError("injected crash after commit for resume test")

        stream = (
            self.spark.readStream.schema(self.cfg.binlog_schema)
            .option("maxFilesPerTrigger", self.cfg.max_files_per_trigger)
            .format(self.cfg.source_format)
            .load(binlog_dir)
        )
        writer = (
            stream.writeStream.foreachBatch(_sink)
            .option("checkpointLocation", self.cfg.checkpoint_path)
            .trigger(availableNow=available_now)
        )
        q = writer.start()
        try:
            q.awaitTermination()
        except Exception:
            q.stop()
            raise
        return q

    def replay_batch_mode(self, binlog_dir: str, *, batch_id: int = 0) -> dict:
        """Whole-directory replay as one maximal-parallelism batch (bench path)."""
        df = self._read_source(binlog_dir)
        return self.process_batch(df, batch_id)

    def replay_in_batches(self, binlog_dir: str, n_batches: int = 4) -> list[dict]:
        """Replay the binlog directory as ``n_batches`` sequential micro-
        batches of whole files (LSN-ordered), without streaming-checkpoint
        overhead — the bench path for *sustained* throughput: batch 0 also
        absorbs residual session warm-up, batches 1.. are steady state."""
        ext = ".parquet" if self.cfg.source_format == "parquet" else ""
        files = sorted(
            f for f in os.listdir(binlog_dir)
            if f.endswith(ext) and not f.startswith("_") and not f.startswith(".")
        )
        per = max(1, -(-len(files) // n_batches))  # ceil: no runt trailing batch
        audits = []
        for bid, i in enumerate(range(0, len(files), per)):
            group = [os.path.join(binlog_dir, f) for f in files[i : i + per]]
            df = self._read_source(*group)
            audits.append(self.process_batch(df, bid))
        return audits

    # ------------------------------------------------------------ verify/obs

    def audit_df(self) -> DataFrame:
        return self.spark.read.json(os.path.join(self.cfg.audit_path, "batch-*.json"))

    def verify_roundtrip(self, binlog_dir: str) -> dict:
        """The correctness invariant (BASELINE.json metric): decrypt the final
        table state and compare token arrays against a latest-wins replay of
        the binlog computed independently in Spark. Returns mismatch counts
        (all zeros = pass)."""
        state = ops.decrypt_batch(self.table.read(), self.settings, self.cfg.fmt)
        log = self._read_source(binlog_dir)
        ok = log.filter((F.col("op") == "D") | F.col("tdf_attribute").isNotNull())
        expected = ops.latest_wins(ok).filter(F.col("op") != "D")
        joined = state.alias("s").join(
            expected.alias("e"), F.col("s.doc_id") == F.col("e.doc_id"), "full_outer"
        )
        agg = joined.agg(
            F.sum(F.when(F.col("e.doc_id").isNull(), 1).otherwise(0)).alias("unexpected_rows"),
            F.sum(F.when(F.col("s.doc_id").isNull(), 1).otherwise(0)).alias("missing_rows"),
            F.sum(F.when(F.col("s.decrypt_error").isNotNull(), 1).otherwise(0)).alias("decrypt_failures"),
            F.sum(
                F.when(
                    F.col("s.doc_id").isNotNull()
                    & F.col("e.doc_id").isNotNull()
                    & (F.col("s.tokens_out") != F.col("e.tokens")),
                    1,
                ).otherwise(0)
            ).alias("token_mismatches"),
            F.sum(F.when(F.col("s.lsn") != F.col("e.lsn"), 1).otherwise(0)).alias("lsn_mismatches"),
            F.count("*").alias("compared"),
        ).collect()[0]
        return {k: (int(v) if v is not None else 0) for k, v in agg.asDict().items()}
