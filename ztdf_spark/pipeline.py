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
    binlog_schema: str = field(default=BINLOG_DDL)

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
        )

    # ------------------------------------------------------------- one batch

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
        in the DLQ with its original content, and an invalid winner never
        shadows an older valid event (it is excluded before dedup).

        Idempotent: every side effect is keyed by ``batch_id`` (DLQ dir
        overwrite, merge fence, audit file overwrite), so foreachBatch
        re-execution after a crash replays to the identical end state.
        """
        t0 = time.monotonic()
        extra_cols = [c for c in batch.columns if c not in _CORE_COLS]

        # NOT persisted: each consumer re-reads the (columnar, pruned,
        # codegen'd) parquet scan — measured cheaper and far lighter on GC
        # than materializing a deserialized 1M-row object cache
        routed = ops.with_pre_route(batch, self.settings, self.cfg.fmt).withColumn(
            "route",
            F.when(F.col("pre_error") == ops.ERR_OVERSIZE, F.lit(ops.ROUTE_OVERSIZE))
            .when(F.col("pre_error").isNotNull(), F.lit(ops.ROUTE_FAILURE))
            .otherwise(F.lit(ops.ROUTE_SUCCESS)),
        )

        # Global route counts piggyback on the DLQ write via observe() —
        # no dedicated aggregation job. Per-source-file offset ranges come
        # from parquet footer metadata (driver-side, zero Spark jobs).
        from pyspark.sql import Observation

        obs = Observation(f"routes-{batch_id}")
        observed = routed.observe(
            obs,
            F.count(F.lit(1)).alias("n_events"),
            F.min("lsn").alias("min_lsn"),
            F.max("lsn").alias("max_lsn"),
            F.sum(F.when(F.col("route") == ops.ROUTE_SUCCESS, 1).otherwise(0)).alias("n_success"),
            F.sum(F.when(F.col("route") == ops.ROUTE_FAILURE, 1).otherwise(0)).alias("n_failure"),
            F.sum(F.when(F.col("route") == ops.ROUTE_OVERSIZE, 1).otherwise(0)).alias("n_oversize"),
            F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_delete"),
        )
        # DLQ: failure + oversize events, original content preserved
        bad = observed.filter(F.col("route") != ops.ROUTE_SUCCESS).withColumnRenamed(
            "pre_error", "error"
        )
        bad.write.mode("overwrite").parquet(os.path.join(self.cfg.dlq_path, f"batch_id={batch_id}"))
        counts = obs.get
        n_events = int(counts["n_events"] or 0)
        if n_events == 0:
            return {"batch_id": batch_id, "n_events": 0, "noop": True}
        lineage_parts = _file_lineage(batch)

        # latest-wins dedup of the valid events (narrow hash-agg winner
        # keys broadcast-joined back — wide rows never shuffle), THEN
        # encrypt only the winners
        winners = ops.latest_wins_join(
            routed.filter(F.col("route") == ops.ROUTE_SUCCESS).drop("pre_error", "route"),
            broadcast_keys=int(counts["n_success"] or 0) <= ops.broadcast_key_limit(self.spark),
        )
        enc = ops.encrypt_batch(winners, self.settings, self.cfg.fmt)
        # persist the (small) encrypted winner set: merge traverses its
        # input several times (key stats, COW union, write) and must not
        # recompute the dedup shuffle + crypto each time
        good = (
            enc.filter(F.col("route") == ops.ROUTE_SUCCESS)
            .select("op", "doc_id", "lsn", "ciphertext", "mime_type", "n_tok", "source", *extra_cols)
            .persist()
        )
        try:
            mstats = self.table.merge(good, batch_id=batch_id, app_id=self.cfg.app_id)
        finally:
            good.unpersist()

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
            "snapshot_version": mstats["version"],
            "merge_noop": bool(mstats.get("noop")),
            "duration_s": round(dt, 4),
            "events_per_sec": round(n_events / dt, 2) if dt > 0 else None,
            "partitions": lineage_parts,
        }
        os.makedirs(self.cfg.audit_path, exist_ok=True)
        _atomic_write(
            os.path.join(self.cfg.audit_path, f"batch-{batch_id:010d}.json"), json.dumps(audit)
        )
        return audit


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
            .parquet(binlog_dir)
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
        df = self.spark.read.schema(self.cfg.binlog_schema).parquet(binlog_dir)
        return self.process_batch(df, batch_id)

    def replay_in_batches(self, binlog_dir: str, n_batches: int = 4) -> list[dict]:
        """Replay the binlog directory as ``n_batches`` sequential micro-
        batches of whole files (LSN-ordered), without streaming-checkpoint
        overhead — the bench path for *sustained* throughput: batch 0 also
        absorbs residual session warm-up, batches 1.. are steady state."""
        files = sorted(
            f for f in os.listdir(binlog_dir) if f.endswith(".parquet")
        )
        per = max(1, len(files) // n_batches)
        audits = []
        for bid, i in enumerate(range(0, len(files), per)):
            group = [os.path.join(binlog_dir, f) for f in files[i : i + per]]
            df = self.spark.read.schema(self.cfg.binlog_schema).parquet(*group)
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
        log = self.spark.read.schema(self.cfg.binlog_schema).parquet(binlog_dir)
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
