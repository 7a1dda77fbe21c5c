"""One CDC replay run, launched via spark-submit (master from the CLI):

    spark-submit --master local[N] --py-files ztdf_spark.zip \
        bench/replay_once.py --binlog <dir> [--verify]

Prints one JSON line: {"cores", "n_events", "wall_s", "events_per_sec", ...}.
Steady-state measurement: the timed region excludes session startup and
binlog generation (BASELINE.md measurement protocol).
"""

import argparse
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
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ztdf-replay").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    from ztdf_spark.pipeline import CdcPipeline, PipelineConfig
    from ztdf_spark.settings import Settings

    workdir = tempfile.mkdtemp(prefix="ztdf-replay-")
    try:
        cfg = PipelineConfig(root=workdir, target_file_rows=args.target_file_rows)
        pipe = CdcPipeline(spark, Settings(), cfg)
        df = spark.read.schema(cfg.binlog_schema).parquet(args.binlog)

        t0 = time.monotonic()
        audit = pipe.process_batch(df, batch_id=0)
        wall = time.monotonic() - t0

        out = {
            "cores": cores,
            "n_events": audit["n_events"],
            "wall_s": round(wall, 3),
            "events_per_sec": round(audit["n_events"] / wall, 1),
            "n_success": audit["n_success"],
            "n_failure": audit["n_failure"],
            "snapshot_version": audit["snapshot_version"],
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
