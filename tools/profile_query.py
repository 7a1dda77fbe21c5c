"""Profile one declared query with the Spark event log enabled, then run
tools/evlog.py on the produced log for per-stage wall/CPU attribution.

Usage: python tools/profile_query.py <query> [--sf DIR] [--runs N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    evdir = "/tmp/ztdf-evlog"
    os.makedirs(evdir, exist_ok=True)
    from pyspark.sql import SparkSession

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"profile-{args.name}")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("ZTDF_BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "131072")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", evdir)
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    import __spark_entry__ as entrymod

    fn = entrymod.queries()[args.name]
    bench.canary_time(spark)
    t0 = time.monotonic()
    runs = bench.time_query(spark, fn, args.sf, n_runs=args.runs)
    print(f"{args.name}: runs={runs} wall={time.monotonic() - t0:.1f}")
    spark.stop()
    print(f"event log: {evdir}/{app_id}")


if __name__ == "__main__":
    main()
