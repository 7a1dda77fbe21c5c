"""Benchmark harness (driver-run per round; also the local feedback loop).

Headline: full CDC replay (binlog → vectorized ZTDF encrypt → route →
latest-wins MERGE into the lake table) measured in events/sec, plus the
per-query wall times for the oracle-checked operator set.

Prints ONE JSON line:
  {"metric": "...", "value": <sec>, "unit": "sec", "queries": {...}, "sf": ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     (default 32)
  ZTDF_BENCH_EVENTS    (default 1_000_000 CDC events)
  ZTDF_BENCH_SKIP_QUERIES=1  to run only the replay
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("ztdf-bench")
        .config("spark.sql.shuffle.partitions", str(max(cores * 2, 16)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("ZTDF_BENCH_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # WAL segments are small files: keep scan partitions ≈ input files so
        # the UDF stage is parallelism-bound, not file-packing-bound
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.files.openCostInBytes", "131072")
        .getOrCreate()
    )


def ensure_binlog(n_events: int, n_files: int, seed: int = 42, n_docs: int | None = None) -> str:
    """Seeded binlog, cached across runs keyed by its spec (both parallelism
    levels must read byte-identical input)."""
    from ztdf_spark.datagen import BinlogSpec, write_binlog

    n_docs = n_docs or max(1000, n_events // 20)
    d = os.path.join(
        tempfile.gettempdir(), f"ztdf-bench-binlog-{n_events}-{n_files}-{seed}-{n_docs}"
    )
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(d, ignore_errors=True)
        spec = BinlogSpec(
            n_events=n_events,
            n_docs=n_docs,
            n_files=n_files,
            seed=seed,
        )
        write_binlog(d, spec)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def run_replay(spark, binlog_dir: str, workdir: str) -> dict:
    from ztdf_spark.pipeline import CdcPipeline, PipelineConfig, warm_python_workers
    from ztdf_spark.settings import Settings

    cfg = PipelineConfig(root=workdir, target_file_rows=1_000_000)
    pipe = CdcPipeline(spark, Settings(), cfg)
    # sustained-throughput protocol (BASELINE.md): populate the Python
    # worker pool, replay as sequential micro-batches, measure steady state
    # (batch 0 absorbs residual warm-up and is reported separately)
    warm_python_workers(spark)
    t0 = time.monotonic()
    audits = pipe.replay_in_batches(binlog_dir, n_batches=4)
    wall = time.monotonic() - t0
    n_total = sum(a["n_events"] for a in audits)
    steady = audits[1:] if len(audits) > 1 else audits
    steady_events = sum(a["n_events"] for a in steady)
    steady_wall = sum(a["duration_s"] for a in steady)
    return {
        "n_events": n_total,
        "wall_s": round(wall, 3),
        "events_per_sec": round(n_total / wall, 1),
        "steady_events_per_sec": round(steady_events / steady_wall, 1) if steady_wall else None,
        "batch_wall_s": [a["duration_s"] for a in audits],
        "snapshot_version": audits[-1]["snapshot_version"],
    }


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_events = int(os.environ.get("ZTDF_BENCH_EVENTS", "1000000"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else None

    binlog = ensure_binlog(n_events, n_files=max(128, cores * 4))
    spark = build_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")

    workdir = tempfile.mkdtemp(prefix="ztdf-bench-")
    try:
        replay = run_replay(spark, binlog, workdir)

        queries = {}
        if os.environ.get("ZTDF_BENCH_SKIP_QUERIES") != "1":
            import __spark_entry__ as entrymod

            for name, fn in entrymod.queries().items():
                # steady-state timing, same rationale as the replay's
                # median-steady-batch: first execution pays codegen/JIT and
                # this VM's sporadic multi-second stalls (observed 6x
                # outliers); min-of-2 is the sustained per-query cost
                try:
                    runs = []
                    for _ in range(2):
                        t0 = time.monotonic()
                        fn(spark, sf_dir).collect()
                        runs.append(time.monotonic() - t0)
                    queries[name] = round(min(runs), 3)
                except Exception as e:
                    queries[name] = f"error: {e}"
        queries["cdc_replay"] = replay["wall_s"]

        out = {
            "metric": "cdc_replay_wall_sec",
            "value": replay["wall_s"],
            "unit": "sec",
            "queries": queries,
            "query_timing": "min of 2 runs (steady-state; see bench.py)",
            "sf": sf,
            "replay": replay,
            "cores": cores,
            "n_events": n_events,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
