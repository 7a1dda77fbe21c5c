"""10x-scale single-node evidence run (VERDICT r2 next-round #7): replay
10M change events (10x the per-round bench) at local[32] via
spark-submit --py-files, with the engine's DEFAULT ratio-driven compaction
active, and record that

- per-batch phase wall stays batch-proportional (MOR's O(batch) merge
  claim demonstrated at 10x data, not just argued), and
- delta accumulation is bounded by the auto-compaction policy (the
  compaction batches are disclosed, with their cost attributed).

Two runs, one JSON (BENCH/scale10x.json):

- ``auto``  — the default config. At this workload's measured update
  amplification (~2.5-3 events/key) adaptive dedup keeps only winners in
  the deltas, so total delta rows stay UNDER the 4M compaction floor:
  the policy correctly does nothing.
- ``never`` — shuffle-free map-only ingest (the unattended worst case for
  delta accumulation): every event lands as a delta row, the 4M floor is
  crossed mid-replay, and ratio-driven compaction fires — its per-batch
  cost is visible in that batch's wall/phase row.

    python bench/scale10x.py [--events 10000000] [--batches 8]
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SPARK_SUBMIT = os.environ.get("SPARK_SUBMIT", "/opt/spark/bin/spark-submit")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    import importlib

    bench = importlib.import_module("bench")
    from scaling import build_zip  # noqa: E402  (bench/ on sys.path via __main__)

    sys.path.insert(0, os.path.join(REPO, "bench"))
    binlog = bench.ensure_binlog(args.events, n_files=256, n_docs=args.events // 20)
    zpath = build_zip()

    env = dict(os.environ)
    env["PYSPARK_PYTHON"] = sys.executable
    work_base = "/dev/shm/ztdf" if os.path.isdir("/dev/shm") else None
    if work_base:
        os.makedirs(work_base, exist_ok=True)
        env["ZTDF_WORK_BASE"] = work_base

    def run(dedup_mode: str) -> dict:
        cmd = [
            SPARK_SUBMIT,
            "--master", f"local[{args.cores}]",
            "--driver-memory", "48g",
            "--driver-java-options", "-Xms40g -XX:+UseParallelGC",
        ] + (["--conf", f"spark.local.dir={work_base}/spark-local"] if work_base else []) + [
            "--conf", f"spark.sql.shuffle.partitions={args.cores * 2}",
            "--conf", "spark.sql.adaptive.enabled=true",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.sql.files.maxPartitionBytes=16m",
            "--conf", "spark.sql.files.openCostInBytes=131072",
            "--conf", "spark.sql.execution.arrow.maxRecordsPerBatch=10000",
            "--py-files", zpath,
            os.path.join(REPO, "bench", "replay_once.py"),
            "--binlog", binlog,
            "--batches", str(args.batches),
            "--dedup-mode", dedup_mode,
            "--compact", "ratio",
            "--verify",
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
        with open(f"/tmp/ztdf-scale10x-{dedup_mode}.err", "w") as f:
            f.write(out.stderr)
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                return json.loads(line)
        raise RuntimeError(
            f"no JSON from spark-submit (rc={out.returncode}); see /tmp/ztdf-scale10x-{dedup_mode}.err"
        )

    result = {
        "protocol": {
            "events": args.events,
            "batches": args.batches,
            "master": f"local[{args.cores}]",
            "compaction": "ratio-driven default (delta_ratio>=0.5, >=4M delta rows)",
            "note": "10x the per-round bench volume; same seeded generator; "
                    "'auto' = default adaptive dedup (deltas stay under the floor → no compaction needed); "
                    "'never' = map-only ingest worst case (floor crossed → compaction fires mid-replay)",
        },
        "runs": {},
    }
    for mode in ("auto", "never"):
        r = run(mode)
        result["runs"][mode] = r
        print(json.dumps({
            "dedup_mode": mode,
            "steady_events_per_sec": r["steady_events_per_sec"],
            "batch_wall_s": r["batch_wall_s"],
            "compacted_batches": r["compacted_batches"],
            "final_delta_ratio": r["final_delta_ratio"],
            "verify_pass": r.get("verify_pass"),
        }))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scale10x.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
