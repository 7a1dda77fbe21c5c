"""Micro-bench: minor compaction cost tracks DELTA size, full compaction
cost tracks TABLE size (the compact_deltas 'O(folded-delta), base never
read' claim).

For each base-table size: build a compacted MOR table, land K small delta
commits (fixed total delta rows across all sizes), then time
  - compact_deltas()  — fold the small delta files (minor)
  - compact()         — the full O(table) rewrite, on a fresh copy with
                        the SAME deltas

Expectation: minor wall stays ~flat as the base grows; full wall grows
with the base. Writes BENCH/minor_compact.json.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASES = [int(x) for x in os.environ.get("ZTDF_MC_BASES", "500000,2000000").split(",")]
N_DELTA_COMMITS = int(os.environ.get("ZTDF_MC_COMMITS", "16"))
DELTA_ROWS = int(os.environ.get("ZTDF_MC_DELTA_ROWS", "2000"))  # per commit
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ztdf_spark.lake import LakeTable

    spark = (
        SparkSession.builder.master(f"local[{CORES}]")
        .config("spark.sql.shuffle.partitions", str(CORES * 2))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ztdf-minorbench-")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )

    def build(n_base: int, path: str) -> LakeTable:
        t = LakeTable.create(
            spark, path, schema, key_col="doc_id", seq_col="lsn",
            merge_mode="mor", target_file_rows=100_000,
        )
        rows = spark.range(n_base).select(
            F.lit("I").alias("op"),
            F.format_string("doc-%09d", F.col("id")).alias("doc_id"),
            F.col("id").alias("lsn"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        t.merge(rows, batch_id=0)
        t.compact()
        for b in range(N_DELTA_COMMITS):
            delta = spark.range(DELTA_ROWS).select(
                F.lit("U").alias("op"),
                F.format_string(
                    "doc-%09d",
                    (F.col("id") * (n_base // DELTA_ROWS) + b) % n_base,
                ).alias("doc_id"),
                (F.col("id") + n_base * 10 + b * DELTA_ROWS).alias("lsn"),
                F.lit("updated").alias("payload"),
            )
            t.merge(delta, batch_id=b + 1)
        return t

    results = []
    for n_base in BASES:
        p_minor = os.path.join(root, f"minor-{n_base}")
        t_minor = build(n_base, p_minor)
        p_full = os.path.join(root, f"full-{n_base}")
        shutil.copytree(p_minor, p_full)
        t_full = LakeTable.load(spark, p_full)

        n_delta_files = sum(1 for f in t_minor._files(t_minor.snapshot()) if f.get("delta"))
        t0 = time.monotonic()
        rm = t_minor.compact_deltas()
        minor_s = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        rf = t_full.compact()
        full_s = round(time.monotonic() - t0, 3)
        results.append(
            {
                "n_base_rows": n_base,
                "n_delta_commits": N_DELTA_COMMITS,
                "delta_rows_total": N_DELTA_COMMITS * DELTA_ROWS,
                "delta_files_before": n_delta_files,
                "minor_s": minor_s,
                "minor_files_removed": rm["files_removed"],
                "minor_files_added": rm["files_added"],
                "full_s": full_s,
                "full_files_added": rf["files_added"],
            }
        )
        print(json.dumps(results[-1]))
        shutil.rmtree(p_minor, ignore_errors=True)
        shutil.rmtree(p_full, ignore_errors=True)

    out = {
        "cores": CORES,
        "results": results,
        "note": (
            "same delta workload at every base size; minor = compact_deltas "
            "(folds small delta files, base untouched), full = compact() "
            "(whole-table winner rewrite); single timed run each — the "
            "CLAIM is the scaling SHAPE (minor ~flat in base size), not an "
            "absolute number on this noisy VM"
        ),
    }
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "minor_compact.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": "BENCH/minor_compact.json"}))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
