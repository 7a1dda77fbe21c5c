"""Micro-bench: MOR full-table read cost vs delta size at FIXED table size
(VERDICT r4 next-round #1 'done' evidence).

Builds one compacted base table, then for each delta size d: copies the
table, merges d fresh change rows, and times
  - read()            — the delta-pruned path (winner aggregate confined
                        to delta-touched keys, base rows anti-joined)
  - full winner recon — the round-4 shape (aggregate over the whole table
                        whenever >=1 delta file exists)
with the same count+xxhash64 checksum action (no driver collect).

Expectation: pruned read cost stays ~flat in d (scan-bound), while the
full reconstruction pays the O(table) narrow-key aggregate + wide join
regardless of d. Writes BENCH/read_pruned.json.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = int(os.environ.get("ZTDF_RP_BASE", "2000000"))
DELTAS = [int(x) for x in os.environ.get("ZTDF_RP_DELTAS", "1000,10000,100000").split(",")]
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))


def checksum_time(df) -> float:
    from pyspark.sql import functions as F

    t0 = time.monotonic()
    df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(F.struct(*df.columns))).alias("c"),
    ).collect()
    return round(time.monotonic() - t0, 3)


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ztdf_spark.lake import LakeTable, _TOMBSTONE

    spark = (
        SparkSession.builder.master(f"local[{CORES}]")
        .config("spark.sql.shuffle.partitions", str(CORES * 2))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="ztdf-readbench-")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    base_path = os.path.join(root, "base")
    t = LakeTable.create(
        spark, base_path, schema, key_col="doc_id", seq_col="lsn",
        merge_mode="mor", target_file_rows=100_000,
    )
    rows = spark.range(N_BASE).select(
        F.lit("I").alias("op"),
        F.format_string("doc-%09d", F.col("id")).alias("doc_id"),
        F.col("id").alias("lsn"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    t.merge(rows, batch_id=0)
    t.compact()

    results = []
    for d in DELTAS:
        path = os.path.join(root, f"d{d}")
        shutil.copytree(base_path, path)
        td = LakeTable.load(spark, path)
        delta = spark.range(d).select(
            F.lit("U").alias("op"),
            # spread touched keys across the whole key space (worst case
            # for file pruning: every base file range is hit)
            F.format_string("doc-%09d", (F.col("id") * (N_BASE // max(d, 1))) % N_BASE).alias("doc_id"),
            (F.col("id") + N_BASE * 10).alias("lsn"),
            F.lit("updated").alias("payload"),
        )
        td.merge(delta, batch_id=1)
        snap = td.snapshot()
        pruned = [checksum_time(td.read()) for _ in range(2)]
        full_df = td._winners_df(snap).filter(
            ~F.coalesce(F.col(_TOMBSTONE), F.lit(False))
        ).select("doc_id", "lsn", "payload")
        full = [checksum_time(full_df) for _ in range(2)]
        results.append(
            {
                "delta_rows": d,
                "pruned_read_s": min(pruned),
                "pruned_runs": pruned,
                "full_recon_s": min(full),
                "full_runs": full,
            }
        )
        print(json.dumps(results[-1]))
        shutil.rmtree(path, ignore_errors=True)

    out = {
        "n_base_rows": N_BASE,
        "cores": CORES,
        "results": results,
        "note": (
            "pruned = LakeTable.read() delta-pruned path; full = round-4 "
            "whole-table winner reconstruction on the same snapshot; min of "
            "2 runs each, both disclosed; checksum action, no collect"
        ),
    }
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "read_pruned.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": "BENCH/read_pruned.json", **out}))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
