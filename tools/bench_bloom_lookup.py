"""Micro-bench: point-lookup file skipping from per-delta-file key Blooms
(create(bloom_delta_keys=True)) vs range-stats-only pruning.

Builds one compacted 2M-row base + 8 unclustered delta commits whose keys
are spread across the whole key space (every delta file's [min,max] range
overlaps every lookup → range pruning alone can never skip a delta file),
once with blooms and once without, then times read_keys() for a lookup set
whose keys live in at most one delta commit each. Also times the delta
merges themselves on both tables, disclosing the opt-in write-side cost of
building the blooms (one narrow key-column job per commit).

Expectation: the bloom table opens ~#base-matched + #hit-delta files while
the plain table opens every delta file; lookup wall drops accordingly, and
the merge overhead stays a small fraction of the commit.

Writes BENCH/bloom_lookup.json.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = int(os.environ.get("ZTDF_BL_BASE", "2000000"))
N_DELTA_COMMITS = int(os.environ.get("ZTDF_BL_COMMITS", "8"))
DELTA_ROWS = int(os.environ.get("ZTDF_BL_ROWS", "250000"))
N_LOOKUP = int(os.environ.get("ZTDF_BL_KEYS", "100"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
# odd multiplier ending the scatter far from any file-local range; must be
# coprime with N_BASE (2M = 2^7·5^6·... → any odd non-multiple-of-5 works)
_SCATTER_P = 999_983


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
    root = tempfile.mkdtemp(prefix="ztdf-bloombench-")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("payload", T.StringType()),
        ]
    )

    def build(name: str, bloom: bool) -> tuple:
        t = LakeTable.create(
            spark, os.path.join(root, name), schema, key_col="doc_id",
            seq_col="lsn", merge_mode="mor", target_file_rows=100_000,
            bloom_delta_keys=bloom,
        )
        rows = spark.range(N_BASE).select(
            F.lit("I").alias("op"),
            F.format_string("doc-%09d", F.col("id")).alias("doc_id"),
            F.col("id").alias("lsn"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        t.merge(rows, batch_id=0)
        t.compact()
        merge_walls = []
        for c in range(N_DELTA_COMMITS):
            # multiplicative scatter (P coprime with N_BASE): consecutive ids
            # land ~P apart and wrap many times, so EVERY delta file's
            # [min,max] range spans ~the whole key space — range stats can
            # never skip a delta file, only the bloom can. The +c offset
            # keeps commits (near-)disjoint so the lookup keys live in
            # commit 1's files and are misses everywhere else.
            delta = spark.range(DELTA_ROWS).select(
                F.lit("U").alias("op"),
                F.format_string(
                    "doc-%09d",
                    (F.col("id") * _SCATTER_P + c) % N_BASE,
                ).alias("doc_id"),
                (F.col("id") + N_BASE * (10 + c)).alias("lsn"),
                F.lit(f"updated-{c}").alias("payload"),
            )
            t0 = time.monotonic()
            t.merge(delta, batch_id=c + 1)
            merge_walls.append(round(time.monotonic() - t0, 3))
        return t, merge_walls

    t_bloom, walls_bloom = build("bloomed", True)
    t_plain, walls_plain = build("plain", False)

    # lookup keys: the first N_LOOKUP keys of delta commit 1 — present in
    # that commit's files only; every other commit's delta files are
    # bloom-skippable misses that range stats cannot skip.
    keys = [f"doc-{(i * _SCATTER_P + 1) % N_BASE:09d}" for i in range(N_LOOKUP)]

    def lookup(t) -> dict:
        from ztdf_spark import bloom as B

        # file counts from the SAME pruning sequence read_keys runs
        # (inputFiles() under-reports after AQE plan rewrites)
        snap = t.snapshot()
        wanted = spark.createDataFrame([(k,) for k in keys], "doc_id string")
        matched = t._matched_files(snap, wanted, "doc_id")
        if snap.get("bloom_delta_keys"):
            matched = B.probe_entries(matched, keys)
        runs, n_rows = [], None
        for _ in range(2):
            t0 = time.monotonic()
            df = t.read_keys(keys)
            n_rows = df.count()
            runs.append(round(time.monotonic() - t0, 3))
        return {
            "runs": runs,
            "best_s": min(runs),
            "files_read": len(matched),
            "delta_files_read": sum(1 for e in matched if e.get("delta")),
            "delta_rows_read": sum(e["rows"] for e in matched if e.get("delta")),
            "rows": n_rows,
        }

    res_bloom = lookup(t_bloom)
    res_plain = lookup(t_plain)
    assert res_bloom["rows"] == res_plain["rows"] == N_LOOKUP, (res_bloom, res_plain)

    out = {
        "n_base_rows": N_BASE,
        "n_delta_commits": N_DELTA_COMMITS,
        "delta_rows_per_commit": DELTA_ROWS,
        "n_lookup_keys": N_LOOKUP,
        "cores": CORES,
        "bloom": res_bloom,
        "no_bloom": res_plain,
        "merge_walls_bloom_s": walls_bloom,
        "merge_walls_plain_s": walls_plain,
        "note": (
            "lookup keys hit exactly one delta commit; all per-commit delta "
            "file ranges overlap the whole key space, so files_read on the "
            "no-bloom table counts every delta file while the bloom table "
            "skips the misses. merge_walls disclose the opt-in write cost "
            "(one narrow key-column job per commit). min of 2 lookup runs, "
            "both disclosed; identical row counts asserted."
        ),
    }
    bench_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH")
    os.makedirs(bench_dir, exist_ok=True)
    with open(os.path.join(bench_dir, "bloom_lookup.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"wrote": "BENCH/bloom_lookup.json", **out}))
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
