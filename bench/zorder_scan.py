"""Pruning evidence for z-order clustering (lake.compact(zorder_by=...) +
read_where): files read and wall time for secondary-column band scans under
(a) the default key-clustered compaction layout — per-file n_tok ranges are
random, nothing prunes — vs (b) the z-ordered layout, at two band widths
and on BOTH clustered dimensions.

The 100 TB claim being evidenced: file-level pruning is driver-side
metadata (O(#files)), and the fraction of files read under z-order tracks
the band's selectivity in each clustered dimension — on a 1000-executor
table the same scan touches ~selectivity x files instead of all of them,
independent of table size. Wall time at this small scale mostly measures
fixed scheduling, so files_read is the headline number.

Writes BENCH/zorder_scan.json.

Usage: python bench/zorder_scan.py  (local[SPARK_GRAFT_CPUS], ~2 min)
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 2_000_000
TARGET_FILE_ROWS = 50_000  # ~40 files


def main():
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from ztdf_spark.lake import LakeTable

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("n_tok", T.LongType()),
            T.StructField("source", T.StringType()),
        ]
    )
    rng = random.Random(23)
    rows = [
        ("U", f"doc-{i:08d}", rng.randrange(10**9), rng.randrange(100_000), "web")
        for i in range(N_ROWS)
    ]
    df = spark.createDataFrame(
        rows, "op string, doc_id string, lsn long, n_tok long, source string"
    ).cache()
    df.count()

    out: dict = {"n_rows": N_ROWS, "target_file_rows": TARGET_FILE_ROWS, "layouts": {}}
    # bands: (col, lo, hi, selectivity label)
    bands = [
        ("n_tok", 10_000, 12_000, "2pct"),
        ("n_tok", 10_000, 30_000, "20pct"),
        ("lsn", 0, 20_000_000, "2pct"),
    ]
    for layout in ("key_clustered", "zorder"):
        root = f"/tmp/ztdf-zorder-bench-{layout}"
        shutil.rmtree(root, ignore_errors=True)
        t = LakeTable.create(
            spark, os.path.join(root, "t"), schema, key_col="doc_id", seq_col="lsn",
            merge_mode="mor", target_file_rows=TARGET_FILE_ROWS,
        )
        t.merge(df, batch_id=0)
        t0 = time.monotonic()
        if layout == "zorder":
            t.compact(zorder_by=["lsn", "n_tok"])
        else:
            # stats recorded but key-clustered: per-file secondary ranges
            # are ~full-width, so the A/B isolates LAYOUT, not stats
            # availability
            t.compact(stat_cols=["lsn", "n_tok"])
        compact_s = time.monotonic() - t0
        t = LakeTable.load(spark, t.path)
        entry: dict = {"compact_s": round(compact_s, 2), "bands": {}}
        for col, lo, hi, label in bands:
            st = t.scan_stats(col, lo, hi)
            t0 = time.monotonic()
            n = t.read_where(col, lo, hi).count()
            wall = time.monotonic() - t0
            entry["bands"][f"{col}_{label}"] = {
                "files_total": st["files_total"],
                "files_read": st["files_read"],
                "rows_scanned": st["rows_scanned"],
                "result_rows": n,
                "wall_s": round(wall, 2),
            }
        out["layouts"][layout] = entry
        print(layout, json.dumps(entry))

    dst = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "zorder_scan.json")
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", dst)
    spark.stop()


if __name__ == "__main__":
    main()
