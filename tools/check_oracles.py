"""Local replica of the driver's correctness gate: run each
__spark_entry__.queries()[name] on Spark and its oracle_sql()[name] on
DuckDB over the same sf dir; compare row count, column names, and an
order-insensitive value multiset. Usage:

    python tools/check_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df_pandas):
    import numpy as np

    cols = sorted(df_pandas.columns)
    rows = []
    for t in df_pandas[cols].itertuples(index=False, name=None):
        row = []
        for v in t:
            if v is None or (isinstance(v, float) and np.isnan(v)):
                row.append("NULL")
            elif isinstance(v, (list, tuple, np.ndarray)):
                row.append("[" + ",".join(str(x) for x in v) + "]")
            elif isinstance(v, (float, np.floating)):
                row.append(f"{float(v):.9g}")
            elif isinstance(v, (np.integer,)):
                row.append(str(int(v)))
            else:
                row.append(str(v))
        rows.append(tuple(row))
    return cols, sorted(rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(sdf)} rows (rows-only, no oracle) [{time.monotonic()-t0:.1f}s]")
            if len(sdf) == 0 and name != "dedup_exact":
                print(f"  WARN {name}: empty result")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {e}")
            continue
        scols, srows = canon(sdf)
        ocols, orows = canon(odf)
        if scols != ocols:
            failures.append(name)
            print(f"FAIL  {name}: columns spark={scols} duckdb={ocols}")
            continue
        if len(srows) != len(orows):
            failures.append(name)
            print(f"FAIL  {name}: rowcount spark={len(srows)} duckdb={len(orows)}")
            continue
        if srows != orows:
            failures.append(name)
            diff = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
            print(f"FAIL  {name}: value mismatch, first diffs: {diff}")
            continue
        print(f"OK    {name}: {len(srows)} rows match [{time.monotonic()-t0:.1f}s]")

    print(f"\n{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
