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


# ---------------------------------------------------------------------------
# Independent pandas/numpy oracles for rows-only (non-SQL-expressible)
# queries: the algorithm is RE-IMPLEMENTED here from its spec (same seeds,
# same hash constructions) without touching the Spark execution path, so a
# Spark-side wiring bug (banding slice off-by-one, wrong column order,
# dropped dedup) fails the value comparison even though DuckDB can't
# express the op.
# ---------------------------------------------------------------------------


def _docs_pdf(sf_dir):
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, "documents.parquet")).to_pandas()


def _pandas_simhash(sf_dir):
    from hashlib import blake2b

    import numpy as np
    import pandas as pd

    d = _docs_pdf(sf_dir)
    bits = np.arange(64, dtype=np.uint64)
    key = (42).to_bytes(8, "little")
    out = []
    for t in d["text"]:
        ws = str(t).lower().split(" ")
        hs = np.fromiter(
            (int.from_bytes(blake2b(w.encode(), digest_size=8, key=key).digest(), "little") for w in ws),
            dtype=np.uint64, count=len(ws),
        )
        votes = np.where((hs[:, None] >> bits) & np.uint64(1), 1, -1).sum(axis=0)
        out.append(int(((votes > 0).astype(np.uint64) << bits).sum() & np.uint64(0x7FFFFFFFFFFFFFFF)))
    return pd.DataFrame({"doc_id": d["doc_id"].astype("int64"), "simhash": np.array(out, dtype="int64")})


def _pandas_minhash_lsh(sf_dir, n_hashes=64, bands=16, k=3, min_est_q=400, seed=42):
    from hashlib import blake2b

    import numpy as np
    import pandas as pd

    p = (1 << 61) - 1
    rng = np.random.default_rng(seed)
    a = rng.integers(1, p, size=n_hashes, dtype=np.uint64)[:, None]
    b = rng.integers(0, p, size=n_hashes, dtype=np.uint64)[:, None]
    d = _docs_pdf(sf_dir)
    sigs = {}
    for doc_id, t in zip(d["doc_id"].astype("int64"), d["text"]):
        ws = str(t).lower().split(" ")
        sh = {" ".join(ws[i : i + k]) for i in range(max(0, len(ws) - k + 1))}
        if not sh:
            sigs[doc_id] = np.zeros(n_hashes, dtype=np.int64)
            continue
        hv = np.fromiter(
            (int.from_bytes(blake2b(s.encode(), digest_size=8).digest(), "little") for s in sh),
            dtype=np.uint64, count=len(sh),
        )
        sig = ((a * (hv[None, :] % p) + b) % p).min(axis=1)
        sigs[doc_id] = (sig & np.uint64(0x7FFFFFFFFFFFFFFF)).astype(np.int64)
    rows = n_hashes // bands
    buckets: dict = {}
    for doc_id, sig in sigs.items():
        for bi in range(bands):
            key = (bi, tuple(sig[bi * rows : (bi + 1) * rows]))
            buckets.setdefault(key, []).append(doc_id)
    cands = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                cands.add((ms[i], ms[j]))
    recs = []
    for da, db in sorted(cands):
        est = int(1000 * int((sigs[da] == sigs[db]).sum()) // n_hashes)
        if est >= min_est_q:
            recs.append((da, db, est))
    return pd.DataFrame(recs, columns=["doc_a", "doc_b", "est_jac_q"]).astype("int64")


def _pandas_ann_cosine(sf_dir, n_queries=10, k=5):
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet")).to_pandas().sort_values("vec_id")
    M = np.stack(t["embedding"].map(lambda v: np.asarray(v, dtype="float64")).to_numpy())
    ids = t["vec_id"].to_numpy()
    qm, cm = M[ids < n_queries], M[ids >= n_queries]
    cids = ids[ids >= n_queries]
    qn = qm / np.linalg.norm(qm, axis=1, keepdims=True)
    cn = cm / np.linalg.norm(cm, axis=1, keepdims=True)
    recs = []
    for qi in range(len(qm)):
        cos = cn @ qn[qi]
        order = np.lexsort((cids, -cos))[:k]
        for r, j in enumerate(order, 1):
            recs.append((qi, int(cids[j]), float(cos[j]), r))
    return pd.DataFrame(recs, columns=["query_id", "neighbor_id", "cos", "rank"])


def _pandas_mm_features(sf_dir, n=30, seed=42):
    import hashlib

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8).tobytes()
        rng.integers(16, 512), rng.integers(16, 512)  # meta draws (keep rng stream aligned)
        if mtype == "video":
            rng.integers(1000, 10000)
        digest = hashlib.blake2b(payload, digest_size=64, key=mtype.encode()[:16]).digest()
        feat = (np.frombuffer(digest, dtype=np.uint32).astype(np.float32) / np.float32(2**32))[:16]
        q = [str(int(np.floor(float(x) * 1_000_000))) for x in feat.astype("float64")]
        recs.append((i, mtype, len(payload), 16, hashlib.md5(",".join(q).encode()).hexdigest()))
    return pd.DataFrame(recs, columns=["media_id", "media_type", "n_bytes", "feat_dim", "feat_checksum"])


def _pandas_mm_frames(sf_dir, n=30, seed=42, every_ms=1000):
    import hashlib

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(seed)
    recs = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 256)), dtype=np.uint8).tobytes()
        rng.integers(16, 512), rng.integers(16, 512)
        dur = int(rng.integers(1000, 10000)) if mtype == "video" else 0
        if mtype != "video":
            continue
        for fi in range(max(1, dur // every_ms)):
            h = hashlib.blake2b(payload + fi.to_bytes(4, "little"), digest_size=8).hexdigest()
            recs.append((i, fi, h))
    return pd.DataFrame(recs, columns=["media_id", "frame_idx", "frame_hash"])


PANDAS_ORACLES = {
    "dedup_simhash": _pandas_simhash,
    "dedup_minhash_lsh": _pandas_minhash_lsh,
    "ann_topk_cosine": _pandas_ann_cosine,
    "mm_features": _pandas_mm_features,
    "mm_frames": _pandas_mm_frames,
}


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
            if name in PANDAS_ORACLES:
                pdf = PANDAS_ORACLES[name](sf_dir)
                scols, srows = canon(sdf)
                pcols, prows = canon(pdf)
                if (scols, srows) != (pcols, prows):
                    failures.append(name)
                    diff = [(a, b) for a, b in zip(srows, prows) if a != b][:3]
                    print(f"FAIL  {name}: pandas-oracle mismatch cols {scols} vs {pcols}; "
                          f"rows {len(srows)} vs {len(prows)}; first diffs: {diff}")
                else:
                    print(f"OK(p) {name}: {len(srows)} rows match independent pandas oracle "
                          f"[{time.monotonic()-t0:.1f}s]")
                continue
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
