"""Generate a measurement-only dataset with the same schema/distributions as
the driver's /root/testdata/sf* fixtures, at an arbitrary scale factor.

The driver's own generator is not in the repo (TESTDATA.md: driver-generated,
read-only), but its distributions are simple and observable from sf0.1:
 - documents: 31-word vocab, uniform word draw, uniform 10..100 words/doc,
   langs {en 41%, zh/es/fr/de ~15% each}, 20 uniform sources, ~0.16% exact dups
 - embeddings: 64-dim float32, 10 labels (cluster centers + noise)
 - events: 15k users/sf, 5 uniform event types over a 30-day window
 - TPC-H-ish: lineitem 6M/sf, orders 1.5M/sf, customer 150k/sf, part 200k/sf,
   supplier 10k/sf, nation 25, region 5

This is NOT the driver's data (different RNG stream) — it exists so that
optimizations measured at sf0.1 can be re-validated at ~10x scale locally
(guide §1: measure at the scale you claim). Never used by bench.py unless
SPARK_GRAFT_SF_DIR points at it explicitly.

Usage: python tools/gen_sfdata.py --sf 1.0 --out /root/sf1data/sf1.0
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream", "value",
    "data", "small", "batch", "part", "line", "order", "sort", "fast", "scan",
    "a", "hash", "group", "agg", "filter", "query", "big", "slow", "key",
    "row", "the", "join", "customer", "sources",
]
LANGS = ["en", "zh", "es", "fr", "de"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
EVENT_TYPES = ["signup", "purchase", "view", "click", "error"]


def write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(name, table.num_rows)


def gen_documents(rng: np.random.Generator, n: int) -> pa.Table:
    lens = rng.integers(10, 101, size=n)
    vocab = np.array(VOCAB)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), size=ln)]) for ln in lens]
    # sprinkle exact duplicates at the observed ~0.16% rate
    n_dup = max(1, n // 625)
    src = rng.integers(0, n, size=n_dup)
    dst = rng.integers(0, n, size=n_dup)
    for s, d in zip(src, dst):
        texts[d] = texts[s]
    langs = rng.choice(LANGS, p=LANG_P, size=n)
    sources = np.array([f"src{i}" for i in rng.integers(0, 20, size=n)])
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
        "source": pa.array(sources, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })


def gen_embeddings(rng: np.random.Generator, n: int) -> pa.Table:
    # calibrated to the driver fixture: pairwise cosine ~ N(0, 1/sqrt(dim))
    # (p90 ≈ 0.16, essentially no pairs above 0.8) — near-random vectors
    # with only a faint label-cluster pull, NOT tight clusters (a tight-
    # cluster version made every LSH bucket quadratic, which the real
    # fixture never does)
    dim, k = 64, 10
    centers = rng.normal(0, 1, size=(k, dim)) * 0.25
    labels = rng.integers(0, k, size=n)
    vecs = centers[labels] + rng.normal(0, 1.0, size=(n, dim))
    return pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "embedding": pa.array(list(vecs.astype(np.float32))),
        "label": pa.array(labels.astype(np.int32)),
    })


def gen_events(rng: np.random.Generator, n: int, n_users: int) -> pa.Table:
    base = np.datetime64("2024-01-01T00:00:00.000000")
    span_us = 30 * 86400 * 1_000_000
    ts = base + np.sort(rng.integers(0, span_us, size=n)).astype("timedelta64[us]")
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "event_type": pa.array(rng.choice(EVENT_TYPES, size=n), pa.string()),
        "value": pa.array(np.round(rng.uniform(0, 200, size=n), 2), pa.float64()),
        "props": pa.array([json.dumps({"k": int(k)}) for k in rng.integers(0, 100, size=n)]),
    })


def gen_tpch(rng: np.random.Generator, out: str, sf: float) -> None:
    n_nation, n_region = 25, 5
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    write(out, "region", pa.table({
        "r_regionkey": pa.array(np.arange(n_region, dtype=np.int32)),
        "r_name": pa.array([f"REGION{i}" for i in range(n_region)]),
    }))
    write(out, "nation", pa.table({
        "n_nationkey": pa.array(np.arange(n_nation, dtype=np.int32)),
        "n_name": pa.array([f"NATION{i}" for i in range(n_nation)]),
        "n_regionkey": pa.array((np.arange(n_nation) % n_region).astype(np.int32)),
    }))
    write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.integers(0, n_nation, size=n_cust).astype(np.int32)),
        "c_acctbal": pa.array(np.round(rng.uniform(-999, 9999, size=n_cust), 2)),
        "c_mktsegment": pa.array(rng.choice(
            ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"], size=n_cust)),
    }))
    write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": pa.array([f"Supplier#{i:09d}" for i in range(n_supp)]),
        "s_nationkey": pa.array(rng.integers(0, n_nation, size=n_supp).astype(np.int32)),
        "s_acctbal": pa.array(np.round(rng.uniform(-999, 9999, size=n_supp), 2)),
    }))
    write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(n_part)]),
        "p_brand": pa.array([f"Brand#{i % 25 // 5 + 1}{i % 5 + 1}" for i in range(n_part)]),
        "p_type": pa.array(rng.choice(
            ["STANDARD", "SMALL", "MEDIUM", "LARGE", "ECONOMY", "PROMO"], size=n_part)),
        "p_size": pa.array(rng.integers(1, 51, size=n_part).astype(np.int32)),
        "p_retailprice": pa.array(np.round(rng.uniform(900, 2000, size=n_part), 2)),
    }))
    base = np.datetime64("2024-01-01T00:00:00.000000")
    odate = base + rng.integers(0, 365 * 86400, size=n_ord).astype("timedelta64[s]").astype(
        "timedelta64[us]")
    write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, size=n_ord), pa.int64()),
        "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], size=n_ord)),
        "o_totalprice": pa.array(np.round(rng.uniform(1000, 400000, size=n_ord), 2)),
        "o_orderdate": pa.array(odate, pa.timestamp("us")),
        "o_orderpriority": pa.array(rng.choice(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"], size=n_ord)),
    }))
    sdate = base + rng.integers(0, 400 * 86400, size=n_li).astype("timedelta64[s]").astype(
        "timedelta64[us]")
    write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(rng.integers(0, n_ord, size=n_li), pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, size=n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, size=n_li), pa.int64()),
        "l_linenumber": pa.array((rng.integers(1, 8, size=n_li)).astype(np.int32)),
        "l_quantity": pa.array(rng.integers(1, 51, size=n_li).astype(np.float64)),
        "l_extendedprice": pa.array(np.round(rng.uniform(900, 100000, size=n_li), 2)),
        "l_discount": pa.array(np.round(rng.uniform(0, 0.1, size=n_li), 2)),
        "l_tax": pa.array(np.round(rng.uniform(0, 0.08, size=n_li), 2)),
        "l_returnflag": pa.array(rng.choice(["A", "N", "R"], size=n_li)),
        "l_linestatus": pa.array(rng.choice(["O", "F"], size=n_li)),
        "l_shipdate": pa.array(sdate, pa.timestamp("us")),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", type=float, default=1.0)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    write(args.out, "documents", gen_documents(rng, int(50_000 * args.sf)))
    write(args.out, "embeddings", gen_embeddings(rng, int(20_000 * args.sf)))
    write(args.out, "events", gen_events(rng, int(1_000_000 * args.sf), int(15_000 * args.sf)))
    gen_tpch(rng, args.out, args.sf)
    with open(os.path.join(args.out, "_DONE"), "w") as f:
        f.write("ok")


if __name__ == "__main__":
    main()
