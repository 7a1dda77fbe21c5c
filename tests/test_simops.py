"""Similarity-search tests over a deterministic embedding fixture."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ztdf_spark import simops

DIM = 8


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(3)
    rows = []
    for i in range(60):
        v = rng.standard_normal(DIM).astype(np.float32)
        v /= np.linalg.norm(v)
        rows.append((i, v.tolist(), i % 3))
    # vec 50 = near-copy of query vec 0
    base = np.array(rows[0][1], dtype=np.float32)
    near = base + 0.01 * rng.standard_normal(DIM).astype(np.float32)
    rows[50] = (50, (near / np.linalg.norm(near)).tolist(), 0)
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_brute_force_cosine_topk_matches_numpy(emb):
    got = simops.ann_topk_cosine(emb, n_queries=3, k=5, ).toPandas()
    pdf = emb.toPandas().sort_values("vec_id")
    M = np.stack(pdf["embedding"].map(lambda v: np.asarray(v, dtype="float64")).to_list())
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    for q in range(3):
        sims = M[3:] @ M[q]
        ids = np.asarray(pdf["vec_id"][3:])
        order = np.lexsort((ids, -sims))[:5]
        exp = ids[order].tolist()
        got_q = got[got.query_id == q].sort_values("rank")["neighbor_id"].tolist()
        assert got_q == exp


def test_quantized_topk_deterministic_and_ranked(emb):
    a = simops.ann_topk_quantized(emb, n_queries=5, k=4).toPandas()
    b = simops.ann_topk_quantized(emb, n_queries=5, k=4).toPandas()
    assert a.sort_values(["query_id", "rank"]).values.tolist() == b.sort_values(["query_id", "rank"]).values.tolist()
    assert set(a.groupby("query_id")["rank"].max()) == {4}
    # near-copy vec 50 is the top neighbor of query 0
    assert a[(a.query_id == 0) & (a["rank"] == 1)]["neighbor_id"].iloc[0] == 50


def test_lsh_recall_on_near_duplicate(emb):
    got = simops.lsh_ann_topk(emb, n_queries=1, k=3, n_planes=4, dim=DIM).toPandas()
    # the near-copy shares the sign pattern of query 0 → found in its bucket
    assert 50 in got[got.query_id == 0]["neighbor_id"].tolist()


def test_embedding_near_dup_pairs(emb):
    # unit vectors quantized by 1000 → dot_q ≈ 1e6·cos; near-dups ≥ .99
    pairs = simops.embedding_near_dup_pairs(emb, min_dot_q=985_000).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in pairs} == {(0, 50)}
