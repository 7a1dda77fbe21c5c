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


# ------------------------------------------------------- recall vs exact oracle


@pytest.fixture(scope="module")
def planted(spark):
    """Planted-neighbor fixture: 60 base directions × 6 perturbed copies
    (within-group cosine ≥ ~0.95) — the workload ANN indexes exist for.
    vec_ids 0..9 are queries drawn from the first 10 groups."""
    rng = np.random.default_rng(17)
    dim, groups, per = 32, 60, 6
    rows = []
    vid = 0
    for g in range(groups):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(per):
            v = base + 0.15 * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, v.astype(np.float32).tolist(), g))
            vid += 1
    # queries first: one member of each of the first 10 groups
    rows = sorted(rows, key=lambda r: (r[2] != r[0] % groups, r[0]))
    rows = [(i, v, g) for i, (_, v, g) in enumerate(rows)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def _recall_at_k(approx, exact, k=5):
    a = approx.toPandas()
    e = exact.toPandas()
    hits = tot = 0
    for q in e["query_id"].unique():
        want = set(e[e.query_id == q].nsmallest(k, "rank")["neighbor_id"])
        got = set(a[a.query_id == q]["neighbor_id"])
        hits += len(want & got)
        tot += len(want)
    return hits / tot


def test_lsh_multiprobe_recall_on_planted_neighbors(spark, planted):
    exact = simops.ann_topk_cosine(planted, n_queries=10, k=5)
    lsh = simops.lsh_ann_topk(
        planted, n_queries=10, k=5, dim=32, n_planes=8, n_tables=8, multiprobe=1
    )
    r = _recall_at_k(lsh, exact, k=5)
    assert r >= 0.9, f"multi-probe LSH recall@5 {r:.2f} < 0.9"
    # multiprobe is a strict candidate superset → recall can only improve
    single = simops.lsh_ann_topk(
        planted, n_queries=10, k=5, dim=32, n_planes=8, n_tables=8, multiprobe=0
    )
    assert r >= _recall_at_k(single, exact, k=5)
    # and it is genuinely sublinear: the candidate set is a fraction of n
    n_cand = (
        simops.lsh_ann_topk(planted, n_queries=10, k=10**6, dim=32, n_planes=8, n_tables=8, multiprobe=1)
        .count()
    )
    n_total = 10 * (planted.count() - 10)
    assert n_cand / n_total < 0.5, f"candidate fraction {n_cand / n_total:.2f} not sublinear"


def test_ivf_recall_on_planted_neighbors(spark, planted):
    exact = simops.ann_topk_cosine(planted, n_queries=10, k=5)
    ivf = simops.ann_ivf_topk(planted, n_queries=10, k=5, n_cells=16, n_probe=3, seed=7)
    r = _recall_at_k(ivf, exact, k=5)
    assert r >= 0.9, f"IVF recall@5 {r:.2f} < 0.9"
    a = simops.ann_ivf_topk(planted, n_queries=10, k=5, n_cells=16, n_probe=3, seed=7).toPandas()
    # layout-invariant too: the md5-threshold training sample makes the
    # index identical under any repartitioning
    b = simops.ann_ivf_topk(
        planted.repartition(17), n_queries=10, k=5, n_cells=16, n_probe=3, seed=7
    ).toPandas()
    assert a.sort_values(["query_id", "rank"]).values.tolist() == b.sort_values(["query_id", "rank"]).values.tolist()


@pytest.fixture(scope="module")
def planted_dups(spark):
    """Tight near-duplicate fixture: 40 bases × 5 copies at cosine ≥ ~0.97
    (the regime near-dup detection targets), plus background noise vectors."""
    rng = np.random.default_rng(23)
    dim = 32
    rows = []
    vid = 0
    for g in range(40):
        base = rng.standard_normal(dim)
        base /= np.linalg.norm(base)
        for _ in range(5):
            v = base + 0.03 * rng.standard_normal(dim)
            v /= np.linalg.norm(v)
            rows.append((vid, v.astype(np.float32).tolist(), g))
            vid += 1
    for _ in range(100):  # background
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        rows.append((vid, v.astype(np.float32).tolist(), -1))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_near_dup_lsh_recall_vs_exact_gemm(spark, planted_dups):
    planted = planted_dups
    exact = simops.embedding_near_dup_pairs(planted, min_dot_q=900_000)
    approx = simops.emb_near_dup_lsh(planted, min_cos=0.9, dim=32, n_planes=8, n_tables=12)
    ep = {(r["vec_a"], r["vec_b"]) for r in exact.collect()}
    ap = {(r["vec_a"], r["vec_b"]) for r in approx.collect()}
    assert len(ep) > 20  # the fixture plants plenty of true near-dups
    # no false positives (exact rerank) and recall >= 0.9
    # (thresholds differ by quantization: dot_q uses floor(x*1000) ints, so
    # compare against the float-cosine pair set)
    recall = len(ep & ap) / len(ep)
    assert recall >= 0.9, f"near-dup LSH recall {recall:.2f} < 0.9"


def test_blocked_gemm_matches_crossjoin_semantics(spark, emb):
    """The blocked-GEMM exact path must equal a literal cross-join evaluation
    (same quantization, same threshold) on an irregular-size input."""
    got = {(r["vec_a"], r["vec_b"], r["dot_q"]) for r in
           simops.embedding_near_dup_pairs(emb, min_dot_q=100_000, n_chunks=5).collect()}
    a = emb.select(F.col("vec_id").alias("vec_a"), simops._quantized(F.col("embedding")).alias("va"))
    b = emb.select(F.col("vec_id").alias("vec_b"), simops._quantized(F.col("embedding")).alias("vb"))
    exp = {(r["vec_a"], r["vec_b"], r["dot_q"]) for r in
           a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
           .withColumn("dot_q", F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                                            F.lit(0).cast("long"), lambda s, x: s + x))
           .filter(F.col("dot_q") >= 100_000).collect()}
    assert got == exp


def test_pq_recall_and_determinism_on_planted_neighbors(spark, planted):
    exact = simops.ann_topk_cosine(planted, n_queries=10, k=5)
    pq = simops.ann_pq_topk(planted, n_queries=10, k=5, m=8, n_codes=16, seed=7)
    r = _recall_at_k(pq, exact, k=5)
    assert r >= 0.9, f"PQ recall@5 {r:.2f} < 0.9"
    # deterministic across runs AND partition layouts (the per-partition
    # top-R prune must be layout-invariant by construction)
    a = simops.ann_pq_topk(planted, n_queries=10, k=5, m=8, n_codes=16, seed=7).toPandas()
    b = simops.ann_pq_topk(
        planted.repartition(17), n_queries=10, k=5, m=8, n_codes=16, seed=7
    ).toPandas()
    assert (
        a.sort_values(["query_id", "rank"]).values.tolist()
        == b.sort_values(["query_id", "rank"]).values.tolist()
    )
    # m must divide the dimension
    with pytest.raises(ValueError):
        simops.ann_pq_topk(planted, m=7)


@pytest.fixture(scope="module")
def planted_sem(spark):
    """10 well-separated anchors; anchors 0-4 each get 2 extra near-copies
    (a 3-member semantic-duplicate group), anchors 5-9 stay singletons.
    Tests run at n_cells=5 — coarse enough that k-means cannot seed two
    centroids INSIDE one duplicate group and split it across cells
    (SemDeDup only prunes within a cluster, so over-sharding trades
    recall for scale by design; n_cells=10 here demonstrably splits a
    group and keeps two members — cluster granularity is a real knob,
    not a free parameter)."""
    rng = np.random.default_rng(17)
    rows = []
    vid = 0
    groups = {}
    for a in range(10):
        base = rng.standard_normal(32)
        base /= np.linalg.norm(base)
        members = [vid]
        rows.append((vid, base.astype(np.float32).tolist(), a))
        vid += 1
        if a < 5:
            for _ in range(2):
                v = base + 0.02 * rng.standard_normal(32)
                members.append(vid)
                rows.append((vid, v.astype(np.float32).tolist(), a))
                vid += 1
        groups[a] = members
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    return df, groups


def test_semdedup_keeps_one_per_group(spark, planted_sem):
    df, groups = planted_sem
    out = simops.semdedup(df, n_cells=5, threshold=0.95, train_sample=100).toPandas()
    assert len(out) == sum(len(m) for m in groups.values())
    by_id = out.set_index("vec_id")
    for a, members in groups.items():
        kept = [m for m in members if by_id.loc[m, "keep"]]
        assert len(kept) == 1, f"group {a}: expected one keeper, got {kept}"
        # the keeper is the member FARTHEST from the centroid (lowest
        # centroid similarity) — the paper's selection rule
        sims = {m: by_id.loc[m, "centroid_sim_q"] for m in members}
        assert sims[kept[0]] == min(sims.values())
        for m in members:
            if m != kept[0]:
                # shadowed by a member of its own group
                assert by_id.loc[m, "dup_of"] in members
    # dup groups landed in one cell each (they're near-identical vectors)
    for a, members in groups.items():
        assert len(set(by_id.loc[m, "cell"] for m in members)) == 1


def test_semdedup_no_false_positives_on_separated_vectors(spark, planted_sem):
    df, groups = planted_sem
    singles = df.filter(F.col("vec_id").isin([m[0] for m in groups.values()]))
    out = simops.semdedup(singles, n_cells=4, threshold=0.95, train_sample=100).toPandas()
    assert bool(out["keep"].all())
    assert (out["dup_of"] == -1).all()


def test_semdedup_layout_invariant(spark, planted_sem):
    """Same rows, different partitioning → identical output (the index
    and the prune must not depend on file splits / parallelism)."""
    df, _ = planted_sem
    a = simops.semdedup(df.repartition(1), n_cells=5, threshold=0.95, train_sample=100).toPandas()
    b = simops.semdedup(df.repartition(7, "label"), n_cells=5, threshold=0.95, train_sample=100).toPandas()
    key = ["vec_id", "cell", "centroid_sim_q", "keep", "dup_of"]
    assert sorted(map(tuple, a[key].to_numpy().tolist())) == sorted(map(tuple, b[key].to_numpy().tolist()))
