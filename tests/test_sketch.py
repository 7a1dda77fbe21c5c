"""Count-min sketch (ztdf_spark/sketch.py): the CM one-sided-error law
(estimate >= truth, always), exactness without collisions, linear
mergeability, and the bounded-groups plan shape."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from ztdf_spark import sketch as sk


@pytest.fixture(scope="module")
def keyed(spark):
    rng = np.random.default_rng(5)
    # zipf-ish: key k appears ~ 300/k times
    rows = [(int(k),) for k in rng.zipf(1.3, size=4000) if k <= 500]
    return spark.createDataFrame(rows, "user_id long")


def test_cms_never_undercounts(spark, keyed):
    exact = keyed.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    cms = sk.cms_build(keyed, "user_id", d=4, w=32, seed=7)
    est = sk.cms_estimate(cms, exact.select("user_id"), "user_id", d=4, w=32, seed=7)
    joined = exact.join(est, "user_id").toPandas()
    assert len(joined) == exact.count()
    assert (joined.n_est >= joined.n_exact).all()
    # w=32 over hundreds of keys MUST collide somewhere — the estimates
    # demonstrably come from the sketch, not an exact count
    assert (joined.n_est > joined.n_exact).any()


def test_cms_exact_when_no_collisions(spark):
    df = spark.createDataFrame([(i,) for i in range(20) for _ in range(i + 1)], "user_id long")
    exact = df.groupBy("user_id").agg(F.count("*").alias("n_exact"))
    cms = sk.cms_build(df, "user_id", d=4, w=4096, seed=7)
    est = sk.cms_estimate(cms, exact.select("user_id"), "user_id", d=4, w=4096, seed=7)
    joined = exact.join(est, "user_id").toPandas()
    assert (joined.n_est == joined.n_exact).all()


def test_cms_linear_merge(spark, keyed):
    a = keyed.filter("user_id % 2 = 0")
    b = keyed.filter("user_id % 2 = 1")
    merged = sk.cms_merge(
        sk.cms_build(a, "user_id", d=4, w=32, seed=7),
        sk.cms_build(b, "user_id", d=4, w=32, seed=7),
    )
    whole = sk.cms_build(keyed, "user_id", d=4, w=32, seed=7)
    ml = sorted(map(tuple, merged.collect()))
    wl = sorted(map(tuple, whole.collect()))
    assert ml == wl


def test_cms_absent_key_is_zero_on_empty_cells(spark):
    df = spark.createDataFrame([(1,), (2,)], "user_id long")
    cms = sk.cms_build(df, "user_id", d=4, w=4096, seed=7)
    probe = spark.createDataFrame([(999,)], "user_id long")
    est = sk.cms_estimate(cms, probe, "user_id", d=4, w=4096, seed=7).collect()
    assert est[0]["n_est"] == 0


def test_cms_build_plan_bounded_groups(spark, keyed):
    """Construction must pre-reduce map-side (partial count) so the one
    exchange carries at most d*w rows per map task."""
    plan = sk.cms_build(keyed, "user_id")._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan or "partial_count(1)" in plan or "count" in plan
    assert plan.count("Exchange") == 1
    assert "Python" not in plan  # pure Catalyst


def test_hll_registers_merge_by_max(spark, keyed):
    a = keyed.filter("user_id % 2 = 0")
    b = keyed.filter("user_id % 2 = 1")
    merged = (
        sk.hll_registers(a, "user_id")
        .unionByName(sk.hll_registers(b, "user_id"))
        .groupBy("bucket")
        .agg(F.max("max_rho").alias("max_rho"))
    )
    whole = sk.hll_registers(keyed, "user_id")
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_hll_estimate_accuracy_across_cardinalities(spark):
    """HLL(m=64) standard error is 1.04/sqrt(64) ≈ 13%; pin estimates
    within 3 sigma at several true cardinalities (deterministic hash →
    deterministic estimate, so these bounds can never flake)."""
    for n in (100, 1000, 20000):
        df = spark.range(n).selectExpr("id as user_id")
        regs = [r.max_rho for r in sk.hll_registers(df, "user_id").collect()]
        est = sk.hll_estimate(regs, m=64)
        assert abs(est - n) / n < 0.39, (n, est)


def test_hll_duplicates_do_not_move_registers(spark):
    ids = spark.range(500).selectExpr("id as user_id")
    dup = ids.unionByName(ids).unionByName(ids)
    a = sorted(map(tuple, sk.hll_registers(ids, "user_id").collect()))
    b = sorted(map(tuple, sk.hll_registers(dup, "user_id").collect()))
    assert a == b


def test_hll_validates_m(spark):
    df = spark.createDataFrame([(1,)], "user_id long")
    with pytest.raises(ValueError):
        sk.hll_registers(df, "user_id", m=48)
