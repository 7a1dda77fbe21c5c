"""Exact-quantile selection tests: order-statistic exactness vs sorted
truth (duplicates, skew, tiny bucket counts forcing deep recursion),
NULL handling, edge probabilities, layout invariance, and the no-sort
plan property of the counting passes."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from ztdf_spark import quantiles

DDL = "id long, value double"


def _truth(vals, p):
    s = sorted(vals)
    return s[max(1, math.ceil(p * len(s))) - 1]


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], DDL
    )


def test_exact_vs_sorted_truth(spark):
    rng = np.random.default_rng(3)
    vals = np.round(rng.lognormal(3.0, 1.2, size=5000), 2)  # dupes + skew
    probs = [0.0, 0.25, 0.5, 0.9, 0.99, 1.0]
    out = {
        r["p"]: r
        for r in quantiles.exact_quantiles(
            _df(spark, vals), "value", probs, n_buckets=64, distinct_cap=128
        ).collect()
    }
    for p in probs:
        assert out[p]["value"] == _truth(vals, p), p
        assert out[p]["k"] == max(1, math.ceil(p * len(vals)))
        assert out[p]["n"] == len(vals)


def test_deep_recursion_tiny_buckets(spark):
    # n_buckets=4 / distinct_cap=4 forces several refinement rounds
    vals = list(range(1, 1001))
    out = quantiles.exact_quantiles(
        _df(spark, vals), "value", [0.5, 0.9], n_buckets=4, distinct_cap=4
    ).collect()
    got = {r["p"]: r["value"] for r in out}
    assert got[0.5] == _truth(vals, 0.5) == 500.0
    assert got[0.9] == _truth(vals, 0.9) == 900.0


def test_heavy_repeated_value_terminates_exactly(spark):
    # 90% of the mass is ONE value — width refinement alone can't split it;
    # the distinct-enumeration exit must catch it
    vals = [42.0] * 9000 + list(np.linspace(0, 100, 1000))
    out = quantiles.exact_quantiles(
        _df(spark, vals), "value", [0.5, 0.95], n_buckets=16, distinct_cap=64
    ).collect()
    got = {r["p"]: r["value"] for r in out}
    assert got[0.5] == _truth(vals, 0.5) == 42.0
    assert got[0.95] == _truth(vals, 0.95)


def test_nulls_excluded_and_empty(spark):
    df = spark.createDataFrame([(0, None), (1, 5.0), (2, None)], DDL)
    rows = quantiles.exact_quantiles(df, "value", [0.5]).collect()
    assert rows[0]["value"] == 5.0 and rows[0]["n"] == 1
    empty = spark.createDataFrame([], DDL)
    assert quantiles.exact_quantiles(empty, "value", [0.5]).count() == 0
    with pytest.raises(ValueError, match="prob"):
        quantiles.exact_quantiles(df, "value", [1.5])


def test_all_equal_values(spark):
    out = quantiles.exact_quantiles(
        _df(spark, [7.0] * 500), "value", [0.1, 0.9]
    ).collect()
    assert all(r["value"] == 7.0 for r in out)


def test_layout_invariant(spark):
    rng = np.random.default_rng(9)
    vals = rng.normal(0, 10, size=3000)
    a = quantiles.exact_quantiles(
        _df(spark, vals).coalesce(1), "value", [0.5, 0.99], n_buckets=32
    ).collect()
    b = quantiles.exact_quantiles(
        _df(spark, vals).repartition(17), "value", [0.5, 0.99], n_buckets=32
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_counting_pass_never_sorts(spark):
    """The scale property: each pass is a partial-combine hash aggregate —
    no Sort, no single-partition funnel, anywhere in the counting plan."""
    df = _df(spark, np.arange(1000.0))
    hist = df.groupBy(
        quantiles._bucket("value", 0.0, 10.0, 128).alias("_b")
    ).agg(F.count("*").alias("_c"))
    plan = hist._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan and "Sort " not in plan
    assert "SinglePartition" not in plan
    assert "partial_count" in plan  # map-side combine before the exchange
