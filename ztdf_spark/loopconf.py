"""Scale-adaptive session config for iterative small-table loops.

The iterative operators (connected components, BPE / WordPiece / unigram
training, the quality-classifier descent) run dozens of rounds over a
working table that is BOUNDED (a train sample, a distinct-word table, a
shrinking edge list) while the session config is sized for corpus-scale
shuffles. Event-log profiling (tools/evlog.py) shows the rounds' wall is
dominated by per-round DRIVER latency — AQE re-plans every exchange of
every tiny round as its own query stage — not by task work.

``small_loop_conf`` scopes the session to the loop: shuffle partitions
derived from the MEASURED working-set row count (never a constant), AQE
dropped only in the small regime, everything restored on exit. When the
working set is genuinely large (a 100 TB-scale train sample), the derived
partition count reaches the session's own value and the config is left
untouched — this is a small-input guard with a scale-adaptive formula,
not a local[32] tuning constant (guide §2: derive partitioning from input
size)."""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def small_loop_conf(spark, n_rows: int, rows_per_partition: int = 250_000):
    base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    parts = max(1, min(base_parts, int(n_rows) // rows_per_partition + 1))
    try:
        if parts < base_parts:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        yield
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(base_parts))
        spark.conf.set("spark.sql.adaptive.enabled", base_aqe)
