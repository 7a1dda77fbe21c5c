"""Structured Streaming operators beyond the CDC ingest pipeline itself:
watermarked event-time windowed aggregation and a custom stateful
sessionizer via ``applyInPandasWithState``.

The reference has no streaming analytics of its own (NiFi's framework owns
scheduling; SURVEY.md §2.3) — these are the stream-processing operators a
training-data platform runs NEXT to the CDC ingest, expressed the idiomatic
Spark way:

- ``windowed_event_counts`` is a pure declarative plan: identical code runs
  in batch (DuckDB-oracle-checked via the driver contract) and in a stream
  (``readStream`` + watermark governs state eviction for late data).
- ``sessionize_stateful`` is the custom-stateful-operator pattern
  (``groupBy(key).applyInPandasWithState``): per-user session state with an
  event-time timeout keyed to the watermark — sessions close either by an
  explicit gap between a user's own events or when the watermark passes
  their last event + gap. Streaming-only by nature (state lives in the
  state store); its semantics are pinned against the batch sessionizer in
  tests/test_stream_ops.py.

Scale notes: windowed aggregation is hash-partitioned on (window, group)
with map-side partial aggregation; state store size is bounded by the
watermark horizon. The stateful sessionizer shuffles once on user_id; state
per key is O(1) (three longs), and event-time timeout guarantees eviction —
no unbounded state at 10^10 events.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_GAP_MS = 1_800_000  # 30 min, matches the batch sessionizer


def windowed_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time tumbling-window counts per event_type.

    Batch and streaming share this exact plan; in streaming the watermark
    bounds state and admits late events inside the horizon. Output columns
    are epoch-second longs so the DuckDB oracle comparison is bit-stable.
    """
    e = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark(ts_col, watermark)
    return (
        e.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.min("event_id").alias("min_event_id"))
        .select(
            F.unix_timestamp("w.start").alias("w_start"),
            F.unix_timestamp("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "min_event_id",
        )
    )


_SESSION_OUT = "user_id long, session_start_ms long, session_end_ms long, n_events long"
_SESSION_STATE = "start_ms long, last_ms long, n long"


def sessionize_stateful(events: DataFrame, *, gap_ms: int = SESSION_GAP_MS, watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization as a CUSTOM STATEFUL OPERATOR
    (``applyInPandasWithState`` with event-time timeout).

    Emits one row per CLOSED session: a session closes when a later event
    from the same user arrives more than ``gap_ms`` after the previous one,
    or when the watermark passes (last event + gap) — the state-store
    eviction path for users who simply stop sending.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start_ms": [start_ms],
                 "session_end_ms": [last_ms], "n_events": [n]}
            )
            return
        ts = []
        for pdf in pdfs:
            ts.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())  # ns → ms
        ts.sort()
        start_ms, last_ms, n = state.get if state.exists else (None, None, 0)
        closed = {"user_id": [], "session_start_ms": [], "session_end_ms": [], "n_events": []}
        for t in ts:
            if start_ms is None:
                start_ms, last_ms, n = t, t, 1
            elif t - last_ms > gap_ms:
                closed["user_id"].append(user_id)
                closed["session_start_ms"].append(start_ms)
                closed["session_end_ms"].append(last_ms)
                closed["n_events"].append(n)
                start_ms, last_ms, n = t, t, 1
            else:
                last_ms, n = t, n + 1
        state.update((start_ms, last_ms, n))
        # event-time timeout: close the open session once the watermark
        # passes last + gap (bounded state, late data inside the horizon)
        state.setTimeoutTimestamp(last_ms + gap_ms)
        if closed["user_id"]:
            yield pd.DataFrame(closed)

    e = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark("ts", watermark)
    return e.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=_SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# ---------------------------------------------------------------------------
# As-of (temporal) join
# ---------------------------------------------------------------------------

_ASOF_TAG = "__asof_is_left"


def dedup_exactly_once(
    events: DataFrame,
    *,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exactly-once event dedup: ONE row per key from an at-least-once
    transport (redeliveries, producer retries).

    Streaming: ``withWatermark`` + ``dropDuplicatesWithinWatermark`` —
    Spark keeps per-key state only inside the watermark horizon, so
    state is bounded no matter how long the stream runs; a duplicate
    arriving beyond the horizon is the transport's SLA violation, the
    same contract as Spark's built-in operator (and Kafka's
    idempotent-producer window).

    Batch twin (the driver/DuckDB-oracled path): deterministic
    FIRST-ARRIVAL — ``min_by`` of the full row over the event time per
    key. One hash shuffle on the key with map-side partial aggregation
    (MaxMinBy is partial-aggregable), never a global sort or window, so
    the plan is the same shape as a plain groupBy at 100 TB. Streaming
    keeps whichever duplicate lands first (arrival order); batch makes
    that reproducible by electing the smallest event time.
    """
    e = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark(ts_col, watermark)
        return e.dropDuplicatesWithinWatermark(list(key_cols))
    others = [c for c in e.columns if c not in key_cols]
    picked = e.groupBy(*key_cols).agg(
        F.min_by(F.struct(*others), F.col(ts_col)).alias("_first")
    )
    return picked.select(*key_cols, *[F.col(f"_first.{c}").alias(c) for c in others])


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    ts: str = "ts",
    value_cols: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Inclusive backward as-of join: each left row picks up ``value_cols``
    from the LATEST right row with ``right.ts <= left.ts`` for the same
    key(s) — the point-in-time lookup every event pipeline needs (state as
    of event time, latest price before a trade, last login before an
    action). Left rows with no prior right row keep nulls (left-join
    semantics). Spark has no ASOF JOIN operator; the classic range-join
    rewrite (θ-join on ``r.ts <= l.ts`` + window max) explodes into
    O(L×R) per key before pruning.

    This is instead the union-scan formulation — O((L+R) log(L+R)) per
    key and exactly ONE shuffle: tag both sides, union, and carry the last
    non-null right value forward over a per-key event-time window
    (``last(ignorenulls)`` over rows unbounded-preceding → current). At
    equal timestamps the right row sorts FIRST (tag 0 < 1), giving the
    inclusive <= semantics. Scale shape: hash-partitioned on the join
    key(s), per-key sort, no cartesian, no Python; key skew is the same
    skew any per-key window has (salt upstream if one key dominates).

    ``tie_col``: if several right rows share (key, ts), keep the one with
    the max ``tie_col`` (deterministic); without it the caller must
    guarantee (key, ts) uniqueness on the right side.

    ``value_cols`` may not collide with a left column (raises ValueError:
    the output has one column per value, and a silent carry of the LEFT
    frame's own values into later left rows would be a wrong as-of result
    — ADVICE r5 #1). NULL semantics match a real ASOF JOIN (DuckDB
    parity): a right row whose value is legitimately NULL still WINS over
    an older non-null row — each right value rides in a struct, so the
    last-non-null carry keys on "a right row existed", never on the
    value itself.
    """
    from pyspark.sql import Window

    clash = set(value_cols) & set(left.columns)
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} already exist on the left frame; "
            "rename them on one side before the as-of join"
        )
    r = right
    if tie_col is not None:
        r = (
            r.groupBy(*on, ts)
            .agg(*[F.max_by(c, tie_col).alias(c) for c in value_cols])
        )
    # struct-wrap each right value: non-null for EVERY right row, so a
    # genuinely-NULL right value overwrites instead of being skipped for a
    # staler non-null one (last(ignorenulls) then means "latest right row")
    r = r.select(
        *on, ts, *[F.struct(F.col(c).alias("v")).alias(c) for c in value_cols]
    ).withColumn(_ASOF_TAG, F.lit(0))
    l = left.withColumn(_ASOF_TAG, F.lit(1))
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts).asc(), F.col(_ASOF_TAG).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = {c: F.last(c, ignorenulls=True).over(w) for c in value_cols}
    u = u.withColumns(carried)
    return (
        u.filter(F.col(_ASOF_TAG) == 1)
        .drop(_ASOF_TAG)
        .withColumns({c: F.col(c).getField("v") for c in value_cols})
    )


def hopping_event_counts(
    events: DataFrame,
    *,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Event-time HOPPING (sliding) window counts per event_type — each
    event lands in ``window/slide`` overlapping windows (the trend-smoothing
    companion of the tumbling variant; same batch ≡ stream plan contract).

    Scale shape identical to the tumbling aggregation: Spark expands each
    row into its ``window/slide`` window memberships MAP-SIDE (a projection,
    not a join), then hash-partitions on (window, event_type) with partial
    aggregation; streaming state is bounded by watermark ÷ slide windows
    per group. Output epoch-second longs for bit-stable oracle compare."""
    e = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if e.isStreaming:
        e = e.withWatermark(ts_col, watermark)
    return (
        e.groupBy(F.window(ts_col, window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.min("event_id").alias("min_event_id"))
        .select(
            F.unix_timestamp("w.start").alias("w_start"),
            F.unix_timestamp("w.end").alias("w_end"),
            "event_type",
            "n_events",
            "min_event_id",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    lookback: str = "24 hours",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream INTERVAL join: each left event pairs with the right
    events of the same key whose timestamp falls in
    ``[left.ts - lookback, left.ts]`` (inclusive backward interval — e.g.
    every signup within a day before a purchase; the as-of join keeps only
    the latest, this keeps them all).

    One declarative plan for batch AND streaming. In streaming BOTH sides
    carry watermarks and the join condition bounds event-time distance, so
    Spark can evict right-side state older than watermark + lookback and
    left-side state older than watermark — the stream-stream inner-join
    state contract; without the time bound state would grow forever.

    Scale shape: an EQUI-join on the key (hash exchange both sides, the
    range condition evaluated post-match) — never a cartesian; right-side
    rows per key are bounded by the lookback horizon."""
    l = left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
    r = right.withColumn(right_ts, F.col(right_ts).cast("timestamp"))
    if l.isStreaming:
        l = l.withWatermark(left_ts, watermark)
    if r.isStreaming:
        r = r.withWatermark(right_ts, watermark)
    lp = l.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_lts"),
        *[c for c in l.columns if c not in (key, left_ts)],
    )
    rp = r.select(
        F.col(key).alias("_rk"),
        F.col(right_ts).alias("_rts"),
        *[c for c in r.columns if c not in (key, right_ts)],
    )
    cond = (
        (F.col("_k") == F.col("_rk"))
        & (F.col("_rts") >= F.col("_lts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("_rts") <= F.col("_lts"))
    )
    return (
        lp.join(rp, cond, "inner")
        .select(
            F.col("_k").alias(key),
            F.unix_timestamp("_lts").alias("left_ts_s"),
            F.unix_timestamp("_rts").alias("right_ts_s"),
            *[c for c in lp.columns if c not in ("_k", "_lts")],
            *[c for c in rp.columns if c not in ("_rk", "_rts")],
        )
    )
