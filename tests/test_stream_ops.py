"""Streaming operators: watermarked windowed aggregation (batch ≡ stream)
and the applyInPandasWithState stateful sessionizer (semantics pinned
against an independent pandas replay)."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ztdf_spark import stream_ops

EVENTS_DDL = "event_id long, user_id long, event_type string, ts timestamp, value double"


def _mk_events(spark, tmp_path):
    """3 time-ordered files so availableNow advances the watermark between
    micro-batches (that's what closes sessions via event-time timeout)."""
    base = pd.Timestamp("2026-01-01 00:00:00")
    rows = []
    eid = 0

    def ev(user, minutes, etype="view"):
        nonlocal eid
        rows.append((eid, user, etype, (base + pd.Timedelta(minutes=minutes)).to_pydatetime(), 1.0))
        eid += 1

    # user 1: two sessions (gap > 30 min), user 2: one long session,
    # user 3: a single event early (closes by watermark timeout)
    for m in (0, 5, 10):
        ev(1, m)
    ev(3, 2)
    for m in (60, 70):
        ev(1, m)  # second session for user 1
    for m in (0, 20, 40, 55):
        ev(2, m)
    # late tail, far in the future: pushes the watermark forward so all
    # earlier sessions time out
    for m in (600, 610):
        ev(4, m)
    rows.sort(key=lambda r: r[3])
    d = str(tmp_path / "events_stream")
    os.makedirs(d, exist_ok=True)
    n = len(rows)
    for i, lo in enumerate(range(0, n, (n + 2) // 3)):
        chunk = rows[lo : lo + (n + 2) // 3]
        spark.createDataFrame(chunk, EVENTS_DDL).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"f{i}")
        )
    return d


def _read_stream(spark, d):
    return (
        spark.readStream.schema(EVENTS_DDL)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "f*"))
    )


def test_windowed_counts_batch_equals_stream(spark, tmp_path):
    d = _mk_events(spark, tmp_path)
    batch_df = spark.read.schema(EVENTS_DDL).parquet(os.path.join(d, "f*"))
    expected = sorted(map(tuple, stream_ops.windowed_event_counts(batch_df).collect()))

    q = (
        stream_ops.windowed_event_counts(_read_stream(spark, d))
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("select * from win_counts").collect()))
    assert got == expected
    assert len(got) >= 3


def _pandas_sessions(spark, d, gap_ms=stream_ops.SESSION_GAP_MS):
    """Independent replay: all sessions per user by the same gap rule."""
    pdf = spark.read.schema(EVENTS_DDL).parquet(os.path.join(d, "f*")).toPandas()
    out = []
    for uid, g in pdf.groupby("user_id"):
        ts = sorted(int(t.value // 1_000_000) for t in g["ts"])
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last > gap_ms:
                out.append((uid, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        out.append((uid, start, last, n))
    return sorted(out)


def test_stateful_sessionizer_closes_sessions(spark, tmp_path):
    d = _mk_events(spark, tmp_path)
    q = (
        stream_ops.sessionize_stateful(_read_stream(spark, d), watermark="1 minute")
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["user_id"], r["session_start_ms"], r["session_end_ms"], r["n_events"])
        for r in spark.sql("select * from sessions").collect()
    )
    all_sessions = _pandas_sessions(spark, d)
    # no fabricated sessions, no duplicates
    assert len(got) == len(set(got))
    assert set(got) <= set(all_sessions)
    # every session that ended well before the final watermark (the user-4
    # tail at +600 min pushes it to +599 min) must have been closed
    final_wm_ms = max(e for _, _, e, _ in all_sessions) - 60 * 60_000  # tail - wm horizon... conservative
    must_close = {s for s in all_sessions if s[2] + stream_ops.SESSION_GAP_MS < final_wm_ms}
    assert must_close <= set(got)
    # the two explicit gap-split sessions of user 1 and user 3's singleton
    u1 = [s for s in got if s[0] == 1]
    assert len(u1) >= 1  # first session of user 1 closed by its own gap
    assert any(s[0] == 3 and s[3] == 1 for s in got)


# ---------------------------------------------------------------------------
# as-of join
# ---------------------------------------------------------------------------


def test_asof_join_matches_bisect_oracle(spark):
    import bisect
    import random
    from datetime import datetime, timedelta

    random.seed(23)
    base = datetime(2026, 1, 1)
    L = [(i, random.randrange(7), base + timedelta(seconds=random.randrange(500))) for i in range(400)]
    R = [(1000 + i, random.randrange(7), base + timedelta(seconds=random.randrange(500))) for i in range(200)]
    # equal-ts collisions in BOTH directions: left==right ts (inclusive
    # semantics) and duplicate right rows at one (key, ts) (tie_col dedup)
    R += [(2000 + i, u, t) for i, (_, u, t) in enumerate(L[:15])]
    ldf = spark.createDataFrame(L, "event_id long, user_id long, ts timestamp")
    rdf = spark.createDataFrame(R, "signup_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["signup_id"]
        for r in stream_ops.asof_join(
            ldf, rdf, ["user_id"], ts="ts", value_cols=["signup_id"], tie_col="signup_id"
        ).collect()
    }
    # independent oracle: per-key sorted bisect over (ts, max-id-per-ts)
    per_key = {}
    for sid, u, t in R:
        k = per_key.setdefault(u, {})
        k[t] = max(k.get(t, -1), sid)
    want = {}
    for eid, u, t in L:
        items = sorted(per_key.get(u, {}).items())
        i = bisect.bisect_right([x[0] for x in items], t)
        want[eid] = items[i - 1][1] if i else None
    assert got == want
    assert sum(1 for v in want.values() if v is None) > 0  # left-join nulls exercised
    # determinism under a different partition layout
    again = {
        r["event_id"]: r["signup_id"]
        for r in stream_ops.asof_join(
            ldf.repartition(13), rdf.repartition(5), ["user_id"],
            ts="ts", value_cols=["signup_id"], tie_col="signup_id"
        ).collect()
    }
    assert again == got


def test_asof_join_plan_is_one_shuffle_no_cartesian(spark):
    from datetime import datetime

    ldf = spark.createDataFrame(
        [(1, 1, datetime(2026, 1, 1))], "event_id long, user_id long, ts timestamp"
    )
    rdf = spark.createDataFrame(
        [(9, 1, datetime(2026, 1, 1))], "signup_id long, user_id long, ts timestamp"
    )
    j = stream_ops.asof_join(ldf, rdf, ["user_id"], ts="ts", value_cols=["signup_id"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    # the union-scan rewrite shuffles ONCE on the join key (both sides feed
    # one window exchange; no per-side join exchanges)
    assert plan.count("hashpartitioning(user_id") <= 2  # one per union branch max


def test_asof_join_null_right_value_wins_and_left_clash_raises(spark):
    """ADVICE r5 #1: (a) a right row whose value is legitimately NULL still
    overwrites an older non-null row (DuckDB ASOF parity — the carry keys
    on row existence, not value non-nullness); (b) a value_col that already
    exists on the left frame raises instead of silently carrying left
    rows' own values forward."""
    from datetime import datetime

    t = lambda s: datetime(2026, 1, 1, 0, 0, s)
    rdf = spark.createDataFrame(
        [(1, t(0), "old"), (1, t(10), None)], "user_id long, ts timestamp, plan string"
    )
    ldf = spark.createDataFrame(
        [(100, 1, t(5)), (101, 1, t(20))], "event_id long, user_id long, ts timestamp"
    )
    got = {
        r["event_id"]: r["plan"]
        for r in stream_ops.asof_join(
            ldf, rdf, ["user_id"], ts="ts", value_cols=["plan"]
        ).collect()
    }
    assert got == {100: "old", 101: None}  # t=20 sees the NULL overwrite at t=10

    clash = ldf.withColumn("plan", F.lit("mine"))
    with pytest.raises(ValueError, match="plan"):
        stream_ops.asof_join(clash, rdf, ["user_id"], ts="ts", value_cols=["plan"])


def test_hopping_counts_batch_equals_stream_and_membership(spark, tmp_path):
    """Hopping windows: identical plan in batch and stream; every event
    lands in exactly window/slide overlapping windows (membership checked
    against an independent python expansion)."""
    d = _mk_events(spark, tmp_path)
    batch_df = spark.read.schema(EVENTS_DDL).parquet(os.path.join(d, "f*"))
    expected = sorted(map(tuple, stream_ops.hopping_event_counts(batch_df).collect()))

    # independent membership oracle: event t -> window starts
    # generate_series(floor(t/S)*S - W + S, floor(t/S)*S, S)
    W, S = 3600, 1800
    pdf = batch_df.toPandas()
    agg = {}
    for _, r in pdf.iterrows():
        t = int(r["ts"].value // 1_000_000_000)
        base = (t // S) * S
        for s in range(base - W + S, base + 1, S):
            k = (s, s + W, r["event_type"])
            n, m = agg.get(k, (0, None))
            eid = int(r["event_id"])
            agg[k] = (n + 1, eid if m is None or eid < m else m)
    exp_py = sorted((k[0], k[1], k[2], v[0], v[1]) for k, v in agg.items())
    assert expected == exp_py

    q = (
        stream_ops.hopping_event_counts(_read_stream(spark, d))
        .writeStream.format("memory")
        .queryName("hop_counts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("select * from hop_counts").collect()))
    assert got == expected
    # hopping emits ~2x the tumbling windows (every event in W/S windows)
    n_tumble = stream_ops.windowed_event_counts(batch_df).count()
    assert len(got) > n_tumble


def test_interval_join_batch_equals_stream(spark, tmp_path):
    """Stream-stream interval join: same plan in batch and streaming; every
    (view, earlier-view-within-15min) pair of the same user, pinned against
    an independent python expansion."""
    d = _mk_events(spark, tmp_path)
    batch = spark.read.schema(EVENTS_DDL).parquet(os.path.join(d, "f*"))
    left = batch.select("user_id", "ts", F.col("event_id").alias("l_id"))
    right = batch.select("user_id", "ts", F.col("event_id").alias("r_id"))
    out_cols = ["user_id", "l_id", "r_id", "left_ts_s", "right_ts_s"]
    expected = sorted(
        map(tuple, stream_ops.interval_join(left, right, lookback="15 minutes")
            .select(*out_cols).collect())
    )

    # independent oracle
    pdf = batch.toPandas()
    rows = [(int(r.user_id), int(r.event_id), int(r.ts.value // 1_000_000_000)) for r in pdf.itertuples()]
    exp_py = sorted(
        (u, li, ri, lt, rt)
        for (u, li, lt) in rows
        for (u2, ri, rt) in rows
        if u == u2 and lt - 900 <= rt <= lt
    )
    assert expected == exp_py and len(expected) > len(rows)  # self-pairs + overlaps

    sl = _read_stream(spark, d).select("user_id", "ts", F.col("event_id").alias("l_id"))
    sr = _read_stream(spark, d).select("user_id", "ts", F.col("event_id").alias("r_id"))
    q = (
        stream_ops.interval_join(sl, sr, lookback="15 minutes", watermark="10 hours")
        .select(*out_cols)
        .writeStream.format("memory")
        .queryName("ij_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(map(tuple, spark.sql("select * from ij_out").collect()))
    assert got == expected


def _mk_dup_events(spark, tmp_path):
    """Events with in-horizon redeliveries split across 3 files: each
    duplicate carries a LATER ts (the retry), some landing in a later
    micro-batch than the original — the cross-batch state case."""
    base = pd.Timestamp("2026-01-01 00:00:00")

    def ev(eid, minutes, value=1.0):
        return (eid, eid % 3, "view", (base + pd.Timedelta(minutes=minutes)).to_pydatetime(), value)

    f0 = [ev(1, 0), ev(2, 1), ev(1, 2, 9.0), ev(3, 3)]          # same-batch dup of 1
    f1 = [ev(2, 10, 9.0), ev(4, 11), ev(5, 12)]                 # cross-batch dup of 2
    f2 = [ev(4, 20, 9.0), ev(6, 21), ev(3, 22, 9.0)]            # cross-batch dups of 4, 3
    d = str(tmp_path / "dup_events")
    os.makedirs(d, exist_ok=True)
    for i, chunk in enumerate((f0, f1, f2)):
        spark.createDataFrame(chunk, EVENTS_DDL).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(d, f"f{i}")
        )
    return d


def test_dedup_exactly_once_batch_equals_stream(spark, tmp_path):
    """Batch twin keeps the deterministic first arrival; the streaming
    path (dropDuplicatesWithinWatermark) must emit the same event_id SET
    with one row each, and every kept row must be one of that id's
    arrivals. First-arrival VALUES also match here because every
    original lands no later than its retry."""
    d = _mk_dup_events(spark, tmp_path)
    batch_df = spark.read.schema(EVENTS_DDL).parquet(os.path.join(d, "f*"))
    expected = {r.event_id: tuple(r) for r in stream_ops.dedup_exactly_once(batch_df).collect()}
    assert sorted(expected) == [1, 2, 3, 4, 5, 6]
    assert all(expected[i][4] == 1.0 for i in expected)  # originals won, not retries

    q = (
        stream_ops.dedup_exactly_once(_read_stream(spark, d))
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("select * from dedup_stream").collect()
    assert sorted(r.event_id for r in got) == [1, 2, 3, 4, 5, 6]
    # maxFilesPerTrigger=1 processes files in order, so the first arrival
    # is what the stream keeps too: exact parity with the batch twin
    assert {r.event_id: tuple(r) for r in got} == expected


def test_dedup_exactly_once_plan_shape(spark):
    """Batch plan: ONE exchange on the key with map-side partial min_by
    combine (duplicates pre-reduce per map task — the same shape as the
    CDC latest-wins winner agg), and never a Window over the full row
    stream."""
    df = spark.createDataFrame(
        [(1, 1, "view", pd.Timestamp("2026-01-01").to_pydatetime(), 1.0)], EVENTS_DDL
    )
    plan = stream_ops.dedup_exactly_once(df)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min_by" in plan
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
