"""Streaming/batch parity: each Structured Streaming operator run with
trigger(availableNow=True) over the bounded fixture must agree with its
batch twin — the unified-model guarantee the streaming package claims."""

import pytest

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators.events import (
    asof_join_events,
    load_events,
    q_events_hourly,
)
from graphdb_neo4j_spark.streaming import (
    asof_stream,
    hourly_stream,
    run_available_now,
    session_window_stream,
    stream_events,
    user_counts_stateful_stream,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hourly_stream_matches_batch(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    out = run_available_now(spark, hourly_stream(ev), "hourly_avail")
    batch = q_events_hourly(spark, sf_dir)
    cols = ["window_start", "event_type", "n", "sum_value"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_session_window_stream_counts(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    out = run_available_now(spark, session_window_stream(ev), "sessions_avail")
    # session totals must cover every event exactly once
    total = out.agg(F.sum("n_events")).collect()[0][0]
    n_events = load_events(spark, sf_dir).count()
    assert total == n_events
    # per-user totals match a batch groupBy
    per_user = out.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    batch = load_events(spark, sf_dir).groupBy("user_id").agg(
        F.count("*").alias("n")
    )
    assert _rows(per_user, ["user_id", "n"]) == _rows(batch, ["user_id", "n"])


def test_asof_stream_matches_batch(spark, sf_dir):
    out = run_available_now(
        spark,
        asof_stream(stream_events(spark, sf_dir)),
        "asof_avail",
        output_mode="append",
    )
    batch = asof_join_events(load_events(spark, sf_dir))
    cols = ["event_id", "user_id", "ts_ms", "prior_ts_ms", "lag_ms", "n_prior"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_asof_stream_custom_types_match_batch(spark, sf_dir):
    """Swapped left/right types must flow into the state kernel (the
    kernel closes over left_type; a module-constant kernel silently
    mislabeled custom types)."""
    out = run_available_now(
        spark,
        asof_stream(stream_events(spark, sf_dir), "purchase", "click"),
        "asof_custom_avail",
        output_mode="append",
    )
    batch = asof_join_events(load_events(spark, sf_dir), "purchase", "click")
    cols = ["event_id", "user_id", "ts_ms", "prior_ts_ms", "lag_ms", "n_prior"]
    assert _rows(out, cols) == _rows(batch, cols)


def test_json_stream_matches_batch(spark, sf_dir):
    from graphdb_neo4j_spark.operators.events import q_events_json
    from graphdb_neo4j_spark.streaming.events_stream import json_stats_stream

    out = run_available_now(
        spark,
        json_stats_stream(stream_events(spark, sf_dir)),
        "json_avail",
    )
    cols = ["event_type", "n", "sum_k", "min_k", "max_k"]
    assert _rows(out, cols) == _rows(q_events_json(spark, sf_dir), cols)


def test_transform_with_state_counts_match_batch(spark, sf_dir):
    """The transformWithStateInPandas form must reach the same final
    per-user totals as the batch groupBy (same contract as the
    applyInPandasWithState twin). Skips where protobuf (the TWS state
    protocol dependency) is absent — this container ships without it."""
    pytest.importorskip("google.protobuf.descriptor")
    from graphdb_neo4j_spark.streaming.events_stream import user_counts_tws_stream

    out = run_available_now(
        spark,
        user_counts_tws_stream(stream_events(spark, sf_dir)),
        "tws_counts_avail",
        output_mode="update",
    )
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n"))
    batch = load_events(spark, sf_dir).groupBy("user_id").agg(
        F.count("*").alias("n")
    )
    assert _rows(final, ["user_id", "n"]) == _rows(batch, ["user_id", "n"])


def test_stateful_user_counts_match_batch(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    out = run_available_now(
        spark,
        user_counts_stateful_stream(ev),
        "user_counts_avail",
        output_mode="update",
    )
    # update mode may emit one row per micro-batch per key: keep the max
    # (the final running count) per user
    final = out.groupBy("user_id").agg(F.max("n_events").alias("n"))
    batch = load_events(spark, sf_dir).groupBy("user_id").agg(
        F.count("*").alias("n")
    )
    assert _rows(final, ["user_id", "n"]) == _rows(batch, ["user_id", "n"])


def test_stream_dedup_is_exactly_once(spark, sf_dir):
    """Doubled delivery in, each event exactly once out — and the survivor
    set is the full batch table (nothing lost, nothing duplicated)."""
    from graphdb_neo4j_spark.streaming.events_stream import q_stream_dedup

    out = q_stream_dedup(spark, sf_dir)
    batch = load_events(spark, sf_dir)
    assert out.count() == batch.count()
    assert out.select("event_id").distinct().count() == batch.count()


def test_asof_state_handles_late_right_across_batches(spark):
    """A right-side event arriving in a later micro-batch BEHIND rights
    already in state must merge into the buffered right timeline: every
    left processed afterwards must equal the batch ``asof_join`` answer
    (the old scalar latest-ts state mis-joined them to the late right).
    Third batch: rights at-or-before the watermark fold into the
    (latest, count) scalars and matching stays exact."""
    import pandas as pd

    from graphdb_neo4j_spark.streaming.events_stream import _make_asof_fn

    class FakeState:
        def __init__(self, wm_ms=0):
            self.exists = False
            self.get = None
            self._wm = wm_ms

        def update(self, v):
            self.exists = True
            self.get = v

        def getCurrentWatermarkMs(self):
            return self._wm

    fn = _make_asof_fn("click")
    H = 3600 * 10**9  # ns

    def run_batch(state, rows):
        pdf = pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": 1,
                "ts": [pd.Timestamp(r[2] * H) for r in rows],
                "event_type": [r[1] for r in rows],
            }
        )
        outs = pd.concat(list(fn((1,), iter([pdf]), state)))
        return {
            int(r.event_id): (
                None if pd.isna(r.prior_ts_ms) else int(r.prior_ts_ms),
                int(r.n_prior),
            )
            for r in outs.itertuples()
        }

    ms = 3600 * 1000
    state = FakeState()
    # batch 1: purchase @10h, click @10.5h
    out1 = run_batch(state, [(1, "purchase", 10), (2, "click", 10.5)])
    assert out1 == {2: (10 * ms, 1)}
    # batch 2: LATE purchase @9h (behind the buffered 10h), clicks @9.5h
    # and @11h — the 11h click must still match the 10h right (scalar
    # state would have ffilled the late 9h right onto it)
    out2 = run_batch(
        state, [(3, "purchase", 9), (4, "click", 9.5), (5, "click", 11)]
    )
    assert out2 == {4: (9 * ms, 1), 5: (10 * ms, 2)}
    # batch 3 under an advanced watermark (10.5h): both rights fold into
    # the evicted scalars, and a later click still matches exactly
    state._wm = int(10.5 * ms)
    out3 = run_batch(state, [(6, "click", 12)])
    assert out3 == {6: (10 * ms, 2)}
    rights_buf, evicted_latest, n_evicted = state.get
    us = 3600 * 10**6
    assert rights_buf == [] and evicted_latest == 10 * us and n_evicted == 2

    # the whole scenario must equal the batch as-of oracle on the union
    from graphdb_neo4j_spark.operators.events import asof_join_events

    all_events = spark.createDataFrame(
        [
            (eid, 1, pd.Timestamp(h * H).to_pydatetime(), et)
            for eid, et, h in [
                (1, "purchase", 10),
                (2, "click", 10.5),
                (3, "purchase", 9),
                (4, "click", 9.5),
                (5, "click", 11),
                (6, "click", 12),
            ]
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    batch = {
        int(r["event_id"]): (
            None if r["prior_ts_ms"] is None else int(r["prior_ts_ms"]),
            int(r["n_prior"]),
        )
        for r in asof_join_events(all_events).collect()
    }
    # every left processed AFTER the late right arrived matches the batch
    # oracle exactly (the hardening under test)
    streamed = {**out2, **out3}
    assert streamed == {k: batch[k] for k in streamed}
    # documented append-mode residual: a left emitted BEFORE the late
    # right (click 2, batch 1) keeps its at-arrival enrichment — the
    # batch oracle retro-counts the 9h purchase into its n_prior
    assert out1[2] == (10 * ms, 1) and batch[2] == (10 * ms, 2)


def test_asof_kernel_sees_rights_in_later_arrow_chunks():
    """Group rows arrive across Arrow CHUNKS of one micro-batch in no
    time order: a right in a LATER chunk must be visible to lefts in an
    EARLIER chunk (r6 fix — per-chunk enrichment missed it, so
    batch-equivalence held only while a group fit one Arrow batch)."""
    import pandas as pd

    from graphdb_neo4j_spark.streaming.events_stream import _make_asof_fn

    class FakeState:
        exists = False
        get = None

        def update(self, v):
            self.exists = True
            self.get = v

        def getCurrentWatermarkMs(self):
            return 0

    fn = _make_asof_fn("click")
    H = 3600 * 10**9  # ns

    def chunk(rows):
        return pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "user_id": 1,
                "ts": [pd.Timestamp(r[2] * H) for r in rows],
                "event_type": [r[1] for r in rows],
            }
        )

    # chunk 1 carries the lefts, chunk 2 the earlier-in-time right
    chunks = [
        chunk([(1, "click", 10.5), (2, "click", 11)]),
        chunk([(3, "purchase", 10)]),
    ]
    state = FakeState()
    out = pd.concat(list(fn((1,), iter(chunks), state)))
    got = {
        int(r.event_id): (
            None if pd.isna(r.prior_ts_ms) else int(r.prior_ts_ms),
            int(r.n_prior),
        )
        for r in out.itertuples()
    }
    ms = 3600 * 1000
    assert got == {1: (10 * ms, 1), 2: (10 * ms, 1)}


def test_stream_funnel_repairs_out_of_order_stage1(spark):
    """A late stage-1 event that moves the funnel window must both ENABLE
    stages it newly reaches and INVALIDATE stages it no longer covers —
    the recompute-from-lists state handles what scalar (t1,t2,t3) state
    cannot."""
    import pandas as pd

    from graphdb_neo4j_spark.streaming.events_stream import _funnel_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, v):
            self.exists = True
            self.get = v

    def run_batch(state, rows):
        pdf = pd.DataFrame(
            {
                "event_type": [r[0] for r in rows],
                "ts": [pd.Timestamp(r[1]) for r in rows],
            }
        )
        (out,) = list(_funnel_fn((1,), iter([pdf]), state))
        return int(out["reached"][0])

    day = 24 * 3600 * 10**9  # ns
    state = FakeState()
    # batch 1: view at t=30h, purchase at t=31h, signup at t=29h
    # → funnel windows: view within [29h, 53h] ✓, purchase ✓ → reached 3
    r1 = run_batch(
        state,
        [
            ("view", 30 * 3600 * 10**9),
            ("purchase", 31 * 3600 * 10**9),
            ("signup", 29 * 3600 * 10**9),
        ],
    )
    assert r1 == 3
    # batch 2: a LATE signup at t=1h arrives. t1 moves to 1h; the only
    # view (t=30h) is outside [1h, 25h] → reached collapses to 1.
    r2 = run_batch(state, [("signup", 1 * 3600 * 10**9)])
    assert r2 == 1
    # batch 3: a view at t=20h re-enables stage 2 ([1h, 25h] ✓), and the
    # purchase at 31h is within [20h, 44h] → reached 3 again.
    r3 = run_batch(state, [("view", 20 * 3600 * 10**9)])
    assert r3 == 3


def test_stream_interval_join_matches_batch_pairs(spark, sf_dir):
    """The watermarked stream-stream interval join drained with
    availableNow must equal the batch inner pair join exactly."""
    from graphdb_neo4j_spark.streaming.events_stream import q_stream_interval

    out = q_stream_interval(spark, sf_dir)
    ev = load_events(spark, sf_dir)
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.unix_millis("ts").alias("c_ms")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.col("user_id").alias("pu"), F.unix_millis("ts").alias("p_ms")
    )
    w_ms = 60 * 60 * 1000
    batch = p.join(
        c,
        (F.col("cu") == F.col("pu"))
        & (F.col("c_ms") > F.col("p_ms") - w_ms)
        & (F.col("c_ms") <= F.col("p_ms")),
    ).select(
        "event_id",
        F.col("pu").alias("user_id"),
        F.col("p_ms").alias("ts_ms"),
        F.col("c_ms").alias("click_ms"),
    )
    cols = ["event_id", "user_id", "ts_ms", "click_ms"]
    assert _rows(out, cols) == _rows(batch, cols)
    assert batch.count() > 0  # fixture must actually exercise the join


def test_stream_transitions_state_bridges_batches(spark, sf_dir):
    """The previous batch's final event must seed the next batch's first
    pair (batch boundaries invisible), and the drained availableNow run
    must equal the batch operator."""
    import pandas as pd

    from graphdb_neo4j_spark.operators.events import q_event_transitions
    from graphdb_neo4j_spark.streaming.events_stream import (
        _transitions_fn,
        q_stream_transitions,
    )

    class FakeState:
        def __init__(self):
            self.exists = False
            self.get = None

        def update(self, v):
            self.exists = True
            self.get = v

    def run_batch(state, rows):
        pdf = pd.DataFrame(
            {
                "event_id": [r[0] for r in rows],
                "ts": [pd.Timestamp(r[1], unit="s") for r in rows],
                "event_type": [r[2] for r in rows],
            }
        )
        outs = list(_transitions_fn((1,), iter([pdf]), state))
        return (
            list(zip(outs[0]["from_type"], outs[0]["to_type"])) if outs else []
        )

    state = FakeState()
    assert run_batch(state, [(1, 10, "view"), (2, 20, "click")]) == [
        ("view", "click")
    ]
    # boundary pair: click (batch 1 tail) -> purchase (batch 2 head)
    assert run_batch(state, [(3, 30, "purchase"), (4, 40, "view")]) == [
        ("click", "purchase"),
        ("purchase", "view"),
    ]
    # empty batch leaves state untouched
    assert run_batch(state, []) == []
    assert run_batch(state, [(5, 50, "error")]) == [("view", "error")]

    cols = ["from_type", "to_type", "n", "p_to_given_from"]
    out = q_stream_transitions(spark, sf_dir)
    batch = q_event_transitions(spark, sf_dir)
    assert _rows(out, cols) == _rows(batch, cols)
