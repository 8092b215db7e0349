"""Incrementally-maintained hourly rollup ≡ one-shot batch aggregation."""

from pyspark.sql import functions as F

from graphdb_neo4j_spark.operators import events
from graphdb_neo4j_spark.streaming import rollup_maintain
from graphdb_neo4j_spark.streaming.events_stream import stream_events


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_maintained_store_equals_batch_hourly(spark, sf_dir, tmp_path):
    store = str(tmp_path / "store")
    rollup_maintain.maintain_hourly_rollup(
        spark, stream_events(spark, sf_dir), store
    )
    got = _rows(rollup_maintain.read_hourly_rollup(spark, store))
    want = _rows(events.q_events_hourly(spark, sf_dir))
    assert got == want


def test_two_generation_merge_equals_one_shot(spark, sf_dir, tmp_path):
    """Maintain from two disjoint event slices arriving as separate runs —
    the merged store must equal the whole-input batch answer, proving the
    foreachBatch fold re-aggregates keys straddling the generations
    (hours split across slices) instead of last-write-wins."""
    store = str(tmp_path / "inc")
    s1 = stream_events(spark, sf_dir).filter(F.col("event_id") % 2 == 0)
    s2 = stream_events(spark, sf_dir).filter(F.col("event_id") % 2 == 1)
    rollup_maintain.maintain_hourly_rollup(spark, s1, store)
    # second run needs its own checkpoint (same store, new source lineage)
    import shutil

    shutil.rmtree(f"{store}/_checkpoint")
    rollup_maintain.maintain_hourly_rollup(spark, s2, store)

    got = _rows(rollup_maintain.read_hourly_rollup(spark, store))
    want = _rows(events.q_events_hourly(spark, sf_dir))
    assert got == want


def test_store_is_day_partitioned(spark, sf_dir, tmp_path):
    import glob

    store = str(tmp_path / "p")
    rollup_maintain.maintain_hourly_rollup(
        spark, stream_events(spark, sf_dir), store
    )
    assert len(glob.glob(f"{store}/d=*")) > 1  # directory-prunable layout


def test_stream_anomaly_equals_batch_anomaly(spark, sf_correct):
    from graphdb_neo4j_spark.streaming import rollup_maintain

    got = _rows(rollup_maintain.q_stream_anomaly(spark, sf_correct))
    want = _rows(events.q_events_anomaly(spark, sf_correct))
    assert got == want


def test_daily_store_two_generation_merge(spark, sf_dir, tmp_path):
    """Events split across two maintenance runs: per-day counts must SUM
    (a day straddling the split gets contributions from both runs)."""
    import shutil

    from graphdb_neo4j_spark.streaming import rollup_maintain

    store = str(tmp_path / "daily")
    s1 = stream_events(spark, sf_dir).filter(F.col("event_id") % 2 == 0)
    s2 = stream_events(spark, sf_dir).filter(F.col("event_id") % 2 == 1)
    rollup_maintain.maintain_daily_counts(spark, s1, store)
    shutil.rmtree(f"{store}/_checkpoint")
    rollup_maintain.maintain_daily_counts(spark, s2, store)

    got = {
        (r["event_type"], str(r["d"])): r["n"]
        for r in spark.read.parquet(store).collect()
    }
    want = {
        (r["event_type"], str(r["d"])): r["n"]
        for r in events.load_events(spark, sf_dir)
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_stream_sessionize_equals_batch(spark, sf_correct):
    from graphdb_neo4j_spark.streaming import rollup_maintain

    got = _rows(rollup_maintain.q_stream_sessionize(spark, sf_correct))
    want = _rows(events.q_sessionize(spark, sf_correct))
    assert got == want


def test_session_store_fuses_straddling_sessions(spark, sf_dir, tmp_path):
    """Split events by parity (timestamps interleave heavily, so most
    sessions straddle the two maintenance runs — and a second run can
    FUSE two previously-separate stored sessions): the merged store must
    equal the whole-input batch sessionization exactly."""
    import shutil

    from graphdb_neo4j_spark.streaming import rollup_maintain

    store = str(tmp_path / "sess")
    s1 = stream_events(spark, sf_dir).filter(F.col("event_id") % 2 == 0)
    s2 = stream_events(spark, sf_dir).filter(F.col("event_id") % 2 == 1)
    rollup_maintain.maintain_sessions(spark, s1, store)
    shutil.rmtree(f"{store}/_checkpoint")
    rollup_maintain.maintain_sessions(spark, s2, store)

    got = {
        (r["user_id"], r["n_sessions"], r["n_events"], r["max_session_events"])
        for r in spark.read.parquet(store)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.max("n_events").alias("max_session_events"),
        )
        .collect()
    }
    want = {
        (r["user_id"], r["n_sessions"], r["n_events"], r["max_session_events"])
        for r in events.q_sessionize(spark, sf_dir).collect()
    }
    assert got == want
