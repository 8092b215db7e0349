"""Crafted-spike semantics for the rolling z-score anomaly detector."""

import datetime

import pytest

from graphdb_neo4j_spark.operators import events


@pytest.fixture(scope="module")
def spiky(spark, tmp_path_factory):
    """40 days of a flat-ish 10±1/day signal with a 60-event spike on day 35."""
    rows = []
    eid = 0
    base = datetime.datetime(2024, 1, 1)
    for day in range(40):
        n = 10 + (day % 3 == 0)  # 10 or 11 — small real variance, std > 0
        if day == 35:
            n = 60
        for i in range(n):
            rows.append(
                (eid, base + datetime.timedelta(days=day, minutes=i), 1, "click", 1.0, "{}")
            )
            eid += 1
    d = tmp_path_factory.mktemp("anom")
    spark.createDataFrame(
        rows,
        schema="event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return str(d)


def test_spike_day_is_flagged_and_only_it(spark, spiky):
    out = {r["day"]: r for r in events.q_events_anomaly(spark, spiky).collect()}
    assert out["2024-02-05"]["is_anomaly"]  # day 35
    assert out["2024-02-05"]["z_score"] > 10
    flagged = [d for d, r in out.items() if r["is_anomaly"]]
    assert flagged == ["2024-02-05"]


def test_warmup_days_never_flag(spark, spiky):
    out = {r["day"]: r for r in events.q_events_anomaly(spark, spiky).collect()}
    for day in range(events.ANOMALY_MIN_BASELINE):
        key = (datetime.date(2024, 1, 1) + datetime.timedelta(days=day)).isoformat()
        assert out[key]["z_score"] is None or day >= events.ANOMALY_MIN_BASELINE
        assert not out[key]["is_anomaly"] or day >= events.ANOMALY_MIN_BASELINE


def test_baseline_excludes_current_day(spark, spiky):
    """The spike's own 60 events must not inflate its baseline mean."""
    out = {r["day"]: r for r in events.q_events_anomaly(spark, spiky).collect()}
    assert out["2024-02-05"]["baseline_mean"] < 12  # trailing window only
    # the day AFTER the spike has the spike in ITS baseline → mean jumps
    assert out["2024-02-06"]["baseline_mean"] > out["2024-02-05"]["baseline_mean"]
