"""Fixture-drift guard: catches the next events.parquet re-encoding in
seconds of pytest instead of a crashed driver round.

Round-2 postmortem: the driver regenerated ``events.parquet`` from
TIMESTAMP(NANOS) to plain ``timestamp[us]`` (TIMESTAMP_NTZ to Spark) and
the old readers either crashed (``unix_millis`` on NTZ) or silently
decoded every event into January 1970 (streaming's hardcoded
nanos-as-bigint schema). These tests pin the three invariants that break
under any such drift:

1. the loaded ``ts`` is session-zoned TimestampType (not NTZ, not bigint);
2. the decoded instants agree with an independent pyarrow read of the
   same file (epoch-micros exact, no 1970 shift, no ns/us confusion);
3. batch and streaming readers decode identically.
"""

from __future__ import annotations

import pyarrow.parquet as pq
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from graphdb_neo4j_spark.operators.events import load_events
from graphdb_neo4j_spark.streaming import run_available_now, stream_events


def _pyarrow_epoch_us(sf_dir: str) -> dict[int, int]:
    """Independent ground truth: event_id -> epoch micros straight from the
    parquet file, normalized from whatever unit pyarrow reports."""
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_id", "ts"])
    ts = t.column("ts")
    typ = ts.type
    if str(typ).startswith("timestamp"):
        unit_div = {"s": 1, "ms": 1, "us": 1, "ns": 1000}[typ.unit]
        unit_mul = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": 1}[typ.unit]
        raw = ts.cast("int64").to_pylist()
        vals = [v * unit_mul // unit_div if v is not None else None for v in raw]
    else:  # bigint nanos encoding
        vals = [v // 1000 for v in ts.to_pylist()]
    return dict(zip(t.column("event_id").to_pylist(), vals))


# Column names + core types per fixture table. Timestamp-ish columns
# accept every encoding normalize_ts handles (the known drift axis —
# round 2 shipped nanos→micros silently); anything else failing here
# means the driver regenerated the fixture shape and readers need review.
_FLEX_TS = {"bigint", "timestamp", "timestamp_ntz"}
EXPECTED_SCHEMAS = {
    "region": {"r_regionkey": "int", "r_name": "string"},
    "nation": {"n_nationkey": "int", "n_name": "string", "n_regionkey": "int"},
    "customer": {
        "c_custkey": "bigint", "c_name": "string", "c_nationkey": "int",
        "c_acctbal": "double", "c_mktsegment": "string",
    },
    "supplier": {
        "s_suppkey": "bigint", "s_name": "string", "s_nationkey": "int",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "bigint", "p_name": "string", "p_brand": "string",
        "p_type": "string", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "bigint", "o_custkey": "bigint",
        "o_orderstatus": "string", "o_totalprice": "double",
        "o_orderdate": _FLEX_TS | {"date"}, "o_orderpriority": "string",
    },
    "lineitem": {
        "l_orderkey": "bigint", "l_partkey": "bigint", "l_suppkey": "bigint",
        "l_linenumber": "int", "l_quantity": "double",
        "l_extendedprice": "double", "l_discount": "double", "l_tax": "double",
        "l_returnflag": "string", "l_linestatus": "string",
        "l_shipdate": _FLEX_TS | {"date"},
    },
    "events": {
        "event_id": "bigint", "ts": _FLEX_TS, "user_id": "bigint",
        "event_type": "string", "value": "double", "props": "string",
    },
    "documents": {
        "doc_id": "bigint", "text": "string", "lang": "string",
        "source": "string", "n_chars": "bigint",
    },
    "embeddings": {
        "vec_id": "bigint", "embedding": "array<float>", "label": "int",
    },
}


def test_all_fixture_table_schemas(spark, sf_dir):
    for table, expected in EXPECTED_SCHEMAS.items():
        got = dict(spark.read.parquet(f"{sf_dir}/{table}.parquet").dtypes)
        assert set(got) == set(expected), (
            f"{table}: columns drifted — got {sorted(got)}, "
            f"expected {sorted(expected)}"
        )
        for col, want in expected.items():
            allowed = want if isinstance(want, set) else {want}
            assert got[col] in allowed, (
                f"{table}.{col}: type {got[col]} not in {allowed} — fixture "
                "regenerated; review the readers before trusting results"
            )


def test_events_ts_is_timestamp_type(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    assert isinstance(ev.schema["ts"].dataType, TimestampType), (
        f"events.ts loaded as {ev.schema['ts'].dataType}; fixture encoding "
        "drifted — extend normalize_ts in operators/events.py"
    )


def test_events_epoch_matches_pyarrow(spark, sf_dir):
    truth = _pyarrow_epoch_us(sf_dir)
    got = {
        r["event_id"]: r["us"]
        for r in load_events(spark, sf_dir)
        .select("event_id", F.unix_micros("ts").alias("us"))
        .limit(50)
        .collect()
    }
    assert got, "no events read"
    for eid, us in got.items():
        assert us == truth[eid], (
            f"event {eid}: Spark decoded epoch_us={us}, file says {truth[eid]} "
            "(1970-shift / unit-confusion class of bug)"
        )


def test_events_not_in_1970(spark, sf_dir):
    # cheap year-range sanity independent of the pyarrow cross-check
    lo, hi = (
        load_events(spark, sf_dir)
        .agg(F.min(F.year("ts")), F.max(F.year("ts")))
        .collect()[0]
    )
    assert 2000 <= lo <= hi <= 2100, f"event years [{lo}, {hi}] out of range"


def test_stream_events_decodes_like_batch(spark, sf_dir):
    batch = load_events(spark, sf_dir).select(
        "event_id", F.unix_micros("ts").alias("us")
    )
    streamed = run_available_now(
        spark,
        stream_events(spark, sf_dir).select(
            "event_id", F.unix_micros("ts").alias("us")
        ),
        "fixture_drift_stream_sink",
        output_mode="append",
    )
    b = sorted((r["event_id"], r["us"]) for r in batch.collect())
    s = sorted((r["event_id"], r["us"]) for r in streamed.collect())
    assert b == s


def test_rollup_serve_split_is_invisible(spark, sf_dir):
    """Materialized-plus-tail serving must equal the one-shot hourly
    aggregation for any cutoff (hour alignment makes the window sets
    disjoint)."""
    from graphdb_neo4j_spark.operators.events import (
        q_events_hourly,
        q_hourly_rollup_serve,
    )

    cols = ["window_start", "event_type", "n", "sum_value"]

    def rows(df):
        return sorted(tuple(r[c] for c in cols) for r in df.collect())

    base = rows(q_events_hourly(spark, sf_dir))
    for frac in (0.0, 0.3, 0.9, 1.0):
        assert rows(q_hourly_rollup_serve(spark, sf_dir, frac)) == base, frac
