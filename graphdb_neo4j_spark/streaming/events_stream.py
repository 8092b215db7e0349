"""Streaming event analytics: readStream → windowed/stateful transforms →
writeStream, with ``availableNow`` runners for bounded verification.

Shapes and their batch twins (operators/events.py):

- :func:`hourly_stream`   — tumbling 1-hour window + watermark; twin of
  ``q_events_hourly``. Late data beyond the watermark is dropped at the
  state boundary — on the bounded fixture nothing is late, so the
  availableNow run must equal the batch result EXACTLY (pytest-checked).
- :func:`session_window_stream` — native ``session_window`` (gap-merged
  state windows); the streaming analog of the batch gaps-and-islands
  sessionizer.
- :func:`user_counts_stateful_stream` — custom per-key state via
  ``applyInPandasWithState`` (Arrow-batched, GroupState-backed): the
  extension point for operators Spark's built-ins can't express
  (counters, decaying aggregates, CEP-ish logic).

Scale notes: all state is keyed (event_type / user_id) and partitioned by
the shuffle on the grouping key; watermarks bound state size for the
window forms. The parquet source here is the test fixture — swap
``readStream.parquet`` for Kafka/files-on-arrival in production; every
transform below is source-agnostic.

The TIMESTAMP(NANOS) fixture quirk is handled the same way as the batch
reader (nanosAsLong + truncate to micros), so both paths see identical
timestamps.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP = "30 minutes"

# events.parquet under nanosAsLong: ts arrives as BIGINT nanos.
EVENTS_RAW_SCHEMA = (
    "event_id bigint, ts bigint, user_id bigint, event_type string,"
    " value double, props string"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the events fixture with ``ts`` as a proper
    timestamp (micros truncation identical to operators/events.load_events)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see load_events
    ev = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        # file source requires a DIRECTORY; glob-filter to the events table
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return ev.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


def hourly_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1-hour × event_type counts/sums with a watermark bounding
    the window state."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def session_window_stream(
    events: DataFrame, gap: str = SESSION_GAP, watermark: str = "2 hours"
) -> DataFrame:
    """Per-user session aggregation via the native session_window state
    operator (windows merge while events arrive within ``gap``)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


# --- custom stateful operator (applyInPandasWithState) ----------------------

_STATE_SCHEMA = "n bigint"
_COUNT_OUT_SCHEMA = "user_id bigint, n_events bigint"


def _count_events_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Running per-user event count: state = one long; each micro-batch
    adds its rows and emits the updated total (output mode 'update')."""
    n = state.get[0] if state.exists else 0
    for pdf in batches:
        n += len(pdf)
    state.update((n,))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})


def user_counts_stateful_stream(events: DataFrame) -> DataFrame:
    """Custom keyed state: per-user running event counts."""
    return events.groupBy("user_id").applyInPandasWithState(
        _count_events_fn,
        outputStructType=_COUNT_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- bounded runner ---------------------------------------------------------


def run_available_now(
    spark: SparkSession,
    streaming_df: DataFrame,
    query_name: str,
    output_mode: str = "complete",
    timeout_s: int = 120,
) -> DataFrame:
    """Execute a streaming transform over the bounded fixture with
    ``trigger(availableNow=True)`` into a memory sink and return the final
    table — the batch-equivalence harness for every operator above."""
    q = (
        streaming_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_s)
    finally:
        q.stop()
    return spark.table(query_name)


# --- registered query forms + oracles ---------------------------------------
#
# availableNow over the bounded fixture makes every streaming operator
# oracle-checkable: the final memory-sink table must equal the batch
# answer (nothing is late on a bounded source), so the DuckDB oracle is
# the SAME SQL the batch twin uses.


def q_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window agg, run to completion and compared
    against the batch oracle (twin of operators/events.q_events_hourly)."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(spark, hourly_stream(ev), "stream_hourly_sink")


def q_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window state operator run to completion. Session
    boundary discipline: session_window merges an event iff it lands
    STRICTLY within ``gap`` of the window end, so the oracle breaks
    sessions on ``diff >= gap`` (the batch gaps-and-islands form uses
    ``> gap`` — equivalent unless an exact-gap pair exists)."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(spark, session_window_stream(ev), "stream_sessions_sink")


STREAM_SESSIONS_SQL = f"""
WITH ordered AS (
    SELECT user_id, ts::TIMESTAMP AS ts,
           CASE WHEN epoch_ms(ts::TIMESTAMP)
                     - epoch_ms(lag(ts::TIMESTAMP) OVER (PARTITION BY user_id ORDER BY ts))
                     >= {30 * 60 * 1000} THEN 1 ELSE 0 END AS new_session
    FROM events
),
numbered AS (
    SELECT user_id, ts,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM ordered
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
"""


def q_stream_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom applyInPandasWithState operator run to completion. Update-mode
    emissions are per-micro-batch, so the row set depends on batch split —
    registered rows-only; the pytest invariant checks final totals."""
    ev = stream_events(spark, sf_dir)
    return run_available_now(
        spark,
        user_counts_stateful_stream(ev),
        "stream_user_counts_sink",
        output_mode="update",
    )
