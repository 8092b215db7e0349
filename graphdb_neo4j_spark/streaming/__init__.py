"""Structured Streaming operators (SURVEY.md §2.8 extension).

The reference has no streaming surface — its closest analog is the
startup backfill thread (src/main.py:25-35). This package provides the
streaming forms of the event analytics: tumbling-window aggregation with
a watermark, native session windows, and a custom stateful operator via
``applyInPandasWithState``. Each has an ``availableNow`` runner whose
bounded output is pytest-compared against the equivalent batch query —
the batch/streaming parity check Structured Streaming's unified model
promises.
"""

from graphdb_neo4j_spark.streaming.events_stream import (
    asof_stream,
    dedup_stream,
    hourly_stream,
    run_available_now,
    session_window_stream,
    stream_events,
    user_counts_stateful_stream,
)

__all__ = [
    "asof_stream",
    "dedup_stream",
    "hourly_stream",
    "run_available_now",
    "session_window_stream",
    "stream_events",
    "user_counts_stateful_stream",
]
