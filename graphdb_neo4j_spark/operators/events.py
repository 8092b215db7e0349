"""Event-stream batch analytics over the ``events`` table: tumbling-window
aggregation, JSON property extraction, sessionization.

The reference has no streaming operators (SURVEY.md §2.8); these are the
designated extensions over the driver's events fixture, expressed as batch
queries with DuckDB oracles. The same logical shapes (tumbling window agg,
stateful sessionization) port directly to Structured Streaming
(readStream + watermark / applyInPandasWithState) when an append source
exists.

Determinism: window starts are emitted as formatted strings (timestamp
representation parity), sums run on exact decimals (value is 2-decimal by
data contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with ``ts`` as a proper timestamp.

    The file stores TIMESTAMP(NANOS), which Spark's vectorized reader
    rejects by default (PARQUET_TYPE_ILLEGAL). We set the runtime SQLConf
    ``spark.sql.legacy.parquet.nanosAsLong`` HERE — not only in get_spark()
    — so the read works on ANY caller-supplied SparkSession (the driver
    harness builds its own). Nanos arrive as LONG and are truncated to
    microseconds — the same truncation DuckDB applies casting TIMESTAMP_NS
    → TIMESTAMP, keeping oracle parity."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
    return ev


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows × event_type: count + exact sum(value)."""
    ev = load_events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
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


EVENTS_HOURLY_SQL = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction (props is a JSON string column): per
    event_type stats over props.k."""
    ev = load_events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       COUNT(*) AS n,
       SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
"""


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Assign session ids per user: a session breaks when the gap from the
    previous event exceeds ``gap_minutes`` (gaps-and-islands via lag +
    running sum)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = gap_minutes * 60 * 1000  # millisecond precision on both engines
    is_new = (
        F.when(
            F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w) > gap_ms,
            1,
        )
        .otherwise(0)
    )
    return events.withColumn("new_session", is_new).withColumn(
        "session_id", F.sum("new_session").over(w)
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats: #sessions, #events, largest session."""
    ev = load_events(spark, sf_dir)
    sess = sessionize(ev)
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )
    return per_session.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.sum("n_events").alias("n_events"),
        F.max("n_events").alias("max_session_events"),
    )


SESSIONIZE_SQL = f"""
WITH ordered AS (
    SELECT user_id, event_id, ts,
           CASE WHEN epoch_ms(ts::TIMESTAMP) - epoch_ms(LAG(ts::TIMESTAMP) OVER w) > {SESSION_GAP_MIN * 60 * 1000}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
),
with_sess AS (
    SELECT user_id, event_id,
           SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
    FROM ordered
),
per_session AS (
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM with_sess GROUP BY user_id, session_id
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       SUM(n_events) AS n_events,
       MAX(n_events) AS max_session_events
FROM per_session
GROUP BY user_id
"""
