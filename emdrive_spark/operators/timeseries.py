"""Time-series / event-stream operators over the ``events`` table.

ABSENT in the reference (pure request/response HTTP,
/root/reference/src/server/mod.rs:93-138). These are the batch-mode
twins of the Structured Streaming operators in
``emdrive_spark.streaming`` — same windowing semantics, checkable
against DuckDB; the streaming variants add watermarks and run under
``readStream`` (tested in tests/test_streaming.py).

Scale: every op shuffles on (user_id) or on the window bucket — both
high-cardinality and time-partitionable. On a real deployment `events`
is date-partitioned Parquet, so window queries prune to the scanned day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from emdrive_spark.registry import register
from emdrive_spark.sources.tables import load


@register(
    "events_tumbling_count",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows: F.window → epoch-aligned buckets
    (identical alignment to DuckDB's time_bucket)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


@register(
    "events_sliding_avg",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS window_start,
             value
      FROM events
    )
    SELECT window_start, count(*) AS n,
           round(sum(value), 2) / count(*) AS avg_value
    FROM assigned GROUP BY 1
    """,
)
def events_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min size / 5 min slide): each event lands in
    exactly two windows; Spark's F.window(ts, size, slide) expands them
    natively (map-side — no join)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        # avg = round(sum,2)/n with NO outer round: identical doubles
        # divided by identical counts are bitwise-deterministic, while a
        # second rounding would sit on exact decimal midpoints whenever
        # n is a power of two (Spark rounds HALF_UP, DuckDB HALF_EVEN).
        .agg(
            F.count("*").alias("n"),
            (F.round(F.sum("value"), 2) / F.count("*")).alias("avg_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "avg_value")
    )


@register(
    "events_session_agg",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx, count(*) AS n_events,
           round(sum(value), 2) AS sum_value, min(ts) AS session_start
    FROM sessions GROUP BY user_id, session_idx
    """,
)
def events_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap > 30 min starts a new session;
    cumulative sum of the flag numbers the sessions. One shuffle on
    user_id; the streaming twin is F.session_window (see streaming/)."""
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap (cast(long) would truncate to seconds and
    # could disagree with the oracle's interval comparison).
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(order)
    flagged = load(spark, sf_dir, "events").withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(order.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.min("ts").alias("session_start"),
    )


@register(
    "json_extract_props",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
    FROM events
    """,
)
def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction from the props column (SURVEY §2.8)."""
    return load(spark, sf_dir, "events").select(
        "event_id", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
