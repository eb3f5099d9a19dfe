"""Structured Streaming operators — the streaming twins of
operators/timeseries.py (SURVEY §2.9; ABSENT in the reference, which is
request/response only).

Each builder takes a streaming DataFrame (``readStream``) and returns
the windowed aggregation; ``events_stream(spark, sf_dir)`` wires the
driver's events parquet in as a file-stream source so the same queries
run in tests via the memory sink (processAllAvailable → deterministic).

Scale: watermarks bound state; the groupBy keys (window, event_type /
user_id) are the same shuffle keys as the batch twins, so a production
deployment with a Kafka source runs the identical plan continuously.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emdrive_spark.sources.tables import load, table_path

_STAGE_DIRS: dict[str, str] = {}


def _staged_dir(sf_dir: str) -> str:
    """The file-stream source requires a *directory*; stage the single
    events.parquet behind a symlink in a temp dir (local-mode test rig —
    a real deployment streams from a Kafka topic or a landing dir)."""
    if sf_dir not in _STAGE_DIRS:
        d = tempfile.mkdtemp(prefix="emdrive_events_")
        os.symlink(table_path(sf_dir, "events"), os.path.join(d, "events.parquet"))
        _STAGE_DIRS[sf_dir] = d
    return _STAGE_DIRS[sf_dir]


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over the events table (schema taken from the
    batch read, incl. the nanos→µs ts conversion)."""
    batch = load(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_dir(sf_dir))
    )
    # same ns→µs conversion as sources.tables.load
    stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return stream.select(*batch.columns)


def tumbling_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming twin of events_tumbling_count: 10-minute tumbling
    windows with a watermark bounding late data and state size."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming sessionization via F.session_window — the native
    stateful operator the batch twin emulates with lag+cumsum."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Stateful exact dedup on event_id with watermark-bounded state —
    the streaming analog of dedup_exact."""
    return events.withWatermark("ts", "1 hour").dropDuplicates(["event_id", "ts"])


def run_to_memory(
    spark: SparkSession, stream_df: DataFrame, name: str, mode: str = "complete"
) -> DataFrame:
    """Drive a streaming query to completion against the finite file
    source (tests): memory sink + processAllAvailable. mode='complete'
    for aggregations, 'append' for row-wise ops (dedup)."""
    q = (
        stream_df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
