"""Structured Streaming operators — the streaming twins of
operators/timeseries.py (SURVEY §2.9; ABSENT in the reference, which is
request/response only).

Each builder takes a streaming DataFrame (``readStream``) and returns
the windowed aggregation; ``events_stream(spark, sf_dir)`` wires the
driver's events parquet in as a file-stream source so the same queries
run in tests via the memory sink (processAllAvailable → deterministic).

Scale: the windowed aggregations, the stream-stream join, and the
dedup bound their state by watermark; the applyInPandasWithState /
transformWithStateInPandas running-total operators intentionally keep
one state entry per key for the key's lifetime (a running total IS
per-key history — production deployments with churning key spaces add
a TTL timeout and merge evicted partials downstream, the
stream_foreach_upsert pattern). The groupBy keys (window, event_type /
user_id) are the same shuffle keys as the batch twins, so a production
deployment with a Kafka source runs the identical plan continuously.

Test-harness caveat (r4 review): the convergence oracle drives the
windowed aggregations in 'complete' output mode over an in-order
finite replay, where the watermark is inert — it verifies the
aggregation arithmetic, NOT the late-data policy. The watermark values
here are the documented production intent; an out-of-order deployment
drops rows later than the watermark, which a batch twin by definition
does not.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emdrive_spark.registry import register
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
    # The NTZ→LTZ→NTZ round-trip below is only exact in a UTC session:
    # F.window aligns boundaries to the UTC epoch, so an offset that is
    # not a whole multiple of the window (+05:45 Kathmandu vs a 10-min
    # window) shifts window_start vs the batch/oracle computation, and a
    # DST fall-back makes the NTZ→LTZ cast ambiguous (advisor r2).
    # get_spark pins UTC; enforce it here for sessions built elsewhere.
    # The set must persist (not set-and-restore): streaming evaluation
    # is lazy, so the TZ matters at query RUN time, long after this
    # builder returns — hence the loud warning instead of a revert.
    current_tz = spark.conf.get("spark.sql.session.timeZone", None)
    if current_tz != "UTC":
        import logging

        logging.getLogger("emdrive_spark.streaming").warning(
            "events_stream: pinning spark.sql.session.timeZone=UTC for the whole "
            "session (was %s) — streaming window semantics require it",
            current_tz,
        )
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(_staged_dir(sf_dir))
    )
    # same dtype-adaptive ns→µs conversion as sources.tables.load (the
    # current fixture stores µs natively, so this is usually a no-op)
    if stream.schema["ts"].dataType.typeName() in ("long", "bigint"):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # Watermarks/event-time state require TIMESTAMP (LTZ), which NTZ
    # parquet columns are not. Cast here; registered ops cast timestamp
    # OUTPUTS back to NTZ (_ntz) so results keep the batch/oracle's
    # naive-µs semantics — the two casts cancel exactly UNDER THE UTC
    # SESSION pinned above (offset 0 = no epoch-alignment skew, no DST).
    if stream.schema["ts"].dataType.typeName() == "timestamp_ntz":
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream.select(*batch.columns)


def _ntz(name: str):
    """Cast a streaming timestamp output back to naive (NTZ) µs."""
    return F.col(name).cast("timestamp_ntz").alias(name)


def tumbling_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming twin of events_tumbling_count: 10-minute tumbling
    windows with a watermark bounding late data and state size."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "event_type", "n", "sum_value")
    )


def session_aggregates(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Streaming sessionization via F.session_window — the native
    stateful operator the batch twin emulates with lag+cumsum."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
        .select(
            F.col("w.start").cast("timestamp_ntz").alias("session_start"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(events: DataFrame) -> DataFrame:
    """Stateful exact dedup on event_id with watermark-bounded state —
    the streaming analog of dedup_exact. dropDuplicatesWithinWatermark,
    not dropDuplicates (r4 review): the key is event_id ALONE, so a
    duplicate redelivered with a jittered event time is still caught,
    and state eviction follows the watermark explicitly — the API built
    for at-least-once redelivery. (Late uniques beyond the watermark
    are still dropped — that is the watermark contract itself.)"""
    return events.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stateful_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState (SURVEY
    §2.9/2.10): per-user running (count, sum) kept in explicit state,
    updated per micro-batch in Arrow-sized pandas chunks. This is the
    extension point for operators Spark lacks natively — the state
    schema is ours, the update function is ours, Spark owns shuffling
    by key, state storage, checkpointing, and recovery."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    def update(key, pdfs, state):
        # State carries integer CENTS: float accumulation would drift
        # with batch order; 2-decimal values times 100 sum exactly.
        # dropna before the int cast (r4 review): one NULL value would
        # otherwise raise on astype('int64') and kill the whole query;
        # count(*) still counts the row, matching the batch twin.
        n, cents = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            n += len(pdf)
            cents += int((pdf["value"].dropna() * 100).round().astype("int64").sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def has_transform_with_state(spark: SparkSession | None = None) -> bool:
    """transformWithStateInPandas needs protobuf on the Python workers
    (the state-server protocol is proto-encoded); absent in this
    container. Gate, don't crash."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stateful_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, exact-cents sum) via Spark 4's
    arbitrary-stateful API — transformWithStateInPandas with an
    explicit ValueState, the successor to applyInPandasWithState
    (stateful_user_totals is the same logic on the older API; both
    must converge to the batch groupBy). State lives in the state
    store keyed by user_id; Spark owns shuffling, checkpointing and
    recovery; the processor owns only the merge arithmetic.

    Requires protobuf (see has_transform_with_state) — the builder
    itself is importable everywhere; only execution needs the dep."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timer_values):
            # integer cents: float accumulation would drift with batch
            # order; dropna so a NULL value cannot kill the query
            n, cents = self.state.get() if self.state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int((pdf["value"].dropna() * 100).round().astype("int64").sum())
            self.state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )


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


# ---------------------------------------------------------------------------
# Registered streaming entries (SURVEY §2.9). The finite file source +
# processAllAvailable makes these DETERMINISTIC, so unlike most engines'
# streaming paths they carry full value-checked oracles: the stream must
# converge to exactly the batch answer.
# ---------------------------------------------------------------------------

_RUN_SEQ = iter(range(1_000_000))


def _drive(spark: SparkSession, sf_dir: str, builder, mode: str) -> DataFrame:
    name = f"emdrive_stream_{next(_RUN_SEQ)}"
    return run_to_memory(spark, builder(events_stream(spark, sf_dir)), name, mode)


@register(
    "stream_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window counts driven to completion — must
    equal the batch/SQL answer exactly (same epoch alignment)."""
    return _drive(spark, sf_dir, tumbling_counts, "complete")


@register(
    "stream_session_agg",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_idx
      FROM flagged
    )
    SELECT min(ts) AS session_start, user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM sessions GROUP BY user_id, session_idx
    """,
)
def stream_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (native F.session_window) — converges
    to the batch lag-gap sessionization, pinned by the oracle."""
    return _drive(spark, sf_dir, session_aggregates, "complete")


@register(
    "stream_dedup",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded stateful dedup on event_id: every unique
    event passes exactly once, and a redelivered duplicate is dropped
    even if its event time jittered (key excludes ts)."""
    out = _drive(spark, sf_dir, streaming_dedup, "append")
    return out.select("event_id", "user_id", "event_type", "value")


@register(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id, count(*) AS n_events, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState custom operator driven to completion; the
    per-user (count, sum) state must equal the batch groupBy."""
    out = _drive(spark, sf_dir, stateful_user_totals, "update")
    # One update row per user per micro-batch; keep the final state.
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


def sliding_counts(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming twin of events_sliding_avg: 10-minute windows sliding
    every 5 — F.window expands each event into its two windows map-side
    before the keyed state update, so overlap costs no join."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_value"),
        )
        .select(F.col("w.start").cast("timestamp_ntz").alias("window_start"), "n", "avg_value")
    )


@register(
    "stream_sliding_counts",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS window_start,
             value
      FROM events
    )
    SELECT window_start, count(*) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
    FROM assigned GROUP BY 1
    """,
)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window aggregation driven to completion — must
    equal the batch overlap expansion exactly (same epoch alignment,
    same decimal-sum determinism)."""
    return _drive(spark, sf_dir, sliding_counts, "complete")


@register(
    "stream_foreach_upsert",
    oracle="""
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events GROUP BY user_id
    """,
)
def stream_foreach_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink pattern: each micro-batch reduces to per-user
    PARTIAL aggregates (count, integer cents) appended to a parquet
    state table; the read side merges partials with one groupBy. This
    is the canonical 'streaming upsert into a warehouse table' recipe —
    the stream writes only |users|-per-batch partial rows and the merge
    is associative (exact cents, no float drift). Each epoch writes to
    its OWN epoch_id=N directory with overwrite, not a blind append
    (r4 review): foreachBatch is at-least-once, so a batch re-delivered
    after a crash re-materializes the same partition instead of
    double-counting — the documented epoch-id idempotence recipe. Must
    converge to the batch answer."""
    out_dir = tempfile.mkdtemp(prefix="emdrive_upsert_")

    def sink_batch(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.groupBy("user_id")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(out_dir, f"epoch_id={epoch_id}"))
        )

    q = (
        events_stream(spark, sf_dir)
        .writeStream.outputMode("update")
        .foreachBatch(sink_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.read.parquet(out_dir)
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            (F.sum("cents") / 100.0).alias("total_value"),
        )
    )


@register(
    "stream_static_join",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, min(ts) AS cohort_ts FROM events GROUP BY user_id
    )
    SELECT e.event_id, e.user_id, e.event_type, f.cohort_ts
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    """,
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join (§2.9): the live stream enriched per
    micro-batch against a static batch dimension (per-user first-seen
    cohort). The static side is planned once and broadcast/reused each
    batch — the standard streaming-enrichment shape; state-free, so no
    watermark is needed. LEFT join, not inner (r4 review): on an
    unbounded stream, users first seen after query start have no
    dimension row yet, and an inner join would silently drop their
    events forever — enrichment must pass the event through with a
    null cohort (refresh the dimension periodically to fill it). On
    the fixture the dimension covers every user, so left == inner and
    the oracle is unchanged. Must equal the batch join exactly."""
    static_dim = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("ts").alias("cohort_ts"))
    )
    stream = events_stream(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "ts"
    )
    joined = stream.join(static_dim, "user_id", "left").select(
        "event_id", "user_id", "event_type", "cohort_ts"
    )
    name = f"emdrive_stream_{next(_RUN_SEQ)}"
    return run_to_memory(spark, joined, name, "append")


@register(
    "stream_stream_join",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id,
           p.ts AS purchase_ts, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts BETWEEN p.ts - INTERVAL '24 hours' AND p.ts
    """,
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join (§2.9): purchases joined to the views
    that preceded them within 24h, both sides live streams. Watermarks
    on BOTH inputs plus the time-range predicate let Spark bound the
    join state (views older than the watermark minus 24h are evicted) —
    the canonical streaming attribution join. Both sides tolerate 25h
    of lateness (r4 review: an asymmetric 1h purchase bound silently
    dropped routinely-late purchases — offline mobile flushes — and
    lost their attributions; the view side needs 25h anyway to cover
    the 24h range, and matching it on the purchase side costs only
    purchase-stream state, the small side). Converges to the batch
    interval join (join_time_range's oracle) exactly."""
    base = events_stream(spark, sf_dir)
    purchases = (
        base.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "25 hours")
    )
    views = (
        base.filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "25 hours")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 24 HOURS"))
        & (F.col("view_ts") <= F.col("purchase_ts")),
    ).select("purchase_id", "view_id", _ntz("purchase_ts"), _ntz("view_ts"))
    name = f"emdrive_stream_{next(_RUN_SEQ)}"
    return run_to_memory(spark, joined, name, "append")


def ewma_user(events: DataFrame) -> DataFrame:
    """Streaming per-user EWMA via applyInPandasWithState — the custom
    SEQUENCE-SENSITIVE stateful operator (stateful_user_totals is
    order-free; this one is not). Each micro-batch's rows are sorted by
    event time inside the group before the fold, and the state carries
    the raw (unrounded) accumulator so later batches resume the exact
    recurrence. KNOWN LIMITATION (made explicit per the r4 review):
    ordering holds only WITHIN a micro-batch — cross-batch
    out-of-orderness folds in arrival order, so an event-time-exact
    EWMA on a disordered production source requires watermark-buffered
    reordering in state (hold rows newer than the watermark, fold only
    what the watermark has sealed), which this operator does NOT
    implement. The finite single-file test source delivers everything
    in one batch, so the convergence oracle exercises the fold
    arithmetic, not the cross-batch ordering."""
    import pandas as pd  # noqa: PLC0415 — worker-side import
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("ewma", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("acc", DoubleType())]
    )

    def update(key, pdfs, state):
        import math  # noqa: PLC0415

        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        n, acc = state.get if state.exists else (0, None)
        # identical fold to the batch oracle: x*0.3 + acc*0.7, seeded at
        # the first observation; .tolist() yields exact IEEE doubles.
        # dropna: a NULL value would poison the recurrence (NaN forever)
        for x in pdf["value"].dropna().tolist():
            acc = x if acc is None else x * 0.3 + acc * 0.7
        n += len(pdf)
        state.update((n, acc))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "ewma": [math.floor(acc * 1000000 + 0.5) / 1000000],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_ewma",
    oracle="""
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           floor(list_reduce(list(value ORDER BY ts, event_id),
                             (acc, x) -> x * 0.3 + acc * 0.7)
                 * 1000000 + 0.5) / 1000000 AS ewma
    FROM events GROUP BY user_id
    """,
)
def stream_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming EWMA custom stateful operator driven to completion;
    the final per-user smoothed value must equal the batch left fold
    over the user's full event-time-ordered history (events_ewma's
    untruncated twin). The oracle's list_reduce folds the same doubles
    in the same order, so equality is exact, not approximate."""
    out = _drive(spark, sf_dir, ewma_user, "update")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "ewma")
    )


def leaderboard_counts(events: DataFrame) -> DataFrame:
    """Streaming twin of a per-type activity leaderboard: running
    (event_type, user_id) counts, state one integer per live pair."""
    return events.groupBy("event_type", "user_id").agg(F.count("*").alias("n"))


@register(
    "stream_topk",
    oracle="""
    WITH c AS (
      SELECT event_type, user_id, count(*) AS n
      FROM events GROUP BY event_type, user_id
    )
    SELECT event_type, user_id, n FROM c
    QUALIFY row_number() OVER (PARTITION BY event_type
                               ORDER BY n DESC, user_id ASC) <= 3
    """,
)
def stream_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming heavy-hitter leaderboard: the top-3 most active users
    per event type over the whole stream — the live-dashboard shape
    (who is hammering the API, which docs are hot) next to the batch
    sketch_countmin_topk. The stream maintains one integer of state
    per live (type, user) pair via a running count in complete mode;
    the rank-and-keep is computed on the emitted table, so the
    stateful operator itself is a plain partial-agg count whose state
    never exceeds the live key space (production bounds churn with a
    TTL or a Count-Min front, the sketch op's role). Driven to
    completion the leaderboard must equal the batch answer exactly —
    ties broken by user_id, so the full value-hash oracle applies."""
    out = _drive(spark, sf_dir, leaderboard_counts, "complete")
    from pyspark.sql import Window as W

    w = W.partitionBy("event_type").orderBy(F.col("n").desc(), F.col("user_id").asc())
    return (
        out.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("event_type", "user_id", "n")
    )
