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
           event_type, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute windows: F.window → epoch-aligned buckets
    (identical alignment to DuckDB's time_bucket)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"))
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
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_value
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
            (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("avg_value"),
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
                          >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, value,
             CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      FROM flagged
    )
    SELECT user_id, session_idx, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, min(ts) AS session_start
    FROM sessions GROUP BY user_id, session_idx
    """,
)
def events_session_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag-gap >= 30 min starts a new session;
    cumulative sum of the flag numbers the sessions. Inclusive >=, not
    strict > (r4 review): F.session_window — the streaming twin this op
    claims identical semantics with — ends a session at ts+gap
    EXCLUSIVE, so an event exactly gap later opens a new session; the
    old strict > disagreed at that boundary on both engine and oracle
    sides, invisible to the gate. One shuffle on user_id."""
    order = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap via native timestamp subtraction (works on
    # NTZ and LTZ alike, no unix_micros — that builtin rejects NTZ):
    # the day-time interval compares against the same INTERVAL literal
    # the oracle uses.
    gap = F.col("ts") - F.lag(F.col("ts")).over(order)
    flagged = load(spark, sf_dir, "events").withColumn(
        "new_session",
        F.when(gap.isNull() | (gap >= F.expr("INTERVAL 30 MINUTES")), 1).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_idx",
        F.sum("new_session").over(order.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return sessions.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
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


@register(
    "events_multi_rollup",
    oracle="""
    WITH b AS (
      SELECT date_trunc('minute', ts) AS t_minute,
             date_trunc('hour', ts)   AS t_hour,
             date_trunc('day', ts)    AS t_day,
             value
      FROM events
    )
    SELECT t_minute, t_hour, t_day, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM b GROUP BY GROUPING SETS ((t_minute), (t_hour), (t_day))
    """,
)
def events_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: one pass maintains
    minute, hour, AND day granularities via GROUPING SETS — the batch
    form of a timeseries DB's cascaded materialized rollups. At 100 TB
    the expansion happens map-side (each row feeds 3 partial aggs); the
    shuffle carries only the (bucket, partial) pairs, and each coarser
    granularity is strictly smaller. NULL pattern identifies the level."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events_mr")
    return spark.sql(
        """
        WITH b AS (
          SELECT date_trunc('minute', ts) AS t_minute,
                 date_trunc('hour', ts)   AS t_hour,
                 date_trunc('day', ts)    AS t_day,
                 value
          FROM events_mr
        )
        SELECT t_minute, t_hour, t_day, count(*) AS n, CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM b GROUP BY GROUPING SETS ((t_minute), (t_hour), (t_day))
        """
    )


@register(
    "join_time_range",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id,
           p.ts AS purchase_ts, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id
     AND v.ts BETWEEN p.ts - INTERVAL '24 hours' AND p.ts
    """,
)
def join_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: every view within the 24h attribution window
    before each purchase by the same user. The equi key (user_id)
    carries the shuffle; the BETWEEN evaluates post-match, so cost is
    per-user pairs, never a cross product. (The as-of join keeps ONE
    match; attribution keeps ALL in-window matches.)"""
    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    win = (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 24 HOURS")) & (
        F.col("view_ts") <= F.col("purchase_ts")
    )
    return p.join(v, (p.p_user == v.v_user) & win).select(
        "purchase_id", "view_id", "purchase_ts", "view_ts"
    )


@register(
    "join_asof_tolerance",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           CASE WHEN r.ts >= l.ts - INTERVAL '24 hours' THEN r.ts END AS matched_ts,
           CASE WHEN r.ts >= l.ts - INTERVAL '24 hours' THEN r.value END AS matched_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a tolerance bound (pandas merge_asof semantics):
    the latest prior view, but only if within 24h — stale matches null
    out. Same single-shuffle union+window plan as join_asof plus one
    cheap post-predicate."""
    from emdrive_spark.registry import REGISTRY

    base = REGISTRY["join_asof"].fn(spark, sf_dir)
    fresh = F.col("matched_ts") >= F.col("ts") - F.expr("INTERVAL 24 HOURS")
    return base.select(
        "event_id",
        "user_id",
        "ts",
        F.when(fresh, F.col("matched_ts")).alias("matched_ts"),
        F.when(fresh, F.col("matched_value")).alias("matched_value"),
    )


@register(
    "events_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS t0, date_trunc('hour', max(ts)) AS t1 FROM events
    ),
    grid AS (
      SELECT unnest(generate_series(t0, t1, INTERVAL '1 hour')) AS bucket FROM bounds
    ),
    agg AS (
      SELECT date_trunc('hour', ts) AS bucket, count(*) AS n FROM events GROUP BY 1
    )
    SELECT g.bucket, coalesce(a.n, 0) AS n
    FROM grid g LEFT JOIN agg a ON g.bucket = a.bucket
    """,
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling: a dense hourly grid (sequence over the observed
    range) left-joined against the sparse aggregate, empty buckets
    zero-filled — what every timeseries dashboard needs and naive
    GROUP BY can't produce. The grid generates from ONE min/max row
    (broadcastable); the left join shuffles only the sparse aggregate,
    never raw events."""
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = bounds.select(
        F.explode(F.sequence("t0", "t1", F.expr("INTERVAL 1 HOUR"))).alias("bucket")
    )
    agg = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.count("*").alias("n")
    )
    return grid.join(agg, "bucket", "left").select(
        "bucket", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )


@register(
    "events_anomaly_zscore",
    oracle="""
    WITH f AS (
      SELECT event_id, event_type, ts, value,
             count(*) OVER w AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  OVER w AS DOUBLE) AS s2
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, event_type,
           round((value - s1 / n) / sqrt(nullif((s2 - s1 * s1 / n) / (n - 1), 0)), 4)
             AS zscore,
           abs((value - s1 / n) / sqrt(nullif((s2 - s1 * s1 / n) / (n - 1), 0))) > 3
             AS is_anomaly
    FROM f WHERE n >= 5
    """,
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly detection: each event scored against the
    mean/stddev of its previous ≤20 events of the same type. The
    moments come from exact DECIMAL power sums over the frame (frame
    aggregation accumulates in ORDER BY order — deterministic; the
    built-in stddev's streaming co-moments are not engine-portable).
    One shuffle on event_type, then a single ordered pass per
    partition — the standard telemetry-guardrail query at stream
    scale."""
    ev = load(spark, sf_dir, "events")
    dv = F.col("value").cast("decimal(18,2)")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    n = F.count("*").over(w)
    s1 = F.sum(dv).over(w).cast("double")
    s2 = F.sum(dv * dv).over(w).cast("double")
    f = ev.select(
        "event_id",
        "event_type",
        "value",
        n.alias("n"),
        s1.alias("s1"),
        s2.alias("s2"),
    ).filter(F.col("n") >= 5)
    mean = F.col("s1") / F.col("n")
    var = F.nullif(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1),
        F.lit(0.0),
    )
    z = (F.col("value") - mean) / F.sqrt(var)
    return f.select(
        "event_id",
        "event_type",
        F.round(z, 4).alias("zscore"),
        (F.abs(z) > 3).alias("is_anomaly"),
    )


@register(
    "json_roundtrip_nested",
    oracle="""
    SELECT event_id, event_type AS type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           event_id AS second_id
    FROM events
    """,
)
def json_roundtrip_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-JSON machinery check (§2.8 depth beyond the flat
    json_extract_props): build a nested document per event with
    to_json(struct(..., struct(...), array(...))), reparse with an
    explicit from_json schema, and extract nested fields + an array
    element. The oracle states the expected values straight from the
    source columns, so ANY corruption in the serialize→parse→extract
    chain shows as a mismatch. One projection — JSON functions are
    JVM-side, no shuffle, no Python."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.struct(F.col("event_type").alias("type"), k.alias("k")).alias("meta"),
            F.array(F.col("user_id"), F.col("event_id")).alias("ids"),
        )
    )
    parsed = F.from_json(doc, "id long, meta struct<type:string,k:long>, ids array<long>")
    return ev.select(
        "event_id",
        parsed["meta"]["type"].alias("type"),
        parsed["meta"]["k"].alias("k"),
        parsed["ids"][1].alias("second_id"),
    )


@register(
    "events_ohlc",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
           arg_min(value, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                          || lpad(CAST(event_id AS VARCHAR), 20, '0')) AS open,
           round(max(value), 2) AS high,
           round(min(value), 2) AS low,
           arg_max(value, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                          || lpad(CAST(event_id AS VARCHAR), 20, '0')) AS close,
           count(*) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars (open/high/low/close per hour per event_type) — the
    candlestick downsample every time-series store ships. open/close
    are min_by/max_by on the (ts, event_id) composite, so ties at a
    bucket boundary resolve identically in any engine; one shuffle on
    the (bucket, type) key with full map-side partial aggregation."""
    ev = load(spark, sf_dir, "events")
    # DuckDB arg_min/arg_max take only scalar sort keys, so the
    # (ts, event_id) composite rides as a fixed-width lexicographic
    # string — micros-precision timestamp then zero-padded id. Width
    # 20, not 12 (r4 review): both engines' lpad TRUNCATES beyond the
    # width, so a 12-char pad misorders/collides ids >= 1e12 — reached
    # at exactly the event scale the module documents; 20 covers the
    # full signed-64-bit digit count.
    order_key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.round(F.max("value"), 2).alias("high"),
            F.round(F.min("value"), 2).alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count("*").alias("n"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "open", "high", "low", "close", "n")
    )


@register(
    "events_ewma",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
      FROM events
    )
    SELECT event_id, user_id,
           floor(list_reduce(xs, (acc, x) -> x * 0.3 + acc * 0.7)
                 * 1000000 + 0.5) / 1000000 AS ewma
    FROM f
    """,
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (alpha=0.3,
    seeded at the first observation, state truncated to the trailing 20
    events — the standard bounded-memory smoother for telemetry). The
    frame is collected in ORDER BY order and folded LEFT-TO-RIGHT with
    the EWMA recurrence, so both engines add the same doubles in the
    same sequence — bit-identical without any decimal detour. One
    shuffle on user_id, then a single ordered pass per partition; the
    20-row truncation bounds per-row work, and the same fold runs
    incrementally under applyInPandasWithState in the streaming twin
    family."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    f = ev.select(
        "event_id", "user_id", F.collect_list(F.col("value")).over(w).alias("xs")
    )
    fold = F.aggregate(
        F.slice(F.col("xs"), 2, F.size("xs") - 1),
        F.element_at(F.col("xs"), 1),
        lambda acc, x: x * F.lit(0.3) + acc * F.lit(0.7),
    )
    return f.select(
        "event_id",
        "user_id",
        (F.floor(fold * 1000000 + F.lit(0.5)) / 1000000).alias("ewma"),
    )


@register(
    "join_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT event_id AS a_id, ts AS a_s, ts + INTERVAL 120 SECOND AS a_e
      FROM events WHERE event_type = 'error'
    ),
    b AS (
      SELECT event_id AS b_id, ts AS b_s, ts + INTERVAL 120 SECOND AS b_e
      FROM events WHERE event_type = 'purchase'
    )
    SELECT a_id, b_id,
           date_diff('microsecond', greatest(a_s, b_s), least(a_e, b_e)) // 1000000
             AS overlap_s
    FROM a JOIN b ON a_s <= b_e AND b_s <= a_e
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join WITHOUT an equi key — the genomics/ads
    primitive Spark would otherwise plan as a broadcast-nested-loop
    theta join. Both interval sets are flattened onto a fixed time-
    bucket grid sized >= the interval length, so every truly
    overlapping pair provably shares a bucket; the bucket equi-join
    generates candidates (each pair at most twice — distinct'd), and
    the exact boundary predicate verifies. At 100 TB the theta join is
    O(|A| x |B|); this is O(matching bucket pairs) through an ordinary
    hash shuffle on the bucket id, the same candidates-then-verify
    shape as the LSH dedup family. The oracle states the semantics as
    the plain theta join."""
    ev = load(spark, sf_dir, "events")
    anchor = "TIMESTAMP_NTZ'2024-01-01 00:00:00'"

    def intervals(etype: str, prefix: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("ts").alias(f"{prefix}_s"),
                (F.col("ts") + F.expr("INTERVAL 120 SECONDS")).alias(f"{prefix}_e"),
            )
            .withColumn(
                "bkt",
                F.explode(
                    F.sequence(
                        F.expr(f"timestampdiff(SECOND, {anchor}, {prefix}_s) DIV 120"),
                        F.expr(f"timestampdiff(SECOND, {anchor}, {prefix}_e) DIV 120"),
                    )
                ),
            )
        )

    a = intervals("error", "a")
    b = intervals("purchase", "b")
    # whole microseconds DIV 1e6: sub-second truncation must happen on
    # the exact integer micros — engines disagree on fractional-second
    # handling in second-granularity diffs
    overlap = F.expr(
        "timestampdiff(MICROSECOND, greatest(a_s, b_s), least(a_e, b_e)) DIV 1000000"
    )
    return (
        a.join(b, "bkt")
        .filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .select("a_id", "b_id", overlap.alias("overlap_s"))
        .distinct()
    )


@register(
    "events_interpolate",
    oracle="""
    WITH obs AS (
      SELECT event_type,
             date_trunc('minute', ts) AS bucket,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS v
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT min(date_trunc('minute', ts)) AS t0, max(date_trunc('minute', ts)) AS t1
      FROM events
    ),
    grid AS (
      SELECT t.event_type, g.bucket
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(t0, t1, INTERVAL 1 MINUTE)) AS bucket
            FROM bounds) g
    ),
    j AS (
      SELECT grid.event_type, grid.bucket,
             date_diff('minute', TIMESTAMP '2024-01-01 00:00:00', grid.bucket) AS idx,
             obs.v, obs.v IS NOT NULL AS observed
      FROM grid LEFT JOIN obs
        ON grid.event_type = obs.event_type AND grid.bucket = obs.bucket
    ),
    n AS (
      SELECT *,
             last_value(v IGNORE NULLS) OVER wp AS pv,
             last_value(CASE WHEN observed THEN idx END IGNORE NULLS) OVER wp AS pidx,
             first_value(v IGNORE NULLS) OVER wn AS nv,
             first_value(CASE WHEN observed THEN idx END IGNORE NULLS) OVER wn AS nidx
      FROM j
      WINDOW wp AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wn AS (PARTITION BY event_type ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bucket, observed,
           floor(coalesce(pv + (nv - pv) * ((idx - pidx) / nullif(nidx - pidx, 0)),
                          pv, nv)
                 * 1000000 + 0.5) / 1000000 AS v_interp
    FROM n
    """,
)
def events_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series linear interpolation onto a dense minute grid: each
    (event_type, minute) gets its observed mean value, and missing
    minutes get the straight line between the nearest observed
    neighbors (edges clamp to the nearest side). The windows partition
    BY SERIES — at telemetry scale parallelism is the number of series,
    never one global sort; per-minute means are exact DECIMAL sums and
    the interpolation fraction is an integer-minute ratio, so the line
    is the same double everywhere. The grid generates from one
    broadcastable min/max row, and only the sparse observed aggregate
    shuffles. The standard downsample-then-fill resampling shape
    (pandas df.resample().interpolate()) as pure DataFrame ops."""
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("bucket")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")).cast("double") / F.count("*")).alias("v")
    )
    bounds = ev.agg(
        F.date_trunc("minute", F.min("ts")).alias("t0"),
        F.date_trunc("minute", F.max("ts")).alias("t1"),
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(
                bounds.select(
                    F.explode(
                        F.sequence("t0", "t1", F.expr("INTERVAL 1 MINUTE"))
                    ).alias("bucket")
                )
            )
        )
    )
    idx = F.expr(
        "timestampdiff(MINUTE, TIMESTAMP_NTZ'2024-01-01 00:00:00', bucket)"
    )
    j = grid.join(obs, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        idx.alias("idx"),
        "v",
        F.col("v").isNotNull().alias("observed"),
    )
    wp = (
        W.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # "next observed" = last-ignore-nulls over the REVERSED running
    # frame: Spark evaluates a (currentRow, unboundedFollowing) frame by
    # re-aggregating the remainder per row — O(n^2) per series (measured
    # 200 s on the sf0.01 grid) — while both running frames stream in
    # O(n) (0.9 s).
    wn = (
        W.partitionBy("event_type")
        .orderBy(F.col("bucket").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    when_idx = F.when(F.col("observed"), F.col("idx"))
    n = j.select(
        "event_type",
        "bucket",
        "observed",
        "idx",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(when_idx, ignorenulls=True).over(wp).alias("pidx"),
        F.last("v", ignorenulls=True).over(wn).alias("nv"),
        F.last(when_idx, ignorenulls=True).over(wn).alias("nidx"),
    )
    # nullif on the span: an observed row has idx == pidx == nidx and a
    # 0/0 here would be an ANSI error in Spark and a NaN in DuckDB —
    # NULL falls through to coalesce(pv) on both engines instead
    line = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("idx") - F.col("pidx"))
        / F.nullif(F.col("nidx") - F.col("pidx"), F.lit(0))
    )
    v = F.coalesce(line, F.col("pv"), F.col("nv"))
    return n.select(
        "event_type",
        "bucket",
        "observed",
        (F.floor(v * 1000000 + F.lit(0.5)) / 1000000).alias("v_interp"),
    )


@register(
    "events_cusum",
    oracle="""
    WITH stats AS (
      SELECT sum(CAST(value AS DECIMAL(24,2))) AS s_tot,
             CAST(count(*) AS BIGINT) AS n_tot
      FROM events
    ),
    seq AS (
      SELECT user_id, ts, event_id,
             sum(4 * n_tot * CAST(value AS DECIMAL(24,2)) - 4 * s_tot - n_tot)
               OVER w AS rup,
             sum(4 * s_tot - 4 * n_tot * CAST(value AS DECIMAL(24,2)) - n_tot)
               OVER w AS rdn,
             n_tot
      FROM events, stats
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    scored AS (
      SELECT user_id, ts, event_id, n_tot,
             CAST((rup - least(CAST(0 AS DECIMAL(38,2)), min(rup) OVER w)) * 100
                  AS BIGINT) AS du,
             CAST((rdn - least(CAST(0 AS DECIMAL(38,2)), min(rdn) OVER w)) * 100
                  AS BIGINT) AS dn
      FROM seq
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST((arg_max(du, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                             || lpad(CAST(event_id AS VARCHAR), 20, '0'))
                 * 20000 + 4 * any_value(n_tot)) // (8 * any_value(n_tot))
                AS DOUBLE) / 1000000 AS s_pos,
           CAST((arg_max(dn, strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                             || lpad(CAST(event_id AS VARCHAR), 20, '0'))
                 * 20000 + 4 * any_value(n_tot)) // (8 * any_value(n_tot))
                AS DOUBLE) / 1000000 AS s_neg,
           max(du) > 2000 * any_value(n_tot) AS drift_up,
           max(dn) > 2000 * any_value(n_tot) AS drift_down
    FROM scored GROUP BY user_id
    """,
)
def events_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection per user: two one-sided cumulative sums
    (slack k=0.25, threshold h=5) over the user's event-time-ordered
    values against the DECIMAL-exact corpus mean — the classic
    sequential changepoint statistic. s_pos/s_neg report the
    END-OF-WINDOW statistics; drift_up/drift_down alarm on the RUNNING
    MAX of the recurrence (r4 review: the old final-value-only test
    missed a drift that crossed h mid-window and then decayed — a
    textbook alarm both engine and oracle agreed to ignore because
    they shared the fold). The clamped walk has the exact identity
    s_t = P_t - min(0, min_{j<=t} P_j) over plain prefix sums, so the
    whole thing is two window passes; scaling the per-event deviation
    by 4N (x_i -> 4N*x_i - 4S - N, mu = S/N, k = 1/4) keeps every
    prefix DECIMAL-exact, making the statistics identical across
    engines independent of summation order. One user_id shuffle; O(n)
    per series."""
    ev = load(spark, sf_dir, "events")
    stats = ev.agg(
        F.sum(F.col("value").cast("decimal(24,2)")).alias("s_tot"),
        F.count("*").alias("n_tot"),
    )
    base = ev.crossJoin(F.broadcast(stats))
    wseq = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    x = F.col("value").cast("decimal(24,2)")
    dup = 4 * F.col("n_tot") * x - 4 * F.col("s_tot") - F.col("n_tot")
    ddn = 4 * F.col("s_tot") - 4 * F.col("n_tot") * x - F.col("n_tot")
    seq = base.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(dup).over(wseq).alias("rup"),
        F.sum(ddn).over(wseq).alias("rdn"),
        F.col("n_tot"),
    )
    # Integer-exact rounding and thresholding (r4): s = D/(4N) with D
    # an exact hundredths decimal lands EXACTLY on 1e-6 midpoints for
    # many (D, N), and the two engines' double divisions round such a
    # midpoint to opposite sides. round(s, 6) half-up == the integer
    # division (100D*20000 + 4N) div (8N), and s > 5 == 100D > 2000N —
    # no float enters either path. (BIGINT carriers are exact to ~9e18,
    # far past the compare scales; the decimal prefixes above stay the
    # scale path.)
    zero = F.lit(0).cast("decimal(38,2)")
    scored = seq.select(
        "user_id",
        "ts",
        "event_id",
        F.col("n_tot"),
        ((F.col("rup") - F.least(zero, F.min("rup").over(wseq))) * 100)
        .cast("long")
        .alias("du"),
        ((F.col("rdn") - F.least(zero, F.min("rdn").over(wseq))) * 100)
        .cast("long")
        .alias("dn"),
    )
    last_key = F.concat(
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"),
        F.lpad(F.col("event_id").cast("string"), 20, "0"),
    )
    agg = scored.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.max_by("du", last_key).alias("du_last"),
        F.max_by("dn", last_key).alias("dn_last"),
        F.max("du").alias("du_max"),
        F.max("dn").alias("dn_max"),
        F.first("n_tot").alias("n_tot"),
    )
    return agg.select(
        "user_id",
        "n_events",
        (
            F.expr("(du_last * 20000 + 4 * n_tot) div (8 * n_tot)").cast("double")
            / 1000000
        ).alias("s_pos"),
        (
            F.expr("(dn_last * 20000 + 4 * n_tot) div (8 * n_tot)").cast("double")
            / 1000000
        ).alias("s_neg"),
        (F.col("du_max") > 2000 * F.col("n_tot")).alias("drift_up"),
        (F.col("dn_max") > 2000 * F.col("n_tot")).alias("drift_down"),
    )


@register(
    "events_seasonality",
    oracle="""
    WITH h AS (
      SELECT event_type, CAST(hour(ts) AS INT) AS hour_of_day, count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, sum(n) AS total FROM h GROUP BY event_type)
    SELECT h.event_type, hour_of_day, n,
           floor(CAST(n AS DOUBLE) / total * 1000000 + 0.5) / 1000000 AS share,
           n = max(n) OVER (PARTITION BY h.event_type) AS is_peak
    FROM h JOIN tot ON h.event_type = tot.event_type
    """,
)
def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality profile per event type: volume share per
    hour with the peak hour(s) flagged — the diurnal-load query behind
    capacity planning and anomaly baselines. One (type, hour) aggregate
    (at most |types| x 24 rows leave the shuffle), shares are exact
    integer-count ratios, and the peak flag is a window max over the
    tiny profile — data-sized work is the single scan."""
    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("int").alias("hour_of_day")
    ).agg(F.count("*").alias("n"))
    tot = h.groupBy("event_type").agg(F.sum("n").alias("total"))
    share = F.col("n").cast("double") / F.col("total")
    wmax = W.partitionBy("event_type")
    return (
        h.join(tot, "event_type")
        .select(
            "event_type",
            "hour_of_day",
            "n",
            (F.floor(share * 1000000 + F.lit(0.5)) / 1000000).alias("share"),
            (F.col("n") == F.max("n").over(wmax)).alias("is_peak"),
        )
    )


@register(
    "events_sliding_distinct",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, user_id
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', user_id
      FROM events
    )
    SELECT window_start, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM assigned GROUP BY 1
    """,
)
def events_sliding_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window distinct users (1 h window / 30 min slide) — the
    concurrent-actives metric. F.window expands each event into its two
    windows MAP-SIDE; the exact distinct is a two-phase aggregate
    ((window, user) dedup, then count) — at deployment scale the
    drop-in approximate twin is approx_count_distinct over the same
    window expression (see agg_approx_count_distinct), trading exact
    counts for fixed-size sketches."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count_distinct("user_id").alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n_users")
    )


@register(
    "join_point_in_time",
    oracle="""
    WITH hist AS (
      SELECT user_id, value AS plan_value, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM events WHERE event_type = 'signup'
    ),
    fact AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT event_id, fact.user_id, plan_value
    FROM fact JOIN hist
      ON fact.user_id = hist.user_id
     AND fact.ts >= valid_from
     AND (valid_to IS NULL OR fact.ts < valid_to)
    """,
)
def join_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct dimension lookup: each fact joins the
    dimension VERSION that was valid at the fact's own timestamp
    (valid_from <= ts < valid_to), the SCD-2 read path that prevents
    feature leakage in ML training joins and restatement bugs in
    warehouses. The version intervals come from one lead() window over
    the change stream; the join is an ordinary user_id equi join with
    the interval predicate — exactly one key shuffle per side, at most
    one match per fact by construction."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    hist = (
        ev.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.col("value").alias("plan_value"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w.orderBy("ts", "event_id")).alias("valid_to"),
        )
    )
    fact = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        fact.join(hist, "user_id")
        .filter(
            (F.col("ts") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("ts") < F.col("valid_to")))
        )
        .select("event_id", "user_id", "plan_value")
    )


@register(
    "events_ab_test",
    oracle="""
    WITH g AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
             CAST(sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2)))
                  AS DOUBLE) AS s2
      FROM events WHERE event_type IN ('click', 'error')
      GROUP BY event_type
    ),
    w AS (
      SELECT event_type, n, s1 / n AS mean,
             (s2 - s1 * s1 / n) / (n - 1) / n AS vn
      FROM g
    )
    SELECT a.n AS n_a, b.n AS n_b,
           floor(a.mean * 1000000 + 0.5) / 1000000 AS mean_a,
           floor(b.mean * 1000000 + 0.5) / 1000000 AS mean_b,
           floor((a.mean - b.mean) / sqrt(a.vn + b.vn) * 1000000 + 0.5) / 1000000
             AS t_stat,
           floor((a.vn + b.vn) * (a.vn + b.vn)
                 / (a.vn * a.vn / (a.n - 1) + b.vn * b.vn / (b.n - 1))
                 * 10000 + 0.5) / 10000 AS dof
    FROM (SELECT * FROM w WHERE event_type = 'click') a,
         (SELECT * FROM w WHERE event_type = 'error') b
    """,
)
def events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's two-sample t-test between event cohorts (click vs
    error), computed from exact DECIMAL power sums: per-group mean and
    vn = s^2/n reduce map-side to four scalars, and the t statistic and
    Welch-Satterthwaite degrees of freedom are the identical double
    expressions in both engines (sqrt only — no libm pow). This is the
    experimentation primitive: at any scale the data-sized work is one
    filtered scan; everything after the two-row aggregate is
    arithmetic on a broadcastable 2x4 table."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    dv = F.col("value").cast("decimal(18,2)")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dv).cast("double").alias("s1"),
        F.sum(dv * dv).cast("double").alias("s2"),
    )
    w = g.select(
        "event_type",
        "n",
        (F.col("s1") / F.col("n")).alias("mean"),
        (
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
            / F.col("n")
        ).alias("vn"),
    )
    a = w.filter(F.col("event_type") == "click").alias("a")
    b = w.filter(F.col("event_type") == "error").alias("b")
    j = a.crossJoin(b)

    def f(c, d=1000000):
        return F.floor(c * d + F.lit(0.5)) / d

    t = (F.col("a.mean") - F.col("b.mean")) / F.sqrt(F.col("a.vn") + F.col("b.vn"))
    dof = (
        (F.col("a.vn") + F.col("b.vn"))
        * (F.col("a.vn") + F.col("b.vn"))
        / (
            F.col("a.vn") * F.col("a.vn") / (F.col("a.n") - 1)
            + F.col("b.vn") * F.col("b.vn") / (F.col("b.n") - 1)
        )
    )
    return j.select(
        F.col("a.n").alias("n_a"),
        F.col("b.n").alias("n_b"),
        f(F.col("a.mean")).alias("mean_a"),
        f(F.col("b.mean")).alias("mean_b"),
        f(t).alias("t_stat"),
        f(dof, 10000).alias("dof"),
    )


@register(
    "events_outlier_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, med.med,
             abs(e.value - med.med) AS adev
      FROM events e JOIN med ON e.event_type = med.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT event_id, dev.event_type,
           floor(dev.adev / nullif(1.4826 * mad.mad, 0.0) * 10000 + 0.5) / 10000
             AS robust_z,
           dev.adev > 3 * (1.4826 * mad.mad) AS is_outlier
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    """,
)
def events_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation: each
    event scored as |x - median| / (1.4826 * MAD) per event type — the
    zscore's breakdown-resistant sibling (one wild value cannot shift
    the baseline the way it shifts a mean/stddev). Exact interpolated
    percentiles group per TYPE (agg_percentile pinned the Spark
    percentile ↔ DuckDB quantile_cont parity); the two tiny per-type
    stats tables broadcast back, so the event stream is scanned twice
    and never shuffled on anything but the scan. At the billion-row
    grain swap in approx_percentile — same plan shape."""
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_id",
        "event_type",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(F.percentile("adev", 0.5).alias("mad"))
    j = dev.join(F.broadcast(mad), "event_type")
    rz = F.col("adev") / F.nullif(F.lit(1.4826) * F.col("mad"), F.lit(0.0))
    return j.select(
        "event_id",
        "event_type",
        (F.floor(rz * 10000 + F.lit(0.5)) / 10000).alias("robust_z"),
        (F.col("adev") > 3 * (F.lit(1.4826) * F.col("mad"))).alias("is_outlier"),
    )


@register(
    "events_detect_gaps",
    oracle="""
    WITH seq AS (
      SELECT ts,
             lag(ts) OVER (ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    SELECT prev_ts AS gap_start, ts AS gap_end,
           date_diff('microsecond', prev_ts, ts) // 1000000 AS gap_s
    FROM seq
    WHERE prev_ts IS NOT NULL
      AND date_diff('microsecond', prev_ts, ts) // 1000000 >= 900
    """,
)
def events_detect_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-gap detection: consecutive-event pairs more than 15
    minutes apart, reported as (start, end, seconds) — the monitoring
    query that pages when a feed stalls (the complement of
    events_gap_fill, which repairs; this one REPORTS). Global lag()
    WITHOUT the global window: events are bucketed by a deterministic
    hour-of-epoch key, each bucket computes its own lag in parallel,
    and the only cross-bucket information — each bucket's last
    timestamp — is a one-row-per-bucket frame whose lag (nearest
    non-empty predecessor) stitches onto the next bucket's first row,
    the same two-phase shape as functions/prefix.py. The gap SET is
    identical for any bucket width, so the result is
    partitioning-independent; no Exchange SinglePartition touches
    event-cardinality data (plan-pinned in tests/test_plans.py). Gap
    seconds are exact integer microseconds DIV 1e6."""
    ev = load(spark, sf_dir, "events").select("ts", "event_id")
    # Deterministic monotone bucket id FROM THE DATA (hour-of-epoch),
    # not spark_partition_id(): the stitch below joins two branches on
    # pid, and a physical-partition id would make correctness depend on
    # independent range-sample jobs producing identical boundaries. A
    # data-derived pid is identical on every evaluation by construction
    # (r4 review finding). Bucket width trades skew for partition
    # count — at 100 TB drop to minute buckets; the gap set is
    # invariant to the width.
    # (date_trunc, not unix_micros: the fixture lands ts as
    # TIMESTAMP_NTZ, which unix_micros rejects; the truncated hour is
    # an equally deterministic, monotone bucket key.)
    pid = F.date_trunc("hour", F.col("ts")).alias("pid")
    bucketed = ev.select(pid, "ts", "event_id")
    wp = W.partitionBy("pid").orderBy("ts", "event_id")
    seq = bucketed.select(
        "pid",
        "ts",
        F.lag("ts").over(wp).alias("prev_ts"),
        F.row_number().over(wp).alias("rn"),
    )
    # Per-bucket last timestamp — a straight partial+final aggregate
    # (one row per non-empty bucket crosses the wire); the lag over it,
    # ordered by pid, finds the nearest non-empty predecessor bucket.
    bounds = bucketed.groupBy("pid").agg(F.max("ts").alias("last_ts"))
    wb = W.orderBy("pid")
    boundary = bounds.select(
        "pid", F.lag("last_ts").over(wb).alias("boundary_prev_ts")
    )
    # Single-branch stitch: each bucket's first row takes the previous
    # bucket's last timestamp, every other row keeps its in-bucket lag.
    stitched = seq.join(F.broadcast(boundary), "pid", "left").select(
        "ts",
        F.when(F.col("rn") == 1, F.col("boundary_prev_ts"))
        .otherwise(F.col("prev_ts"))
        .alias("prev_ts"),
    )
    gap_s = F.expr("timestampdiff(MICROSECOND, prev_ts, ts) DIV 1000000")
    return (
        stitched.filter(F.col("prev_ts").isNotNull())
        .select(
            F.col("prev_ts").alias("gap_start"),
            F.col("ts").alias("gap_end"),
            gap_s.alias("gap_s"),
        )
        .filter(F.col("gap_s") >= 900)
    )


@register(
    "events_holt",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id,
             list([value, 0.0]) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
      FROM events
    ),
    r AS (
      SELECT event_id, user_id,
             list_reduce(xs, (acc, x) ->
               [x[1] * 0.3 + (acc[1] + acc[2]) * 0.7,
                (x[1] * 0.3 + (acc[1] + acc[2]) * 0.7 - acc[1]) * 0.2
                  + acc[2] * 0.8]) AS s
      FROM f
    )
    SELECT event_id, user_id,
           floor(s[1] * 1000000 + 0.5) / 1000000 AS level,
           floor(s[2] * 1000000 + 0.5) / 1000000 AS trend,
           floor((s[1] + s[2]) * 1000000 + 0.5) / 1000000 AS forecast
    FROM r
    """,
)
def events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing per user series (level
    alpha=0.3, trend gamma=0.2, state truncated to the trailing 20
    events, trend seeded 0 at the first observation): level tracks
    the local mean, trend the local slope, and level+trend is the
    one-step-ahead forecast — the telemetry forecaster one notch up
    from events_ewma. The 2-component state folds LEFT-TO-RIGHT as a
    2-element double list ([level, trend]) so BOTH engines run the
    bit-identical recurrence: DuckDB's list_reduce seeds with the
    first element (the [x1, 0] pair), Spark's aggregate seeds
    element_at(xs, 1) and folds the tail — the events_ewma recipe
    extended to coupled recurrences. The level expression is inlined
    twice inside the trend update (SQL lambdas have no local
    bindings); identical ASTs produce identical doubles.

    Scale shape: one shuffle on user_id, a single ordered pass per
    partition, per-row work bounded by the 20-element state frame."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    f = ev.select(
        "event_id",
        "user_id",
        F.collect_list(F.array(F.col("value"), F.lit(0.0))).over(w).alias("xs"),
    )

    def _lvl(acc, x):
        return F.element_at(x, 1) * F.lit(0.3) + (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        ) * F.lit(0.7)

    fold = F.aggregate(
        F.slice(F.col("xs"), 2, F.size("xs") - 1),
        F.element_at(F.col("xs"), 1),
        lambda acc, x: F.array(
            _lvl(acc, x),
            (_lvl(acc, x) - F.element_at(acc, 1)) * F.lit(0.2)
            + F.element_at(acc, 2) * F.lit(0.8),
        ),
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    s = f.select("event_id", "user_id", fold.alias("s"))
    return s.select(
        "event_id",
        "user_id",
        r6(F.element_at("s", 1)).alias("level"),
        r6(F.element_at("s", 2)).alias("trend"),
        r6(F.element_at("s", 1) + F.element_at("s", 2)).alias("forecast"),
    )


@register(
    "events_holt_winters",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id,
             list([value, 0.0, 0.0, 0.0, 0.0, 0.0])
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
      FROM events
    ),
    r AS (
      SELECT event_id, user_id,
             list_reduce(xs, (acc, x) ->
               [(x[1] - acc[3]) * 0.3 + (acc[1] + acc[2]) * 0.7,
                ((x[1] - acc[3]) * 0.3 + (acc[1] + acc[2]) * 0.7 - acc[1]) * 0.2
                  + acc[2] * 0.8,
                acc[4], acc[5], acc[6],
                (x[1] - ((x[1] - acc[3]) * 0.3 + (acc[1] + acc[2]) * 0.7)) * 0.1
                  + acc[3] * 0.9]) AS s
      FROM f
    )
    SELECT event_id, user_id,
           floor(s[1] * 1000000 + 0.5) / 1000000 AS level,
           floor(s[2] * 1000000 + 0.5) / 1000000 AS trend,
           floor((s[1] + s[2] + s[3]) * 1000000 + 0.5) / 1000000 AS forecast
    FROM r
    """,
)
def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive seasonal smoothing per user series
    (alpha=0.3, gamma=0.2, delta=0.1, season length 4, seasonal
    components seeded 0, state truncated to the trailing 20 events) —
    the third member of the forecasting ladder after events_ewma and
    events_holt. The 6-component state [level, trend, s1..s4] folds
    left-to-right as a double list; the season ROTATES inside the
    fold (the current seasonal index is always slot 3, updated
    components append at the tail), so no position arithmetic is
    needed and the same lambda runs in both engines. The level
    expression is inlined three times (trend and seasonal updates
    reference it; SQL lambdas have no local bindings) — identical
    ASTs, identical doubles, full value-hash oracle. The one-step
    forecast is level + trend + next season slot.

    Scale shape: identical to events_ewma/events_holt — one user_id
    shuffle, a single ordered pass, per-row work bounded by the
    20-element frame."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    f = ev.select(
        "event_id",
        "user_id",
        F.collect_list(
            F.array(
                F.col("value"),
                F.lit(0.0),
                F.lit(0.0),
                F.lit(0.0),
                F.lit(0.0),
                F.lit(0.0),
            )
        )
        .over(w)
        .alias("xs"),
    )
    e = F.element_at

    def _lvl(acc, x):
        return (e(x, 1) - e(acc, 3)) * F.lit(0.3) + (e(acc, 1) + e(acc, 2)) * F.lit(
            0.7
        )

    fold = F.aggregate(
        F.slice(F.col("xs"), 2, F.size("xs") - 1),
        e(F.col("xs"), 1),
        lambda acc, x: F.array(
            _lvl(acc, x),
            (_lvl(acc, x) - e(acc, 1)) * F.lit(0.2) + e(acc, 2) * F.lit(0.8),
            e(acc, 4),
            e(acc, 5),
            e(acc, 6),
            (e(x, 1) - _lvl(acc, x)) * F.lit(0.1) + e(acc, 3) * F.lit(0.9),
        ),
    )
    r6 = lambda c: F.floor(c * 1000000 + F.lit(0.5)) / 1000000  # noqa: E731
    s = f.select("event_id", "user_id", fold.alias("s"))
    return s.select(
        "event_id",
        "user_id",
        r6(e(F.col("s"), 1)).alias("level"),
        r6(e(F.col("s"), 2)).alias("trend"),
        r6(e(F.col("s"), 1) + e(F.col("s"), 2) + e(F.col("s"), 3)).alias("forecast"),
    )


_ACF_LAGS = (1, 2, 3)


def _acf_oracle() -> str:
    """Per-lag terms as exact DECIMAL power sums, combined in the same
    double expression the Spark side evaluates (+,-,*,/ only)."""
    lag_sums = ",\n             ".join(
        f"""CAST(sum(CASE WHEN x{L} IS NOT NULL THEN x END) AS DOUBLE) AS a{L},
             CAST(sum(x{L}) AS DOUBLE) AS b{L},
             CAST(sum(x * x{L}) AS DOUBLE) AS c{L},
             count(x{L}) AS n{L}"""
        for L in _ACF_LAGS
    )
    branches = "\n      UNION ALL ".join(
        f"""SELECT event_type, {L} AS lag,
             floor((c{L} - (s1 / n) * a{L} - (s1 / n) * b{L}
                    + n{L} * (s1 / n) * (s1 / n))
                   / (s2 - s1 * s1 / n) * 1000000 + 0.5) / 1000000 AS acf
      FROM g"""
        for L in _ACF_LAGS
    )
    leads = ",\n             ".join(
        f"lead(CAST(value AS DECIMAL(18,2)), {L}) OVER w AS x{L}" for L in _ACF_LAGS
    )
    return f"""
    WITH o AS (
      SELECT event_type, CAST(value AS DECIMAL(18,2)) AS x,
             {leads}
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    g AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(x) AS DOUBLE) AS s1,
             CAST(sum(x * x) AS DOUBLE) AS s2,
             {lag_sums}
      FROM o GROUP BY event_type
    )
    {branches}
    """


@register("events_autocorr", oracle=_acf_oracle())
def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation of the event value series at lags 1-3
    per event type — the model-identification diagnostic that pairs
    with the forecasting ladder (events_holt / events_holt_winters
    choose their smoothing structure off exactly this: decaying ACF =
    trend, spikes at the season length = seasonality). ACF at lag L is
    sum((x_t - mean)(x_{t+L} - mean)) / sum((x_t - mean)^2), expanded
    into the four cross/marginal sums so every data-sized aggregate is
    an exact DECIMAL power sum (the events_ab_test recipe): the lagged
    pairing is one lead() per lag over the (ts, event_id)-ordered
    per-type window, and the final combine is the identical +,-,*,/
    double expression in both engines, floor-rounded to 6 decimals.

    Scale shape: one shuffle keyed by event_type (the same per-series
    window every per-series op pays; series parallelism is across
    keys), three leads computed in a single window pass, then a
    map-side-combinable groupBy down to a |types| x 10-scalar frame —
    the unpivot to (type, lag, acf) rows is arithmetic on that tiny
    frame, not data."""
    dv = F.col("value").cast("decimal(18,2)")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    o = load(spark, sf_dir, "events").select(
        "event_type",
        dv.alias("x"),
        *[F.lead(dv, L).over(w).alias(f"x{L}") for L in _ACF_LAGS],
    )
    aggs = [
        F.count("*").alias("n"),
        F.sum("x").cast("double").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("s2"),
    ]
    for L in _ACF_LAGS:
        xl = F.col(f"x{L}")
        aggs += [
            F.sum(F.when(xl.isNotNull(), F.col("x"))).cast("double").alias(f"a{L}"),
            F.sum(xl).cast("double").alias(f"b{L}"),
            F.sum(F.col("x") * xl).cast("double").alias(f"c{L}"),
            F.count(xl).alias(f"n{L}"),
        ]
    g = o.groupBy("event_type").agg(*aggs)
    mean = F.col("s1") / F.col("n")
    denom = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    parts = []
    for L in _ACF_LAGS:
        num = (
            F.col(f"c{L}")
            - mean * F.col(f"a{L}")
            - mean * F.col(f"b{L}")
            + F.col(f"n{L}") * mean * mean
        )
        parts.append(
            g.select(
                "event_type",
                F.lit(L).cast("int").alias("lag"),
                (F.floor(num / denom * 1000000 + F.lit(0.5)) / 1000000).alias("acf"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


@register(
    "events_holt_backtest",
    oracle="""
    WITH f AS (
      SELECT event_id, user_id, ts, value,
             list([value, 0.0]) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS xs
      FROM events
    ),
    r AS (
      SELECT event_id, user_id, ts, value,
             list_reduce(xs, (acc, x) ->
               [x[1] * 0.3 + (acc[1] + acc[2]) * 0.7,
                (x[1] * 0.3 + (acc[1] + acc[2]) * 0.7 - acc[1]) * 0.2
                  + acc[2] * 0.8]) AS s
      FROM f
    ),
    p AS (
      SELECT user_id, value,
             lag(s[1] + s[2]) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS fc
      FROM r
    ),
    e AS (
      SELECT user_id,
             floor(abs(value - fc) * 1000000 + 0.5) / 1000000 AS ae
      FROM p WHERE fc IS NOT NULL
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_forecasts,
           floor(CAST(sum(CAST(ae AS DECIMAL(18,6))) AS DOUBLE) / count(*)
                 * 1000000 + 0.5) / 1000000 AS mae
    FROM e GROUP BY user_id
    """,
)
def events_holt_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Walk-forward backtest of the Holt forecaster: for every event
    after a user's first, the one-step-ahead forecast is the PREVIOUS
    row's level+trend (exactly what events_holt publishes), and the op
    reduces per-user mean absolute error — the evaluation loop that
    closes the forecasting ladder (events_autocorr identifies the
    structure, events_holt/holt_winters fit it, this measures it;
    production promotes a model only when backtest MAE beats the
    incumbent). The fold is bit-identical to events_holt's (same
    2-element list recurrence, same trailing-20 frame), the forecast
    shift is one lag over the same (ts, event_id) order, absolute
    errors floor-round to 6 decimals and sum as DECIMAL — so a model
    evaluation metric carries a full value-hash oracle.

    Scale shape: one user_id shuffle shared by the fold window and the
    lag window (same partitioning + ordering, Spark evaluates both in
    one sort), then a combinable per-user reduce. Per-row work is the
    O(20) fold events_holt already pays."""
    ev = load(spark, sf_dir, "events")
    w20 = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    f = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.collect_list(F.array(F.col("value"), F.lit(0.0))).over(w20).alias("xs"),
    )

    def _lvl(acc, x):
        return F.element_at(x, 1) * F.lit(0.3) + (
            F.element_at(acc, 1) + F.element_at(acc, 2)
        ) * F.lit(0.7)

    fold = F.aggregate(
        F.slice(F.col("xs"), 2, F.size("xs") - 1),
        F.element_at(F.col("xs"), 1),
        lambda acc, x: F.array(
            _lvl(acc, x),
            (_lvl(acc, x) - F.element_at(acc, 1)) * F.lit(0.2)
            + F.element_at(acc, 2) * F.lit(0.8),
        ),
    )
    r = f.select("user_id", "ts", "event_id", "value", fold.alias("s"))
    p = r.select(
        "user_id",
        "value",
        F.lag(F.element_at("s", 1) + F.element_at("s", 2)).over(w).alias("fc"),
    ).filter(F.col("fc").isNotNull())
    ae = F.floor(F.abs(F.col("value") - F.col("fc")) * 1000000 + F.lit(0.5)) / 1000000
    e = p.select("user_id", ae.alias("ae"))
    return e.groupBy("user_id").agg(
        F.count("*").alias("n_forecasts"),
        (
            F.floor(
                F.sum(F.col("ae").cast("decimal(18,6)")).cast("double")
                / F.count("*")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("mae"),
    )


_SEQ_CHARS = {"click": "c", "error": "e", "purchase": "p", "signup": "s", "view": "v"}
_SEQ_PATTERN = "s.*c.*p"  # signup, later a click, later a purchase


def _seq_char_sql() -> str:
    return (
        "CASE event_type "
        + " ".join(f"WHEN '{k}' THEN '{v}'" for k, v in _SEQ_CHARS.items())
        + " ELSE '_' END"
    )


@register(
    "events_sequence_match",
    oracle=f"""
    WITH s AS (
      SELECT user_id,
             string_agg({_seq_char_sql()}, '' ORDER BY ts, event_id) AS seq
      FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           regexp_matches(seq, '{_SEQ_PATTERN}') AS matched,
           CAST((length(seq) - length(replace(seq, 'cp', ''))) // 2 AS BIGINT)
             AS n_click_then_buy
    FROM s
    """,
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern matching over per-user event journeys — the
    poor-man's MATCH_RECOGNIZE / CEP operator: each user's history
    compresses to a one-char-per-event string in exact (ts, event_id)
    order, and patterns become plain regular expressions over it
    (here 'signup, then sometime a click, then sometime a purchase',
    plus an adjacency count of click-immediately-before-purchase).
    The string IS the per-user state, so arbitrarily complex ordered
    patterns (negations, bounded gaps via {{n,m}}, alternations) cost
    one regex pass instead of a k-way self-join per stage — the shape
    events_funnel's per-stage joins cannot express.

    Exactness: the journey string is built by sorting (ts, event_id,
    char) structs inside the row (deterministic total order; DuckDB's
    ordered string_agg is the same sequence), the regex is in the
    RE2-compatible subset Java and DuckDB evaluate identically, and
    the adjacency count is integer length arithmetic.

    Scale shape: one user_id shuffle (combinable collect_list), then
    pure string projections; per-user state is their event count —
    the same O(history) bound every journey op carries, parallel
    across users. At 100 TB add a time-bucketed variant for unbounded
    histories (the events_detect_gaps stitching recipe)."""
    ev = load(spark, sf_dir, "events")
    ch = F.col("event_type")
    mapped = F.lit("_")
    for k, v in reversed(_SEQ_CHARS.items()):
        mapped = F.when(ch == k, v).otherwise(mapped)
    s = (
        ev.select("user_id", F.struct("ts", "event_id", mapped.alias("ch")).alias("t"))
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("t")), lambda x: x["ch"]), ""
            ).alias("seq")
        )
    )
    return s.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.col("seq").rlike(_SEQ_PATTERN).alias("matched"),
        F.expr("CAST((length(seq) - length(replace(seq, 'cp', ''))) DIV 2 AS BIGINT)")
        .alias("n_click_then_buy"),
    )


_ATTR_WINDOW_S = 7 * 24 * 3600  # last-touch lookback: 7 days


@register(
    "events_attribution",
    oracle=f"""
    SELECT p.event_id, p.user_id, p.ts,
           CASE WHEN c.ts IS NOT NULL
                     AND date_diff('second', c.ts, p.ts) <= {_ATTR_WINDOW_S}
                THEN 'click' ELSE 'organic' END AS channel,
           CASE WHEN c.ts IS NOT NULL
                     AND date_diff('second', c.ts, p.ts) <= {_ATTR_WINDOW_S}
                THEN c.event_id END AS touch_event_id
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (
      -- same-instant clicks collapse to the max event_id BEFORE the
      -- as-of, so the credited touch is a total order (r6 ADVICE:
      -- ASOF's pick among equal c.ts is unspecified)
      SELECT user_id, ts, max(event_id) AS event_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ) c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase is credited to
    the user's most recent click at-or-before it IF that click falls
    inside a 7-day lookback, else to 'organic' — the conversion-credit
    join every growth team runs, and the canonical consumer of the
    as-of machinery (join_asof finds the touch, the lookback gates the
    credit). Spark lacks a native ASOF; the scalable pattern is the
    union + single user_id shuffle + last(ignorenulls) ordered window
    (the join_asof recipe — O(n log n) per user, no range explosion),
    with the lookback test as exact integer seconds
    (timestampdiff(SECOND) DIV-free, the events_detect_gaps recipe).
    The oracle is DuckDB's native ASOF LEFT JOIN plus the same CASE.

    Scale shape: one shuffle keyed by user_id over just the click +
    purchase subset (both filters push to the scan), one ordered
    window pass, then a pure projection. Attribution re-runs daily on
    a bounded event window in production — this plan is that job."""
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.lit(None).cast("timestamp_ntz").alias("c_ts"),
        F.lit(None).cast("long").alias("c_id"),
        F.lit(1).alias("is_left"),
    )
    right = ev.filter(F.col("event_type") == "click").select(
        F.lit(None).cast("long").alias("event_id"),
        "user_id",
        "ts",
        F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
        F.lit(0).alias("is_left"),
    )
    # c_id is the final tiebreaker: two clicks at the same (user, ts)
    # would otherwise make last(c_id) partitioning-dependent (r6
    # ADVICE). Ascending c_id puts the max event_id last in the frame
    # — the same total order the oracle pins by collapsing same-ts
    # clicks to max(event_id) before its ASOF join.
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_left"), F.col("c_id"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    m = (
        left.unionByName(right)
        .withColumn("t_ts", F.last("c_ts", ignorenulls=True).over(w))
        .withColumn("t_id", F.last("c_id", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
    )
    in_window = F.col("t_ts").isNotNull() & (
        F.expr("timestampdiff(SECOND, t_ts, ts)") <= _ATTR_WINDOW_S
    )
    return m.select(
        "event_id",
        "user_id",
        "ts",
        F.when(in_window, "click").otherwise("organic").alias("channel"),
        F.when(in_window, F.col("t_id")).alias("touch_event_id"),
    )


@register(
    "agg_ks_test",
    oracle="""
    WITH s AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS f
      FROM events WHERE event_type IN ('click', 'error')
    ),
    v AS (SELECT value, sum(f) AS a, sum(1 - f) AS b FROM s GROUP BY value),
    o AS (
      SELECT sum(a) OVER w AS c1, sum(b) OVER w AS c2
      FROM v WINDOW w AS (ORDER BY value ROWS UNBOUNDED PRECEDING)
    ),
    n AS (
      SELECT sum(a) AS n1, sum(b) AS n2 FROM v
    ),
    d AS (SELECT max(abs(c1 * (SELECT n2 FROM n) - c2 * (SELECT n1 FROM n))) AS dn FROM o)
    SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
           floor(CAST(d.dn AS DOUBLE)
                 / (CAST(n.n1 AS DOUBLE) * CAST(n.n2 AS DOUBLE))
                 * 1000000 + 0.5) / 1000000 AS ks_d
    FROM n, d
    """,
)
def agg_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    error value distributions — the DISTRIBUTION-FREE hypothesis test
    next to events_ab_test's t-test (detects any shape difference, not
    just a mean shift). D = sup|F1 - F2| evaluated at the distinct
    value points with the exact-integer identity
    D·n1·n2 = max|c1·n2 - c2·n1|, so the data-sized work is entirely
    integer running counts and the one float division happens once on
    exact operands.

    Scale shape (the events_detect_gaps recipe — no corpus-sized
    single-partition window): per-VALUE counts are one combinable
    groupBy; values then bucket by floor(value), running sums are
    computed inside each bucket's window, per-bucket subtotals prefix
    on a |buckets|-row frame (the only SinglePartition exchange — one
    row per bucket, triaged), and bucket offsets broadcast back. The
    global max is a combinable aggregate. The oracle computes the same
    statistic with a plain global window — engine-sized data, same
    exact integers."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    s = ev.select(
        "value",
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("f"),
    )
    v = s.groupBy("value").agg(
        F.sum("f").alias("a"), F.sum(1 - F.col("f")).alias("b")
    )
    # within-bucket running counts (bucket = floor(value))
    v = v.withColumn("bkt", F.floor("value").cast("long"))
    win = W.partitionBy("bkt").orderBy("value").rowsBetween(
        W.unboundedPreceding, 0
    )
    w_in = v.select(
        "bkt",
        "value",
        F.sum("a").over(win).alias("ca"),
        F.sum("b").over(win).alias("cb"),
    )
    # per-bucket totals -> exclusive prefix offsets on a |buckets|-row frame
    btot = v.groupBy("bkt").agg(F.sum("a").alias("ta"), F.sum("b").alias("tb"))
    bwin = W.orderBy("bkt").rowsBetween(W.unboundedPreceding, -1)
    offs = btot.select(
        "bkt",
        F.coalesce(F.sum("ta").over(bwin), F.lit(0)).alias("oa"),
        F.coalesce(F.sum("tb").over(bwin), F.lit(0)).alias("ob"),
    )
    n1n2 = v.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2")).collect()[0]
    n1, n2 = int(n1n2["n1"]), int(n1n2["n2"])
    d = (
        w_in.join(F.broadcast(offs), "bkt")
        .select(
            F.abs(
                (F.col("ca") + F.col("oa")) * F.lit(n2)
                - (F.col("cb") + F.col("ob")) * F.lit(n1)
            ).alias("dn")
        )
        .agg(F.max("dn").alias("dn"))
    )
    return d.select(
        F.lit(n1).cast("long").alias("n1"),
        F.lit(n2).cast("long").alias("n2"),
        (
            F.floor(
                F.col("dn").cast("double") / (float(n1) * float(n2)) * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("ks_d"),
    )


@register(
    "agg_mannwhitney",
    oracle="""
    WITH s AS (
      SELECT value, CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS f
      FROM events WHERE event_type IN ('click', 'error')
    ),
    v AS (SELECT value, sum(f) AS a, sum(1 - f) AS b FROM s GROUP BY value),
    o AS (
      SELECT a, b,
             coalesce(sum(a + b) OVER (ORDER BY value
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS prev,
             a + b AS k
      FROM v
    ),
    n AS (SELECT sum(a) AS n1, sum(b) AS n2 FROM v),
    r AS (
      -- 2*R1 stays integer: sum over values of a * (2*prev + k + 1)
      SELECT sum(a * (2 * prev + k + 1)) AS r1x2,
             sum(CAST(k AS DECIMAL(18,0)) * k * k - k) AS ties
      FROM o
    )
    SELECT CAST(n.n1 AS BIGINT) AS n1, CAST(n.n2 AS BIGINT) AS n2,
           CAST((r.r1x2 - n.n1 * (n.n1 + 1)) // 2 AS BIGINT) AS u1,
           floor((CAST(r.r1x2 AS DOUBLE) / 2
                  - CAST(n.n1 AS DOUBLE) * (n.n1 + 1) / 2
                  - CAST(n.n1 AS DOUBLE) * n.n2 / 2)
                 / sqrt(CAST(n.n1 AS DOUBLE) * n.n2 / 12
                        * ((n.n1 + n.n2 + 1)
                           - CAST(r.ties AS DOUBLE)
                             / ((n.n1 + n.n2) * (CAST(n.n1 AS DOUBLE) + n.n2 - 1))))
                 * 1000000 + 0.5) / 1000000 AS z
    FROM n, r
    """,
)
def agg_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test between the click and error value
    distributions — the nonparametric location test completing the
    hypothesis-testing family (events_ab_test: parametric means;
    agg_ks_test: any shape difference; this: stochastic dominance,
    robust to outliers where the t-test is not). Tied observations get
    the textbook average rank with the tie-corrected variance.

    Exactness: ranks come from per-distinct-value running counts, and
    DOUBLED rank sums stay integers (avg rank of a tie block starting
    after `prev` with k members is prev + (k+1)/2, so
    2·R1 = Σ a·(2·prev + k + 1) is exact); the tie term Σ(k³−k) sums
    as DECIMAL; the z-score is one sqrt — the only libm call that IS
    correctly rounded by IEEE and therefore bit-portable, unlike
    ln/exp (the events_ab_test discipline).

    Scale shape: identical to agg_ks_test minus the bucket stitching —
    per-value counts combine map-side, the ordered prefix runs over
    DISTINCT values (here one window; the KS bucket-two-phase recipe
    drops in verbatim when the distinct-value space is corpus-sized),
    and everything after is scalar arithmetic."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "error")
    )
    s = ev.select(
        "value", F.when(F.col("event_type") == "click", 1).otherwise(0).alias("f")
    )
    v = s.groupBy("value").agg(F.sum("f").alias("a"), F.sum(1 - F.col("f")).alias("b"))
    prev_w = W.orderBy("value").rowsBetween(W.unboundedPreceding, -1)
    o = v.select(
        "a",
        "b",
        F.coalesce(F.sum(F.col("a") + F.col("b")).over(prev_w), F.lit(0)).alias("prev"),
        (F.col("a") + F.col("b")).alias("k"),
    )
    nrow = v.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2")).collect()[0]
    n1, n2 = int(nrow["n1"]), int(nrow["n2"])
    r = o.agg(
        F.sum(F.col("a") * (2 * F.col("prev") + F.col("k") + 1)).alias("r1x2"),
        F.sum(
            F.col("k").cast("decimal(18,0)") * F.col("k") * F.col("k") - F.col("k")
        ).alias("ties"),
    )
    nn = n1 + n2
    z = (
        F.col("r1x2").cast("double") / 2
        - F.lit(float(n1) * (n1 + 1) / 2)
        - F.lit(float(n1) * n2 / 2)
    ) / F.sqrt(
        F.lit(float(n1) * n2 / 12)
        * (F.lit(float(nn + 1)) - F.col("ties").cast("double") / F.lit(float(nn) * (nn - 1)))
    )
    return r.select(
        F.lit(n1).cast("long").alias("n1"),
        F.lit(n2).cast("long").alias("n2"),
        F.expr(f"CAST((r1x2 - {n1} * ({n1} + 1)) DIV 2 AS BIGINT)").alias("u1"),
        (F.floor(z * 1000000 + F.lit(0.5)) / 1000000).alias("z"),
    )


@register(
    "agg_chisq_independence",
    oracle="""
    WITH cell AS (
      SELECT event_type, CAST(hour(ts) // 6 AS INT) AS day_part,
             count(*) AS obs
      FROM events GROUP BY 1, 2
    ),
    rt AS (SELECT event_type, sum(obs) AS r FROM cell GROUP BY event_type),
    ct AS (SELECT day_part, sum(obs) AS c FROM cell GROUP BY day_part),
    n AS (SELECT sum(obs) AS n FROM cell)
    SELECT cell.event_type, cell.day_part, CAST(cell.obs AS BIGINT) AS obs,
           floor(CAST(rt.r AS DOUBLE) * ct.c / n.n * 1000000 + 0.5) / 1000000
             AS expected,
           floor((CAST(cell.obs AS DOUBLE) - CAST(rt.r AS DOUBLE) * ct.c / n.n)
                 * (CAST(cell.obs AS DOUBLE) - CAST(rt.r AS DOUBLE) * ct.c / n.n)
                 / (CAST(rt.r AS DOUBLE) * ct.c / n.n)
                 * 1000000 + 0.5) / 1000000 AS chi_term
    FROM cell
    JOIN rt ON rt.event_type = cell.event_type
    JOIN ct ON ct.day_part = cell.day_part, n
    """,
)
def agg_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between event type and
    time-of-day (6-hour day parts) — 'does behavior depend on when?',
    the contingency-table sibling of agg_benford's goodness-of-fit
    screen. One row per table cell with the observed count, the
    independence-expected count row_total·col_total/n, and the cell's
    chi-square contribution; sum the column against chi-square with
    (R-1)(C-1) degrees of freedom.

    Exactness: the contingency table, margins, and grand total are all
    exact integers; expected/chi terms are the identical +,-,*,/
    double expressions in both engines, floor-rounded (the
    events_ab_test discipline). The day part is integer hour DIV 6 —
    no timezone or float boundary anywhere.

    Scale shape: one map-side-combinable groupBy to |types|×4 cells;
    margins are groupBys OF THE CELLS (KB), broadcast back — after the
    scan nothing data-sized moves."""
    ev = load(spark, sf_dir, "events")
    cell = ev.select(
        "event_type", F.expr("CAST(hour(ts) DIV 6 AS INT)").alias("day_part")
    ).groupBy("event_type", "day_part").agg(F.count("*").alias("obs"))
    rt = cell.groupBy("event_type").agg(F.sum("obs").alias("r"))
    ct = cell.groupBy("day_part").agg(F.sum("obs").alias("c"))
    n = int(cell.agg(F.sum("obs")).collect()[0][0])  # 1-row scalar
    exp = F.col("r").cast("double") * F.col("c") / F.lit(float(n))
    dev = F.col("obs").cast("double") - exp
    return (
        cell.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "day_part")
        .select(
            "event_type",
            "day_part",
            F.col("obs").cast("long").alias("obs"),
            (F.floor(exp * 1000000 + F.lit(0.5)) / 1000000).alias("expected"),
            (F.floor(dev * dev / exp * 1000000 + F.lit(0.5)) / 1000000).alias(
                "chi_term"
            ),
        )
    )


@register(
    "agg_spearman",
    oracle="""
    WITH li AS (
      SELECT l_returnflag AS g, l_quantity AS x, l_extendedprice AS y
      FROM lineitem
    ),
    rx AS (
      SELECT g, x,
             2 * coalesce(sum(count(*)) OVER (PARTITION BY g ORDER BY x
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + count(*) + 1 AS rx2
      FROM li GROUP BY g, x
    ),
    ry AS (
      SELECT g, y,
             2 * coalesce(sum(count(*)) OVER (PARTITION BY g ORDER BY y
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + count(*) + 1 AS ry2
      FROM li GROUP BY g, y
    ),
    r AS (
      SELECT li.g, rx.rx2, ry.ry2
      FROM li JOIN rx ON rx.g = li.g AND rx.x = li.x
              JOIN ry ON ry.g = li.g AND ry.y = li.y
    ),
    m AS (
      SELECT g, count(*) AS n,
             sum(CAST(rx2 AS DECIMAL(38,0))) AS sx,
             sum(CAST(ry2 AS DECIMAL(38,0))) AS sy,
             sum(CAST(rx2 AS DECIMAL(19,0)) * ry2) AS sxy,
             sum(CAST(rx2 AS DECIMAL(19,0)) * rx2) AS sxx,
             sum(CAST(ry2 AS DECIMAL(19,0)) * ry2) AS syy
      FROM r GROUP BY g
    )
    SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
           floor((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                 * 1000000 + 0.5) / 1000000 AS spearman_rho
    FROM m
    """,
)
def agg_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between quantity and price per return
    flag — the monotone-association twin of agg_regression's Pearson
    family (robust to nonlinearity and outliers: it correlates RANKS).
    Ties get textbook average ranks via the agg_mannwhitney identity:
    a value's DOUBLED average rank is 2·prev + k + 1 (prev = count of
    strictly smaller rows, k = tie-block size) — an exact integer, and
    Pearson is scale-invariant, so rho over doubled ranks equals rho
    over ranks while every moment stays an exact DECIMAL sum. The one
    libm call is sqrt (bit-portable), floor-rounded to 6 decimals.

    Scale shape: per-(group, value) tie blocks are combinable
    groupBys; the rank windows are PARTITIONED BY GROUP over distinct
    values (no global frame); ranks join back to rows on (group,
    value) equality, and the five moments reduce map-side to |groups|
    rows."""
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    def ranks(col: str, out: str):
        w = W.partitionBy("g").orderBy(col).rowsBetween(W.unboundedPreceding, -1)
        return (
            li.groupBy("g", col)
            .agg(F.count("*").alias("k"))
            .select(
                "g",
                col,
                (
                    2 * F.coalesce(F.sum("k").over(w), F.lit(0)) + F.col("k") + 1
                ).alias(out),
            )
        )

    r = li.join(ranks("x", "rx2"), ["g", "x"]).join(ranks("y", "ry2"), ["g", "y"])
    m = r.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("rx2").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("ry2").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("rx2").cast("decimal(19,0)") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2").cast("decimal(19,0)") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2").cast("decimal(19,0)") * F.col("ry2")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    rho = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return m.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").cast("long").alias("n"),
        (F.floor(rho * 1000000 + F.lit(0.5)) / 1000000).alias("spearman_rho"),
    )
