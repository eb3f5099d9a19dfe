"""Relational operator surface (SURVEY §2.1, §2.2, §2.3–2.8).

The reference implements parse-only project/filter/equality on a single
table (/root/reference/src/constructs/statements.rs:30-42,
/root/reference/src/sql/expects/semantic.rs:216-263) and declares the
rest; we realize the full relational family as declarative DataFrame
plans so Catalyst handles pushdown, pruning, join selection and AQE.

Scale notes, per op family:
- Scans: Parquet + pushed filters/pruned columns (verified via .explain
  in tests) — at 100 TB this is the difference between reading 100 TB
  and reading the 2 columns x matching row-groups you need.
- Joins: small dims (region/nation/customer at TPC-H ratios) broadcast;
  fact-fact joins shuffle on the join key and AQE handles skew.
- Aggregations: groupBy/agg compiles to partial (map-side) + final
  hash aggregation automatically — no driver-side combining anywhere.
- Windows: partitionBy keys chosen to be high-cardinality (user_id,
  custkey) so a 1000-executor cluster gets even work; no global
  (unpartitioned) windows in the hot path.
- Top-k: orderBy().limit(k) plans as TakeOrderedAndProject — per
  partition heap + driver merge of k rows, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from emdrive_spark.functions import money as M
from emdrive_spark.registry import register
from emdrive_spark.sources.tables import load


def _r2(c):
    """Deterministic money representation: round(double, 2). Spark and
    DuckDB sum doubles bitwise-identically on this corpus (verified);
    rounding is insurance against partial-agg ordering at larger SFs."""
    return F.round(c, 2)


# ---------------------------------------------------------------------------
# §2.1 scans
# ---------------------------------------------------------------------------


@register("scan_full", oracle="SELECT * FROM region")
def scan_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full table scan (reference executor/read.rs:7-31)."""
    return load(spark, sf_dir, "region")


# ---------------------------------------------------------------------------
# §2.2 projection / filter / predicates
# ---------------------------------------------------------------------------


@register(
    "project",
    oracle="SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem",
)
def project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT col,... (reference select.rs:5-32). Column pruning reaches
    the Parquet scan: ReadSchema carries only these three columns."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "filter_eq",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer
    WHERE c_mktsegment = 'BUILDING'
    """,
)
def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE a = b — the reference grammar's only predicate
    (semantic.rs:216-263). Pushed to the Parquet scan as an EqualTo."""
    return (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# §2.6 sort / limit / top-k
# ---------------------------------------------------------------------------


@register("sort_pk", oracle="SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey")
def sort_pk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY primary key — the implicit B+tree order of the reference
    (paging.rs:49-54). Range-partitioned sort, no single-node funnel."""
    return load(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal").orderBy("c_custkey")


@register(
    "limit",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
)
def limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic LIMIT (top-10 with tiebreak). Plans as
    TakeOrderedAndProject: per-partition heap, k-row driver merge."""
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# §2.7 set operations
# ---------------------------------------------------------------------------


@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION ALL SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s)


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@register("distinct_rows", oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem")
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT = hash aggregate on all columns; partial+final, map-side
    combine keeps the shuffle tiny when cardinality is low."""
    return load(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------


@register(
    "join_inner",
    oracle="""
    SELECT o_orderkey, c_name, o_totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join. customer is ~1/10 of orders: AQE picks broadcast
    below threshold; at 100 TB the fact side never re-shuffles if
    bucketed on the key."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "c_name", "o_totalprice"
    )


@register(
    "join_left",
    oracle="""
    SELECT c_custkey, o_orderkey
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left").select("c_custkey", "o_orderkey")


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI = EXISTS. Only the left side's columns flow — Spark
    never materializes the pair, and the right side reduces to a
    (broadcast) hash set of keys."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@register(
    "join_broadcast",
    oracle="""
    SELECT c_custkey, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of the dim tables: zero shuffle of the fact
    side — the canonical star-schema plan at any scale (nation=25 rows,
    region=5 rows even at sf 100k)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )


@register(
    "join_range",
    oracle="""
    SELECT s_suppkey, c_custkey
    FROM supplier JOIN customer
      ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    """,
)
def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join: equi key (nationkey) carries the shuffle, the range
    predicate evaluates post-match — NOT a BNLJ. At scale, the equi
    component is what keeps this tractable."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    return s.join(
        c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal)
    ).select("s_suppkey", "c_custkey")


@register(
    "join_asof",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS matched_ts, r.value AS matched_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest view by the same user
    at-or-before it. Spark lacks a native ASOF; the scalable pattern is
    a single union + one shuffle on (user_id) + an ordered window with
    last(ignorenulls) — O(n log n) per user partition, no range
    explosion, no per-row subquery. (user_id, ts) pairs are unique in
    this corpus, so the match is deterministic."""
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(None).cast("timestamp").alias("r_ts"),
        F.lit(None).cast("double").alias("r_value"), F.lit(1).alias("is_left"),
    )
    right = ev.filter(F.col("event_type") == "view").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
        F.col("ts").alias("r_ts"), F.col("value").alias("r_value"),
        F.lit(0).alias("is_left"),
    )
    # Right rows sort before left rows at identical ts so ties match
    # (ASOF's <= semantics).
    merged = left.unionByName(right)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_left"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("matched_ts", F.last("r_ts", ignorenulls=True).over(w))
        .withColumn("matched_value", F.last("r_value", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select("event_id", "user_id", "ts", "matched_ts", "matched_value")
    )


def _asof_merged(spark: SparkSession, sf_dir: str):
    """Shared union frame for the as-of family: purchases as left rows,
    views as right rows, one (user_id)-keyed stream."""
    ev = load(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast(ev.schema["ts"].dataType).alias("r_ts"),
        F.lit(None).cast("double").alias("r_value"), F.lit(1).alias("is_left"),
    )
    right = ev.filter(F.col("event_type") == "view").select(
        F.lit(None).cast("long").alias("event_id"), "user_id", "ts",
        F.col("ts").alias("r_ts"), F.col("value").alias("r_value"),
        F.lit(0).alias("is_left"),
    )
    return left.unionByName(right)


@register(
    "join_asof_forward",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts,
           r.ts AS matched_ts, r.value AS matched_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the EARLIEST view by the
    same user at-or-after it (pandas merge_asof direction='forward').
    Same single-shuffle union + ordered-window shape as join_asof, with
    the stream ordered descending so last(ignorenulls) carries the
    nearest future right row backwards."""
    merged = _asof_merged(spark, sf_dir)
    # Right rows sort before left at identical ts (<= matches ties).
    w = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_left"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("matched_ts", F.last("r_ts", ignorenulls=True).over(w))
        .withColumn("matched_value", F.last("r_value", ignorenulls=True).over(w))
        .filter(F.col("is_left") == 1)
        .select("event_id", "user_id", "ts", "matched_ts", "matched_value")
    )


@register(
    "join_asof_nearest",
    oracle="""
    WITH l AS (SELECT * FROM events WHERE event_type = 'purchase'),
    bwd AS (
      SELECT l.event_id, r.ts AS b_ts, r.value AS b_value
      FROM l ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    ),
    fwd AS (
      SELECT l.event_id, r.ts AS f_ts, r.value AS f_value
      FROM l ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
        ON l.user_id = r.user_id AND l.ts <= r.ts
    )
    SELECT l.event_id, l.user_id, l.ts,
           CASE WHEN f_ts IS NULL THEN b_ts
                WHEN b_ts IS NULL THEN f_ts
                WHEN (l.ts - b_ts) <= (f_ts - l.ts) THEN b_ts
                ELSE f_ts END AS matched_ts,
           CASE WHEN f_ts IS NULL THEN b_value
                WHEN b_ts IS NULL THEN f_value
                WHEN (l.ts - b_ts) <= (f_ts - l.ts) THEN b_value
                ELSE f_value END AS matched_value
    FROM l JOIN bwd ON l.event_id = bwd.event_id
           JOIN fwd ON l.event_id = fwd.event_id
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join (pandas merge_asof direction='nearest'): the
    view closest in time on EITHER side, ties to the earlier one. Two
    ordered-window passes over the SAME (user_id)-partitioned union —
    Catalyst evaluates both window specs in one shuffle's worth of
    partitioning — then an interval comparison picks the winner."""
    merged = _asof_merged(spark, sf_dir)
    wb = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_left"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wf = (
        W.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("is_left"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    both = (
        merged.withColumn("b_ts", F.last("r_ts", ignorenulls=True).over(wb))
        .withColumn("b_value", F.last("r_value", ignorenulls=True).over(wb))
        .withColumn("f_ts", F.last("r_ts", ignorenulls=True).over(wf))
        .withColumn("f_value", F.last("r_value", ignorenulls=True).over(wf))
        .filter(F.col("is_left") == 1)
    )
    take_b = (
        F.col("f_ts").isNull()
        | (~F.col("b_ts").isNull())
        & ((F.col("ts") - F.col("b_ts")) <= (F.col("f_ts") - F.col("ts")))
    )
    return both.select(
        "event_id",
        "user_id",
        "ts",
        F.when(take_b, F.col("b_ts")).otherwise(F.col("f_ts")).alias("matched_ts"),
        F.when(take_b, F.col("b_value")).otherwise(F.col("f_value")).alias("matched_value"),
    )


@register(
    "join_right",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi right outer join (SURVEY §2.3 full family). nation is tiny,
    but a RIGHT outer cannot broadcast its preserved (right) side —
    Spark plans broadcast-left or shuffles; either way null-extends
    supplier-less nations."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return s.join(n, s.s_nationkey == n.n_nationkey, "right").select(
        "s_suppkey", "s_name", "n_name"
    )


@register(
    "join_full",
    oracle="""
    SELECT coalesce(c.nk, s.nk) AS nationkey, c.n_cust, s.n_supp
    FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY c_nationkey) c
    FULL JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY s_nationkey) s
      ON c.nk = s.nk
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides — per-nation customer
    vs supplier counts. Pre-aggregating BEFORE the outer join is the
    scale move: the join operates on ≤25 rows per side instead of the
    raw tables, and at small SF some nations exist on only one side, so
    both null-extension directions are exercised."""
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_cust"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("n_supp"))
    )
    return c.join(s, "nk", "full").select(
        F.col("nk").alias("nationkey"), "n_cust", "n_supp"
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------


@register(
    "agg_group_sum",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                 AS sum_qty,
           {M.sql_money_sum('l_extendedprice')}      AS sum_base_price,
           CAST(sum({M.SQL_DISC_PRICE}) AS DOUBLE)   AS sum_disc_price,
           CAST(sum({M.SQL_CHARGE}) AS DOUBLE)       AS sum_charge,
           round(sum(l_quantity), 2) / count(*)      AS avg_qty,
           {M.sql_money_sum('l_extendedprice')} / count(*) AS avg_price,
           CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(*) AS avg_disc,
           count(*)                                  AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan → partial+final hash aggregate.
    The filter pushes to Parquet; only 7 of 11 columns are read.
    Money sums run in DECIMAL (functions.money): double sums vary with
    combine order and can flip a cent at half-cent boundaries under a
    different partitioning; decimal sums are exact on any engine.
    Quantity sums stay double — integral values sum exactly."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _r2(F.sum("l_quantity")).alias("sum_qty"),
            M.money_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(M.disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(M.charge()).cast("double").alias("sum_charge"),
            # avg = exact-sum / n: bitwise-equal inputs divide
            # deterministically; no outer round (quotient midpoints are
            # where Spark HALF_UP != DuckDB HALF_EVEN).
            (_r2(F.sum("l_quantity")) / F.count("*")).alias("avg_qty"),
            (M.money_sum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (F.sum(M.rate("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_count_distinct",
    oracle="""
    SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_custs, count(*) AS n_orders
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct — Spark expands to a two-phase aggregate (distinct
    on (group, key) then count), both phases map-side partial."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_custs"),
            F.count("*").alias("n_orders"),
        )
    )


@register("agg_approx_count_distinct", oracle=None)  # HLL sketches differ across engines
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct = HyperLogLog++: constant memory per group
    regardless of key cardinality — the 100 TB replacement for exact
    distinct when ±2% is acceptable. Not oracle-comparable (sketch
    internals differ across engines) → rows-only check."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_custs"))
    )


@register(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(_r2(F.sum("l_quantity")).alias("sum_qty"), F.count("*").alias("n"))
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           {M.sql_money_sum('o_totalprice')} AS sum_price, count(*) AS n
    FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(M.money_sum("o_totalprice").alias("sum_price"), F.count("*").alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.5 window functions
# ---------------------------------------------------------------------------


@register(
    "window_rank",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 3
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer. One shuffle on o_custkey; Spark 3.5+
    inserts a WindowGroupLimit so each partition keeps only 3 rows
    before the final window — the scalable top-k-per-group plan."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_lag",
    oracle="""
    SELECT event_id, user_id, value,
           lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
    FROM events
    """,
)
def window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id", "value", F.lag("value").over(w).alias("prev_value"))
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
    FROM orders
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per customer. Explicit ROWS frame (the default with
    ORDER BY is RANGE — different semantics on ties) and a full
    tie-break so the accumulation order is deterministic."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", _r2(F.sum("o_totalprice").over(w)).alias("running_total"))
    )


@register(
    "window_ntile_lead",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS INT) AS price_quartile,
           lead(o_orderkey) OVER w AS next_orderkey,
           first_value(o_orderkey) OVER w AS first_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    """,
)
def window_ntile_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/lead/first_value over one shared window spec (SURVEY §2.5
    ranking + analytic family). One shuffle on the partition key serves
    all three functions — Spark collapses same-spec windows into a
    single Window physical node."""
    w = W.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.ntile(4).over(w).alias("price_quartile"),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
        F.first("o_orderkey").over(w).alias("first_orderkey"),
    )


@register(
    "window_range_frame",
    oracle="""
    SELECT o_orderkey,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderkey
             RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_total
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-count-based) — all orders whose
    key lies within 1000 of the current row's. Summed in DECIMAL so the
    result is exact regardless of intra-frame add order, then cast to
    double for the comparison."""
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rangeBetween(-1000, W.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(w).cast("double").alias("near_total"),
    )


@register(
    "agg_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5)  AS p50,
           quantile_cont(l_quantity, 0.95) AS p95
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (SURVEY §2.4). Spark's percentile
    is a sort-based exact aggregate — at 100 TB prefer approx_percentile
    (see agg_approx_count_distinct for the sketch-family caveat); this
    op pins the exact semantics the approximate one converges to."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("p50"),
            F.expr("percentile(l_quantity, 0.95)").alias("p95"),
        )
    )


# ---------------------------------------------------------------------------
# §2.2 subquery shapes (via the SQL surface — Catalyst decorrelates)
# ---------------------------------------------------------------------------


@register(
    "subquery_scalar",
    oracle="""
    SELECT p_partkey, p_retailprice
    FROM part
    WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: Catalyst plans the inner agg as a
    separate 1-row stage whose result is injected into the outer
    filter — two passes over part, no join."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(
        "SELECT p_partkey, p_retailprice FROM part "
        "WHERE p_retailprice > (SELECT avg(p_retailprice) FROM part)"
    )


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery → Catalyst rewrites to LEFT SEMI join (same physical
    plan as join_semi; this pins the SQL surface for it)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_custkey IN "
        "(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')"
    )


# ---------------------------------------------------------------------------
# §2.8 scalar function passthrough
# ---------------------------------------------------------------------------


@register(
    "str_funcs",
    oracle="""
    SELECT p_partkey, upper(p_brand) AS brand_u, substr(p_name, 1, 10) AS name10,
           CAST(length(p_type) AS BIGINT) AS type_len,
           concat(p_brand, ':', p_type) AS brand_type
    FROM part
    """,
)
def str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String library passthrough (ABSENT in reference, SURVEY §2.8)."""
    return load(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.substring("p_name", 1, 10).alias("name10"),
        F.length("p_type").cast("long").alias("type_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
    )


@register(
    "date_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT)  AS o_year,
           CAST(month(o_orderdate) AS BIGINT) AS o_month,
           date_trunc('month', o_orderdate)   AS month_start
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


@register(
    "str_levenshtein",
    oracle="""
    SELECT p_partkey, p_name,
           CAST(levenshtein(p_name, 'small copper ring') AS BIGINT) AS edit_dist
    FROM part
    WHERE levenshtein(p_name, 'small copper ring') <= 8
    """,
)
def str_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance similarity on strings (the non-vector cousin of the
    metric ops): distance to a probe name with a threshold filter —
    same SELECT-distance-WHERE shape as the README's hash @ query
    flagship, over a string metric space. (Probe re-anchored to the
    current fixture generation's '<size> <material> <noun>' name
    style in r7 — the r1-era TPC-H-style probe sat >= 17 edits from
    every current name, making the filter vacuously empty.)"""
    p = load(spark, sf_dir, "part")
    d = F.levenshtein(F.col("p_name"), F.lit("small copper ring"))
    return (
        p.select("p_partkey", "p_name", d.cast("long").alias("edit_dist"))
        .filter(F.col("edit_dist") <= 8)
    )


_TRGM_PROBE = "promo burnished copper"
_TRGM_SET = sorted({_TRGM_PROBE[i : i + 3] for i in range(len(_TRGM_PROBE) - 2)})
_TRGM_SQL = "[" + ", ".join(f"'{t}'" for t in _TRGM_SET) + "]"


@register(
    "str_trgm_similarity",
    oracle=f"""
    WITH t AS (
      SELECT p_partkey,
             list_distinct(list_transform(range(1, greatest(len(p_name) - 2, 0) + 1),
                                          i -> substr(p_name, i, 3))) AS tg
      FROM part
    )
    SELECT p_partkey,
           CAST(len(list_intersect(tg, {_TRGM_SQL})) AS BIGINT) AS n_shared,
           floor(CAST(len(list_intersect(tg, {_TRGM_SQL})) AS DOUBLE)
                 / CAST(len(list_distinct(list_concat(tg, {_TRGM_SQL}))) AS DOUBLE)
                 * 10000 + 0.5) / 10000 AS trgm_jaccard
    FROM t
    """,
)
def str_trgm_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigram-set Jaccard similarity against a probe string — the
    pg_trgm-style fuzzy match (robust to word order and partial edits,
    where levenshtein is position-bound). Trigram extraction and set
    algebra are higher-order array expressions per row: no shuffle, no
    Python. At corpus scale the probe set (here 20 trigrams) broadcasts
    as a literal; an any-to-any fuzzy join would instead explode
    trigrams and equi-join on them (the dedup_ngram shape)."""
    p = load(spark, sf_dir, "part")
    name = F.col("p_name")
    # strings shorter than 3 chars have NO trigrams — mirror the
    # oracle's empty set exactly (and dodge sequence(1, k<1) descending)
    tg = F.when(
        F.length(name) >= 3,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(name) - 2),
                lambda i: name.substr(i, F.lit(3)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    probe = F.array(*[F.lit(t) for t in _TRGM_SET])
    inter = F.size(F.array_intersect(tg, probe))
    union = F.size(F.array_union(tg, probe))
    return p.select(
        "p_partkey",
        inter.cast("long").alias("n_shared"),
        (F.floor(inter.cast("double") / union.cast("double") * 10000 + F.lit(0.5)) / 10000).alias(
            "trgm_jaccard"
        ),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, CAST(rnk AS INT) AS rnk
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      FROM orders
    )
    WHERE rnk <= 3
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the grouped top-k idiom (window
    row_number + filter). One shuffle on the group key; rank columns
    never materialize beyond k per group after the filter. The global
    variant is `limit`/TakeOrderedAndProject; this is its per-key twin."""
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("c_custkey"),
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@register(
    "agg_stats",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             count(*) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           round((sxy / n - (sx / n) * (sy / n))
                 / sqrt((sxx / n - (sx / n) * (sx / n))
                        * (syy / n - (sy / n) * (sy / n))), 6) AS price_qty_corr,
           round(sxy / n - (sx / n) * (sy / n), 2) AS price_qty_cov,
           round(sqrt((sxx - sx * sx / n) / (n - 1)), 2) AS price_stddev
    FROM m
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (corr / covar_pop / stddev_samp), derived
    from exact DECIMAL power sums (Σx, Σy, Σxy, Σx², Σy²) rather than
    the built-in streaming co-moments: co-moment merges depend on
    partition order, so their last ulp differs run to run; power sums
    of 2-decimal values are exact, and the identical downstream double
    arithmetic yields identical results on every engine and
    partitioning. (At this value range the textbook cancellation risk
    of the power-sum form is ~1e-9 relative — far under the rounding.)
    Still one pass, still partial+final map-side aggregation."""
    li = load(spark, sf_dir, "lineitem")
    x = M.dec2("l_extendedprice")
    y = F.col("l_quantity").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov = sxy / n - (sx / n) * (sy / n)
    corr = cov / F.sqrt(
        (sxx / n - (sx / n) * (sx / n)) * (syy / n - (sy / n) * (sy / n))
    )
    stddev = F.sqrt((sxx - sx * sx / n) / (n - 1))
    return m.select(
        "l_returnflag",
        F.round(corr, 6).alias("price_qty_corr"),
        F.round(cov, 2).alias("price_qty_cov"),
        F.round(stddev, 2).alias("price_stddev"),
    )


@register(
    "window_percent_rank",
    oracle="""
    SELECT o_orderkey,
           round(percent_rank() OVER w, 6) AS pr,
           round(cume_dist() OVER w, 6) AS cd
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position analytics: percent_rank and cume_dist over the
    same spec (one Window node). Ordering key is the unique PK, so both
    are tie-free and deterministic."""
    w = W.partitionBy("o_orderpriority").orderBy("o_orderkey")
    return load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@register(
    "array_funcs",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, [o_orderkey, o_orderkey * 2, o_orderkey * 3] AS arr
      FROM orders WHERE o_orderkey <= 100
    )
    SELECT o_orderkey,
           array_to_string(list_slice(arr, 2, 3), ',') AS mid,
           CAST(len(arr) AS INT) AS n,
           array_to_string(
             list_transform(list_zip(arr, arr), p -> p[1] + p[2]), ',') AS doubled,
           CAST(list_sum(arr) AS BIGINT) AS total
    FROM t
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array library passthrough (SURVEY §2.8): construct, slice, size,
    zip_with arithmetic, aggregate-sum — all JVM-side higher-order
    expressions, no shuffle, no Python. Array outputs are serialized to
    CSV strings: the driver's order-insensitive hash sorts values in
    pandas, and raw Python lists are unhashable there (r1 finding)."""
    arr = F.array(F.col("o_orderkey"), F.col("o_orderkey") * 2, F.col("o_orderkey") * 3)
    t = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 100)
        .select("o_orderkey", arr.alias("arr"))
    )
    return t.select(
        "o_orderkey",
        F.array_join(F.slice("arr", 2, 2).cast("array<string>"), ",").alias("mid"),
        F.size("arr").alias("n"),
        F.array_join(
            F.zip_with("arr", "arr", lambda a, b: a + b).cast("array<string>"), ","
        ).alias("doubled"),
        F.aggregate("arr", F.lit(0).cast("bigint"), lambda acc, x: acc + x).alias("total"),
    )


@register(
    "null_conditional_funcs",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn'
                WHEN c_acctbal < 5000 THEN 'standard'
                ELSE 'premium' END AS tier,
           round(greatest(c_acctbal, 0.0), 2) AS nonneg_bal,
           round(least(c_acctbal, 9999.99), 2) AS capped_bal
    FROM customer
    """,
)
def null_conditional_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL/conditional library (SURVEY §2.8): coalesce, nullif,
    CASE WHEN chains, greatest/least — pure codegen projections."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.coalesce(F.nullif("c_mktsegment", F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.when(F.col("c_acctbal") < 0, "overdrawn")
        .when(F.col("c_acctbal") < 5000, "standard")
        .otherwise("premium")
        .alias("tier"),
        F.round(F.greatest("c_acctbal", F.lit(0.0)), 2).alias("nonneg_bal"),
        F.round(F.least("c_acctbal", F.lit(9999.99)), 2).alias("capped_bal"),
    )


@register(
    "cast_funcs",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS VARCHAR) AS key_str,
           CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
           CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS order_date,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS date_str
    FROM orders
    """,
)
def cast_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast/conversion surface pinning the emdrive↔Spark type map
    (SURVEY §1.2). floor() is explicit on both sides: DuckDB's
    float→int CAST rounds while Spark's truncates — never rely on
    implicit float→int casts in cross-engine code."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.floor("o_totalprice").cast("long").alias("price_floor"),
        F.col("o_orderdate").cast("date").cast("string").alias("order_date"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("date_str"),
    )


@register(
    "agg_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_total
    FROM orders GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram: bucket = floor(value / width) — one hash
    aggregate, bucket count bounded by the value range, not the row
    count. The building block for distribution profiling and skew
    detection at corpus scale (pair with analyze_table's min/max to
    pick the width)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.floor(F.col("o_totalprice") / 50000).cast("long").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            M.money_sum("o_totalprice").alias("bucket_total"),
        )
    )


@register(
    "subquery_correlated_agg",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE c_acctbal > (SELECT 2 * avg(o_totalprice) / 100 FROM orders o
                       WHERE o.o_custkey = c.c_custkey)
    """,
)
def subquery_correlated_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar-aggregate subquery — Catalyst decorrelates it
    into aggregate + join (one pass over orders, no per-row re-scan);
    the naive reading is O(|customer| × |orders|)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer c
        WHERE c_acctbal > (SELECT 2 * avg(o_totalprice) / 100 FROM orders o
                           WHERE o.o_custkey = c.c_custkey)
        """
    )


# ---------------------------------------------------------------------------
# Modern aggregate / window / scalar breadth (round-1 continuation)
# ---------------------------------------------------------------------------


@register(
    "agg_mode_median",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_quantity AS q, count(*) AS n
      FROM lineitem GROUP BY 1, 2
    ),
    m AS (
      SELECT l_returnflag, q, n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, q ASC) AS rn
      FROM c
    ),
    med AS (
      SELECT l_returnflag, median(l_quantity) AS median_qty
      FROM lineitem GROUP BY 1
    )
    SELECT m.l_returnflag, m.q AS mode_qty, m.n AS mode_count, med.median_qty
    FROM m JOIN med USING (l_returnflag)
    WHERE m.rn = 1
    """,
)
def agg_mode_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode + median per group. The built-in mode() is tie-arbitrary in
    both engines, so the mode is computed deterministically: count per
    (group, value), rank by (count DESC, value ASC), keep rank 1 —
    two map-side-combined aggregations, value-cardinality intermediate.
    Median (exact, interpolating) joins on the 3-row group key."""
    li = load(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", F.col("l_quantity").alias("q")).agg(
        F.count("*").alias("n")
    )
    w = W.partitionBy("l_returnflag").orderBy(F.col("n").desc(), F.col("q").asc())
    mode = (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", F.col("q").alias("mode_qty"), F.col("n").alias("mode_count"))
    )
    med = li.groupBy("l_returnflag").agg(F.median("l_quantity").alias("median_qty"))
    return mode.join(med, "l_returnflag")


@register(
    "agg_regression",
    oracle="""
    WITH m AS (
      SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sx,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sy,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sxy,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS syy
      FROM lineitem GROUP BY 1
    )
    SELECT l_returnflag, n,
           round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) + 0.0 AS slope,
           round((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n, 4)
             + 0.0 AS intercept,
           round(((sxy - sx * sy / n) * (sxy - sx * sy / n))
                 / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) + 0.0 AS r2
    FROM m
    """,
)
def agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-regression aggregates (regr_slope / regr_intercept / r²)
    of quantity on price per group, derived from exact DECIMAL power
    sums for the same reason as agg_stats: the built-in streaming
    co-moments merge in partition order and wobble in the last ulp,
    while power sums of 2-decimal values are exact and the downstream
    double arithmetic is identical on every engine. One pass, map-side
    partials."""
    li = load(spark, sf_dir, "lineitem")
    x = M.dec2("l_extendedprice")
    y = F.col("l_quantity").cast("decimal(18,2)")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    # "+ 0.0" normalizes IEEE negative zero: a slope that rounds to
    # -0.0 here but 0.0 in the oracle would hash-mismatch (r1 finding).
    return m.select(
        "l_returnflag",
        "n",
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (F.round((sy - slope * sx) / n, 4) + F.lit(0.0)).alias("intercept"),
        (
            F.round(
                ((sxy - sx * sy / n) * (sxy - sx * sy / n))
                / ((sxx - sx * sx / n) * (syy - sy * sy / n)),
                6,
            )
            + F.lit(0.0)
        ).alias("r2"),
    )


@register(
    "agg_bitwise",
    oracle="""
    SELECT l_linestatus,
           bit_and(l_orderkey) AS key_and,
           bit_or(l_orderkey) AS key_or,
           bit_xor(l_orderkey) AS key_xor,
           count(*) AS n
    FROM lineitem GROUP BY 1
    """,
)
def agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregates (AND/OR/XOR fold over a key column) — order-
    and partitioning-independent by algebra, so they need none of the
    decimal machinery; the XOR fold is the classic set-difference /
    missing-element trick at corpus scale."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.bit_and("l_orderkey").alias("key_and"),
            F.bit_or("l_orderkey").alias("key_or"),
            F.bit_xor("l_orderkey").alias("key_xor"),
            F.count("*").alias("n"),
        )
    )


@register(
    "window_cume_dist",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           round(cume_dist() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice, o_orderkey), 6) AS cd,
           nth_value(o_orderkey, 2) OVER (
             PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_cheapest
    FROM orders
    """,
)
def window_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value analytics (SURVEY §2.5 breadth). The
    ordering key includes the unique o_orderkey so cume_dist is
    tie-free and engine-identical; nth_value reads the full-partition
    frame explicitly."""
    o = load(spark, sf_dir, "orders")
    order = [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    w = W.partitionBy("o_orderpriority").orderBy(*order)
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_cheapest"),
    )


@register(
    "explode_pos",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
      FROM documents WHERE doc_id < 50
    ),
    e AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(toks) + 1),
                                   i -> {'pos': i - 1, 'tok': toks[i]})) AS u
      FROM t
    )
    SELECT doc_id, CAST(u.pos AS INT) AS pos, u.tok AS tok FROM e
    """,
)
def explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: array → (position, element) rows — the lateral-view
    building block for token-level work. The position comes from the
    generator itself, not a window, so no shuffle is added."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    from emdrive_spark.operators.text import tokens as _tokens

    return d.select("doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok"))


@register(
    "regex_funcs",
    oracle=r"""
    SELECT o_orderkey,
           CAST(regexp_extract(o_orderpriority, '^(\d+)-(.+)$', 1) AS INT)
             AS prio_num,
           regexp_extract(o_orderpriority, '^(\d+)-(.+)$', 2) AS prio_name,
           regexp_matches(o_orderpriority, 'URGENT|HIGH') AS is_hot,
           regexp_replace(lower(o_orderpriority), '[^a-z0-9]', '_', 'g') AS slug
    FROM orders
    """,
)
def regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex scalar family (extract group / match / replace) in the
    RE2-compatible dialect both engines evaluate identically — pure
    codegen projection."""
    o = load(spark, sf_dir, "orders")
    pat = r"^(\d+)-(.+)$"
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", pat, 1).cast("int").alias("prio_num"),
        F.regexp_extract("o_orderpriority", pat, 2).alias("prio_name"),
        F.col("o_orderpriority").rlike("URGENT|HIGH").alias("is_hot"),
        F.regexp_replace(F.lower(F.col("o_orderpriority")), "[^a-z0-9]", "_").alias(
            "slug"
        ),
    )


@register(
    "join_null_safe",
    oracle="""
    WITH o AS (SELECT o_orderkey, o_orderstatus,
                      nullif(o_custkey % 7, 0) AS k FROM orders),
    a AS (SELECT k, count(*) AS n_open FROM o WHERE o_orderstatus = 'O' GROUP BY k),
    b AS (SELECT k, count(*) AS n_final FROM o WHERE o_orderstatus = 'F' GROUP BY k)
    SELECT a.k, a.n_open, b.n_final
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): the NULL
    key buckets match each other instead of vanishing — the semantics
    ETL needs when the join key is legitimately absent. Still a hash
    join on the key (null-safe equality is an equi-key to Spark), not
    a BNLJ."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.nullif(F.col("o_custkey") % 7, F.lit(0)).alias("k"),
    )
    a = o.filter(F.col("o_orderstatus") == "O").groupBy("k").agg(F.count("*").alias("n_open"))
    b = o.filter(F.col("o_orderstatus") == "F").groupBy("k").agg(F.count("*").alias("n_final"))
    return a.join(b, a["k"].eqNullSafe(b["k"])).select(a["k"].alias("k"), "n_open", "n_final")


@register(
    "join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (dim × dim — the only place a Cartesian
    product is legitimate; both sides are constant-size). Completes the
    §2.3 join family."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@register(
    "window_ignore_nulls",
    oracle="""
    SELECT o_orderkey,
           last_value(big_key IGNORE NULLS) OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_big,
           first_value(big_key IGNORE NULLS) OVER (
             PARTITION BY o_orderpriority ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_big
    FROM (SELECT o_orderkey, o_orderpriority,
                 CASE WHEN o_totalprice > 150000 THEN o_orderkey END AS big_key
          FROM orders)
    """,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last IGNORE NULLS over a running frame — the
    carry-forward-last-observation primitive (same mechanism as
    events_gap_fill, here in its §2.5 window form on a sparse derived
    column)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.when(F.col("o_totalprice") > 150000, F.col("o_orderkey")).alias("big_key"),
    )
    w = (
        W.partitionBy("o_orderpriority")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_orderkey",
        F.last("big_key", ignorenulls=True).over(w).alias("last_big"),
        F.first("big_key", ignorenulls=True).over(w).alias("first_big"),
    )


@register(
    "map_funcs",
    oracle="""
    SELECT event_id,
           'k' AS prop_keys,
           CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR)
             AS prop_vals,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
    FROM events
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: props parsed to map<string,long>, then
    map_keys / map_values / element access — the semi-structured
    property-bag pattern. (Keys/values ship CSV-serialized: neither map
    nor raw array columns survive the driver's pandas canonicalizer.)"""
    ev = load(spark, sf_dir, "events").select(
        "event_id", F.from_json("props", "map<string,bigint>").alias("m")
    )
    return ev.select(
        "event_id",
        F.array_join(F.map_keys("m"), ",").alias("prop_keys"),
        F.array_join(F.map_values("m").cast("array<string>"), ",").alias("prop_vals"),
        F.col("m")["k"].alias("k_val"),
    )


@register(
    "union_by_name",
    oracle="""
    SELECT n_name AS name, n_regionkey AS rkey FROM nation
    UNION ALL BY NAME
    SELECT NULL AS rkey, r_name AS name FROM region
    """,
)
def union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: schema-evolution-tolerant
    append (column order differs, missing columns null-fill) — the ETL
    union, not the positional one."""
    a = load(spark, sf_dir, "nation").select(
        F.col("n_name").alias("name"), F.col("n_regionkey").alias("rkey")
    )
    b = load(spark, sf_dir, "region").select(F.col("r_name").alias("name"))
    return a.unionByName(b, allowMissingColumns=True)


@register(
    "agg_conditional",
    oracle="""
    SELECT l_returnflag,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS discounted_value,
           bool_and(l_quantity >= 1) AS all_positive_qty,
           bool_or(l_tax = 0) AS any_tax_free
    FROM lineitem GROUP BY 1
    """,
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregates: count_if / FILTERed sum / bool_and /
    bool_or — the one-pass alternative to N filtered subqueries; all
    map-side combined."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_discount") > 0.05
    return li.groupBy("l_returnflag").agg(
        F.count_if(disc).alias("n_discounted"),
        F.sum(F.when(disc, M.dec2("l_extendedprice"))).cast("double").alias("discounted_value"),
        F.bool_and(F.col("l_quantity") >= 1).alias("all_positive_qty"),
        F.bool_or(F.col("l_tax") == 0).alias("any_tax_free"),
    )


@register("agg_percentile_approx", oracle=None)
def agg_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (percentile_approx, re-aggregable
    KLL-style sketch) — the 100 TB path the exact agg_percentile op
    converges from: constant memory per group, mergeable partials.
    Approximate by design → rows-only check; accuracy vs the exact
    percentile is pinned in tests/test_engine.py."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_quantity", 0.5, 10000).alias("p50_approx"),
            F.percentile_approx("l_quantity", 0.95, 10000).alias("p95_approx"),
        )
    )


@register(
    "agg_moments",
    oracle="""
    WITH m AS (
      SELECT event_type, count(*) AS n,
             CAST(sum(v) AS DOUBLE) AS s1,
             CAST(sum(v2) AS DOUBLE) AS s2,
             CAST(sum(CAST(v2 AS DECIMAL(19,4)) * v) AS DOUBLE) AS s3,
             CAST(sum(CAST(v2 AS DECIMAL(19,4)) * v2) AS DOUBLE) AS s4
      FROM (SELECT event_type,
                   CAST(value AS DECIMAL(9,2)) AS v,
                   CAST(CAST(value AS DECIMAL(9,2)) * CAST(value AS DECIMAL(9,2))
                        AS DECIMAL(18,4)) AS v2
            FROM events)
      GROUP BY event_type
    )
    SELECT event_type, CAST(n AS BIGINT) AS n,
           floor((s1/n) * 1000000 + 0.5) / 1000000 AS mean,
           floor((s2/n - (s1/n)*(s1/n)) * 1000000 + 0.5) / 1000000 AS var_pop,
           floor(((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                  / ((s2/n - (s1/n)*(s1/n)) * sqrt(s2/n - (s1/n)*(s1/n))))
                 * 1000000 + 0.5) / 1000000 AS skewness,
           floor(((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                   - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                  / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3.0)
                 * 1000000 + 0.5) / 1000000 AS kurtosis_excess
    FROM m
    """,
)
def agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis from EXACT decimal power sums
    (Σv..Σv⁴): the built-in skewness/kurtosis stream co-moments whose
    last ulp depends on partition merge order, while 2-decimal values
    raised within DECIMAL(38) are exact, and the downstream double
    arithmetic is written token-for-token like the oracle's (including
    var*sqrt(var) instead of pow(var, 1.5) — sqrt is IEEE-exact, pow is
    libm-dependent). One map-side partial aggregation, five numbers per
    group, same plan shape as agg_stats."""
    ev = load(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(9,2)")
    v2 = (v * v).cast("decimal(18,4)")
    m = (
        ev.select("event_type", v.alias("v"), v2.alias("v2"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("v").cast("double").alias("s1"),
            F.sum("v2").cast("double").alias("s2"),
            F.sum(F.col("v2") * F.col("v")).cast("double").alias("s3"),
            F.sum(F.col("v2") * F.col("v2")).cast("double").alias("s4"),
        )
    )
    n = F.col("n")
    mu = F.col("s1") / n
    s2n = F.col("s2") / n
    s3n = F.col("s3") / n
    s4n = F.col("s4") / n
    var = s2n - mu * mu
    skew = (s3n - F.lit(3) * mu * s2n + F.lit(2) * mu * mu * mu) / (var * F.sqrt(var))
    kurt = (
        s4n - F.lit(4) * mu * s3n + F.lit(6) * mu * mu * s2n - F.lit(3) * mu * mu * mu * mu
    ) / (var * var) - F.lit(3.0)

    def f6(c):
        return F.floor(c * 1000000 + F.lit(0.5)) / 1000000

    return m.select(
        "event_type",
        n.alias("n"),
        f6(mu).alias("mean"),
        f6(var).alias("var_pop"),
        f6(skew).alias("skewness"),
        f6(kurt).alias("kurtosis_excess"),
    )


@register(
    "window_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    keyed AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d) AS INT)
               AS island_key
      FROM days
    ),
    islands AS (
      SELECT user_id, island_key, count(*) AS len
      FROM keyed GROUP BY user_id, island_key
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_islands,
           CAST(max(len) AS BIGINT) AS longest_streak,
           CAST(sum(len) AS BIGINT) AS active_days
    FROM islands GROUP BY user_id
    """,
)
def window_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user runs of CONSECUTIVE active days via
    the date-minus-row_number trick (consecutive days share an island
    key), then per-island lengths roll up to streak stats — the classic
    engagement-streak query. Two shuffles, both on user_id (the window
    and the rollup reuse the same partitioning; AQE coalesces). All
    integer/date arithmetic — engine-exact by construction."""
    ev = load(spark, sf_dir, "events")
    days = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = W.partitionBy("user_id").orderBy("d")
    keyed = days.select(
        "user_id",
        "d",
        F.date_sub(F.col("d"), F.row_number().over(w)).alias("island_key"),
    )
    islands = keyed.groupBy("user_id", "island_key").agg(F.count("*").alias("len"))
    return islands.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.max("len").alias("longest_streak"),
        F.sum("len").cast("long").alias("active_days"),
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_PAIRS = tuple(
    (_CORR_COLS[i], _CORR_COLS[j])
    for i in range(len(_CORR_COLS))
    for j in range(i + 1, len(_CORR_COLS))
)


def _corr_matrix_oracle() -> str:
    """One exact-decimal power-sum row, then one SELECT per pair —
    the agg_moments recipe widened to cross-moments. The DECIMAL(19,2)
    cast on the left factor forces DuckDB's int128 multiply path
    (same-width decimal products overflow int64 at runtime)."""
    short = {c: c[2:3] for c in _CORR_COLS}  # q, e, d, t
    sums = ["count(*) AS n"]
    for c in _CORR_COLS:
        s = short[c]
        sums.append(f"CAST(sum(v_{s}) AS DOUBLE) AS s_{s}")
        sums.append(
            f"CAST(sum(CAST(v_{s} AS DECIMAL(19,2)) * v_{s}) AS DOUBLE) AS s_{s}{s}"
        )
    for a, b in _CORR_PAIRS:
        sa, sb = short[a], short[b]
        sums.append(
            f"CAST(sum(CAST(v_{sa} AS DECIMAL(19,2)) * v_{sb}) AS DOUBLE) AS s_{sa}{sb}"
        )
    vals = ", ".join(
        f"CAST({c} AS DECIMAL(12,2)) AS v_{short[c]}" for c in _CORR_COLS
    )
    selects = []
    for a, b in _CORR_PAIRS:
        sa, sb = short[a], short[b]
        selects.append(
            f"""SELECT '{a}' AS col_a, '{b}' AS col_b, CAST(n AS BIGINT) AS n,
           floor((n * s_{sa}{sb} - s_{sa} * s_{sb})
                 / nullif(sqrt((n * s_{sa}{sa} - s_{sa} * s_{sa})
                               * (n * s_{sb}{sb} - s_{sb} * s_{sb})), 0)
                 * 1000000 + 0.5) / 1000000 AS corr
    FROM m"""
        )
    return (
        f"WITH m AS (SELECT {', '.join(sums)} FROM (SELECT {vals} FROM lineitem))\n    "
        + "\n    UNION ALL ".join(selects)
    )


@register("agg_corr_matrix", oracle=_corr_matrix_oracle())
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over lineitem's four
    numeric measures — the feature-redundancy audit run before any
    model training, as ONE aggregation pass: all 4 first moments,
    4 second moments, and 6 cross-moments accumulate as EXACT
    DECIMAL sums in a single map-side-combinable aggregate (the
    built-in corr() streams float co-moments whose last ulp depends
    on partition merge order — unusable under a value-hash oracle),
    then each pair's r = (n*Sab - Sa*Sb) / sqrt((n*Saa - Sa^2) *
    (n*Sbb - Sb^2)) is closed-form double arithmetic written
    token-for-token like the oracle's, nullif-guarded against a
    constant column (ANSI Spark would throw where DuckDB yields
    inf/NaN).

    Scale shape: one full-scan aggregate combining map-side to 15
    numbers per partition — the cheapest possible statistics pass at
    any SF; the 6-row output is a stack() projection of one row."""
    li = load(spark, sf_dir, "lineitem")
    short = {c: c[2:3] for c in _CORR_COLS}
    vals = [F.col(c).cast("decimal(12,2)").alias(f"v_{short[c]}") for c in _CORR_COLS]
    aggs = [F.count("*").alias("n")]
    for c in _CORR_COLS:
        s = short[c]
        aggs.append(F.sum(f"v_{s}").cast("double").alias(f"s_{s}"))
        aggs.append(
            F.sum(F.col(f"v_{s}") * F.col(f"v_{s}")).cast("double").alias(f"s_{s}{s}")
        )
    for a, b in _CORR_PAIRS:
        sa, sb = short[a], short[b]
        aggs.append(
            F.sum(F.col(f"v_{sa}") * F.col(f"v_{sb}"))
            .cast("double")
            .alias(f"s_{sa}{sb}")
        )
    # spread() the 4-column projection before the 15-accumulator
    # DECIMAL aggregate (layout.py): exact-decimal multiply/sum per row
    # is ~10x the scan cost and otherwise runs at one-reader scan
    # parallelism; map-side combine still reduces to 15 numbers per
    # partition before the exchange.
    from emdrive_spark.functions.layout import spread

    m = spread(li.select(*_CORR_COLS)).select(*vals).agg(*aggs)
    n = F.col("n")
    corrs = []
    for a, b in _CORR_PAIRS:
        sa, sb = short[a], short[b]
        num = n * F.col(f"s_{sa}{sb}") - F.col(f"s_{sa}") * F.col(f"s_{sb}")
        den = F.sqrt(
            (n * F.col(f"s_{sa}{sa}") - F.col(f"s_{sa}") * F.col(f"s_{sa}"))
            * (n * F.col(f"s_{sb}{sb}") - F.col(f"s_{sb}") * F.col(f"s_{sb}"))
        )
        r6 = F.floor(num / F.nullif(den, F.lit(0.0)) * 1000000 + F.lit(0.5)) / 1000000
        corrs.append(r6.alias(f"r_{sa}{sb}"))
    wide = m.select(n.cast("long").alias("n"), *corrs)
    stack_args = ", ".join(
        f"'{a}', '{b}', r_{short[a]}{short[b]}" for a, b in _CORR_PAIRS
    )
    return wide.select(
        F.expr(
            f"stack({len(_CORR_PAIRS)}, {stack_args}) AS (col_a, col_b, corr)"
        ),
        "n",
    ).select("col_a", "col_b", "n", "corr")
