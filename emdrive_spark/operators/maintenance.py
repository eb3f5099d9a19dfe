"""Table maintenance operations: upsert/merge, targeted delete,
small-file compaction, statistics collection.

The reference's only mutation is a leaf-page append
(/root/reference/src/executor/write.rs:40-76). A production lake needs
the day-2 operations around immutable columnar storage: merge new
versions over a keyed table (SCD-1), rewrite-without (GDPR-style
delete), compact the small files that streaming/appends accumulate, and
collect the column statistics an optimizer prunes with. All are
expressed as read → declarative transform → rewrite; Spark parallelizes
the rewrite, the pattern is Delta/Iceberg's under the hood without the
transaction log (out of scope: no such package in this environment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emdrive_spark.registry import register
from emdrive_spark.sources.tables import load, staging_dir


@register(
    "upsert_table",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_custkey % 10 = 0 THEN 'UPDATED' ELSE c_mktsegment END AS c_mktsegment,
           CASE WHEN c_custkey % 10 = 0 THEN round(c_acctbal + 1000, 2) ELSE c_acctbal END
             AS c_acctbal
    FROM customer
    UNION ALL
    SELECT c_custkey + 1000000000000 AS c_custkey, 'NEW' AS c_mktsegment, 0.0 AS c_acctbal
    FROM customer WHERE c_custkey % 100 = 0
    """,
)
def upsert_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE/upsert (SCD-1): updates for every 10th customer, inserts
    for every 100th (id-shifted). Realized as full-outer join on the
    key + coalesce-newest — one shuffle on the key, then a full
    partition-parallel rewrite. This is exactly what Delta MERGE plans
    when most files are touched; when updates are sparse, a real lake
    format adds file-level pruning on top of the same join."""
    target = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    updates = target.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("UPDATED").alias("u_seg"),
        F.round(F.col("c_acctbal") + 1000, 2).alias("u_bal"),
    )
    inserts = target.filter(F.col("c_custkey") % 100 == 0).select(
        # 1e12 shift, same rationale as cdc_changes: c_custkey reaches
        # 1.5e5*SF, so a small shift collides with real keys at scale.
        (F.col("c_custkey") + 1_000_000_000_000).alias("c_custkey"),
        F.lit("NEW").alias("u_seg"),
        F.lit(0.0).alias("u_bal"),
    )
    source = updates.unionByName(inserts)
    merged = (
        target.alias("t")
        .join(source.alias("s"), "c_custkey", "full")
        .select(
            "c_custkey",
            F.coalesce(F.col("s.u_seg"), F.col("t.c_mktsegment")).alias("c_mktsegment"),
            F.coalesce(F.col("s.u_bal"), F.col("t.c_acctbal")).alias("c_acctbal"),
        )
    )
    path = staging_dir(spark, "customer_upserted")
    merged.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@register(
    "delete_where",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
    WHERE NOT (o_orderstatus = 'F' AND o_custkey % 7 = 0)
    """,
)
def delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Targeted delete on immutable storage = rewrite-without (the
    GDPR/right-to-erasure pattern): anti-filter + overwrite. At 100 TB
    with a partitioned layout only the partitions containing matches
    rewrite (pair with sink_partitioned); everything else is untouched
    metadata."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderstatus")
    kept = o.filter(~((F.col("o_orderstatus") == "F") & (F.col("o_custkey") % 7 == 0)))
    path = staging_dir(spark, "orders_deleted")
    kept.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


@register(
    "compact_small_files",
    oracle="SELECT s_suppkey, s_name, s_acctbal FROM supplier",
)
def compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction: the table is first fragmented into one
    file per row-bucket (what streaming appends produce), then
    coalesced into a handful of right-sized files. Content must be
    byte-for-byte equivalent (the oracle checks it); the file count
    drop is asserted in tests. At 100 TB this is the nightly OPTIMIZE
    job — scan cost is dominated by file count, not bytes, once files
    shrink below a row group."""
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    frag = staging_dir(spark, "supplier_fragmented")
    compacted = staging_dir(spark, "supplier_compacted")
    # fragment: many tiny files (worst case: one per ~8 rows)
    s.repartition(64).write.mode("overwrite").parquet(frag)
    # compact: few large files
    spark.read.parquet(frag).coalesce(2).write.mode("overwrite").parquet(compacted)
    return spark.read.parquet(compacted)


@register(
    "analyze_table",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           CAST(min(o_orderkey) AS DOUBLE) AS min_val,
           CAST(max(o_orderkey) AS DOUBLE) AS max_val,
           count(DISTINCT o_orderkey) AS ndv,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS null_count
    FROM orders
    UNION ALL
    SELECT 'o_totalprice',
           CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE),
           count(DISTINCT o_totalprice),
           CAST(count(*) - count(o_totalprice) AS BIGINT)
    FROM orders
    """,
)
def analyze_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column statistics collection (ANALYZE TABLE): per-column
    min/max/NDV/null-count in ONE scan via a multi-aggregate projection
    then unpivot — not one scan per column. These are the stats CBO
    join-ordering and skew detection feed on; at 100 TB the single-pass
    shape is the difference between a stats job and a stats week."""
    o = load(spark, sf_dir, "orders")
    agg = o.agg(
        F.min("o_orderkey").cast("double").alias("k_min"),
        F.max("o_orderkey").cast("double").alias("k_max"),
        F.count_distinct(F.col("o_orderkey")).alias("k_ndv"),
        (F.count("*") - F.count("o_orderkey")).alias("k_nulls"),
        F.min("o_totalprice").cast("double").alias("p_min"),
        F.max("o_totalprice").cast("double").alias("p_max"),
        F.count_distinct(F.col("o_totalprice")).alias("p_ndv"),
        (F.count("*") - F.count("o_totalprice")).alias("p_nulls"),
    )
    return agg.selectExpr(
        """stack(2,
             'o_orderkey',  k_min, k_max, k_ndv, k_nulls,
             'o_totalprice', p_min, p_max, p_ndv, p_nulls
           ) AS (column_name, min_val, max_val, ndv, null_count)"""
    )


@register(
    "mv_incremental_refresh",
    oracle="""
    SELECT o_orderpriority, count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders GROUP BY o_orderpriority
    """,
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: a pre-existing
    aggregate (orders with key < split) merged with the DELTA batch's
    aggregate by re-aggregating partials — count-of-counts and
    sum-of-sums — instead of recomputing over the full table. The
    oracle IS the full recompute: the algebra must be lossless. At
    100 TB this is the difference between touching one day's partition
    and re-scanning years; works for any commutative-monoid aggregate
    (count/sum/min/max; avg as sum+count; distinct via sketches)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    split = 7500  # the "already materialized" boundary

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("total_dec"),
        )

    mv = partial(o.filter(F.col("o_orderkey") < split))
    delta = partial(o.filter(F.col("o_orderkey") >= split))
    return (
        mv.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(F.sum("n").alias("n"), F.sum("total_dec").cast("double").alias("total"))
    )


@register(
    "merge_scd2",
    oracle="""
    SELECT c_custkey, c_mktsegment, TIMESTAMP '2020-01-01' AS valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
    FROM customer WHERE c_custkey % 10 <> 0
    UNION ALL
    SELECT c_custkey, c_mktsegment, TIMESTAMP '2020-01-01', TIMESTAMP '2024-06-01', FALSE
    FROM customer WHERE c_custkey % 10 = 0
    UNION ALL
    SELECT c_custkey, 'UPDATED', TIMESTAMP '2024-06-01', CAST(NULL AS TIMESTAMP), TRUE
    FROM customer WHERE c_custkey % 10 = 0
    """,
)
def merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 merge: incoming changes CLOSE the current row
    (valid_to = effective date, is_current = false) and append a new
    current row, so history survives — the warehouse dimension pattern
    Delta MERGE + whenMatchedUpdate/whenNotMatchedInsert encodes. The
    change set (every 10th customer re-segmented) joins the dimension
    once on the key: unchanged rows pass through an anti-join, closed +
    new rows derive from the semi side. One key shuffle, rewrite is
    partition-parallel."""
    eff = F.lit("2024-06-01 00:00:00").cast("timestamp")
    base_from = F.lit("2020-01-01 00:00:00").cast("timestamp")
    dim = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        base_from.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = dim.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.lit("UPDATED").alias("new_segment")
    )
    unchanged = dim.join(changes, "c_custkey", "left_anti")
    closed = dim.join(changes.select("c_custkey"), "c_custkey", "left_semi").select(
        "c_custkey",
        "c_mktsegment",
        "valid_from",
        eff.alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changes.select(
        "c_custkey",
        F.col("new_segment").alias("c_mktsegment"),
        eff.alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return unchanged.unionByName(closed).unionByName(opened)


@register(
    "table_quality_audit",
    oracle="""
    SELECT * FROM (
      SELECT 'o_orderkey' AS column_name,
             CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
             CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_dup,
             CAST(min(o_orderkey) AS DOUBLE) AS min_v,
             CAST(max(o_orderkey) AS DOUBLE) AS max_v
      FROM orders
      UNION ALL
      SELECT 'o_custkey',
             CAST(count(*) - count(o_custkey) AS BIGINT),
             CAST(count(DISTINCT o_custkey) AS BIGINT),
             CAST(count(*) - count(DISTINCT o_custkey) AS BIGINT),
             CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'o_totalprice',
             CAST(count(*) - count(o_totalprice) AS BIGINT),
             CAST(count(DISTINCT o_totalprice) AS BIGINT),
             CAST(count(*) - count(DISTINCT o_totalprice) AS BIGINT),
             CAST(min(o_totalprice) AS DOUBLE), CAST(max(o_totalprice) AS DOUBLE)
      FROM orders
    )
    """,
)
def table_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expectations-style data-quality audit: per audited column, null
    count, distinct count, duplicate count (the PK-uniqueness check
    when run on the key), and value range — the contract a pipeline
    asserts before publishing a table. All columns audit in ONE scan:
    each metric is a map-side partial aggregate, and the per-column
    rows are unpivoted from a single aggregate row, so at 100 TB the
    audit costs one pass regardless of how many columns it covers
    (count_distinct adds one shuffle per audited column — swap in
    approx_count_distinct to keep the audit single-pass at the
    billion-row grain)."""
    o = load(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_totalprice"]
    aggs = []
    for c in cols:
        aggs += [
            (F.count("*") - F.count(c)).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            (F.count("*") - F.count_distinct(F.col(c))).alias(f"{c}__dup"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    one = o.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__null, {c}__distinct, {c}__dup, {c}__min, {c}__max" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column_name, n_null, n_distinct, n_dup, min_v, max_v)"
    ).select(
        "column_name",
        F.col("n_null").cast("long").alias("n_null"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        F.col("n_dup").cast("long").alias("n_dup"),
        "min_v",
        "max_v",
    )


_VACUUM_KEEP = 2  # retention: keep the newest N versions


@register(
    "table_vacuum",
    oracle="""
    SELECT CAST(2 AS INT) AS version, count(*) AS n_rows
    FROM orders WHERE o_orderkey % 3 = 1
    UNION ALL
    SELECT CAST(3 AS INT) AS version, count(*) AS n_rows
    FROM orders WHERE o_orderkey % 3 = 2
    """,
)
def table_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention vacuum for the versioned-snapshot layout
    (sink_versioned_timetravel's day-2 complement, Delta VACUUM's
    directory-level skeleton): three immutable version directories are
    committed, retention keeps the newest 2, and the expired v=1 tree
    is deleted. The op returns (version, n_rows) for every SURVIVING
    version read back from disk, so the oracle pins both retention
    (v=1 absent from the result) and content (per-version counts match
    the source filters exactly); the on-disk deletion itself is pinned
    in tests.

    Scale shape: vacuum is a METADATA-SIZED operation — expiry is a
    directory listing + unlink of whole version trees (at 100 TB an
    object-store prefix delete), never a row-level rewrite, because
    writers never mutate a published version. The read-back counts are
    one combinable aggregate per surviving version."""
    import os as _os
    import shutil

    base = staging_dir(spark, "orders_vacuum")
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    versions = (1, 2, 3)
    for v in versions:
        o.filter(F.col("o_orderkey") % 3 == v - 1).write.mode("overwrite").parquet(
            _os.path.join(base, f"v={v}")
        )
    expired = versions[: len(versions) - _VACUUM_KEEP]
    for v in expired:
        shutil.rmtree(_os.path.join(base, f"v={v}"))
    surviving = sorted(
        int(d.split("=", 1)[1]) for d in _os.listdir(base) if d.startswith("v=")
    )
    out = None
    for v in surviving:
        part = (
            spark.read.parquet(_os.path.join(base, f"v={v}"))
            .agg(F.count("*").alias("n_rows"))
            .select(F.lit(v).cast("int").alias("version"), "n_rows")
        )
        out = part if out is None else out.unionByName(part)
    return out
