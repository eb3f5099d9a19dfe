"""Scale-pattern operators: the physical-layout techniques that make the
100 TB story real, expressed as verifiable queries.

The reference's only layout tools are an 8 KiB page file and a B+ tree
(/root/reference/src/storage/paging.rs:8,39-62). At Spark scale the
equivalents are partitioned Parquet (partition pruning ≈ its page/index
skips), bucketed tables (co-located joins ≈ its clustered PK reads), and
key salting (its single-writer design never meets skew; a 1000-executor
shuffle does). Each op returns a plain relational result so the DuckDB
oracle checks the *semantics* while tests/test_plans.py pins the
*physical* property (pruned scan, no Exchange, balanced tasks).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emdrive_spark.registry import register
from emdrive_spark.sources.tables import load, staging_dir


@register(
    "sink_partitioned",
    oracle="""
    SELECT o_orderkey, o_totalprice, CAST(1997 AS INT) AS o_year
    FROM orders WHERE year(o_orderdate) = 1997
    """,
)
def sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned Parquet sink + pruned read-back: write orders
    partitioned by year, read with a partition filter. The filter
    resolves at *planning* time from directory names — a 100 TB table
    with 25 year partitions scans 4% of its files for one year. This is
    the engine's analog of the reference's B+tree range skip."""
    path = staging_dir(spark, "orders_by_year")
    o = load(spark, sf_dir, "orders").withColumn("o_year", F.year("o_orderdate"))
    o.select("o_orderkey", "o_totalprice", "o_year").write.mode("overwrite").partitionBy(
        "o_year"
    ).parquet(path)
    return (
        spark.read.parquet(path)
        .filter(F.col("o_year") == 1997)
        .select("o_orderkey", "o_totalprice", F.col("o_year").cast("int").alias("o_year"))
    )


@register(
    "sink_bucketed_join",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM customer JOIN orders ON c_custkey = o_custkey
    """,
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed managed tables joined WITHOUT a shuffle: both sides are
    written bucketBy(8, custkey) + sortBy, so the sort-merge join reads
    co-located, pre-sorted buckets — zero Exchange on either side (see
    tests/test_plans.py). At 100 TB this converts every repeated join on
    the distribution key from a full network shuffle into a local merge."""
    import shutil

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for tbl in ("emdrive_b_customer", "emdrive_b_orders"):
        # The in-memory catalog is per-session but the warehouse dir is
        # not: drop both the entry and any orphaned location.
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join(warehouse, tbl), ignore_errors=True)
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").format("parquet").saveAsTable(
        "emdrive_b_customer"
    )
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").format("parquet").saveAsTable(
        "emdrive_b_orders"
    )
    bc = spark.table("emdrive_b_customer")
    bo = spark.table("emdrive_b_orders")
    return bc.join(bo, bc.c_custkey == bo.o_custkey).select(
        "c_custkey", "c_name", "o_orderkey"
    )


@register(
    "join_skew_salted",
    oracle="""
    SELECT o_orderkey, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi join: fact rows get a deterministic salt in [0, 8);
    the dimension side is replicated once per salt value; the join key
    becomes (custkey, salt). A hot key's rows now land on 8 reducers
    instead of one — the classic pre-AQE skew cure, still required when
    skew is *persistent* (AQE splits reactively per query; salting fixes
    the layout). Result is provably identical to the unsalted join."""
    n_salt = 8
    o = load(spark, sf_dir, "orders").withColumn(
        "salt", (F.col("o_orderkey") % n_salt).cast("int")
    )
    c = (
        load(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment")
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    )
    return o.join(c, (o.o_custkey == c.c_custkey) & (o.salt == c.salt)).select(
        "o_orderkey", "c_mktsegment"
    )


@register(
    "sample_hash",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2) < '1a'
    """,
)
def sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sampling by key-hash prefix — the reproducible
    alternative to sample(): every engine, every run, every partitioning
    selects the SAME rows (md5 is engine-portable; '1a'/256 ≈ 10.2%).
    This is how a 100 TB pipeline takes a consistent dev slice, and how
    correlated tables stay aligned (sample both on the same join key)."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 2) < "1a"
    ).select("o_orderkey", "o_totalprice")


# Z-order bit interleave: 16 bits from each of two keys -> one 32-bit
# locality value. The SAME Python loop emits both the Spark Column tree
# and the DuckDB SQL text so the two formulas cannot drift.
_Z_BITS = 16


def _zval_column(x, y):
    terms = []
    for i in range(_Z_BITS):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z


def _zval_sql(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "zorder_cluster",
    oracle=f"""
    WITH k AS (
      SELECT o_orderkey,
             o_custkey % 65536 AS xk,
             CAST(floor(o_totalprice) AS BIGINT) % 65536 AS yk
      FROM orders
    )
    SELECT o_orderkey, CAST({_zval_sql("xk", "yk")} AS BIGINT) AS zval
    FROM k
    """,
)
def zorder_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering value over two dimensions: interleave
    the low 16 bits of (custkey, price) so rows close in BOTH keys get
    close z-values. The physical move at 100 TB is
    ``repartitionByRange(zval).sortWithinPartitions(zval)`` before the
    Parquet write (applied here): every file then covers a small
    rectangle of (custkey, price) space and min/max footer stats let a
    predicate on EITHER column skip most files — the multi-dimensional
    generalization of sink_partitioned's one-key pruning, and the
    engine-side analog of the reference's single-key B+tree clustering
    (/root/reference/src/storage/paging.rs:39-62, which cannot index a
    second dimension at all). Pure codegen arithmetic; the one range
    shuffle IS the clustering being bought."""
    o = load(spark, sf_dir, "orders")
    xk = (F.col("o_custkey") % 65536).cast("long")
    # floor() explicitly: DuckDB's double->BIGINT cast rounds to nearest
    # while Spark's truncates — floor is the portable bucketing.
    yk = (F.floor("o_totalprice") % 65536).cast("long")
    z = o.select("o_orderkey", _zval_column(xk, yk).cast("long").alias("zval"))
    return z.repartitionByRange(16, "zval").sortWithinPartitions("zval")


@register(
    "cdc_changes",
    oracle="""
    WITH snap_old AS (
      SELECT o_orderkey AS k, o_totalprice AS p FROM orders
    ),
    snap_new AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS p
      FROM orders WHERE o_orderkey % 23 != 0
      UNION ALL
      SELECT o_orderkey + 1000000000000 AS k, o_totalprice / 2 AS p
      FROM orders WHERE o_orderkey % 31 = 0
    )
    SELECT COALESCE(snap_old.k, snap_new.k) AS o_orderkey,
           CASE WHEN snap_old.k IS NULL THEN 'insert'
                WHEN snap_new.k IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           snap_old.p AS old_price, snap_new.p AS new_price
    FROM snap_old FULL OUTER JOIN snap_new ON snap_old.k = snap_new.k
    WHERE snap_old.k IS NULL OR snap_new.k IS NULL OR snap_old.p != snap_new.p
    """,
)
def cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff change capture: classify every key as
    insert / update / delete by full-outer-joining two table versions on
    the primary key (the new snapshot is derived deterministically from
    orders: ~4% of keys deleted, ~6% price-updated, ~3% inserted under
    shifted keys). This is the batch CDC primitive that feeds
    merge_scd2 and upsert_table; at 100 TB it is one sort-merge join on
    the PK with unchanged rows dropped before any downstream shuffle.
    All price math is IEEE double (*, /) — bit-identical in any engine,
    so the diff itself is engine-portable. No UDFs, no collect."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    updated = o.filter(F.col("k") % 23 != 0).select(
        "k",
        F.when(F.col("k") % 17 == 0, F.col("p") * 1.1).otherwise(F.col("p")).alias("p"),
    )
    # Shift by 1e12, not 1e8: TPC-H o_orderkey reaches 6e6*SF, so a 1e8
    # shift collides with real keys around SF~17 and misclassifies the
    # synthetic inserts as updates. 1e12 clears SF 100k (~100 TB).
    inserted = o.filter(F.col("k") % 31 == 0).select(
        (F.col("k") + 1_000_000_000_000).alias("k"), (F.col("p") / 2).alias("p")
    )
    new = updated.unionAll(inserted)
    old = o
    j = old.alias("o").join(new.alias("n"), F.col("o.k") == F.col("n.k"), "full_outer")
    change = (
        F.when(F.col("o.k").isNull(), "insert")
        .when(F.col("n.k").isNull(), "delete")
        .otherwise("update")
    )
    return j.filter(
        F.col("o.k").isNull() | F.col("n.k").isNull() | (F.col("o.p") != F.col("n.p"))
    ).select(
        F.coalesce(F.col("o.k"), F.col("n.k")).alias("o_orderkey"),
        change.alias("change_type"),
        F.col("o.p").alias("old_price"),
        F.col("n.p").alias("new_price"),
    )


@register(
    "sink_manifest",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
           CAST(min(o_totalprice) AS DOUBLE) AS min_price,
           CAST(max(o_totalprice) AS DOUBLE) AS max_price
    FROM orders GROUP BY 1
    """,
)
def sink_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse manifest: write orders partitioned by year, then build
    the per-partition stats manifest (row count, key and price min/max)
    BY READING THE SINK BACK — the bookkeeping a Delta/Iceberg
    transaction log keeps per file, here per partition. A query planner
    consults the manifest instead of the data: a predicate outside a
    partition's [min, max] skips it without opening a file (the same
    contract parquet footer stats give within a file). The manifest
    aggregation shuffles six scalars per partition — nothing else; the
    oracle states the invariant that the manifest must equal the source
    table's own statistics (a lost row or partition would break it)."""
    path = staging_dir(spark, "orders_manifest")
    o = load(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    o.select("o_orderkey", "o_totalprice", "o_year").write.mode("overwrite").partitionBy(
        "o_year"
    ).parquet(path)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("o_year").cast("int").alias("o_year"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.min("o_totalprice").cast("double").alias("min_price"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


@register(
    "sink_versioned_timetravel",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 100 < 50
    """,
)
def sink_versioned_timetravel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot versioning + time travel on plain Parquet: each commit
    writes a full new version directory (v=1, then v=2 with different
    rows) and readers pin a version — reading v1 AFTER v2 landed must
    return exactly the v1 rows, which is the oracle's check. This is
    the directory-level skeleton of Delta/Iceberg time travel (their
    logs record file sets per snapshot; here the version IS the
    directory). Writers never mutate a published version, so reads
    need no locks at any scale."""
    base = staging_dir(spark, "orders_versions")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    v1 = o.filter(F.col("o_orderkey") % 100 < 50)
    v2 = o.filter(F.col("o_orderkey") % 100 >= 50)
    v1.write.mode("overwrite").parquet(os.path.join(base, "v=1"))
    v2.write.mode("overwrite").parquet(os.path.join(base, "v=2"))
    return spark.read.parquet(os.path.join(base, "v=1"))


@register(
    "source_federated_join",
    oracle="""
    SELECT n_name, count(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def source_federated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated multi-format join: the fact side stays Parquet while
    the dimension is staged to (and read back from) JSON — one logical
    plan over heterogeneous sources, the everyday lakehouse reality of
    curated Parquet joined against exported/reference files. Catalyst
    treats both scans uniformly (pushdown works per-format), the tiny
    JSON dim broadcasts, and the answer must equal the single-format
    join exactly."""
    path = staging_dir(spark, "nation_json")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    nation.write.mode("overwrite").json(path)
    njson = spark.read.json(path).select(
        F.col("n_nationkey").cast("long").alias("n_nationkey"), "n_name"
    )
    c = load(spark, sf_dir, "customer").select("c_nationkey")
    return (
        c.join(F.broadcast(njson), c.c_nationkey == njson.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
    )


_BLOOM_BITS = 4096  # 64 words x 64 bits — constant size at any corpus
_BLOOM_WORDS = _BLOOM_BITS // 64


@register(
    "join_bloom_prefilter",
    oracle="""
    SELECT s.s_suppkey AS supp_key, s.s_name AS supp_name,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE n.n_nationkey % 3 = 0
    GROUP BY s.s_suppkey, s.s_name
    """,
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join reduction: revenue per supplier in every
    third nation,
    with the fact side pre-filtered through a 4096-bit Bloom bitmap
    built from the dimension's key set BEFORE the join — the manual
    twin of Spark's runtime row-level bloom filters
    (spark.sql.optimizer.runtime.bloomFilter.*), expressed as an
    operator so the mechanism is visible and testable. The final join
    drops the bitmap's false positives, so the RESULT is exact and the
    full value-hash oracle is the plain 3-table join.

    Scale shape: the bitmap is built with one map-side-combinable
    bit_or aggregate over the dim keys and collected to the driver as
    AT MOST 64 longs — constant size no matter how many keys flow in
    (hash collisions cost false positives, never correctness). It
    re-enters the plan as an array literal, so the membership test is
    a pure codegen projection on the fact scan: at 100 TB this is what
    cuts the fact side's shuffle input when the dim is too big to
    broadcast but its key set fits a filter — rows that cannot join
    never reach the exchange. Here the surviving dim is also small
    enough to broadcast, which the plan does; the bloom step is the
    part that generalizes when it is not."""
    nation = load(spark, sf_dir, "nation").filter(F.col("n_nationkey") % 3 == 0)
    supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    words = (
        supp.select(
            F.expr(f"pmod(xxhash64(s_suppkey), {_BLOOM_BITS})").alias("bit")
        )
        .select(
            F.expr("CAST(bit DIV 64 AS INT)").alias("w"),
            F.expr("shiftleft(1L, CAST(bit % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("mask"))
        .collect()  # <= 64 rows by construction, independent of |dim|
    )
    masks = {r["w"]: r["mask"] for r in words}
    bitmap = F.array(*[F.lit(masks.get(w, 0)).cast("long") for w in range(_BLOOM_WORDS)])
    fact = (
        load(spark, sf_dir, "lineitem")
        .select("l_suppkey", "l_extendedprice", "l_discount")
        .withColumn("_bit", F.expr(f"pmod(xxhash64(l_suppkey), {_BLOOM_BITS})"))
        .filter(
            F.element_at(bitmap, F.expr("CAST(_bit DIV 64 AS INT)") + 1).bitwiseAND(
                F.expr("shiftleft(1L, CAST(_bit % 64 AS INT))")
            )
            != 0
        )
        .drop("_bit")
    )
    from emdrive_spark.functions.money import disc_price

    return (
        fact.join(F.broadcast(supp), fact["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_suppkey", "s_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select(
            F.col("s_suppkey").alias("supp_key"),
            F.col("s_name").alias("supp_name"),
            "revenue",
        )
    )
