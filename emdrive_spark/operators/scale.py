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
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emdrive_spark.registry import register
from emdrive_spark.sources.tables import load

_TMP = os.path.join(tempfile.gettempdir(), "emdrive_scale")


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
    path = os.path.join(_TMP, "orders_by_year")
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
