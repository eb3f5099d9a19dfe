"""DDL/DML + generator operators registered for the driver gate
(SURVEY §2.1 create_table/insert_rows, §2.8 gen_ulid/gen_now).

These run the real Engine (parse → validate → catalog → Spark) and
surface deterministic projections of the result so the DuckDB oracle
can check them; generator outputs are nondeterministic by nature →
rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emdrive_spark.engine import Engine
from emdrive_spark.functions.generators import ulid_expr
from emdrive_spark.registry import register

_CREATE = """
CREATE TABLE photos_seen (
    hash UINT8 METRIC KEY USING mtree(hamming),
    url STRING(2048) PRIMARY KEY,
    width UINT32,
    height UINT32,
    seen_at TIMESTAMP DEFAULT NOW()
)
"""

_INSERT = """
INSERT INTO photos_seen (hash, url, width, height)
VALUES (0b11001111, 'https://twixes.com/a.png', 1280, 820),
       (0b00001011, 'https://twixes.com/b.png', 640, 480),
       (0b11111111, 'https://twixes.com/c.png', 1, 1)
"""


@register(
    "create_table",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(0 AS BIGINT), 'hash',    'UINT8',        false, false, true,  'hamming'),
      (CAST(1 AS BIGINT), 'url',     'STRING(2048)', true,  false, false, CAST(NULL AS VARCHAR)),
      (CAST(2 AS BIGINT), 'width',   'UINT32',       false, false, false, CAST(NULL AS VARCHAR)),
      (CAST(3 AS BIGINT), 'height',  'UINT32',       false, false, false, CAST(NULL AS VARCHAR)),
      (CAST(4 AS BIGINT), 'seen_at', 'TIMESTAMP',    false, false, false, CAST(NULL AS VARCHAR))
    ) AS t(ordinal, column_name, data_type, primary_key, is_nullable, metric_key, metric)
    """,
)
def create_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE TABLE end-to-end (reference: parse create_table.rs:8-105,
    validate components.rs:133-172, file creation write.rs:12-38):
    the catalog's column metadata is the observable result."""
    eng = Engine(spark)
    eng.execute(_CREATE)
    return (
        eng.catalog.system_columns()
        .filter(F.col("table_name") == "photos_seen")
        .select(
            F.col("ordinal").cast("long").alias("ordinal"),
            "column_name",
            "data_type",
            "primary_key",
            "is_nullable",
            "metric_key",
            "metric",
        )
    )


@register(
    "insert_rows",
    oracle="""
    SELECT * FROM (VALUES
      (CAST(207 AS SMALLINT), 'https://twixes.com/a.png', CAST(1280 AS BIGINT), CAST(820 AS BIGINT)),
      (CAST(11 AS SMALLINT),  'https://twixes.com/b.png', CAST(640 AS BIGINT),  CAST(480 AS BIGINT)),
      (CAST(255 AS SMALLINT), 'https://twixes.com/c.png', CAST(1 AS BIGINT),    CAST(1 AS BIGINT))
    ) AS t(hash, url, width, height)
    """,
)
def insert_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT ... VALUES end-to-end with DEFAULT injection (seen_at ←
    NOW(), excluded from the compared projection because it is
    generated): reference parse insert.rs:6-35, append write.rs:40-76."""
    eng = Engine(spark)
    eng.execute(_CREATE)
    eng.execute(_INSERT)
    out = eng.execute("SELECT * FROM photos_seen")
    # seen_at was DEFAULT-generated; assert it exists, compare the rest.
    assert "seen_at" in out.columns
    return out.select("hash", "url", "width", "height")


@register("gen_ulid", oracle=None)  # random entropy → rows-only
def gen_ulid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed ULID() generation (functions.rs:16-21): 1000 ids,
    validated for shape/uniqueness in tests."""
    return spark.range(1000).select("id", ulid_expr().alias("ulid"))


@register("gen_now", oracle=None)  # wall clock → rows-only
def gen_now(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOW() (functions.rs:19)."""
    return spark.range(1).select(F.current_timestamp().alias("now"))


@register(
    "system_catalog_introspect",
    oracle="""
    SELECT * FROM (VALUES
      ('main', 'photos_seen', CAST(0 AS INT), 'hash',    'UINT8',        false, false),
      ('main', 'photos_seen', CAST(1 AS INT), 'url',     'STRING(2048)', true,  false),
      ('main', 'photos_seen', CAST(2 AS INT), 'width',   'UINT32',       false, false),
      ('main', 'photos_seen', CAST(3 AS INT), 'height',  'UINT32',       false, false),
      ('main', 'photos_seen', CAST(4 AS INT), 'seen_at', 'TIMESTAMP',    false, false),
      ('main', 'tags',        CAST(0 AS INT), 'name',    'STRING(64)',   true,  false),
      ('main', 'tags',        CAST(1 AS INT), 'weight',  'NULLABLE(UINT32)', false, true)
    ) AS t(schema_name, table_name, ordinal, column_name, data_type,
           primary_key, is_nullable)
    """,
)
def system_catalog_introspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The system catalog AS A QUERYABLE SURFACE: after two CREATEs, a
    plain Spark SQL join over the ``system_tables`` / ``system_columns``
    temp views must reproduce the full column inventory — the same
    introspection contract the reference bootstraps as real tables an
    SQL client reads (/root/reference/src/storage/system.rs:5-91,
    /root/reference/src/executor/mod.rs:64-71). The oracle pins the
    exact expected rows, so this driver row certifies that catalog
    mutations propagate to the SQL-visible views (refresh-on-DDL)."""
    eng = Engine(spark)
    eng.execute(_CREATE)
    eng.execute(
        "CREATE TABLE tags (name STRING(64) PRIMARY KEY, weight NULLABLE(UINT32))"
    )
    return spark.sql(
        """
        SELECT t.schema_name, c.table_name, c.ordinal, c.column_name,
               c.data_type, c.primary_key, c.is_nullable
        FROM system_columns c JOIN system_tables t ON c.table_name = t.table_name
        """
    )


@register(
    "pivot_sum",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_O,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (columns from values) — groupBy().pivot() with an explicit
    value list so the plan is a single pass (no value-discovery job)."""
    from emdrive_spark.sources.tables import load

    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum("l_quantity"), 2))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@register(
    "sql_select_at_distance",
    oracle="""
    SELECT * FROM (VALUES
      ('https://twixes.com/b.png', CAST(0 AS INT)),
      ('https://twixes.com/a.png', CAST(3 AS INT)),
      ('https://twixes.com/c.png', CAST(5 AS INT))
    ) AS t(url, distance)
    """,
)
def sql_select_at_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference README's flagship query VERBATIM through the SQL
    dialect layer (README.md:67-78): `hash @ 0b00001011` rewrites to
    the hamming metric, the `distance` alias is referable in WHERE
    (alias-in-predicate, which stock Spark SQL rejects), and ORDER
    BY/threshold behave as declared. The oracle states the expected
    popcounts of the three inserted rows — so this driver row checks
    parser, rewriter, catalog, metric function, and executor
    end-to-end."""
    eng = Engine(spark)
    eng.execute(_CREATE)
    eng.execute(_INSERT)
    out = eng.execute(
        """
        SELECT url, hash @ 0b00001011 AS distance
        FROM photos_seen
        WHERE distance < 200
        ORDER BY distance
        """
    )
    return out.select("url", F.col("distance").cast("int").alias("distance"))
