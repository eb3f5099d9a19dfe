"""UDF / UDAF / UDTF extension surface (SURVEY §2.10).

The reference's entire extensibility story is a fixed two-function enum
(/root/reference/src/constructs/functions.rs:10-13); the README frames
metrics as pluggable per index (/root/reference/README.md:28-32). Our
engine's extension points are Spark's three pandas-UDF shapes, each
demonstrated here WITH a value-checked oracle — the custom code must
reproduce the declarative answer exactly:

- scalar pandas_udf: vectorized per-row compute, Arrow batches in/out;
- grouped-agg pandas_udf: a custom aggregate over each group's column
  as one pandas Series;
- applyInPandas (grouped map): arbitrary per-group pandas logic with a
  declared output schema.

Scale: all three cross the JVM↔Python boundary in Arrow columnar
batches (spark.sql.execution.arrow.*), ~10-100× row-at-a-time Python
UDFs. They remain the SLOW path versus built-in expressions — the
docstrings in operators/ keep hot paths JVM-side; this module pins the
escape hatch for semantics Spark genuinely lacks.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from emdrive_spark.registry import register
from emdrive_spark.sources.tables import load


@register(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS net_price
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf: the net-price formula evaluated on whole Arrow
    batches as numpy vector math. (Production code would use the
    built-in column expression — see tpch_q1; the point is the
    extension point produces bit-identical results.)"""

    @F.pandas_udf(DoubleType())
    def net_price(price: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
        return price * (1 - disc) * (1 + tax)

    # Round JVM-side at the product's EXACT decimal width: inputs have
    # 2 decimals each, so the true product has <= 6 — round(x, 6) is
    # boundary-free and recovers the exact decimal in both engines,
    # whereas round(x, 2) sits on half-cent boundaries where HALF_UP
    # impls (BigDecimal vs scaled-double) disagree, and numpy's .round
    # is half-to-even besides.
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.round(net_price("l_extendedprice", "l_discount", "l_tax"), 6).alias("net_price"),
    )


@register(
    "udf_grouped_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS weighted_avg_price
    FROM lineitem GROUP BY l_returnflag
    """,
)
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas_udf: quantity-weighted mean price per
    return flag, computed from each group's columns as pandas Series.
    The ratio-of-sums form keeps float error correlated between
    numerator and denominator, so it agrees with the SQL oracle at 4
    decimals despite different summation orders."""

    @F.pandas_udf(DoubleType())
    def weighted_avg(price: pd.Series, qty: pd.Series) -> float:
        return float((price * qty).sum() / qty.sum())

    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(weighted_avg("l_extendedprice", "l_quantity"), 4).alias("weighted_avg_price"))
    )


@register(
    "udf_grouped_map",
    oracle="""
    SELECT o_orderkey,
           round((o_totalprice - avg(o_totalprice) OVER (PARTITION BY o_orderpriority))
                 / stddev_pop(o_totalprice) OVER (PARTITION BY o_orderpriority), 4) AS z
    FROM orders
    """,
)
def udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas (grouped map): per-priority z-score normalization —
    each group arrives as one pandas DataFrame, output schema declared
    up front. The declarative twin is a window aggregate (the oracle);
    the grouped-map form is the escape hatch for group logic with no
    SQL equivalent (model scoring, per-group fits)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["o_totalprice"]
        std = v.std(ddof=0)
        return pd.DataFrame({"o_orderkey": pdf["o_orderkey"], "z": (v - v.mean()) / std})

    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .groupBy("o_orderpriority")
        .applyInPandas(zscore, "o_orderkey long, z double")
        # half-up rounding JVM-side (numpy rounds half-to-even)
        .select("o_orderkey", F.round("z", 4).alias("z"))
    )


@register(
    "udf_map_in_pandas",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_m
    FROM documents
    """,
)
def udf_map_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas: an iterator-of-Arrow-batches transform — the shape
    for streaming per-partition Python work that neither groups nor
    aggregates (tokenizer inference, decode pipelines; multimodal ops
    build on this). Each batch is processed and yielded without
    materializing the partition."""

    def batch_stats(batches):
        for pdf in batches:
            s = pdf["text"].str.strip()
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_tokens": s.str.split().map(len).astype("int64"),
                    "n_chars_m": pdf["text"].str.len().astype("int64"),
                }
            )

    return (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .mapInPandas(batch_stats, "doc_id long, n_tokens long, n_chars_m long")
    )


@register(
    "udf_table_function",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, string_split(o_orderpriority, '-') AS parts FROM orders
    ),
    e AS (
      SELECT o_orderkey,
             unnest(list_transform(range(1, len(parts) + 1),
                                   i -> {'pos': i - 1, 'part': parts[i]})) AS u
      FROM t
    )
    SELECT o_orderkey, CAST(u.pos AS INT) AS pos, u.part AS part FROM e
    """,
)
def udf_table_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+): a table function yielding multiple
    rows per input — registered in the session catalog and applied via
    LATERAL, the §2.10 extension shape for one-to-many Python logic
    (parsers, span extractors). The declarative twin is posexplode
    (see explode_pos); the UDTF form is for generators SQL can't
    express."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, part string")
    class SplitParts:
        def eval(self, s: str):
            for i, p in enumerate((s or "").split("-")):
                yield i, p

    spark.udtf.register("split_parts", SplitParts)
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_udtf")
    return spark.sql(
        """
        SELECT o_orderkey, t.pos, t.part
        FROM orders_udtf, LATERAL split_parts(o_orderpriority) t
        """
    )
