"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship metric-search query (the reference
README's photos_seen shape, /root/reference/README.md:58-78) at
sf0.001. ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 via emdrive_spark.registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from emdrive_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distance-threshold metric search (hash @ q < 4)."""
    registry.load_all()
    return registry.REGISTRY["distance_threshold"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
