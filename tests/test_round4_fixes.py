"""Round-4 advisor fixes, pinned as regressions (ADVICE.md r3):
per-session staging isolation, scale-safe synthetic insert keys, and
rank-stable keyword rounding."""

from __future__ import annotations

from pyspark.sql import functions as F

from emdrive_spark import registry
from emdrive_spark.sources.tables import load, staging_dir

from .conftest import SF_SMOKE

registry.load_all()


def test_staging_dir_is_per_session(spark):
    """Two concurrent gate/bench invocations must not share staged
    paths: the path is keyed on the Spark applicationId, unique per
    SparkSession (advisor r3: fixed /tmp path caused cross-run
    clobbering)."""
    p = staging_dir(spark, "x")
    assert spark.sparkContext.applicationId in p
    assert staging_dir(spark, "a", "b").endswith("/a/b")


def test_cdc_insert_keys_clear_scale(spark):
    """Synthetic 'insert' keys are shifted by 1e12 — above the max
    o_orderkey TPC-H generates through SF~100k (~100 TB), so inserts
    can never collide with real keys and be misclassified as updates
    (advisor r3: the old 1e8 shift collided from SF~17)."""
    out = registry.REGISTRY["cdc_changes"].fn(spark, SF_SMOKE)
    ins = out.filter(F.col("change_type") == "insert")
    min_ins = ins.agg(F.min("o_orderkey")).first()[0]
    assert min_ins is not None and min_ins >= 1_000_000_000_000
    # and every insert row carries no old-side value (true insert shape)
    assert ins.filter(F.col("old_price").isNotNull()).count() == 0


def test_keyword_extract_rank_exact_top3(spark):
    """The rank<=3 cut must yield exactly 3 keywords per doc (ties are
    broken lexicographically, scores rounded with the portable
    floor(x*1e6+0.5) pattern so the SET cannot differ across engines)."""
    out = registry.REGISTRY["text_keyword_extract"].fn(spark, SF_SMOKE)
    per_doc = out.groupBy("doc_id").count()
    n_docs = load(spark, SF_SMOKE, "documents").count()
    assert per_doc.count() == n_docs
    assert per_doc.filter(F.col("count") != 3).count() == 0
