"""Round-7 fixes, pinned as regressions (VERDICT.md r6 + ADVICE.md):
graph_hits per-round checkpointing, the engine-level checkpoint-block
release, the graph_related_topk structural single-execution ckpt, and
the three r6 ADVICE items (attribution tiebreak, PMI broadcast gate,
entity-blocking format guard)."""

from __future__ import annotations

import pytest

from emdrive_spark import registry
from emdrive_spark.functions.ckpt import ckpt, release

SF_SMOKE = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture
def reliable_ckpt(spark, tmp_path):
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    spark.conf.set("spark.graft.checkpointDir", str(tmp_path / "ckpt"))
    yield spark
    spark.conf.set("spark.graft.reliableCheckpoint", "false")


# ----------------------------------------------------- graph_hits ckpt


def test_reliable_checkpoint_hits_matches_default(spark, reliable_ckpt):
    """VERDICT r6 item 2: graph_hits now checkpoints each round's raw
    score frame before its scalar collect; the reliable-checkpoint
    flag must keep routing those sites and produce byte-identical
    results either way."""
    fn = registry.queries()["graph_hits"]
    spark.conf.set("spark.graft.reliableCheckpoint", "false")
    base = _rows(fn(spark, SF_SMOKE))
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    flagged = _rows(fn(spark, SF_SMOKE))
    assert flagged == base
    assert len(base) > 0


def test_related_topk_matches_unckpted_composition(spark):
    """VERDICT r6 item 4: the ckpt on graph_related_topk's edge frame
    is a plan-shape change only — results must equal the plain
    composition of edge_jaccard + union + rank window."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from emdrive_spark.operators import analytics

    got = _rows(registry.queries()["graph_related_topk"](spark, SF_SMOKE))
    ej = analytics.graph_edge_jaccard(spark, SF_SMOKE)
    both = ej.select(
        F.col("u").alias("part_id"), F.col("v").alias("neighbor"), "common", "jscore"
    ).unionByName(
        ej.select(
            F.col("v").alias("part_id"), F.col("u").alias("neighbor"), "common", "jscore"
        )
    )
    w = W.partitionBy("part_id").orderBy(
        F.col("jscore").desc(), F.col("common").desc(), F.col("neighbor").asc()
    )
    want = _rows(
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= analytics._RELATED_K)
        .select("part_id", "neighbor", "common", "jscore")
    )
    assert got == want
    assert len(got) > 0


# -------------------------------------------------------- release()


def test_release_drops_checkpoint_blocks_and_session_stays_usable(spark):
    """VERDICT r6 item 3: release() must empty the persistent-RDD map
    (the co-residence pressure source) and leave the session fully
    usable for the NEXT query — including ops that checkpoint again."""
    fn = registry.queries()["graph_pagerank"]
    fn(spark, SF_SMOKE).collect()
    held = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert held > 0  # the op really does pin blocks
    n = release(spark)
    assert n == held
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
    # a fresh run of the same checkpoint-heavy op still works
    assert len(fn(spark, SF_SMOKE).collect()) > 0


def test_release_counts_manual_ckpt_frame(spark):
    df = ckpt(spark.range(100).selectExpr("id", "id * 2 AS v"))
    assert df.count() == 100
    assert release(spark) >= 1
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == 0
