"""Known-answer tests for the distance library (mirrors the reference's
README contract, /root/reference/README.md:58-78)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from emdrive_spark.functions import distance as D


def test_hamming_readme_known_answer(spark):
    # README: hash=0b11001111, query=0b00001011 -> distance 3
    df = spark.range(1).select(D.hamming(F.lit(0b11001111), 0b00001011).alias("d"))
    assert df.head()["d"] == 3


def test_hamming_zero(spark):
    df = spark.range(1).select(D.hamming(F.lit(42), 42).alias("d"))
    assert df.head()["d"] == 0


def test_vector_metrics_match_python(spark):
    a = [1.0, 2.0, 3.0]
    b = [-2.0, 0.5, 4.0]
    ca = F.array(*[F.lit(x) for x in a])
    cb = F.array(*[F.lit(x) for x in b])
    row = spark.range(1).select(
        D.dot(ca, cb).alias("dot"),
        D.l2(ca, cb).alias("l2"),
        D.cosine_similarity(ca, cb).alias("cos"),
    ).head()
    exp_dot = sum(x * y for x, y in zip(a, b))
    exp_l2 = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    assert abs(row["dot"] - exp_dot) < 1e-12
    assert abs(row["l2"] - exp_l2) < 1e-12
    assert abs(row["cos"] - exp_dot / (na * nb)) < 1e-12


def test_cosine_zero_vector_is_null(spark):
    z = F.array(F.lit(0.0), F.lit(0.0))
    v = F.array(F.lit(1.0), F.lit(2.0))
    assert spark.range(1).select(D.cosine_similarity(z, v).alias("c")).head()["c"] is None


def test_metric_registry():
    assert D.resolve("hamming") is D.hamming
    assert D.resolve("COSINE") is D.cosine_distance
    try:
        D.resolve("nope")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
