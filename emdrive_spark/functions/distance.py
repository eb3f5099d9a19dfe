"""Distance expressions — the similarity-search core.

The reference declares a ``@`` distance operator evaluated against a
table's METRIC KEY under a named metric (hamming)
(/root/reference/README.md:26-32,67-78); only the keyword is tokenized
(/root/reference/src/sql/tokenizer.rs:70). We realize the full family as
*native Column expressions* so every distance stays inside whole-stage
codegen — no Python in the hot path. That is the property that lets a
distance-threshold scan or a brute-force top-k run at 100 TB: the metric
is just arithmetic fused into the scan.

All functions take/return ``pyspark.sql.Column``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hamming(a: Column | str, b: Column | int) -> Column:
    """popcount(a XOR b) — the reference's flagship metric
    (/root/reference/README.md:58-78: 0b11001111 @ 0b00001011 = 3).

    Works on any integral hash column (the reference stores perceptual
    hashes as UINT8..UINT128; we map them onto Spark integral types,
    SURVEY §1.2)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.lit(b) if isinstance(b, int) else b
    return F.bit_count(a.bitwiseXOR(b))


def dot(a: Column, b: Column) -> Column:
    """Inner product of two array<float|double> columns.

    zip_with + aggregate stays fully JVM-side (codegen), unlike a Python
    UDF: per-row cost is a tight loop over the arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm2(a: Column) -> Column:
    """L2 norm of an array column."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def l2(a: Column, b: Column) -> Column:
    """Euclidean distance between two array columns."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """dot(a,b) / (|a||b|); NaN-safe via nullif on zero norms."""
    return dot(a, b) / F.nullif(norm2(a) * norm2(b), F.lit(0.0))


def cosine_distance(a: Column, b: Column) -> Column:
    return F.lit(1.0) - cosine_similarity(a, b)


METRICS = {
    "hamming": hamming,
    "l2": l2,
    "euclidean": l2,
    "cosine": cosine_distance,
    "dot": dot,
}


def resolve(metric: str):
    """Metric registry — mirrors the reference's 'metrics pluggable per
    index' design (/root/reference/README.md:28-32)."""
    try:
        return METRICS[metric.lower()]
    except KeyError:
        raise ValueError(f"unknown metric {metric!r}; known: {sorted(METRICS)}") from None
