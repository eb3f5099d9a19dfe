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


def hamming_wide(a: Column, b: Column, nlimbs: int = 2) -> Column:
    """Hamming distance over the FULL unsigned 64/128-bit range.

    UINT64/UINT128 columns are stored as DECIMAL (types.py) because
    values ≥ 2⁶³ overflow Spark's signed long — a plain ``cast("long")``
    before popcount throws CAST_OVERFLOW on exactly the perceptual-hash
    values the reference's METRIC KEY is for. Split each operand into
    32-bit limbs with EXACT decimal arithmetic — ``pmod`` is an exact
    remainder, and (d - lo) / 2³² divides evenly so the quotient's
    decimal rounding is a no-op (naive floor(d / 2³²) could round
    5.9999… up across the integer boundary) — then popcount the XOR of
    each limb pair and sum. Bit-identical to wide popcount; all codegen
    arithmetic, fused into the scan like every other metric here.

    nlimbs: 2 for UINT64, 4 for UINT128 (values beyond DECIMAL(38,0) —
    above ~10³⁸ — are the documented BinaryType edge, types.py)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    two32 = F.lit(4294967296).cast("decimal(38,0)")

    def limbs(c: Column) -> list[Column]:
        d = c.cast("decimal(38,0)")
        out = []
        for _ in range(nlimbs):
            lo = F.pmod(d, two32)
            out.append(lo.cast("long"))
            d = ((d - lo) / two32).cast("decimal(38,0)")
        return out

    pairs = zip(limbs(a), limbs(b))
    total = None
    for x, y in pairs:
        term = F.bit_count(x.bitwiseXOR(y))
        total = term if total is None else total + term
    return total.cast("long")


def hamming_binary(a: Column, b: Column, nbytes: int = 16) -> Column:
    """Hamming distance between fixed-width BINARY hash columns — the
    storage type for hashes wider than DECIMAL(38,0) can hold exactly
    (UINT128 max has 39 digits; types.py documents BinaryType as the
    edge's home). Spark has no bitwise ops on binary, so: hex-encode,
    carve 8-hex-char (32-bit) chunks, conv to long, XOR, popcount, sum.
    All codegen string/int ops, fused into the scan like every metric
    here. Inputs shorter than nbytes compare as left-zero-padded (hex
    lpad), matching big-endian integer semantics."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    nchunks = (nbytes + 3) // 4
    ah = F.lpad(F.hex(a), nbytes * 2, "0")
    bh = F.lpad(F.hex(b), nbytes * 2, "0")
    total = None
    for c in range(nchunks):
        xa = F.conv(F.substring(ah, 1 + 8 * c, 8), 16, 10).cast("long")
        xb = F.conv(F.substring(bh, 1 + 8 * c, 8), 16, 10).cast("long")
        term = F.bit_count(xa.bitwiseXOR(xb))
        total = term if total is None else total + term
    return total.cast("long")


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
