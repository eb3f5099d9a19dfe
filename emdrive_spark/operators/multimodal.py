"""Multimodal column plumbing — image/audio/video as opaque binary.

ABSENT in the reference; north-star surface. The container has no
image/audio codecs, so the *decode* step is stubbed (NotImplementedError
or a deterministic fake, clearly marked), while everything Spark-side is
real and tested: binary payload columns, typed metadata, Arrow batch
transfer through mapInPandas, frame-index expansion.

Scale: payloads stay in executor-local Arrow batches end to end — the
only shuffles are on (doc_id, metadata); a 100 TB media corpus flows
through mapInPandas partition-parallel with bounded batch memory
(spark.sql.execution.arrow.maxRecordsPerBatch).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from emdrive_spark.registry import register
from emdrive_spark.sources.tables import load

_FNV = 2654435761
_MOD = 1_000_003


def decode_image(payload: bytes) -> "object":
    """STUB — real image decode needs PIL/opencv, not in this container.
    The Spark-side plumbing (schema, batching, partitioning) is real;
    swap this for an actual decoder in a full deployment."""
    raise NotImplementedError("image decode stub: no codec libraries in this environment")


def fake_features(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a feature extractor: derives features
    from the payload bytes only (so the oracle can reproduce them from
    the byte length)."""
    n = len(payload)
    return n, (n * _FNV) % _MOD


def _pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text → opaque binary payload + typed metadata, the
    canonical multimodal row shape: (id, kind, payload binary, meta)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.lit("text/plain").alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
    )


@register(
    "mm_pack",
    oracle="""
    SELECT doc_id, 'text/plain' AS kind,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len
    FROM documents
    """,
)
def mm_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload packing + metadata projection."""
    return _pack(spark, sf_dir).select(
        "doc_id", "kind", F.octet_length("payload").cast("long").alias("byte_len")
    )


@register(
    "mm_features",
    oracle=f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           CAST((octet_length(encode(text)) * {_FNV}) % {_MOD} AS BIGINT) AS feat
    FROM documents
    """,
)
def mm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary payloads via mapInPandas: real
    Arrow binary batches into Python, deterministic fake extractor (the
    decode itself is the stubbed step), typed output schema."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_features)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": feats.map(lambda t: t[0]),
                    "feat": feats.map(lambda t: t[1]),
                }
            )

    return _pack(spark, sf_dir).mapInPandas(
        extract, schema="doc_id long, byte_len long, feat long"
    )


@register(
    "mm_frame_sample",
    oracle="""
    SELECT doc_id, unnest(range(0, (n_chars % 30) + 1, 5)) AS frame_idx
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for 'video' payloads: every 5th frame index up to
    the (synthesized) frame count. sequence+explode — map-side expansion,
    the decode of each sampled frame would hang off decode_image()."""
    docs = load(spark, sf_dir, "documents").withColumn(
        "n_frames", (F.col("n_chars") % 30) + 1
    )
    return docs.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("n_frames") - 1, F.lit(5).cast("long"))
        ).alias("frame_idx"),
    )


@register(
    "mm_resize",
    oracle="""
    WITH dims AS (
      SELECT doc_id,
             (doc_id % 640) + 32 AS orig_w,
             (doc_id % 480) + 32 AS orig_h
      FROM documents
    )
    SELECT doc_id, orig_w, orig_h,
           CAST(floor(orig_w * least(1.0, 256.0 / greatest(orig_w, orig_h)) + 0.5) AS BIGINT) AS new_w,
           CAST(floor(orig_h * least(1.0, 256.0 / greatest(orig_w, orig_h)) + 0.5) AS BIGINT) AS new_h
    FROM dims
    """,
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-resize plumbing via mapInPandas: aspect-preserving
    fit-to-256 box math per payload, computed in Arrow batches. The
    pixel resample itself is the stubbed decode step (decode_image); the
    schema, batching, and the exact target-dimension contract — what a
    distributed thumbnailing job must get right — are real and checked.
    Dimensions derive deterministically from the PK (the corpus carries
    no real images)."""

    def resize_meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = (pdf["doc_id"] % 640) + 32
            h = (pdf["doc_id"] % 480) + 32
            import numpy as np

            scale = np.minimum(1.0, 256.0 / np.maximum(w, h))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orig_w": w,
                    "orig_h": h,
                    "new_w": np.floor(w * scale + 0.5).astype("int64"),
                    "new_h": np.floor(h * scale + 0.5).astype("int64"),
                }
            )

    return _pack(spark, sf_dir).mapInPandas(
        resize_meta, schema="doc_id long, orig_w long, orig_h long, new_w long, new_h long"
    )
