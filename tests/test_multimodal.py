from __future__ import annotations

import pytest

from emdrive_spark.operators import multimodal as mm

from .conftest import SF_SMOKE


def test_decode_stub_is_marked():
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG")


def test_fake_features_deterministic():
    assert mm.fake_features(b"abc") == mm.fake_features(b"abc")
    n, feat = mm.fake_features(b"abcd")
    assert n == 4
    assert feat == (4 * 2654435761) % 1_000_003


def test_fake_features_null_safe():
    # a nullable payload column delivers None in production batches;
    # the extractor must propagate the null, not raise (r4 review)
    assert mm.fake_features(None) == (None, None)


def test_payload_hash_parity_non_ascii():
    """The phash/content oracles hash DuckDB md5(text); Spark hashes
    md5(encode(text, 'UTF-8')). These must agree BYTE-for-byte on
    non-ASCII input — the old oracle hashed the blob's escaped VARCHAR
    rendering and silently diverged (r4 review)."""
    import hashlib

    import duckdb

    for text in ("café", "naïve — ❄", "plain ascii"):
        duck = duckdb.sql("select md5(?)", params=[text]).fetchone()[0]
        raw = hashlib.md5(text.encode("utf-8")).hexdigest()
        assert duck == raw, text


def test_mapinpandas_binary_plumbing(spark):
    out = mm.mm_features(spark, SF_SMOKE)
    assert dict(out.dtypes) == {
        "doc_id": "bigint",
        "byte_len": "bigint",
        "feat": "bigint",
        "content_pref": "bigint",
    }
    rows = out.orderBy("doc_id").limit(3).collect()
    assert all(r["byte_len"] > 0 for r in rows)
