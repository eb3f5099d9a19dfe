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


def test_mapinpandas_binary_plumbing(spark):
    out = mm.mm_features(spark, SF_SMOKE)
    assert dict(out.dtypes) == {"doc_id": "bigint", "byte_len": "bigint", "feat": "bigint"}
    rows = out.orderBy("doc_id").limit(3).collect()
    assert all(r["byte_len"] > 0 for r in rows)
