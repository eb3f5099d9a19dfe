"""Round-13 optimization pins.

The ann_pq / ann_ivf_pq codebook rewrite (F.expr-parsed literal-string
arrays -> single F.lit Literal nodes + Python-DSL lambdas) must be
value-neutral: identical rows AND identical rank order, both arms run
in one session over the same fixture.
"""

from __future__ import annotations

import pytest

from emdrive_spark.operators import similarity

from .conftest import SF_SMOKE


@pytest.mark.parametrize("op", ["ann_pq", "ann_ivf_pq"])
def test_pq_lit_arm_equals_expr_arm(spark, op):
    fn = getattr(similarity, op)
    saved = similarity._PQ_VIA_LIT
    try:
        similarity._PQ_VIA_LIT = True
        lit_rows = [tuple(r) for r in fn(spark, SF_SMOKE).collect()]
        similarity._PQ_VIA_LIT = False
        expr_rows = [tuple(r) for r in fn(spark, SF_SMOKE).collect()]
    finally:
        similarity._PQ_VIA_LIT = saved
    # exact tuple-for-tuple equality, order included: the op returns an
    # ordered top-10, so byte-identical doubles AND identical tie-break
    # ranks are both pinned.
    assert lit_rows == expr_rows
    assert len(lit_rows) == 10
