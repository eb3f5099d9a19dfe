"""A/B: a substring prefilter on the BPE merge fold (r8 verdict item
1) — measured and REJECTED. The hypothesis was that gating the
F.aggregate fold behind ``contains(';'+w, ';l;r;')`` (an exact test:
symbols contain no ';', so a hit is delimiter-bounded adjacency) would
recover the r8 "2.11x regression" by skipping the fold on most
vocabulary rows. Measured on a quiet host (same session, alternating
round-robin reps so noise spreads across both arms):

  sf0.1:        gated median 2.03s  vs ungated 2.01s
  x100 vocab:   gated median 2.63s  vs ungated 2.42s  (stress_dedup
                stage(100), 500k docs)

i.e. cost-neutral to slightly SLOWER — the per-round cost is the pair
explode + aggregate, not the merge projection, and the r8 bench row
that motivated the idea (3.57s at load_at_start 3.57) was ambient
load: the same unchanged code's quiet median is ~2.0s. The shipped
fold stays ungated; this tool re-runs the comparison (the gated arm is
reconstructed below and monkeypatched in).

Run:  python tools/ab_bpe_prefilter.py
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from emdrive_spark.operators import text
from emdrive_spark.session import get_spark

# Capture the SHIPPED fold at import time: run() monkeypatches
# text._bpe_merge_word, so any variant that looked it up lazily would
# recurse into itself once patched in (r9 review finding).
_SHIPPED_MERGE_WORD = text._bpe_merge_word


def _ungated_merge_word(w, l: str, r: str):
    """The shipped fold (no prefilter)."""
    return _SHIPPED_MERGE_WORD(w, l, r)


def _gated_merge_word(w, l: str, r: str):
    """The REJECTED variant: exact substring prefilter on the fold.
    Wraps the SHIPPED fold (rather than duplicating its 15-line body)
    so a future change to the fold keeps this A/B measuring shipped
    code against its gated form instead of a stale copy."""
    return F.when(
        F.contains(F.concat(F.lit(";"), w), F.lit(f";{l};{r};")),
        _SHIPPED_MERGE_WORD(w, l, r),
    ).otherwise(w)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
    spark = get_spark("ab-bpe-prefilter")
    from emdrive_spark.functions.ckpt import release

    shipped = text._bpe_merge_word

    def run(variant) -> float:
        text._bpe_merge_word = variant
        t0 = time.perf_counter()
        got = text.bpe_train_merges(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        assert len(got) == 6
        release(spark, blocking=True)
        return dt

    for v in (shipped, _gated_merge_word):  # warm codegen/JIT once per arm
        run(v)
    samples: dict[str, list[float]] = {"shipped_ungated": [], "gated": []}
    for _ in range(reps):
        samples["shipped_ungated"].append(run(shipped))
        samples["gated"].append(run(_gated_merge_word))

    # equality of trained merges on the full corpus, both arms
    text._bpe_merge_word = _gated_merge_word
    want = sorted(map(tuple, text.bpe_train_merges(spark, sf_dir).collect()))
    text._bpe_merge_word = shipped
    got = sorted(map(tuple, text.bpe_train_merges(spark, sf_dir).collect()))
    assert got == want, "prefilter changed the trained merges!"

    for arm, xs in samples.items():
        print(
            f"{arm}: median {statistics.median(xs):.2f}s "
            f"(reps {[round(x, 2) for x in xs]})"
        )
    print(f"load_avg now: {[round(x, 2) for x in os.getloadavg()]}")
    spark.stop()


if __name__ == "__main__":
    main()
