"""A/B: the exact substring prefilter on the BPE merge fold (r8
verdict item 1). Times bpe_train_merges at sf0.1 with the shipped
gated fold vs the ungated r8 fold (reconstructed here, monkeypatched
in — same session, alternating round-robin reps so host noise spreads
across both arms). Run:  python tools/ab_bpe_prefilter.py
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


def _ungated_merge_word(w, l: str, r: str):
    """The r8 fold without the prefilter — pays the F.aggregate on
    every vocabulary row every round."""
    syms = F.filter(F.split(w, ";"), lambda s: F.length(s) > 0)
    folded = F.aggregate(
        syms,
        F.lit(";"),
        lambda acc, x: F.when(
            acc.endswith(F.lit(f";{l};")) & (x == F.lit(r)),
            F.concat(
                acc.substr(F.lit(1), F.length(acc) - F.lit(len(l) + 1)),
                F.lit(f"{l}{r};"),
            ),
        ).otherwise(F.concat(acc, x, F.lit(";"))),
    )
    return folded.substr(F.lit(2), F.length(folded))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
    spark = get_spark("ab-bpe-prefilter")
    from emdrive_spark.functions.ckpt import release

    gated = text._bpe_merge_word

    def run(variant) -> float:
        text._bpe_merge_word = variant
        t0 = time.perf_counter()
        got = text.bpe_train_merges(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        assert len(got) == 6
        release(spark, blocking=True)
        return dt

    # warm both arms once (codegen/JIT), then alternate
    for v in (gated, _ungated_merge_word):
        run(v)
    samples: dict[str, list[float]] = {"gated": [], "ungated": []}
    for _ in range(reps):
        samples["gated"].append(run(gated))
        samples["ungated"].append(run(_ungated_merge_word))
    text._bpe_merge_word = gated

    # equality of results on the full sf0.1 corpus, both arms
    text._bpe_merge_word = _ungated_merge_word
    want = sorted(map(tuple, text.bpe_train_merges(spark, sf_dir).collect()))
    text._bpe_merge_word = gated
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
