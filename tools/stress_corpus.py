"""Scale stress for the round-6 corpus-diagnostic operators.

Stages a REP x replicated documents corpus via tools/stress_dedup.stage
(default 20 -> 100k docs; every non-cluster token is suffixed with its
replica id, so the VOCABULARY grows ~REP x too — the worst case for the
"weight table is constant / vocabulary-bounded" claims, which hold by
bucket hashing (quality_dsir: fixed 4096 buckets) or by top-N windows
(text_zipf_fit) rather than by assuming a small vocabulary). Runs the
corpus diagnostics end-to-end on the staged corpus and prints one JSON
line — copy the numbers into SCALING.md.

Usage: python tools/stress_corpus.py [REP]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402
from tools.stress_dedup import stage  # noqa: E402

OPS = (
    "quality_dsir",
    "text_novelty",
    "corpus_mix_entropy",
    "text_zipf_fit",
    "quality_filter_gopher",  # round-3 baseline pass for comparison
    # round 8: the vocabulary-shaped additions/de-hints under the
    # ~REPx vocabulary growth this corpus is built to maximize —
    # BPE's "loop is vocab-bounded" claim and the unhinted
    # vocabulary joins (text_tfidf df table, perplexity log-prob
    # table) that AQE must now plan without a forced broadcast.
    "bpe_train_merges",
    "bpe_apply",
    "text_tfidf",
    "text_perplexity_bucket",
    # round 9: the packer on the BPE budget — the prefix sum must stay
    # two-phase (driver sees #partitions subtotal rows, never docs) as
    # the corpus AND vocabulary grow
    "pack_sequences_bpe",
)


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("emdrive-stress-corpus")
    staged = stage(spark, rep)
    result: dict[str, object] = {"rep": rep, "docs": 5000 * rep}
    q = registry.queries()
    for name in OPS:
        t0 = time.time()
        result[f"{name}_rows"] = q[name](spark, staged).count()
        result[f"{name}_wall_s"] = round(time.time() - t0, 1)
    result["load_avg"] = list(os.getloadavg())
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
