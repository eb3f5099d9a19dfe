"""Scale stress for mm_decode_phash (round 10): decode + pixel-hash +
banded near-dup over a replicated corpus, timed at two sizes to check
~linear scaling. Reuses tools/stress_dedup.stage — the heavy-tailed
duplicate-cluster corpus also gives the band join real hamming-0
clusters (exact copies hash identically), so the candidate-verify path
is exercised under bucket skew, not just the synthetic tripled copies.

The Python decode cost is #docs x 64-pixel PPM parses inside
mapInPandas (once per unique payload, pre-ckpt); the shuffle is always
(doc_id, 2x32-bit hash) — payloads never move. Expect wall time to
scale ~REP between the two runs if both claims hold.

Usage: python tools/stress_mm.py [REP_SMALL] [REP_LARGE]   (default 5 20)
Prints one JSON line — copy the numbers into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402
from tools.stress_dedup import N_BASE, stage  # noqa: E402


def main() -> None:
    rep_small = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rep_large = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark("stress-mm")
    qs = registry.queries()
    out = {"op": "mm_decode_phash", "runs": []}
    # warm codegen/JIT + Python workers once at the base SF, so the
    # first timed run doesn't bill first-call compilation (the initial
    # 5x/20x probe measured 8.68 s/5.59 s — SLOWER at the SMALL size,
    # pure warm-up artifact).
    qs["mm_decode_phash"](spark, "/root/testdata/sf0.001").count()
    release(spark, blocking=True)
    for rep in (rep_small, rep_large):
        sf_dir = stage(spark, rep)
        release(spark, blocking=True)
        t0 = time.perf_counter()
        n = qs["mm_decode_phash"](spark, sf_dir).count()
        wall = round(time.perf_counter() - t0, 2)
        out["runs"].append(
            {"rep": rep, "docs": rep * N_BASE, "out_rows": n, "wall_s": wall}
        )
        release(spark, blocking=True)
    a, b = out["runs"]
    out["scale_factor"] = round(b["docs"] / a["docs"], 2)
    out["wall_ratio"] = round(b["wall_s"] / a["wall_s"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
