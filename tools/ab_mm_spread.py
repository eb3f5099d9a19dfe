"""Interleaved A/B of spread() before the decode ops' Python stage.

One session, arms alternated rep-by-rep with per-sample steal metering
(the ab_graph_hints noise discipline). Usage:
  python tools/ab_mm_spread.py [reps] [op ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions import hostmeter  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402

OPS = (
    "mm_decode_phash",
    "mm_decode_phash_png",
    "mm_decode_phash_palette",
    "mm_decode_phash_deep",
    "mm_decode_resize_phash",
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    ops = sys.argv[2:] or OPS
    sf_dir = "/root/testdata/sf0.1"
    from emdrive_spark.operators import multimodal

    spark = get_spark("ab-mm-spread")
    qs = registry.queries()
    for op in ops:
        qs[op](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    release(spark, blocking=True)
    samples: dict[tuple, list] = {(op, arm): [] for op in ops for arm in (False, True)}
    for _ in range(reps):
        for op in ops:
            for arm in (False, True):
                multimodal._SPREAD_DECODE = arm
                m0 = hostmeter.snapshot()
                t0 = time.perf_counter()
                qs[op](spark, sf_dir).write.format("noop").mode("overwrite").save()
                wall = time.perf_counter() - t0
                d = hostmeter.delta(m0, hostmeter.snapshot())
                samples[(op, arm)].append((round(wall, 3), d.get("steal_s")))
                release(spark, blocking=True)
    multimodal._SPREAD_DECODE = None  # back to per-op defaults
    for (op, arm), vals in samples.items():
        med = statistics.median(w for w, _ in vals)
        print(f"{op:26s} spread={arm!s:5s} median={med:.3f} samples={vals}")
    spark.stop()


if __name__ == "__main__":
    main()
