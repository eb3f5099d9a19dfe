"""Interleaved A/B of newly-added spread() sites: layout.DISABLED
toggles every spread() off, so an op whose ONLY spread is the new one
measures with/without it in one session (per-sample steal metered).

Usage: python tools/ab_spread_sites.py [reps] op [op ...]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions import hostmeter, layout  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1])
    ops = sys.argv[2:]
    spark = get_spark("ab-spread-sites")
    qs = registry.queries()
    for op in ops:
        qs[op](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    release(spark, blocking=True)
    samples: dict[tuple, list] = {(op, arm): [] for op in ops for arm in (True, False)}
    for _ in range(reps):
        for op in ops:
            for disabled in (True, False):  # True = no spread (the old plan)
                layout.DISABLED = disabled
                m0 = hostmeter.snapshot()
                t0 = time.perf_counter()
                qs[op](spark, "/root/testdata/sf0.1").write.format("noop").mode(
                    "overwrite"
                ).save()
                wall = time.perf_counter() - t0
                d = hostmeter.delta(m0, hostmeter.snapshot())
                samples[(op, disabled)].append((round(wall, 3), d.get("steal_s")))
                release(spark, blocking=True)
    layout.DISABLED = False
    for (op, disabled), vals in samples.items():
        med = statistics.median(w for w, _ in vals)
        arm = "no-spread" if disabled else "spread   "
        print(f"{op:24s} {arm} median={med:.3f} samples={vals}")
    spark.stop()


if __name__ == "__main__":
    main()
