"""Interleaved A/B of the shared co-purchase edge build shape (r12):
analytics._EDGES_VIA_JOIN toggles _copurchase_edges between the
pre-r12 (distinct li) self-join and the basket-expansion
groupBy/collect_set + double-explode build, so every op that consumes
the shared edge list measures both shapes in one session (per-sample
steal metered). graph_adamic_adar inlines its own basket expansion
(it needs pair counts, not distinct) and is NOT toggled by the flag —
measure it against the before-bench medians instead.

Usage: python tools/ab_edge_consumers.py [reps] op [op ...]
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
from emdrive_spark.operators import analytics  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1])
    ops = sys.argv[2:]
    spark = get_spark("ab-edge-consumers")
    qs = registry.queries()
    for op in ops:
        qs[op](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    release(spark, blocking=True)
    samples: dict[tuple, list] = {(op, arm): [] for op in ops for arm in (True, False)}
    for _ in range(reps):
        for op in ops:
            for via_join in (True, False):  # True = the pre-r12 self-join build
                analytics._EDGES_VIA_JOIN = via_join
                m0 = hostmeter.snapshot()
                t0 = time.perf_counter()
                qs[op](spark, "/root/testdata/sf0.1").write.format("noop").mode(
                    "overwrite"
                ).save()
                wall = time.perf_counter() - t0
                d = hostmeter.delta(m0, hostmeter.snapshot())
                samples[(op, via_join)].append((round(wall, 3), d.get("steal_s")))
                release(spark, blocking=True)
    analytics._EDGES_VIA_JOIN = False
    for (op, via_join), vals in samples.items():
        med = statistics.median(w for w, _ in vals)
        arm = "join  " if via_join else "basket"
        print(f"{op:26s} {arm} median={med:.3f} samples={vals}")
    spark.stop()


if __name__ == "__main__":
    main()
