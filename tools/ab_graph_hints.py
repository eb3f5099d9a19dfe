"""Interleaved A/B of SHUFFLE_HASH hint sets in the triangle machinery.

One session, arms alternated rep-by-rep (this host's co-tenant noise
arrives in minutes-long patches — separate-JVM arms are incomparable;
interleaving puts every patch on all arms equally). Per-sample steal
is metered so contaminated samples are visible.

Usage: python tools/ab_graph_hints.py [op] [reps]
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

ARMS = {
    "none": frozenset(),
    "wedge2": frozenset({"wedge", "closing"}),
    "all": frozenset({"wedge", "closing", "deg_attach", "jac_common", "jac_deg"}),
}


def main() -> None:
    op = sys.argv[1] if len(sys.argv) > 1 else "graph_related_topk"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = "/root/testdata/sf0.1"
    from emdrive_spark.operators import analytics

    spark = get_spark("ab-graph-hints")
    qs = registry.queries()
    qs[op](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite"
    ).save()
    release(spark, blocking=True)
    samples: dict[str, list] = {a: [] for a in ARMS}
    for _ in range(reps):
        for arm, hints in ARMS.items():
            analytics._SHJ_HINTS = hints
            m0 = hostmeter.snapshot()
            t0 = time.perf_counter()
            qs[op](spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            d = hostmeter.delta(m0, hostmeter.snapshot())
            samples[arm].append((round(wall, 3), d.get("steal_s")))
            release(spark, blocking=True)
    for arm, vals in samples.items():
        med = statistics.median(w for w, _ in vals)
        print(f"{op} arm={arm:7s} median={med:.3f} samples={vals}")
    spark.stop()


if __name__ == "__main__":
    main()
