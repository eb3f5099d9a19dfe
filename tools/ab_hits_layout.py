"""Interleaved A/B of the graph_hits round-join strategy (r12):
analytics._HITS_UNPARTITIONED toggles between the pre-r12 unhinted
loop (AQE plans a per-half-round broadcast of the |V| score frame) and
the r12 shuffle_hash hint on the score side. Arms alternate within
each rep so host steal patches hit both; per-sample steal is metered.
(A two-layout variant — edge list repartitioned+ckpt'd per join key —
was also tried here and rejected: localCheckpoint loses partitioning,
so the copies are pure overhead.)

Usage: python tools/ab_hits_layout.py [reps]
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
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-hits-layout")
    fn = registry.queries()["graph_hits"]
    fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    release(spark, blocking=True)
    samples: dict[bool, list] = {True: [], False: []}
    for _ in range(reps):
        for unpart in (True, False):
            analytics._HITS_UNPARTITIONED = unpart
            m0 = hostmeter.snapshot()
            t0 = time.perf_counter()
            fn(spark, "/root/testdata/sf0.1").write.format("noop").mode(
                "overwrite"
            ).save()
            wall = time.perf_counter() - t0
            d = hostmeter.delta(m0, hostmeter.snapshot())
            samples[unpart].append((round(wall, 3), d.get("steal_s")))
            release(spark, blocking=True)
    analytics._HITS_UNPARTITIONED = False
    for unpart, vals in samples.items():
        arm = "unhinted(pre-r12)" if unpart else "shuffle_hash     "
        med = statistics.median(w for w, _ in vals)
        print(f"{arm} median={med:.3f} samples={vals}")
    spark.stop()


if __name__ == "__main__":
    main()
