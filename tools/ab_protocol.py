"""Same-code A/B of the r6 vs r7 bench measurement protocols (r7
VERDICT item 2): graph_pagerank and graph_modularity regressed ~1.75x
in BENCH_r07 with no code change; the suspected cause is the protocol
change (round-robin reps + blocking release after every rep = every
rep runs COLD, where r6's consecutive reps 2..5 ran warm on the JVM
JIT + OS page cache the previous rep left behind).

Protocols, same queries, same session:
  warm      — r6 shape: consecutive reps per query, release() only
              BETWEEN queries (reps 2..N reuse whatever the previous
              rep warmed).
  cold      — r7 shape: round-robin reps, release(blocking=True)
              after EVERY rep (bench.py's current inner loop).
Each variant reports per-query median/min/max plus the rep vector so
the warm-up curve is visible (rep1 vs rep5).

Usage: python tools/ab_protocol.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402

QUERIES = ("graph_pagerank", "graph_modularity", "graph_triangle_count")
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "5"))


def _run(qs, spark, name, sf_dir) -> float:
    t0 = time.perf_counter()
    qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-protocol")
    qs = registry.queries()
    warm_sf = "/root/testdata/sf0.001"
    for name in QUERIES:
        qs[name](spark, warm_sf).write.format("noop").mode("overwrite").save()
    release(spark, blocking=True)

    print(f"load_at_start={os.getloadavg()[0]:.2f} reps={REPS}", flush=True)

    # -- warm protocol (r6): consecutive reps, release between queries
    warm: dict[str, list[float]] = {}
    for name in QUERIES:
        warm[name] = [_run(qs, spark, name, sf_dir) for _ in range(REPS)]
        release(spark, blocking=True)

    # -- cold protocol (r7): round-robin, blocking release every rep
    cold: dict[str, list[float]] = {n: [] for n in QUERIES}
    for _ in range(REPS):
        for name in QUERIES:
            cold[name].append(_run(qs, spark, name, sf_dir))
            release(spark, blocking=True)

    for name in QUERIES:
        for label, runs in (("warm", warm[name]), ("cold", cold[name])):
            s = sorted(runs)
            print(
                f"{name:22s} {label} median={statistics.median(s):.2f}s "
                f"min={s[0]:.2f} max={s[-1]:.2f} "
                f"reps=[{', '.join(f'{r:.2f}' for r in runs)}]",
                flush=True,
            )
    print(f"load_at_end={os.getloadavg()[0]:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
