"""Interleaved A/B of the r13 PQ-codebook Literal rewrite
(similarity._PQ_VIA_LIT) vs the r12 F.expr-parsed-string arm, one JVM,
arms alternating within each rep, hostmeter bracketed around every
sample. Each sample is split into BUILD time (query construction +
explain — the catalyst planning cost the rewrite targets) and EXEC
time (the noop-sink run), because the hypothesis is that the win is
driver-side planning, not compute.

Usage: python tools/ab_pq_lit.py [op ...]   (default: ann_pq ann_ivf_pq)
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_REPS   (default 5)
"""

from __future__ import annotations

import contextlib
import io
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions import hostmeter  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.operators import similarity  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402

ARMS = ("expr", "lit")


def main() -> None:
    ops = tuple(sys.argv[1:]) or ("ann_pq", "ann_ivf_pq")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))

    spark = get_spark("emdrive-ab-pq-lit")
    qs = registry.queries()
    for arm in ARMS:  # warm codegen for both arms off the timed path
        similarity._PQ_VIA_LIT = arm == "lit"
        for name in ops:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
    release(spark, blocking=True)

    build: dict[tuple, list] = {(n, a): [] for n in ops for a in ARMS}
    execu: dict[tuple, list] = {(n, a): [] for n in ops for a in ARMS}
    steal: dict[tuple, list] = {(n, a): [] for n in ops for a in ARMS}
    run0 = hostmeter.snapshot()
    for r in range(reps):
        for name in ops:
            for arm in ARMS:
                similarity._PQ_VIA_LIT = arm == "lit"
                m0 = hostmeter.snapshot()
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                # force analysis+optimization+physical planning; the
                # printed text is noise here, so swallow it
                with contextlib.redirect_stdout(io.StringIO()):
                    df.explain("formatted")
                t1 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                t2 = time.perf_counter()
                d = hostmeter.delta(m0, hostmeter.snapshot())
                build[(name, arm)].append(t1 - t0)
                execu[(name, arm)].append(t2 - t1)
                steal[(name, arm)].append(d["steal_s"])
                release(spark, blocking=True)
        print(f"-- rep {r + 1}/{reps} done", file=sys.stderr, flush=True)
    similarity._PQ_VIA_LIT = True

    share = hostmeter.steal_share(hostmeter.delta(run0, hostmeter.snapshot()))
    print(f"\nrun steal_share={share}  reps={reps}  sf_dir={sf_dir}")
    print(f"{'op':14s} {'arm':4s} {'build_med':>9s} {'exec_med':>8s}  builds / execs / steals")
    for name in ops:
        for arm in ARMS:
            k = (name, arm)
            print(
                f"{name:14s} {arm:4s} {statistics.median(build[k]):9.3f} "
                f"{statistics.median(execu[k]):8.3f}  "
                f"{[round(x, 2) for x in build[k]]} "
                f"{[round(x, 2) for x in execu[k]]} "
                f"{[round(x, 1) for x in steal[k]]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
