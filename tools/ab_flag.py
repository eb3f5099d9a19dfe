"""Interleaved A/B over an arbitrary module-level boolean flag — the
generalized ab_pin.py: arms alternate within each rep in ONE JVM, the
flag is flipped at query-build time, hostmeter brackets every sample.

Usage: python tools/ab_flag.py <module>:<FLAG> <off_label> <on_label> <op> [op ...]
  e.g. python tools/ab_flag.py emdrive_spark.operators.analytics:_TRI_VIA_ADJ \
         wedge adj graph_triangle_count graph_related_topk
Arm "off" runs with FLAG=False, arm "on" with FLAG=True.
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_REPS   (default 5)
"""

from __future__ import annotations

import importlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions import hostmeter  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402


def main() -> None:
    target, off_label, on_label = sys.argv[1], sys.argv[2], sys.argv[3]
    ops = tuple(sys.argv[4:])
    modname, flag = target.split(":")
    mod = importlib.import_module(modname)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
    arms = ((off_label, False), (on_label, True))

    spark = get_spark("emdrive-ab-flag")
    qs = registry.queries()
    for _, v in arms:  # warm codegen for both arms off the timed path
        setattr(mod, flag, v)
        for name in ops:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
    release(spark, blocking=True)

    wall = {(n, a): [] for n in ops for a, _ in arms}
    cpu = {(n, a): [] for n in ops for a, _ in arms}
    steal = {(n, a): [] for n in ops for a, _ in arms}
    run0 = hostmeter.snapshot()
    for r in range(reps):
        for name in ops:
            for arm, v in arms:
                setattr(mod, flag, v)
                m0 = hostmeter.snapshot()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                w = time.perf_counter() - t0
                d = hostmeter.delta(m0, hostmeter.snapshot())
                wall[(name, arm)].append(w)
                cpu[(name, arm)].append(d["cpu_s"])
                steal[(name, arm)].append(d["steal_s"])
                release(spark, blocking=True)
        print(f"-- rep {r + 1}/{reps} done", file=sys.stderr, flush=True)

    share = hostmeter.steal_share(hostmeter.delta(run0, hostmeter.snapshot()))
    print(f"\nrun steal_share={share}  reps={reps}  sf_dir={sf_dir}  {target}")
    print(f"{'op':26s} {'arm':6s} {'wall_med':>8s} {'cpu_med':>8s}  walls / steals")
    for name in ops:
        for arm, _ in arms:
            k = (name, arm)
            print(
                f"{name:26s} {arm:6s} {statistics.median(wall[k]):8.3f} "
                f"{statistics.median(cpu[k]):8.2f}  "
                f"{[round(x, 2) for x in wall[k]]} "
                f"{[round(x, 1) for x in steal[k]]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
