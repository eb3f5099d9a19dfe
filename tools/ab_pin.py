"""Interleaved A/B of the r12 layout pin (functions/layout.py pin())
vs the pre-r12 ckpt shape, one JVM, arms alternating within each rep,
hostmeter bracketed around every sample. PIN_DISABLED degrades every
pin() to a plain ckpt() at query-build time, so both arms share the
session, codegen cache and block store hygiene.

Usage: python tools/ab_pin.py <op> [op ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_REPS   (default 5)
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
    ops = tuple(sys.argv[1:])
    if not ops:
        print("usage: ab_pin.py <op> [op ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))

    spark = get_spark("emdrive-ab-pin")
    qs = registry.queries()
    for flag in (True, False):  # warm codegen for both arms off the timed path
        layout.PIN_DISABLED = flag
        for name in ops:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        release(spark, blocking=True)

    wall: dict[tuple, list] = {(n, a): [] for n in ops for a in ("ckpt", "pin")}
    cpu: dict[tuple, list] = {(n, a): [] for n in ops for a in ("ckpt", "pin")}
    steal: dict[tuple, list] = {(n, a): [] for n in ops for a in ("ckpt", "pin")}
    run0 = hostmeter.snapshot()
    for r in range(reps):
        for name in ops:
            for arm in ("ckpt", "pin"):
                layout.PIN_DISABLED = arm == "ckpt"
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
    layout.PIN_DISABLED = False

    share = hostmeter.steal_share(hostmeter.delta(run0, hostmeter.snapshot()))
    print(f"\nrun steal_share={share}  reps={reps}  sf_dir={sf_dir}")
    print(f"{'op':26s} {'arm':4s} {'wall_med':>8s} {'cpu_med':>8s}  walls / steals")
    for name in ops:
        for arm in ("ckpt", "pin"):
            k = (name, arm)
            print(
                f"{name:26s} {arm:4s} {statistics.median(wall[k]):8.3f} "
                f"{statistics.median(cpu[k]):8.2f}  "
                f"{[round(x, 2) for x in wall[k]]} "
                f"{[round(x, 1) for x in steal[k]]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
