"""Time an arbitrary list of registry ops with the bench methodology:
round-robin reps into the noop sink, hostmeter (wall / executed-CPU /
paravirt-steal) bracketed around every rep, medians reported. The
r12 general-purpose measurement harness — same shape as ab_steal.py
but parameterized, so any optimization target can be measured before
and after without writing a bespoke tool.

Usage: python tools/ab_ops.py <op> [op ...]
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
from emdrive_spark.functions import hostmeter  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402


def main() -> None:
    ops = tuple(sys.argv[1:])
    if not ops:
        print("usage: ab_ops.py <op> [op ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))

    spark = get_spark("emdrive-ab-ops")
    qs = registry.queries()
    for name in ops:  # warm codegen/JIT off the timed path
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    release(spark, blocking=True)

    run0 = hostmeter.snapshot()
    wall: dict[str, list] = {n: [] for n in ops}
    cpu: dict[str, list] = {n: [] for n in ops}
    steal: dict[str, list] = {n: [] for n in ops}
    for r in range(reps):
        for name in ops:
            m0 = hostmeter.snapshot()
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            d = hostmeter.delta(m0, hostmeter.snapshot())
            wall[name].append(w)
            cpu[name].append(d["cpu_s"])
            steal[name].append(d["steal_s"])
            release(spark, blocking=True)
        print(f"-- rep {r + 1}/{reps} done", file=sys.stderr, flush=True)

    share = hostmeter.steal_share(hostmeter.delta(run0, hostmeter.snapshot()))
    print(f"\nrun steal_share={share}  reps={reps}  sf_dir={sf_dir}")
    print(f"{'op':28s} {'wall_med':>8s} {'cpu_med':>8s} {'steal_med':>9s}  walls / steals")
    for name in ops:
        wm = statistics.median(wall[name])
        cm = statistics.median(cpu[name])
        sm = statistics.median(steal[name])
        print(
            f"{name:28s} {wm:8.3f} {cm:8.2f} {sm:9.2f}  "
            f"{[round(x, 2) for x in wall[name]]} {[round(x, 1) for x in steal[name]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
