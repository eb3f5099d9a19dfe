"""Settle the r10 six-op bench question with steal-invariant counters.

Background (r10 verdict): six consecutive bench positions
(dedup_spans_cut/exact, graph_kcore, sketch_countmin_topk,
graph_label_propagation, graph_hits, graph_bfs_distance) sat 1.6-2.2x
above the r9 quiet record while their engine code was byte-identical
(`git diff 0f93fa7..172fe64` touches only the kcore ORACLE SQL in
analytics.py — DuckDB-side, never in the bench path — plus
config/multimodal/registry/server). The round-robin median was built
to discard noise patches, so "a patch got all six, in consecutive
positions, across 5 spread reps" needed direct evidence, not prose.

This tool runs the watch set + in-envelope controls at sf0.1 with the
r11 hostmeter brackets around every rep: wall, executed-CPU
(steal-invariant) and the guest's paravirt steal clock per rep. The
verdict's decision rule: each watch op either returns to ~r9 wall
levels in a genuinely quiet window (per-rep steal ~0), or holds its
elevated wall WITH elevated per-rep steal (co-tenancy confirmed, flags
cleared), or holds elevated wall at zero steal (a real regression —
bisect). CPU medians become the durable cross-round baseline either
way.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions import hostmeter  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402

WATCH = (
    "dedup_spans_cut",
    "dedup_spans_exact",
    "graph_kcore",
    "sketch_countmin_topk",
    "graph_label_propagation",
    "graph_hits",
    "graph_bfs_distance",
)
CONTROLS = (
    "graph_pagerank",      # same iterative-ckpt family, was 1.60x
    "graph_modularity",    # heavy graph, was within envelope (1.24x)
    "dedup_lsh_verified",  # canary-class, was 1.46x
    "text_novelty",        # r10's attributed drift case (1.37x)
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
    r9 = json.loads(
        subprocess.check_output(["git", "-C", "/root/repo", "show", "f587837:BENCH_LOCAL.json"])
    )["queries"]
    r10 = json.load(open("/root/repo/BENCH_LOCAL.json"))["queries"]

    spark = get_spark("emdrive-ab-steal")
    qs = registry.queries()
    ops = WATCH + CONTROLS
    for name in ops:  # warm codegen/JIT off the timed path
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
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
    print(
        f"{'op':26s} {'wall_med':>8s} {'cpu_med':>8s} {'steal_med':>9s} "
        f"{'r9q':>6s} {'r10q':>6s} {'v_r9':>5s} {'v_r10':>5s}  walls"
    )
    for name in ops:
        wm = statistics.median(wall[name])
        cm = statistics.median(cpu[name])
        sm = statistics.median(steal[name])
        tag = "WATCH" if name in WATCH else "ctrl"
        print(
            f"{name:26s} {wm:8.3f} {cm:8.2f} {sm:9.2f} "
            f"{r9[name]:6.2f} {r10[name]:6.2f} {wm / r9[name]:5.2f} {wm / r10[name]:5.2f}  "
            f"{[round(x, 2) for x in wall[name]]} [{tag}]"
        )
    spark.stop()


if __name__ == "__main__":
    main()
