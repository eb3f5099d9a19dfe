"""Interleaved fresh-JVM A/B of the shuffle compression codec (guide
§2.3): lz4 (default) vs zstd, alternating one ab_conf.py invocation
per arm per round so host drift hits both arms equally. Static conf
(`spark.io.compression.codec` is fixed at context creation), so the
arms cannot share a JVM — each invocation is a fresh `python
tools/ab_conf.py`, and per-invocation guest steal is metered from
/proc/stat so contaminated rounds are visible.

Usage: python tools/ab_codec.py [rounds] [op ...]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))

ARMS = {
    "lz4": "",
    "zstd": json.dumps({"spark.io.compression.codec": "zstd"}),
}


def steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    ops = sys.argv[2:] or [
        "graph_related_topk",
        "graph_triangle_count",
        "graph_label_propagation",
        "dedup_edit_verified",
    ]
    env = dict(os.environ, SPARK_GRAFT_REPS=os.environ.get("SPARK_GRAFT_REPS", "3"))
    samples: dict[str, dict[str, list[float]]] = {a: {o: [] for o in ops} for a in ARMS}
    for r in range(rounds):
        for arm, conf in ARMS.items():
            s0, t0 = steal(), time.perf_counter()
            out = subprocess.run(
                [sys.executable, os.path.join(HERE, "ab_conf.py"), conf, *ops],
                capture_output=True,
                text=True,
                env=env,
            )
            dt, ds = time.perf_counter() - t0, steal() - s0
            line = next(
                (l for l in out.stdout.splitlines() if l.startswith("AB_RESULT ")), None
            )
            if line is None:
                print(f"round {r} arm {arm}: FAILED\n{out.stderr[-2000:]}")
                continue
            med = json.loads(line[len("AB_RESULT ") :])["medians"]
            for o, v in med.items():
                samples[arm][o].append(v)
            print(
                f"round {r} arm {arm}: {med} wall={dt:.0f}s steal={ds/100:.1f}s",
                flush=True,
            )
    print()
    for o in ops:
        row = {a: round(statistics.median(samples[a][o]), 3) for a in ARMS if samples[a][o]}
        print(f"FINAL {o}: {row}")


if __name__ == "__main__":
    main()
