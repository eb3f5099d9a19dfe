"""Quiet-host re-measurement of the r8 bench tail (r8 VERDICT item 6):
~15 sub-second queries drifted 1.1-1.4x in BENCH_r08 (recorded at
load_at_start 3.57) with no code change in any of them; the hypothesis
is ambient load, not the codegen-cache resize. This reruns the five
named drifters under the exact bench protocol (cold round-robin reps,
blocking release after every rep, median of 5) on a quiet host and
prints medians next to their r7/r8 artifact rows.

Usage: python tools/ab_tail.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402

QUERIES = (
    "agg_mannwhitney",
    "text_collocation_pmi",
    "agg_benford",
    "eval_lang_confusion",
    "agg_corr_matrix",
)
REPS = int(os.environ.get("SPARK_GRAFT_REPS", "5"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    print(f"load_avg at start: {[round(x, 2) for x in os.getloadavg()]}")
    spark = get_spark("ab-tail")
    qs = registry.queries()
    for name in QUERIES:  # warm codegen/JIT at the smallest SF
        qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    release(spark, blocking=True)

    samples: dict[str, list[float]] = {n: [] for n in QUERIES}
    for _ in range(REPS):
        for name in QUERIES:
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            release(spark, blocking=True)

    prior = {}
    for rnd in (7, 8):
        # Driver artifacts are {n, rc, cpus, sf, tail, parsed}: "parsed"
        # is the payload when the stdout line fit the driver's 2000-char
        # tail (r1-r5, r9+), null when it didn't (r6-r8) — in which case
        # the per-query rows live as a regex-recoverable fragment in
        # "tail". Plain {"queries": ...} files (BENCH_LOCAL.json shape)
        # also pass through the first branch.
        prior[rnd] = {}
        try:
            art = json.load(open(f"/root/repo/BENCH_r0{rnd}.json"))
            parsed = art.get("parsed") or art
            if isinstance(parsed.get("queries"), dict):
                prior[rnd] = parsed["queries"]
            else:
                import re

                # Anchor recovery to the "queries": {...} span instead of
                # denylisting scalar field names (r9 ADVICE): a headline
                # op sharing a scalar's name, or a new numeric scalar in
                # a historical payload, must not pollute or lose rows.
                # The tail is the LAST 2000 chars, so the window usually
                # starts MID-dict: the span runs from after the
                # "queries":{ marker if visible, else from the window
                # start, up to the dict's closing brace (the first "}").
                tail = art.get("tail", "")
                marker = re.search(r'"queries":\s*\{', tail)
                start = marker.end() if marker else 0
                end = tail.find("}", start)
                span = tail[start : end if end != -1 else len(tail)]
                # No marker + span holds top-level scalars ("metric")
                # -> the window does NOT start mid-queries-dict (e.g.
                # the payload had its queries elided entirely, or the
                # window opens on pre-JSON chatter). Scanning from 0
                # would record "value"/"reps"/"sf" as per-query rows
                # (r10 ADVICE) — skip recovery for that round instead.
                if marker is None and '"metric"' in span:
                    continue
                prior[rnd] = {
                    m.group(1): float(m.group(2))
                    for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', span)
                }
        except Exception:
            pass
    for name, xs in samples.items():
        med = statistics.median(xs)  # upper-middle pick biased high at even REPS
        print(
            f"{name}: quiet median {med:.3f}s | r7 {prior[7].get(name)} | "
            f"r8 {prior[8].get(name)} | reps {[round(x, 3) for x in xs]}"
        )
    print(f"load_avg at end: {[round(x, 2) for x in os.getloadavg()]}")
    spark.stop()


if __name__ == "__main__":
    main()
