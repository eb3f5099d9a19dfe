"""Per-stage empirical profile of one registry op (guide §1.1/§7.1).

Runs ``op(spark, sf_dir)`` into the noop sink with the Spark UI enabled,
then dumps every stage of the run from the UI's REST API sorted by
executor run time: stage name/callsite, task count, executorRunTime,
executorCpuTime, shuffle read/write bytes, input bytes. This is the
"open the Stages tab" loop from the optimization guide, scriptable in a
headless sandbox.

Usage: python tools/stage_profile.py <op> [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402


def main() -> None:
    op = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    spark = get_spark(
        f"profile-{op}", extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4050"}
    )
    qs = registry.queries()
    # warm (codegen/JIT) at the smallest SF so the profile reflects
    # steady-state CPU, not first-call compilation
    qs[op](spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    release(spark, blocking=True)
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:{spark.sparkContext.uiWebUrl.rsplit(':', 1)[-1]}/api/v1"

    def stages() -> list[dict]:
        with urllib.request.urlopen(f"{base}/applications/{app_id}/stages") as r:
            return json.load(r)

    seen = {s["stageId"] for s in stages()}
    t0 = time.perf_counter()
    for _ in range(reps):
        qs[op](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release(spark, blocking=True)
    wall = time.perf_counter() - t0
    rows = [s for s in stages() if s["stageId"] not in seen and s["status"] == "COMPLETE"]
    rows.sort(key=lambda s: -s["executorRunTime"])
    print(f"\n{op}: wall {wall:.2f}s over {reps} rep(s); {len(rows)} stages")
    print(
        f"{'stage':>5} {'tasks':>5} {'run_ms':>8} {'cpu_ms':>8} {'in_MB':>7} "
        f"{'shR_MB':>7} {'shW_MB':>7}  name"
    )
    tot_run = tot_cpu = 0
    for s in rows:
        tot_run += s["executorRunTime"]
        tot_cpu += s["executorCpuTime"] // 1_000_000
        print(
            f"{s['stageId']:>5} {s['numCompleteTasks']:>5} {s['executorRunTime']:>8} "
            f"{s['executorCpuTime'] // 1_000_000:>8} {s['inputBytes'] / 1e6:>7.1f} "
            f"{s['shuffleReadBytes'] / 1e6:>7.1f} {s['shuffleWriteBytes'] / 1e6:>7.1f}  "
            f"{s['name'][:90]}"
        )
    print(f"total executorRunTime {tot_run / 1000:.1f}s cpu {tot_cpu / 1000:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
