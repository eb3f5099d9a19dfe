"""A/B a session-level Spark conf against the default session (guide
§1/§3): run the given ops into the noop sink at sf0.1, reps medians,
in ONE fresh JVM per invocation so static confs apply cleanly.

Usage:
  python tools/ab_conf.py '' graph_related_topk graph_triangle_count
  python tools/ab_conf.py '{"spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold":"64m"}' graph_related_topk
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


def main() -> None:
    conf = json.loads(sys.argv[1]) if sys.argv[1] else {}
    ops = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
    spark = get_spark("ab-conf", extra_conf=conf)
    qs = registry.queries()
    for op in ops:  # warm: codegen/JIT at the smallest SF
        qs[op](spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    release(spark, blocking=True)
    samples: dict[str, list[float]] = {op: [] for op in ops}
    for _ in range(reps):  # round-robin, the bench's noise discipline
        for op in ops:
            t0 = time.perf_counter()
            qs[op](spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[op].append(time.perf_counter() - t0)
            release(spark, blocking=True)
    out = {op: round(statistics.median(v), 3) for op, v in samples.items()}
    print("AB_RESULT " + json.dumps({"conf": conf, "medians": out}))
    spark.stop()


if __name__ == "__main__":
    main()
