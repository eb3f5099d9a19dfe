"""A/B: checkpoint the shared co-purchase edge list (und) inside
_copurchase_triangles before deg/oriented derive from it.

Hypothesis: without the ckpt, the basket self-join + distinct (~5 s
warm at sf0.1, 2.39M edges) re-executes once per downstream
materialization — deg's ckpt, oriented's ckpt, and (for
graph_edge_jaccard / graph_related_topk) the final action's canonical
edge list — so each triangle-family op pays the most expensive shared
frame 2-3 times. graph_pagerank already checkpoints its edge list
first; this A/B measures giving the triangle machinery the same shape.

Protocol: alternating arms, cold blocks (release between reps), same
session — the ab_bpe_prefilter shape. Run on a quiet host:

    python tools/ab_ckpt_und.py [sf_dir]
"""

from __future__ import annotations

import functools
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from emdrive_spark.functions.ckpt import release
from emdrive_spark.operators import analytics
from emdrive_spark.session import get_spark

_SHIPPED_TRIANGLES = analytics._copurchase_triangles

OPS = ("graph_triangle_count", "graph_edge_jaccard", "graph_related_topk")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
    spark = get_spark("ab-ckpt-und")

    arms = {
        "ckpt_und": functools.partial(_SHIPPED_TRIANGLES, ckpt_und=True),
        "rebuild": functools.partial(_SHIPPED_TRIANGLES, ckpt_und=False),
    }

    def run(op: str, arm) -> float:
        analytics._copurchase_triangles = arm
        t0 = time.perf_counter()
        getattr(analytics, op)(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        release(spark, blocking=True)
        return dt

    # value parity first (row counts + a full sorted compare is the
    # pytest gate's job; here a cheap count+sum probe per op)
    from pyspark.sql import functions as F

    for op in OPS:
        probes = {}
        for name, arm in arms.items():
            analytics._copurchase_triangles = arm
            df = getattr(analytics, op)(spark, sf_dir)
            num = [c for c, t in df.dtypes if t in ("bigint", "int")]
            probes[name] = df.agg(
                F.count("*"), *[F.sum(c) for c in num]
            ).collect()[0]
            release(spark, blocking=True)
        assert list(probes["ckpt_und"]) == list(probes["rebuild"]), (
            op,
            probes,
        )
        print(f"{op}: value probe equal ({probes['ckpt_und'][0]} rows)")

    for op in OPS:  # warm each op once per arm
        for arm in arms.values():
            run(op, arm)
    samples: dict[tuple, list[float]] = {(o, a): [] for o in OPS for a in arms}
    for _ in range(reps):
        for op in OPS:
            for name, arm in arms.items():
                samples[(op, name)].append(run(op, arm))

    for op in OPS:
        for name in arms:
            xs = samples[(op, name)]
            print(
                f"{op:24s} {name:9s} median={statistics.median(xs):.2f}s "
                f"reps={[round(x, 2) for x in xs]}"
            )
    print(f"load_avg: {[round(x, 2) for x in os.getloadavg()]}")
    analytics._copurchase_triangles = _SHIPPED_TRIANGLES
    spark.stop()


if __name__ == "__main__":
    main()
