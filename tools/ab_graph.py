"""A/B harness for r6 verdict items 2 & 4: graph_hits per-round
checkpointing and a ckpt on graph_related_topk's edge frame.

Usage: python tools/ab_graph.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from emdrive_spark.functions.ckpt import ckpt  # noqa: E402
from emdrive_spark.operators import analytics  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "5"))


# The tail now lives in the engine (analytics.related_topk_from_edges,
# r7 VERDICT item 6) — the A/B times the shared function directly.
related_topk_from = analytics.related_topk_from_edges


def related_ckpt(spark, sf_dir):
    ej = analytics.graph_edge_jaccard(spark, sf_dir).transform(ckpt)
    both = ej.select(
        F.col("u").alias("part_id"), F.col("v").alias("neighbor"), "common", "jscore"
    ).unionByName(
        ej.select(
            F.col("v").alias("part_id"), F.col("u").alias("neighbor"), "common", "jscore"
        )
    )
    w = W.partitionBy("part_id").orderBy(
        F.col("jscore").desc(), F.col("common").desc(), F.col("neighbor").asc()
    )
    return (
        both.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= analytics._RELATED_K)
        .select("part_id", "neighbor", "common", "jscore")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-graph")
    variants = {
        "hits_fixed": lambda sf: analytics.graph_hits(spark, sf),
        "pagerank": lambda sf: analytics.graph_pagerank(spark, sf),
        "related_current": lambda sf: analytics.graph_related_topk(spark, sf),
        "related_ckpt": lambda sf: related_ckpt(spark, sf),
    }
    # Warm EVERY variant (r7 ADVICE: pagerank was timed cold relative
    # to the others) so A/B medians are comparable.
    warm = "/root/testdata/sf0.001"
    for fn in variants.values():
        fn(warm).write.format("noop").mode("overwrite").save()
    for name, fn in variants.items():
        runs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            fn(sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        print(
            f"{name:16s} median={statistics.median(runs):.3f}s "
            f"min={runs[0]:.3f} max={runs[-1]:.3f}",
            flush=True,
        )

    # -- shared-frame decomposition (r7 VERDICT item 6): materialize
    # the scored edge frame ONCE, then time (a) that build and (b) the
    # top-k tail alone. build + tail ~= related_current's median; the
    # tail is what a co-resident pipeline pays per additional consumer
    # of a shared graph_edge_jaccard view.
    t0 = time.perf_counter()
    ej = analytics.graph_edge_jaccard(spark, sf_dir).transform(ckpt)
    ej.write.format("noop").mode("overwrite").save()
    build = time.perf_counter() - t0
    tails = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        related_topk_from(ej).write.format("noop").mode("overwrite").save()
        tails.append(time.perf_counter() - t0)
    tails.sort()
    print(
        f"ej_build_once    {build:.3f}s; related tail median="
        f"{statistics.median(tails):.3f}s min={tails[0]:.3f} max={tails[-1]:.3f}",
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
