"""Capture before/after formatted plans for the r12 shared-edge-build
change (plans/r12). 'before' uses analytics._EDGES_VIA_JOIN=True (the
byte-identical pre-r12 self-join build kept under the A/B toggle);
'after' is the shipped basket expansion. The LPA entry replicates the
loop's round-1 vote join exactly as written in _lpa_edges_and_labels
(edges repartitioned by dst + ckpt, labels = nodes-as-own-label) so the
hinted vs unhinted strategy is visible despite the eager in-loop
checkpoints hiding it from the final frame's plan.

Usage: python tools/capture_edge_plans.py {before|after} [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from emdrive_spark.operators import analytics  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    arm = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    analytics._EDGES_VIA_JOIN = arm == "before"
    spark = get_spark("capture-edge-plans")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12")

    edges = analytics._copurchase_edges(spark, sf_dir)
    with open(os.path.join(out, f"copurchase_edges_{arm}.txt"), "w") as f:
        f.write(f"# _copurchase_edges (shared by pagerank/triangles/kcore/LPA/BFS) — {arm}\n")
        f.write(explain(edges))

    from emdrive_spark.functions.ckpt import ckpt

    dp = spark.sparkContext.defaultParallelism
    ledges = edges.repartition(dp, "dst").transform(ckpt)
    labels = ledges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("lbl")
    )
    lb = labels.hint("shuffle_hash") if arm == "after" else labels
    votes = (
        ledges.join(lb, ledges["dst"] == lb["node"])
        .groupBy("src", "lbl")
        .agg(F.count("*").alias("c"))
    )
    with open(os.path.join(out, f"lpa_vote_join_{arm}.txt"), "w") as f:
        f.write(f"# LPA round-1 vote join (loop body of _lpa_edges_and_labels) — {arm}\n")
        f.write(explain(votes))

    # graph_adamic_adar inlines its own pair-count build (it needs
    # co-occurrence counts, not distinct edges) and is not toggled by
    # _EDGES_VIA_JOIN; both arms' build fragments are reproduced here
    # verbatim (before = the pre-r12 self-join, after = the shipped
    # basket expansion) so the plan diff of the changed fragment is
    # explicit. The rest of the op is untouched by the r12 change.
    from emdrive_spark.sources.tables import load  # noqa: E402

    if arm == "before":
        li = (
            load(spark, sf_dir, "lineitem")
            .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
            .distinct()
        )
        a, b = li.alias("a"), li.alias("b")
        und = (
            a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
            .groupBy(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
            .agg(F.count("*").alias("nco"))
            .filter(F.col("nco") >= analytics._AA_MIN_COOCCUR)
            .select("src", "dst")
        )
    else:
        baskets = (
            load(spark, sf_dir, "lineitem")
            .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
            .groupBy("ok")
            .agg(F.collect_set("pk").alias("ps"))
        )
        und = (
            baskets.select(F.explode("ps").alias("src"), "ps")
            .select("src", F.explode("ps").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .groupBy("src", "dst")
            .agg(F.count("*").alias("nco"))
            .filter(F.col("nco") >= analytics._AA_MIN_COOCCUR)
            .select("src", "dst")
        )
    with open(os.path.join(out, f"graph_adamic_adar_pairs_{arm}.txt"), "w") as f:
        f.write(f"# graph_adamic_adar pair-count build fragment — {arm}\n")
        f.write(explain(und))
    spark.stop()


if __name__ == "__main__":
    main()
