"""Weak-scaling stress for the graph operators (round 5).

Stages COPIES disjoint key-shifted replicas of sf0.1's lineitem
(default 10 → 6M rows, 200k graph nodes, 12M undirected co-purchase
edges) — weak scaling: identical per-copy structure, COPIES× the data.
Runs graph_triangle_count + graph_pagerank end-to-end on the staged
graph and records:

- wall time per op (count sink, full computation),
- the wedge-skew profile from the SAME degree-oriented edge list the
  triangle op builds: node count, undirected edge count m, max and
  p99 out-degree vs the sqrt(2m) worst-case bound, and the total
  wedge count Sum outdeg*(outdeg-1)/2 (the triangle stage's real work).

Staging lands under <repo>/.stress/ (gitignored); results go to stdout
as one JSON line — copy the numbers into SCALING.md's graph entry.

Usage: python tools/stress_graph.py [COPIES]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402
from emdrive_spark.sources.tables import load  # noqa: E402

BASE = "/root/testdata/sf0.1"
# key offsets larger than any sf0.1 key range -> copies stay disjoint
OK_SHIFT = 100_000_000
PK_SHIFT = 10_000_000


def main() -> None:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    spark = get_spark("emdrive-stress-graph")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    staged = os.path.join(root, ".stress", f"graph_x{copies}")
    shutil.rmtree(staged, ignore_errors=True)
    os.makedirs(staged, exist_ok=True)

    li = spark.read.parquet(os.path.join(BASE, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    union = None
    for i in range(copies):
        c = li.select(
            (F.col("l_orderkey") + F.lit(i * OK_SHIFT)).alias("l_orderkey"),
            (F.col("l_partkey") + F.lit(i * PK_SHIFT)).alias("l_partkey"),
        )
        union = c if union is None else union.unionAll(c)
    union.write.mode("overwrite").parquet(os.path.join(staged, "lineitem.parquet"))

    result: dict[str, object] = {"copies": copies}
    q = registry.queries()
    # round-6 additions (bfs/lpa/modularity) only touch (ok, pk), so the
    # staged single-table replica drives them too; graph_hits needs
    # l_suppkey and stays out of this harness.
    ops = (
        "graph_triangle_count",
        "graph_pagerank",
        "graph_kcore",
        "graph_bfs_distance",
        "graph_label_propagation",
        "graph_modularity",
        # round 7/8 additions (lineitem-only, so the replica drives
        # them): AA runs on the thresholded graph, related_topk on the
        # triangle machinery + serving-table tail
        "graph_adamic_adar",
        "graph_related_topk",
    )
    for name in ops:
        t0 = time.time()
        result[f"{name}_rows"] = q[name](spark, staged).count()
        result[f"{name}_wall_s"] = round(time.time() - t0, 1)

    # skew profile of the degree-oriented edge list (triangle op's shape)
    lif = (
        load(spark, staged, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )
    a, b = lif.alias("a"), lif.alias("b")
    und = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count("*").alias("d"))
    ds = deg.select(F.col("src").alias("u_"), F.struct("d", "src").alias("ukey"))
    dd = deg.select(F.col("src").alias("v_"), F.struct("d", "src").alias("vkey"))
    od = (
        und.join(ds, und["src"] == ds["u_"])
        .join(dd, und["dst"] == dd["v_"])
        .filter(F.col("ukey") < F.col("vkey"))
        .groupBy("src")
        .agg(F.count("*").alias("od"))
    )
    stats = od.agg(
        F.count("*").alias("nodes"),
        F.max("od").alias("max_od"),
        F.expr("percentile(od, 0.99)").alias("p99_od"),
        F.sum(F.col("od") * (F.col("od") - 1) / 2).alias("wedges"),
    ).first()
    m = und.count() // 2
    result.update(
        edges_m=m,
        sqrt_2m_bound=int((2 * m) ** 0.5),
        oriented_nodes=stats["nodes"],
        max_outdeg=stats["max_od"],
        p99_outdeg=stats["p99_od"],
        wedges=int(stats["wedges"]),
        load_avg=list(os.getloadavg()),
    )
    shutil.rmtree(staged, ignore_errors=True)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
