"""Interleaved A/B of the r12 agg_spearman reshape vs the r11 body,
one JVM, arms alternating within each rep, hostmeter bracketed around
every sample (the ab_hits_layout.py pattern). The OLD arm is the exact
HEAD body inlined below; the NEW arm is the registry's current one.

Usage: python tools/ab_spearman.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_REPS   (default 5)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions import hostmeter  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402
from emdrive_spark.sources.tables import load  # noqa: E402


def old_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").alias("x"),
        F.col("l_extendedprice").alias("y"),
    )

    def ranks(col: str, out: str):
        w = W.partitionBy("g").orderBy(col).rowsBetween(W.unboundedPreceding, -1)
        return (
            li.groupBy("g", col)
            .agg(F.count("*").alias("k"))
            .select(
                "g",
                col,
                (
                    2 * F.coalesce(F.sum("k").over(w), F.lit(0)) + F.col("k") + 1
                ).alias(out),
            )
        )

    r = li.join(ranks("x", "rx2"), ["g", "x"]).join(ranks("y", "ry2"), ["g", "y"])
    m = r.groupBy("g").agg(
        F.count("*").alias("n"),
        F.sum(F.col("rx2").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("ry2").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("rx2").cast("decimal(19,0)") * F.col("ry2")).alias("sxy"),
        F.sum(F.col("rx2").cast("decimal(19,0)") * F.col("rx2")).alias("sxx"),
        F.sum(F.col("ry2").cast("decimal(19,0)") * F.col("ry2")).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    rho = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return m.select(
        F.col("g").alias("l_returnflag"),
        F.col("n").cast("long").alias("n"),
        (F.floor(rho * 1000000 + F.lit(0.5)) / 1000000).alias("spearman_rho"),
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "5"))
    spark = get_spark("emdrive-ab-spearman")
    arms = {"old": old_spearman, "new": registry.queries()["agg_spearman"]}
    for fn in arms.values():  # warm codegen off the timed path
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()
    release(spark, blocking=True)

    wall: dict[str, list] = {a: [] for a in arms}
    cpu: dict[str, list] = {a: [] for a in arms}
    steal: dict[str, list] = {a: [] for a in arms}
    run0 = hostmeter.snapshot()
    for r in range(reps):
        for arm, fn in arms.items():
            m0 = hostmeter.snapshot()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            w = time.perf_counter() - t0
            d = hostmeter.delta(m0, hostmeter.snapshot())
            wall[arm].append(w)
            cpu[arm].append(d["cpu_s"])
            steal[arm].append(d["steal_s"])
            release(spark, blocking=True)
        print(f"-- rep {r + 1}/{reps} done", file=sys.stderr, flush=True)

    share = hostmeter.steal_share(hostmeter.delta(run0, hostmeter.snapshot()))
    print(f"\nrun steal_share={share}  reps={reps}  sf_dir={sf_dir}")
    for arm in arms:
        print(
            f"{arm:4s} wall_med={statistics.median(wall[arm]):.3f} "
            f"cpu_med={statistics.median(cpu[arm]):.2f} "
            f"steal_med={statistics.median(steal[arm]):.2f}  "
            f"walls={[round(x, 2) for x in wall[arm]]} "
            f"steals={[round(x, 1) for x in steal[arm]]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
