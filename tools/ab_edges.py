"""A/B the co-purchase edge-list build (round 10): both-direction join
+ distinct (shipped) vs half-orientation join (pk < pk) + distinct +
shuffle-free mirror union. Hypothesis: the pair distinct is the
expensive shuffle (2.39M rows at sf0.1); building only the canonical
half cuts the join output AND that shuffle volume in half, and the
mirrored direction is a narrow union (no exchange) on top of the
distinct result. Both arms materialize the SAME und set (order aside),
checked by count and a value probe.

Usage: python tools/ab_edges.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402
from emdrive_spark.sources.tables import load  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "5"))


def _li(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        .distinct()
    )


def und_both(spark, sf_dir):
    li = _li(spark, sf_dir)
    a, b = li.alias("a"), li.alias("b")
    return (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") != F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )


def und_half_mirror(spark, sf_dir):
    li = _li(spark, sf_dir)
    a, b = li.alias("a"), li.alias("b")
    half = (
        a.join(b, (F.col("a.ok") == F.col("b.ok")) & (F.col("a.pk") < F.col("b.pk")))
        .select(F.col("a.pk").alias("src"), F.col("b.pk").alias("dst"))
        .distinct()
    )
    return half.unionByName(
        half.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


ARMS = {"both+distinct": und_both, "half+mirror": und_half_mirror}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    print(f"load_avg at start: {[round(x, 2) for x in os.getloadavg()]}")
    spark = get_spark("ab-edges")

    # value probe: identical edge sets
    probes = {}
    for name, fn in ARMS.items():
        df = fn(spark, sf_dir)
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.col("src") * 7 + F.col("dst")).alias("chk"),
        ).collect()[0]
        probes[name] = (row["n"], row["chk"])
        print(f"probe {name}: n={row['n']} chk={row['chk']}")
    assert len(set(probes.values())) == 1, f"arms disagree: {probes}"

    for name, fn in ARMS.items():  # warm
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
    release(spark, blocking=True)

    samples: dict[str, list[float]] = {n: [] for n in ARMS}
    for _ in range(REPS):
        for name, fn in ARMS.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - t0)
            release(spark, blocking=True)
    for name, xs in samples.items():
        print(
            f"{name}: median {statistics.median(xs):.3f}s "
            f"reps {[round(x, 3) for x in xs]}"
        )
    print(f"load_avg at end: {[round(x, 2) for x in os.getloadavg()]}")
    spark.stop()


if __name__ == "__main__":
    main()
