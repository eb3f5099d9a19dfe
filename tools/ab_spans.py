"""A/B harness for the r6 dedup_spans_cut bench regression (VERDICT r6
item 1). Measures, at sf0.1 with bench-identical session/reps/sink:

  detect        — _dup_spans alone (shared detection stage)
  cut_current   — dedup_spans_cut as registered (let-bound _clean)
  cut_prebind   — the pre-0ecb491 _clean (keep referenced twice, no
                  let-bind) on the same joined frame
  exact_current — dedup_spans_exact (regressed 1.39x in the same window)

Usage: python tools/ab_spans.py [sf_dir]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from emdrive_spark.functions.layout import spread  # noqa: E402
from emdrive_spark.operators import dedup  # noqa: E402
from emdrive_spark.operators.text import tokens  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402
from emdrive_spark.sources.tables import load  # noqa: E402

REPS = int(os.environ.get("SPARK_GRAFT_REPS", "5"))


def cut_prebind(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    sparr = (
        dedup._dup_spans(spark, sf_dir, keep_first=False)
        .groupBy("doc_id")
        .agg(F.collect_list(F.struct("span_start", "span_end")).alias("spans"))
    )
    joined = (
        spread(d.select("doc_id", "text"))
        .join(sparr, "doc_id", "left")
        .select(
            "doc_id",
            "text",
            F.coalesce(
                "spans",
                F.array().cast("array<struct<span_start:int,span_end:int>>"),
            ).alias("spans"),
        )
    )

    def _clean(t):
        keep = F.filter(
            F.sequence(F.lit(1), F.size(t)),
            lambda i: ~F.exists(
                "spans",
                lambda s: (i >= s["span_start"]) & (i <= s["span_end"]),
            ),
        )
        return F.struct(
            F.size(t).cast("long").alias("n_tokens"),
            (F.size(t) - F.size(keep)).cast("long").alias("n_cut"),
            F.array_join(
                F.transform(keep, lambda i: F.element_at(t, i)), " "
            ).alias("clean_text"),
        )

    return (
        joined.select("doc_id", F.transform(F.array(toks), _clean)[0].alias("c"))
        .select("doc_id", "c.n_tokens", "c.n_cut", "c.clean_text")
        .orderBy("doc_id")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-spans")
    variants = {
        "detect": lambda sf: dedup._dup_spans(spark, sf),
        "cut_current": lambda sf: dedup.dedup_spans_cut(spark, sf),
        "cut_prebind": lambda sf: cut_prebind(spark, sf),
        "exact_current": lambda sf: dedup.dedup_spans_exact(spark, sf),
    }
    # Warm EVERY variant so A/B medians are comparable (r7 ADVICE).
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
            f"{name:14s} median={statistics.median(runs):.3f}s "
            f"min={runs[0]:.3f} max={runs[-1]:.3f} "
            f"mean={statistics.mean(runs):.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
