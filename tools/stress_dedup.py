"""Scale stress for the flagship dedup path (r4 VERDICT item 3).

Stages an sf1+-equivalent documents corpus by replicating sf0.1's 5k
docs REP× (default 50 → 250k docs ≈ sf5) with a HEAVY-TAILED duplicate
cluster distribution — the realistic web-crawl shape that produces the
hot LSH band buckets named as the known risk in dedup_lsh_verified's
docstring (dedup.py): most docs unique (every token suffixed with the
replica id, so no shingle survives), a few clusters of 3/10/50 exact
copies. Then runs dedup_lsh_verified + dedup_components end-to-end on
the staged corpus and records:

- wall time per op (noop sink, full computation),
- the band-bucket skew profile from the SAME band construction the ops
  use (dedup.band_members): bucket count, max members m, p99 m,
  total candidate pairs Σ m·(m−1)/2, and the top-5 bucket sizes.

Staging lands under <repo>/.stress/ (gitignored); results go to stdout
as one JSON line — copy the numbers into SCALING.md's stress table.

Usage: python tools/stress_dedup.py [REP]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from emdrive_spark import registry  # noqa: E402
from emdrive_spark.functions.ckpt import release  # noqa: E402
from emdrive_spark.operators.dedup import band_members  # noqa: E402
from emdrive_spark.operators.text import minhash_sig_array, shingles  # noqa: E402
from emdrive_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
N_BASE = 5000  # sf0.1 documents rows; offsets keep ids < dedup._SHIFT


# Cluster-size law: 0.1% of base docs get 50 exact copies, 2% get 10,
# 10% get 3, the rest stay unique across replicas — a heavy tail
# without being all-pairs-degenerate. Single source of truth for the
# staging expression below (a Python twin of this ladder drifted once;
# round-5 review).
_CLUSTER_LAW = ((1000, 50), (50, 10), (10, 3))


def _copies_expr():
    expr = F.lit(1)
    for modulus, n in reversed(_CLUSTER_LAW):
        expr = F.when(F.col("doc_id") % modulus == 0, F.lit(n)).otherwise(expr)
    return expr


def stage(spark, rep: int) -> str:
    out = os.path.join(REPO, ".stress", f"docs_x{rep}")
    if os.path.exists(os.path.join(out, "documents.parquet", "_SUCCESS")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    base = spark.read.parquet(f"{BASE}/documents.parquet")
    # the cluster law as a SQL expression so staging never collects
    copies = _copies_expr()
    parts = []
    for i in range(rep):
        mutated = F.when(
            F.lit(i) < copies, F.col("text")  # dup-cluster member: exact copy
        ).otherwise(
            # unique filler: suffix EVERY token with the replica id so no
            # 3-gram shingle survives → no cross-replica band collisions
            F.regexp_replace("text", r"(\S+)", f"$1_r{i}")
        )
        parts.append(
            base.select(
                (F.col("doc_id") + F.lit(i * N_BASE)).alias("doc_id"),
                mutated.alias("text"),
                "lang",
                "source",
                "n_chars",
            )
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    return out


def bucket_profile(spark, sf_dir: str) -> dict:
    """Band-bucket skew via the ops' own construction (band_members on
    the same shingle→minhash pipeline dedup_lsh_verified runs)."""
    from emdrive_spark.operators.dedup import _doubled

    corpus = _doubled(spark, sf_dir).select(
        "doc_id", F.array_distinct(shingles(F.col("text"))).alias("sh")
    )
    sigs = corpus.select("doc_id", minhash_sig_array(F.col("sh")).alias("sig_arr"))
    sizes = band_members(sigs).groupBy("bkt").agg(F.count("*").alias("m"))
    stats = sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("m").alias("max_m"),
        F.expr("percentile_approx(m, 0.99)").alias("p99_m"),
        F.sum(F.expr("m * (m - 1) / 2")).alias("cand_pairs"),
        F.sum(F.when(F.col("m") > 1, 1).otherwise(0)).alias("colliding_buckets"),
    ).collect()[0]
    top = [r["m"] for r in sizes.orderBy(F.desc("m")).limit(5).collect()]
    return {
        "n_buckets": stats["n_buckets"],
        "colliding_buckets": stats["colliding_buckets"],
        "max_bucket_m": stats["max_m"],
        "p99_bucket_m": stats["p99_m"],
        "candidate_pairs": int(stats["cand_pairs"]),
        "top5_bucket_m": top,
    }


def main() -> None:
    rep = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    from emdrive_spark.operators.dedup import _SHIFT

    # Staged ids live in [0, rep*N_BASE); _doubled() adds _SHIFT for
    # the duplicated copy — overlap would silently corrupt every pair
    # count and the skew profile (round-5 review: the invariant was a
    # comment, now it's enforced).
    if rep * N_BASE > _SHIFT:
        sys.exit(
            f"REP={rep} stages doc_ids up to {rep * N_BASE - 1}, colliding "
            f"with _doubled()'s +{_SHIFT} id space; max supported REP is "
            f"{_SHIFT // N_BASE}."
        )
    spark = get_spark("emdrive-stress")
    t0 = time.perf_counter()
    sf_dir = stage(spark, rep)
    t_stage = round(time.perf_counter() - t0, 1)

    qs = registry.queries()
    timings = {}
    # span ops run on the staged corpus directly (no _doubled): the
    # exact-copy clusters make every cluster member one whole-doc span,
    # and the replica-suffixed filler shares no 8-gram — so the dup-key
    # join's fan-out is exactly the cluster law's collision mass
    for name in (
        "dedup_lsh_verified",
        "dedup_components",
        "dedup_spans_exact",
        "dedup_spans_cut",
        # round 7: fingerprint-selection dedup rides the same staged
        # corpus — exact-copy clusters share ALL fingerprints, so the
        # candidate mass is exactly the cluster law's pair count
        "text_winnowing",
        "dedup_winnowing_verified",
    ):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 1)
        release(spark, blocking=True)  # r7: isolate ops from block pressure

    prof = bucket_profile(spark, sf_dir)
    try:
        load_avg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load_avg = None
    print(
        json.dumps(
            {
                "rep": rep,
                "docs": rep * N_BASE,
                "docs_after_doubling": 2 * rep * N_BASE,
                "stage_sec": t_stage,
                "timings_sec": timings,
                "bucket_profile": prof,
                "load_avg": load_avg,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
