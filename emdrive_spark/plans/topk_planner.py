"""Two-path top-k-by-distance planner (SURVEY §4 custom-planning note).

The reference's declared raison d'être is distance-ordered retrieval
via a metric index (/root/reference/README.md:58-78); its index is an
in-memory flat vector (src/storage/index.rs). Our planner chooses, per
query, between:

- **exact**: distance fused into the scan + TakeOrderedAndProject.
  One pass over the data, k rows per partition kept. Optimal until the
  scan itself is the bottleneck.
- **lsh**: BucketedRandomProjectionLSH candidate generation (bucket
  equality prunes the scan) + exact rerank of candidates. Pays a
  model fit/lookup; wins when the table is large relative to k and an
  index can be amortized across queries.

The crossover is a cost rule, not a guess: exact cost ~ N·d reads;
LSH cost ~ (N/buckets)·d + index probe. On local test sizes exact
always wins — the rule exists so the same query text scales to the
billion-row deployment by flipping on row-count statistics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from emdrive_spark.functions.distance import l2

# Above this many rows, an amortizable LSH index beats a full scan for
# small k (see module docstring for the cost model).
EXACT_SCAN_ROW_CEILING = 10_000_000


@dataclass
class TopKPlan:
    strategy: str  # "exact" | "lsh"
    df: DataFrame


def plan_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    row_estimate: int | None = None,
    force: str | None = None,
) -> TopKPlan:
    """Return the chosen strategy + its DataFrame (not executed)."""
    if row_estimate is None:
        # Parquet-backed inputs answer this from footer metadata fast.
        row_estimate = emb.count()
    strategy = force or (
        "exact" if row_estimate <= EXACT_SCAN_ROW_CEILING or k >= 1000 else "lsh"
    )
    if strategy == "exact":
        return TopKPlan("exact", _exact_topk(emb, query_vec, k, id_col, vec_col))
    return TopKPlan("lsh", _lsh_topk(emb, query_vec, k, id_col, vec_col))


def _qcol(query_vec: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in query_vec])


def _exact_topk(emb, query_vec, k, id_col, vec_col) -> DataFrame:
    dist = l2(F.col(vec_col).cast("array<double>"), _qcol(query_vec))
    return (
        emb.select(id_col, F.round(dist, 6).alias("dist"))
        .orderBy(F.col("dist"), F.col(id_col))
        .limit(k)
    )


def _lsh_topk(emb, query_vec, k, id_col, vec_col) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.ml.linalg import Vectors

    feat = emb.withColumn("features", array_to_vector(F.col(vec_col).cast("array<double>")))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    model = lsh.fit(feat)
    nn = model.approxNearestNeighbors(feat, Vectors.dense(query_vec), k, distCol="dist")
    return nn.select(id_col, F.round("dist", 6).alias("dist"))
