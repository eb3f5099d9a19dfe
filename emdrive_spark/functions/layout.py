"""Partition-layout helpers for high-amplification projections.

``spread()`` exists for one specific plan shape: a NARROW scan feeding a
projection whose per-row cost is 10-100× the scan cost (shingle explode,
8-lane minhash signatures, per-character rolling hashes). Spark
parallelizes a scan by input split, and everything up to the first
exchange runs at scan parallelism — so when the source has few splits
(one row group per file in the local fixtures; a handful of giant
objects in a badly-bucketed lake), the expensive projection serializes
onto a few cores while the rest of the cluster idles.

The fix is to shuffle the *compact* input once, before amplification:
the payload moved is the raw (id, text) bytes — the cheapest this data
will ever be — and it buys full-cluster parallelism for the dominant
CPU stage. At 100 TB with healthy splits the same repartition is a
near-no-op rebalance of already-distributed rows; the cost stays
proportional to input bytes while the benefit stays proportional to the
amplification factor, which is why it is safe to leave in
unconditionally. (AQE's REBALANCE hint is the wrong tool here: it
targets an output *size*, and a small-byte/high-CPU input coalesces to
one partition — the exact pathology this helper removes.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# tools A/B switch (interleaved same-session arms, the _SHJ_HINTS
# precedent): True makes every spread() a no-op so a spread site can
# be measured against its absence without a separate JVM.
DISABLED = False


def spread(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition ``df`` across every core in the cluster
    (``defaultParallelism``), optionally keyed on ``cols`` so a
    downstream key-shuffle can reuse the layout. Call it on the narrow
    pre-amplification frame, never on exploded/widened data."""
    if DISABLED:
        return df
    n = df.sparkSession.sparkContext.defaultParallelism
    if cols:
        return df.repartition(n, *[F.col(c) for c in cols])
    return df.repartition(n)
