"""Checkpoint strategy switch — lineage truncation for iterative ops.

The iterative families (graph loops, components propagation, band
materialization, the prefix-sum pid pin) truncate lineage with
``localCheckpoint``: fastest (executor-local blocks, no extra I/O) but
NOT recomputable — losing an executor mid-op fails the query instead
of degrading it. That trade is right for an interactive session and
wrong for a preemption-heavy cluster (spot instances, aggressive
autoscaling), where a lost block should be re-read from reliable
storage rather than failing a multi-hour pipeline.

``ckpt(df)`` routes on one session-level flag:

    spark.conf.set("spark.graft.reliableCheckpoint", "true")

When set, checkpoints go through ``DataFrame.checkpoint()`` against
``sparkContext.setCheckpointDir`` (HDFS/S3/local path — set
``spark.graft.checkpointDir`` to choose it; defaults to a local tmp
dir, which is only sensible for single-node runs). Results are
identical either way — the flag changes WHERE blocks live, never what
they contain (pinned by tests/test_round6_fixes.py equality tests).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame

FLAG = "spark.graft.reliableCheckpoint"
DIR_CONF = "spark.graft.checkpointDir"


def release(spark, blocking: bool = False) -> int:
    """Drop every persisted/localCheckpointed block the session holds.

    Lineage-truncation blocks (ckpt above) live until the Python frame
    that references them is garbage-collected, so a session running
    many checkpoint-heavy operators back-to-back accumulates dozens of
    block sets and later queries pay their memory pressure — the r6
    bench measured graph_triangle_count at 27.8s in-session vs ~4.6s
    standalone from exactly this (SCALING.md co-residence note; r6
    verdict item 3). Call ``release`` BETWEEN independent queries to
    reset the block store; never mid-query — a released
    localCheckpoint cannot be recomputed, so any still-live frame
    derived from one fails on its next action instead of degrading.

    Returns the number of RDDs unpersisted. ``blocking=True`` waits
    for block removal to finish — use it when the NEXT thing is a
    timed measurement, so the async removal storm cannot overlap the
    next query's execution."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    n = 0
    it = jmap.entrySet().iterator()
    while it.hasNext():
        it.next().getValue().unpersist(blocking)
        n += 1
    # Layout pins (functions/layout.py pin()) also register with the
    # CacheManager; the sweep above already dropped their blocks
    # (respecting ``blocking``), and clearCache() removes the metadata
    # registration so the next rep/query rebuilds the pinned frame from
    # the parquet inputs instead of resolving against a stale cache
    # entry. localCheckpoint blocks are plain RDD persists — the sweep
    # alone covers those.
    spark.catalog.clearCache()
    return n


def ckpt(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate lineage: ``localCheckpoint`` by default; reliable
    ``checkpoint()`` when ``spark.graft.reliableCheckpoint=true``."""
    spark = df.sparkSession
    if spark.conf.get(FLAG, "false").lower() != "true":
        return df.localCheckpoint(eager=eager)
    sc = spark.sparkContext
    if sc.getCheckpointDir() is None:
        target = spark.conf.get(DIR_CONF, None) or tempfile.mkdtemp(
            prefix="emdrive_ckpt_"
        )
        sc.setCheckpointDir(target)
    return df.checkpoint(eager=eager)
