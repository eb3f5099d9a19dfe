"""A telemetry/observability session on emdrive-spark: the timeseries
operator family composed over the events table — rollups, gap repair,
smoothing, anomaly/drift detection, and journey analytics.

Every stage is a registered, oracle-checked engine operator; at
deployment scale `events` is date-partitioned Parquet and each stage
below is one pruned scan plus (at most) one key shuffle.

Run: python examples/timeseries_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from emdrive_spark import registry
from emdrive_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("emdrive-timeseries-pipeline")
    registry.load_all()
    q = registry.REGISTRY

    # 1. Multi-granularity rollup (the hypertable continuous aggregate)
    rollup = q["events_multi_rollup"].fn(spark, sf_dir)
    print("== rollup rows per granularity ==")
    rollup.select(
        F.when(F.col("t_minute").isNotNull(), "minute")
        .when(F.col("t_hour").isNotNull(), "hour")
        .otherwise("day")
        .alias("grain")
    ).groupBy("grain").count().orderBy("grain").show()

    # 2. Gap repair: zero-fill counts, then interpolate values per series
    gaps = q["events_gap_fill"].fn(spark, sf_dir)
    print(f"empty hours zero-filled: {gaps.filter('n = 0').count()}")
    interp = q["events_interpolate"].fn(spark, sf_dir)
    print(
        f"grid minutes interpolated (unobserved): "
        f"{interp.filter('NOT observed').count()} of {interp.count()}"
    )

    # 3. Smoothing and candles
    ewma = q["events_ewma"].fn(spark, sf_dir)
    print(f"EWMA rows (one per event, per-user recurrence): {ewma.count()}")
    ohlc = q["events_ohlc"].fn(spark, sf_dir)
    print(f"hourly OHLC candles: {ohlc.count()}")

    # 4. Anomalies (rolling z-score) and drift (CUSUM)
    anom = q["events_anomaly_zscore"].fn(spark, sf_dir)
    print(f"anomalous events (|z| > 3): {anom.filter('is_anomaly').count()}")
    drift = q["events_cusum"].fn(spark, sf_dir)
    print(
        f"users drifting up/down: "
        f"{drift.filter('drift_up').count()} / {drift.filter('drift_down').count()}"
    )

    # 5. Journey analytics: streaks and the transition matrix
    streaks = q["window_islands"].fn(spark, sf_dir)
    streaks.orderBy(F.desc("longest_streak")).limit(5).show()
    trans = q["events_transitions"].fn(spark, sf_dir)
    print("== top transitions ==")
    trans.orderBy(F.desc("n")).limit(5).show()

    spark.stop()


if __name__ == "__main__":
    main()
