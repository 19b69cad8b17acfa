"""Windowed streaming metrics — the prometheus_exporter analog.

Reference: TPS = sum(tx_count)/interval over a rolling block window
(``prometheus_exporter/gauges/performance/tps.py:47-56``); latency
avg/p50/p75/p95 via sorted-list index percentiles
(``performance.py:131-157``); event-time eviction from the latest
masterchain block (``performance.py:119-125``).

Spark-first: these are plain windowed aggregations usable both on a static
DataFrame (tests/oracles) and on a stream with ``withWatermark`` (the
watermark IS the reference's eviction threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_tps(
    blocks: DataFrame,
    ts_col: str = "gen_utime",
    count_col: str = "tx_count",
    window_sec: int = 100,
    watermark: str | None = None,
) -> DataFrame:
    """Transactions-per-second per tumbling event-time window."""
    df = blocks
    # any non-timestamp column is an epoch-seconds value (smallint/double
    # included, not just bigint/int)
    dtype = dict(df.dtypes)[ts_col]
    ts = (
        F.col(ts_col)
        if dtype.startswith("timestamp")
        else F.timestamp_seconds(F.col(ts_col).cast("long"))
    )
    df = df.withColumn("__ts", ts)
    if watermark:
        df = df.withWatermark("__ts", watermark)
    return (
        df.groupBy(F.window("__ts", f"{window_sec} seconds").alias("w"))
        .agg(F.sum(count_col).cast("long").alias("tx_total"))
        .select(
            F.col("w.start").alias("window_start"),
            "tx_total",
            F.round(F.col("tx_total") / F.lit(float(window_sec)), 6).alias("tps"),
        )
    )


def latency_percentiles(
    traces: DataFrame,
    start_col: str = "start_utime",
    end_col: str = "end_utime",
    group_window_sec: int = 3600,
    watermark: str | None = None,
) -> DataFrame:
    """avg/p50/p75/p95 end-to-end latency per event-time window (exact
    percentile on batch; swap to percentile_approx under streaming state
    limits).  Delays are reported as-is — under clock skew ``end < start``
    yields a negative delay; filter upstream if the source clocks are not
    trusted (the reference's exporter has the same exposure)."""
    df = traces.withColumn("__delay", (F.col(end_col) - F.col(start_col)).cast("double"))
    df = df.withColumn("__ts", F.timestamp_seconds(F.col(end_col)))
    if watermark:
        df = df.withWatermark("__ts", watermark)
    return (
        df.groupBy(F.window("__ts", f"{group_window_sec} seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.avg("__delay"), 6).alias("avg_delay"),
            F.round(F.percentile("__delay", 0.5), 6).alias("p50"),
            F.round(F.percentile("__delay", 0.75), 6).alias("p75"),
            F.round(F.percentile("__delay", 0.95), 6).alias("p95"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "avg_delay", "p50", "p75", "p95")
    )
