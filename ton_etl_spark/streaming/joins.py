"""Watermarked stream-stream enrichment join (SURVEY.md J11).

The reference enriches live dex swaps / jetton transfers with trace latency
by looking up the trace-start time in per-key state held by the exporter
(``/root/reference/prometheus_exporter/gauges/performance/dex.py:36-40``,
trace state ``traces.py:30-43``).  The Structured-Streaming-native form is a
stream-stream inner join: both sides carry event-time watermarks, and the
join condition bounds the time skew between the matching rows — that bound
is what lets Spark expire join state (each side's buffer holds only rows
younger than watermark + span), so state is O(in-flight traces), not
O(history).

Scale shape: the join shuffles both streams on the trace key; matches emit
as soon as both rows are present (inner join does not wait for the
watermark), while the watermark GCs state behind the event-time frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_enrich(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    watermark: str = "30 seconds",
    max_span_sec: int = 60,
) -> DataFrame:
    """Join two (streaming or batch) DataFrames on ``on`` where the right
    row's event time falls within ``[left_ts, left_ts + max_span_sec]``.

    Column contract: apart from ``on``, the two sides must have disjoint
    column names (pre-rename upstream).  Output: all left columns, the right
    columns minus the duplicated key, plus ``delay_ms`` (right - left event
    time) — the trace-latency measure the reference exports.

    The same plan works in batch mode (withWatermark is a no-op there),
    which is exactly how the test asserts stream/batch equality.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {max_span_sec} SECONDS")
        )
    )
    right_cols = [c for c in right.columns if c != on]
    # cast: unix_millis rejects TIMESTAMP_NTZ (parquet scans yield ntz); any
    # session-tz shift introduced by the cast cancels in the subtraction
    delay = (
        (
            F.unix_millis(F.col(f"r.{right_ts}").cast("timestamp"))
            - F.unix_millis(F.col(f"l.{left_ts}").cast("timestamp"))
        )
        .cast("long")
        .alias("delay_ms")
    )
    return l.join(r, cond, "inner").select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right_cols],
        delay,
    )
