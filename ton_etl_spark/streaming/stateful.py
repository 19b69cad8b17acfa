"""Custom stateful streaming operator: per-key rolling churn state with
event-time eviction.

The reference's prometheus exporter keeps dict-of-dict per-key state in
memory and evicts entries older than an event-time threshold derived from
the latest masterchain block (``prometheus_exporter/gauges/performance/
performance.py:64-67,119-125``, trace state ``traces.py:30-43``).  This is
the Structured Streaming-native form: ``applyInPandasWithState`` with an
event-time timeout — the watermark IS the eviction threshold, and the
per-group state is exactly the reference's dict entry.

Emitted rows (update mode): one row per key per micro-batch while the key
is live — (doc_id, n_events, n_deletes, max_lsn, last_ts_ms) — plus a final
row flagged ``evicted=true`` when the watermark passes the key's timeout,
mirroring the exporter's "pending → settled" transition.

Scale notes: state is partitioned by key across executors (state store),
bounded by the watermark horizon; a hot key costs one state entry, not one
per event.  This is the slot where per-key session logic (sessionization,
trace completion detection) plugs in.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_deletes", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), True),
        T.StructField("last_ts_ms", T.LongType(), False),
        T.StructField("evicted", T.BooleanType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType(), False),
        T.StructField("n_deletes", T.LongType(), False),
        T.StructField("max_lsn", T.LongType(), True),
        # persisted so a later micro-batch carrying only OLDER (but still
        # in-watermark) events cannot pull the eviction timeout earlier
        T.StructField("last_ts_ms", T.LongType(), False),
    ]
)


DEFAULT_IDLE_MS = 60_000


def _track(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    doc_id, idle_ms = key[0], int(key[1])
    if state.hasTimedOut:
        n_events, n_deletes, max_lsn, last_ts_ms = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "doc_id": doc_id,
                    "n_events": n_events,
                    "n_deletes": n_deletes,
                    "max_lsn": max_lsn,
                    "last_ts_ms": last_ts_ms,
                    "evicted": True,
                }
            ]
        )
        return
    n_events, n_deletes, max_lsn, last_ts_ms = (
        state.get if state.exists else (0, 0, None, 0)
    )
    for pdf in pdfs:
        n_events += len(pdf)
        n_deletes += int((pdf["op"] == "d").sum())
        batch_max = pdf["lsn"].max()
        max_lsn = int(batch_max) if max_lsn is None else max(max_lsn, int(batch_max))
        last_ts_ms = max(last_ts_ms, int(pdf["ts_ms"].max()))
    state.update((n_events, n_deletes, max_lsn, last_ts_ms))
    # evict when event time passes the LATEST ts ever seen for the key +
    # idle horizon (the reference's `< latest_block_ts - interval*factor`
    # rule); max over stored + batch keeps the timeout monotone
    state.setTimeoutTimestamp(last_ts_ms + idle_ms)
    yield pd.DataFrame(
        [
            {
                "doc_id": doc_id,
                "n_events": n_events,
                "n_deletes": n_deletes,
                "max_lsn": max_lsn,
                "last_ts_ms": last_ts_ms,
                "evicted": False,
            }
        ]
    )


def rolling_doc_churn(
    events: DataFrame,
    watermark: str = "30 seconds",
    idle_ms: int = DEFAULT_IDLE_MS,
) -> DataFrame:
    """Attach the stateful churn tracker to a STREAMING CDC DataFrame
    (envelope columns doc_id/op/lsn/ts_ms required).  Event time is
    ``ts_ms``; keys idle for ``idle_ms`` of event time are evicted and emit
    a final ``evicted=true`` row."""
    with_ts = events.withColumn(
        "__event_ts", F.timestamp_millis(F.col("ts_ms"))
    ).withColumn("__idle_ms", F.lit(idle_ms).cast("long"))
    return (
        with_ts.withWatermark("__event_ts", watermark)
        .groupBy("doc_id", "__idle_ms")
        .applyInPandasWithState(
            _track,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
