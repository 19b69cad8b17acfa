"""Custom stateful streaming operator (applyInPandasWithState): per-key
churn counts must equal the batch groupBy truth after the stream drains,
and idle keys must emit eviction rows once the watermark passes their
timeout (the reference's event-time dict eviction,
prometheus_exporter performance.py:119-125)."""

import os
import time

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log
from ton_etl_spark.cdc.schema import CDC_EVENT_SCHEMA_EVOLVED
from ton_etl_spark.streaming.stateful import rolling_doc_churn

N = 2000


def test_rolling_doc_churn_matches_batch_truth(spark, tmp_path):
    log = generate_cdc_log(spark, N, seed=21)
    root = str(tmp_path / "log")
    write_cdc_log(log, root, n_batches=4, dup_pct=0, seed=21)

    src = (
        spark.readStream.schema(CDC_EVENT_SCHEMA_EVOLVED)
        .option("maxFilesPerTrigger", 4)
        .parquet(os.path.join(root, "phase=*/__seq=*"))
    )
    # watermark wider than the log's ~26s event-time span: the scrambled
    # delivery order drops nothing as late; idle horizon beyond the span:
    # no evictions, so the last update row per key carries cumulative totals
    q = (
        rolling_doc_churn(src, watermark="10 minutes", idle_ms=600_000)
        .writeStream.format("memory")
        .queryName("churn")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.sql(
        """
        SELECT doc_id, n_events, n_deletes, max_lsn FROM (
          SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY n_events DESC) rn
          FROM churn WHERE NOT evicted) WHERE rn = 1
        """
    )
    want = log.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("op") == "d").cast("long")).alias("n_deletes"),
        F.max("lsn").alias("max_lsn"),
    )
    got_rows = sorted(tuple(r) for r in got.collect())
    want_rows = sorted(tuple(r) for r in want.collect())
    assert got_rows == want_rows and len(got_rows) > 0


def test_eviction_fires_after_watermark_passes_timeout(spark, tmp_path):
    """Two time-separated delivery files: key A lives in the first; when the
    second file (100s later in event time) advances the watermark past A's
    idle horizon, A must emit exactly one evicted=true row with its final
    counts."""
    root = str(tmp_path / "elog")
    os.makedirs(root)
    t0 = 1_700_000_000_000
    batch_a = spark.createDataFrame(
        [
            ("A", "c", 1, t0, [1], 1, "web", None),
            ("A", "d", 2, t0 + 500, None, None, "web", None),
        ],
        schema=CDC_EVENT_SCHEMA_EVOLVED,
    )
    batch_b = spark.createDataFrame(
        [("B", "c", 3, t0 + 100_000, [2], 1, "web", None)],
        schema=CDC_EVENT_SCHEMA_EVOLVED,
    )
    batch_a.coalesce(1).write.parquet(os.path.join(root, "f0"))
    time.sleep(1.1)  # file-source ordering is by modification time
    batch_b.coalesce(1).write.parquet(os.path.join(root, "f1"))

    src = (
        spark.readStream.schema(CDC_EVENT_SCHEMA_EVOLVED)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "f*"))
    )
    q = (
        rolling_doc_churn(src, watermark="1 second", idle_ms=2000)
        .writeStream.format("memory")
        .queryName("evict")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    evicted = spark.sql(
        "SELECT doc_id, n_events, n_deletes, max_lsn FROM evict WHERE evicted"
    ).collect()
    assert [tuple(r) for r in evicted] == [("A", 2, 1, 2)]


def test_timeout_survives_older_in_watermark_batch(spark, tmp_path):
    """A later micro-batch carrying only an OLDER (still in-watermark) event
    for a key must not pull its eviction timeout earlier: last_ts_ms is
    persisted in state and the timeout is the max over everything seen."""
    root = str(tmp_path / "mlog")
    os.makedirs(root)
    t0 = 1_700_000_000_000
    f0 = spark.createDataFrame(
        [("A", "c", 1, t0 + 10_000, [1], 1, "web", None)],
        schema=CDC_EVENT_SCHEMA_EVOLVED,
    )
    # older event for A arrives later (out-of-order, within watermark), plus
    # B far enough ahead to advance the watermark past (t0+1_000 + idle)
    # but NOT past (t0+10_000 + idle): with the timeout bug A would evict.
    f1 = spark.createDataFrame(
        [
            ("A", "u", 2, t0 + 1_000, [2], 1, "web", None),
            ("B", "c", 3, t0 + 14_000, [3], 1, "web", None),
        ],
        schema=CDC_EVENT_SCHEMA_EVOLVED,
    )
    f0.coalesce(1).write.parquet(os.path.join(root, "f0"))
    time.sleep(1.1)
    f1.coalesce(1).write.parquet(os.path.join(root, "f1"))

    src = (
        spark.readStream.schema(CDC_EVENT_SCHEMA_EVOLVED)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(root, "f*"))
    )
    q = (
        rolling_doc_churn(src, watermark="1 second", idle_ms=5_000)
        .writeStream.format("memory")
        .queryName("mono")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    rows = spark.sql("SELECT * FROM mono ORDER BY doc_id, n_events").collect()
    a_updates = [r for r in rows if r["doc_id"] == "A" and not r["evicted"]]
    # last_ts_ms never regresses to the older event's ts
    assert a_updates[-1]["last_ts_ms"] == t0 + 10_000
    # watermark (~t0+13_000) passed t0+1_000+idle but not t0+10_000+idle:
    # A must NOT have been evicted
    assert not any(r["doc_id"] == "A" and r["evicted"] for r in rows)
