"""Structured Streaming tail of the change log.

The production analog of the reference's Kafka consumer loop
(``parser/main.py:85-143``): an unbounded source of CDC envelopes, applied
in micro-batches.  Two sources:

- ``start_cdc_stream``: file stream over already-decoded delivery parquet.
- ``start_cdc_envelope_stream``: file stream of Kafka-shaped frames
  (key/value binary + topic/partition/offset/timestamp — the exact column
  set of ``readStream.format("kafka")``) decoded by
  ``cdc.envelope.parse_cdc_envelope`` (Debezium JSON + ``__``-meta strip);
  swapping in a real broker is replacing the file source with
  ``cdc.envelope.kafka_source`` — every transformation downstream is
  identical.

The sink is the LakeTable MERGE inside ``foreachBatch``.

Exactly-once contract (reference analogs X1/X2/X6 in SURVEY.md §2.9):
Spark's checkpoint gives at-least-once ``foreachBatch`` invocations with a
stable ``batch_id``; the commit manifest key ``epoch=<batch_id>`` recorded
in the table snapshot makes re-executions no-ops — commit-then-checkpoint
ordering exactly mirrors the reference's "DB commit, then Kafka commit".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_etl_spark.cdc.apply import apply_cdc_batch, make_lineage_table, make_sequences_table
from ton_etl_spark.cdc.schema import CDC_EVENT_SCHEMA_EVOLVED
from ton_etl_spark.lake.table import LakeTable


def start_cdc_stream(
    spark: SparkSession,
    log_glob: str,
    table_root: str,
    checkpoint_dir: str,
    lineage_root: str | None = None,
    n_buckets: int = 16,
    max_files_per_trigger: int = 2,
    epoch_prefix: str = "stream",
):
    """Start (or restart from checkpoint) the streaming tail.

    ``log_glob`` is a glob over delivery parquet files, e.g.
    ``<log>/phase=*/__seq=*``.  Restart with the same ``checkpoint_dir``
    resumes from the last committed source offset; batches that were
    applied but not checkpointed replay and are skipped by manifest.
    """
    table = make_sequences_table(spark, table_root, n_buckets=n_buckets)
    lineage = make_lineage_table(spark, lineage_root) if lineage_root else None

    src = (
        spark.readStream.schema(CDC_EVENT_SCHEMA_EVOLVED)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_glob)
    )
    # free per-micro-batch delivery counters in the streaming progress
    # (SURVEY A9; the reference's "N messages/sec" consumer log line) —
    # observed metrics ride the existing scan, no extra pass
    src = src.observe(
        "delivery",
        F.count(F.lit(1)).alias("events"),
        F.min("lsn").alias("min_lsn"),
        F.max("lsn").alias("max_lsn"),
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # reload table handle each batch: snapshot pointer may have advanced
        t = LakeTable.load(spark, table_root)
        apply_cdc_batch(t, batch_df, epoch=batch_id, lineage=lineage)

    query = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query


def start_cdc_envelope_stream(
    spark: SparkSession,
    frames_glob: str,
    table_root: str,
    checkpoint_dir: str,
    lineage_root: str | None = None,
    n_buckets: int = 16,
    max_files_per_trigger: int = 2,
    table_filter: str | None = None,
):
    """Streaming tail over Kafka-SHAPED frames: decode the Debezium JSON
    envelope per micro-batch, then the same exactly-once MERGE as
    ``start_cdc_stream``.  ``from_json`` is a streamable projection, so the
    decode lives on the streaming DataFrame itself (JVM-side, codegen), not
    in foreachBatch."""
    from ton_etl_spark.cdc.envelope import KAFKA_FRAME_SCHEMA, parse_cdc_envelope

    make_sequences_table(spark, table_root, n_buckets=n_buckets)
    lineage = make_lineage_table(spark, lineage_root) if lineage_root else None

    frames = (
        spark.readStream.schema(KAFKA_FRAME_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frames_glob)
    )
    events = parse_cdc_envelope(frames, table=table_filter)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        t = LakeTable.load(spark, table_root)
        apply_cdc_batch(t, batch_df, epoch=batch_id, lineage=lineage)

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_to_completion(
    spark: SparkSession,
    log_glob: str,
    table_root: str,
    checkpoint_dir: str,
    **kw,
) -> LakeTable:
    q = start_cdc_stream(spark, log_glob, table_root, checkpoint_dir, **kw)
    q.awaitTermination()
    return LakeTable.load(spark, table_root)
