"""Opt-in REAL-Kafka integration test — closes the one S1 caveat the
sandbox cannot: ``kafka_source`` (cdc/envelope.py) has only ever been
exercised against KAFKA_FRAME_SCHEMA-identical file streams, because the
spark-sql-kafka connector jar and a broker do not exist here.

To run it elsewhere, set BOTH env vars and have a broker up:

    export SPARK_KAFKA_JARS=/path/to/spark-sql-kafka-0-10_2.13-4.0.0.jar,\
/path/to/kafka-clients-3.7.0.jar,\
/path/to/spark-token-provider-kafka-0-10_2.13-4.0.0.jar,\
/path/to/commons-pool2-2.12.0.jar
    export SPARK_KAFKA_BOOTSTRAP=localhost:9092

(maven coordinates: org.apache.spark:spark-sql-kafka-0-10_2.13:<spark
version> plus its transitive kafka-clients/token-provider/commons-pool2;
or pass the single org.apache.spark:spark-sql-kafka-0-10 package via
--packages and point SPARK_KAFKA_JARS at the resolved jars).

The test round-trips the engine's OWN wire format through the broker:
encode a CDC log with ``to_kafka_frames`` → produce with Spark's batch
Kafka sink → tail with ``kafka_source`` → ``parse_cdc_envelope`` →
exactly-once MERGE — and asserts the final table state equals the
file-stream twin's oracle.  Skips cleanly when the env vars are absent."""

import os
import uuid

import pytest

KAFKA_JARS = os.environ.get("SPARK_KAFKA_JARS", "")
KAFKA_BOOTSTRAP = os.environ.get("SPARK_KAFKA_BOOTSTRAP", "")

pytestmark = pytest.mark.skipif(
    not (KAFKA_JARS and KAFKA_BOOTSTRAP),
    reason=(
        "real-Kafka integration is opt-in: set SPARK_KAFKA_JARS (connector "
        "jar paths) and SPARK_KAFKA_BOOTSTRAP (broker) — see module docstring "
        "for the exact coordinates"
    ),
)


@pytest.fixture(scope="module")
def kafka_spark():
    # a dedicated session: connector jars cannot be added to a live JVM
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-integration")
        .config("spark.jars", KAFKA_JARS)
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def test_kafka_source_roundtrip_reaches_oracle(kafka_spark, tmp_path):
    from pyspark.sql import functions as F

    from ton_etl_spark.cdc.apply import (
        apply_cdc_batch,
        final_state_oracle,
        make_sequences_table,
        read_state,
    )
    from ton_etl_spark.cdc.envelope import kafka_source, parse_cdc_envelope, to_kafka_frames
    from ton_etl_spark.cdc.generator import generate_cdc_log
    from ton_etl_spark.lake.table import LakeTable

    spark = kafka_spark
    topic = f"cdc.it.{uuid.uuid4().hex[:8]}"
    log = generate_cdc_log(spark, 2000, seed=21)

    # produce: the engine's encode twin through Spark's batch Kafka sink
    (
        to_kafka_frames(log, topic=topic)
        .select("key", "value", "topic")
        .write.format("kafka")
        .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
        .save()
    )

    # consume: the REAL kafka_source → envelope decode → exactly-once merge
    table_root = str(tmp_path / "ktbl")
    make_sequences_table(spark, table_root, n_buckets=8)
    events = parse_cdc_envelope(kafka_source(spark, KAFKA_BOOTSTRAP, topic))

    def _apply(batch_df, batch_id):
        batch_df.persist()
        try:
            apply_cdc_batch(LakeTable.load(spark, table_root), batch_df, epoch=batch_id)
        finally:
            batch_df.unpersist()

    q = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(tmp_path / "kckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    t = LakeTable.load(spark, table_root)
    got = sorted(tuple(r) for r in read_state(t).collect())
    want = sorted(tuple(r) for r in final_state_oracle(log).collect())
    assert got == want and len(got) > 0

    # restart from the same checkpoint with no new messages: exactly-once —
    # no epoch re-applies, state unchanged
    v = t.current_version()
    q2 = (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(tmp_path / "kckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    t2 = LakeTable.load(spark, table_root)
    assert t2.current_version() == v
    assert sorted(tuple(r) for r in read_state(t2).collect()) == want
