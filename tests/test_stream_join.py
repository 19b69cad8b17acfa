"""Stream-stream watermarked join (J11): the streaming result must equal the
identical plan run in batch mode, across micro-batch boundaries."""

import os

from pyspark.sql import functions as F

from ton_etl_spark.streaming.joins import stream_stream_enrich

STARTS_SCHEMA = "trace_id long, start_ts timestamp, kind string"
ENDS_SCHEMA = "trace_id long, end_ts timestamp, status string"


def _mk_data(spark):
    """Deterministic trace starts/ends: ~2/3 of traces get an end within the
    join span, some end too late (outside span), some never end."""
    starts = spark.range(200).select(
        F.col("id").alias("trace_id"),
        F.timestamp_millis(F.lit(1700000000000) + F.col("id") * 1000).alias("start_ts"),
        F.concat(F.lit("k"), F.pmod("id", F.lit(3))).alias("kind"),
    )
    ends = (
        spark.range(200)
        .where(F.pmod("id", F.lit(3)) != 0)  # 1/3 never end
        .select(
            F.col("id").alias("trace_id"),
            F.timestamp_millis(
                F.lit(1700000000000)
                + F.col("id") * 1000
                # 2s delay normally; every 5th trace ends 120s late (> span)
                + F.when(F.pmod("id", F.lit(5)) == 0, 120_000).otherwise(2_000)
            ).alias("end_ts"),
            F.lit("ok").alias("status"),
        )
    )
    return starts, ends


def test_stream_stream_join_matches_batch(spark, tmp_path):
    starts, ends = _mk_data(spark)
    sdir, edir = str(tmp_path / "starts"), str(tmp_path / "ends")
    # several files per side → several micro-batches with maxFilesPerTrigger=1
    starts.repartition(4).write.parquet(sdir)
    ends.repartition(4).write.parquet(edir)

    want = sorted(
        tuple(r)
        for r in stream_stream_enrich(
            starts, ends, on="trace_id", left_ts="start_ts", right_ts="end_ts",
            watermark="600 seconds", max_span_sec=60,
        ).collect()
    )
    assert len(want) > 0
    # sanity: late enders (id%5==0) and never-enders (id%3==0) excluded
    matched_ids = {t[0] for t in want}
    assert all(i % 3 != 0 and i % 5 != 0 for i in matched_ids)

    s_stream = spark.readStream.schema(STARTS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(sdir)
    e_stream = spark.readStream.schema(ENDS_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(edir)
    # watermark wider than the data span: files arrive in arbitrary order
    # relative to event time (random repartition), so a tight watermark would
    # legitimately drop "late" rows and the comparison would depend on file
    # listing order.  600s > the 200s span keeps every row in-watermark while
    # still exercising cross-micro-batch join state + watermark plumbing.
    joined = stream_stream_enrich(
        s_stream, e_stream, on="trace_id", left_ts="start_ts", right_ts="end_ts",
        watermark="600 seconds", max_span_sec=60,
    )
    out_dir = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(tuple(r) for r in spark.read.parquet(out_dir).collect())
    assert got == want
