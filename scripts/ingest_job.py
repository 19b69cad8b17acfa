#!/usr/bin/env python
"""Standalone CDC ingest job for the scaling benchmark.

Submitted via ``spark-submit --py-files ton_etl_spark.zip scripts/ingest_job.py
<master> <log_dir> <table_dir> <n_buckets>`` — the identical job run at two
parallelism levels on the SAME pre-written input, the sandbox substitution
for the N→4N-executor scaling criterion.

Prints one JSON line: {"elapsed_sec", "events", "events_per_sec", "final_rows"}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    master, log_dir, table_dir, n_buckets = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
    )
    from pyspark.sql import SparkSession

    cores = master.replace("local[", "").replace("]", "")
    shuffle = str(4 * int(cores)) if cores.isdigit() else "64"
    spark = (
        SparkSession.builder.appName(f"ingest_scaling_{cores}")
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # measured environment tunings (see BENCH.md): snappy avoids JNI
        # codec stalls under many writers; tmpfs shuffle dirs avoid virtual-
        # disk contention; high discovery threshold keeps per-file-path
        # listings on the driver
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.local.dir", os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"))
        .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "4096")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ton_etl_spark.cdc.apply import apply_cdc_batch, make_sequences_table, read_state

    batch_dirs = sorted(
        os.path.join(log_dir, ph, sq)
        for ph in os.listdir(log_dir)
        if ph.startswith("phase=")
        for sq in os.listdir(os.path.join(log_dir, ph))
        if sq.startswith("__seq=")
    )
    table = make_sequences_table(spark, table_dir, n_buckets=n_buckets)

    t0 = time.perf_counter()
    for epoch, d in enumerate(batch_dirs):
        batch = spark.read.parquet(d)
        apply_cdc_batch(table, batch, epoch=epoch)
    final_rows = read_state(table).count()
    elapsed = time.perf_counter() - t0

    events = spark.read.parquet(*batch_dirs).count()  # not timed
    print(
        json.dumps(
            {
                "master": master,
                "elapsed_sec": round(elapsed, 3),
                "events": events,
                "events_per_sec": round(events / elapsed, 1),
                "final_rows": final_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
