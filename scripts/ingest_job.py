#!/usr/bin/env python
"""Standalone CDC ingest job for the scaling benchmark.

Submitted via ``spark-submit --py-files ton_etl_spark.zip scripts/ingest_job.py
<master> <log_dir> <table_dir> <n_buckets>`` — the identical job run at two
parallelism levels (local[8] vs local[32]) on the SAME pre-written input, the
sandbox substitution for the N→4N-executor scaling criterion.

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
    spark = (
        SparkSession.builder.appName(f"ingest_scaling_{cores}")
        .master(master)
        .config("spark.sql.shuffle.partitions", cores if cores.isdigit() else "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
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

    events = 0
    t0 = time.perf_counter()
    for epoch, d in enumerate(batch_dirs):
        batch = spark.read.parquet(d)
        apply_cdc_batch(table, batch, epoch=epoch)
    final_rows = read_state(table).count()
    elapsed = time.perf_counter() - t0

    # count delivered events from lineage-free source listing (cheap scan)
    events = spark.read.parquet(*batch_dirs).count()
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
