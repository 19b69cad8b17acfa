#!/usr/bin/env python
"""Standalone CDC ingest job for the scaling benchmark.

Submitted via ``spark-submit --py-files ton_etl_spark.zip scripts/ingest_job.py
<master> <log_dir> <table_dir> <n_buckets> [warmup_dir]`` — the identical job
run at two parallelism levels on the SAME pre-written input, the sandbox
substitution for the N→4N-executor scaling criterion.

Measures STEADY-STATE throughput: when ``warmup_dir`` is given, one warmup
epoch is applied to a throwaway table first (untimed) so JVM JIT compilation
of the whole codepath (parquet scan → Arrow validate → two-stage reduce →
merge join → bucketed write) happens before the clock starts.  A fresh local
JVM spends ~4-5 s single-threaded in C2 compilation — a constant that at
10^10-event scale is irrelevant but at benchmark scale would be charged
equally to both parallelism levels and mask the real scaling (Amdahl).

Prints one JSON line: {"elapsed_sec", "events", "events_per_sec", "final_rows"}.
"""

from __future__ import annotations

import json
import os
import sys
import time


def list_batch_dirs(log_dir: str) -> list[str]:
    return sorted(
        os.path.join(log_dir, ph, sq)
        for ph in os.listdir(log_dir)
        if ph.startswith("phase=")
        for sq in os.listdir(os.path.join(log_dir, ph))
        if sq.startswith("__seq=")
    )


def main() -> None:
    master, log_dir, table_dir, n_buckets = (
        sys.argv[1],
        sys.argv[2],
        sys.argv[3],
        int(sys.argv[4]),
    )
    warmup_dir = sys.argv[5] if len(sys.argv) > 5 else None
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
        # shuffle store is tmpfs (RAM): compressing shuffle blocks only adds
        # CPU + memcpy (measured -14% at 16 cores with it off); a network
        # cluster would keep these true
        .config("spark.shuffle.compress", "false")
        .config("spark.shuffle.spill.compress", "false")
        # ~32 MB input splits: 4× finer task granularity than the 128 MB
        # default evens out straggler tails at high parallelism (measured
        # best wall time at 16 cores; the default packed 64 delivery files
        # into ~32 splits → 2 waves with a long tail)
        .config("spark.sql.files.maxPartitionBytes", "32m")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from ton_etl_spark.cdc.apply import apply_cdc_batch, make_sequences_table, read_state

    if warmup_dir:
        scratch = table_dir + "_warmup"
        wtable = make_sequences_table(spark, scratch, n_buckets=n_buckets)
        for epoch, d in enumerate(list_batch_dirs(warmup_dir)):
            apply_cdc_batch(wtable, spark.read.parquet(d), epoch=epoch)
        read_state(wtable).count()
        wtable.drop()

    batch_dirs = list_batch_dirs(log_dir)
    table = make_sequences_table(spark, table_dir, n_buckets=n_buckets)

    t0 = time.perf_counter()
    for epoch, d in enumerate(batch_dirs):
        te = time.perf_counter()
        batch = spark.read.parquet(d)
        apply_cdc_batch(table, batch, epoch=epoch)
        print(f"@@timing epoch{epoch} {time.perf_counter() - te:.2f}s", flush=True)
    tc = time.perf_counter()
    final_rows = read_state(table).count()
    print(f"@@timing final_count {time.perf_counter() - tc:.2f}s", flush=True)
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
