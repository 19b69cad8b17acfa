#!/usr/bin/env python
"""Benchmark harness (driver contract).

Default: runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the CDC ingest
benchmark (change-events/sec applied end-to-end into a lake table — the
BASELINE.json primary metric), and prints ONE JSON line.

``--scaling``: runs the identical ingest job via spark-submit --py-files at
local[8] and local[32] on the same input and reports throughput at both plus
scaling efficiency = (ev/s@32 / ev/s@8) / 4 (the sandbox substitution for
the N→4N executor criterion) — results appended to BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",
    "cdc_lww_snapshot",
    "asof_prev_view",
    "top_parts_by_revenue",
    "hourly_windows",
    "purchases_with_recent_views",
    "doc_token_stats",
    "exact_dedup_docs",
    "minhash_near_dups",
    "embedding_topk",
    "pack_chunks",
    "segment_dedup",
    "pii_redaction",
    "dup_clusters",
    "dup_clusters_capped",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "8000000"))
BENCH_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_BATCHES", "2"))

# measured local-mode tunings (BENCH.md): shuffle store is tmpfs, so shuffle
# compression is pure CPU overhead; 32 MB splits smooth straggler tails
BENCH_CONF = {
    "spark.shuffle.compress": "false",
    "spark.shuffle.spill.compress": "false",
    "spark.sql.files.maxPartitionBytes": "32m",
    "spark.local.dir": os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
}


def _sf_label(path: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else 0.0


def run_headline(spark) -> dict[str, float]:
    from ton_etl_spark.plans.queries import QUERIES

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, SF_DIR)
        n = df.count()
        times[name] = round(time.perf_counter() - t0, 3)
    return times


def run_cc_graph(spark, workdir: str) -> float:
    """Standing connected-components benchmark (round 6).  The sf0.1
    ``dup_clusters`` reading is orchestration-dominated at bench scale
    (BENCH.md round-5 analysis: Catalyst planning + per-round
    localCheckpoint overhead, not data work), so CC regressions are
    measured here instead: 600k deterministic pseudo-random edges over
    200k nodes (xxhash64-derived — no RNG, identical every run) plus a
    5k-long chain that forces the full O(log n) large-star/small-star
    alternation depth.  Edge generation is untimed (materialised to tmpfs
    parquet and read back) so the timed region is pure CC work."""
    from pyspark.sql import functions as F

    from ton_etl_spark.operators.graph import connected_components

    n_nodes, n_rand, chain_len = 200_000, 600_000, 5_000
    path = os.path.join(workdir, "cc_edges")
    rand = spark.range(n_rand).select(
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("id_a"),
        F.pmod(F.xxhash64(F.col("id") + 1_000_000_007), F.lit(n_nodes)).alias("id_b"),
    )
    chain = spark.range(chain_len).select(
        (F.col("id") + n_nodes).alias("id_a"),
        (F.col("id") + n_nodes + 1).alias("id_b"),
    )
    rand.unionByName(chain).coalesce(8).write.mode("overwrite").parquet(path)
    edges = spark.read.parquet(path)
    t0 = time.perf_counter()
    connected_components(edges).count()
    return round(time.perf_counter() - t0, 3)


def run_ingest(spark, n_events: int, n_batches: int, workdir: str) -> dict:
    """The primary-metric job: generate a CDC log (not timed), then time
    end-to-end apply (validate → LWW MERGE) into a lake table.  A small
    disjoint warmup log is applied to a scratch table first (untimed) so the
    measurement is steady-state, not JVM JIT compilation."""
    from ton_etl_spark.cdc.apply import apply_cdc_batch, make_sequences_table, read_state
    from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log

    n_buckets = int(CPUS) * 4 if str(CPUS).isdigit() else 128

    wlog_dir = os.path.join(workdir, "warmup")
    wdirs = write_cdc_log(
        generate_cdc_log(spark, max(100_000, n_events // 50), seed=7),
        wlog_dir, n_batches=2, dup_pct=5, seed=7, files_per_batch=16,
    )
    scratch = make_sequences_table(spark, os.path.join(workdir, "wtable"), n_buckets=n_buckets)
    for epoch, d in enumerate(wdirs):
        apply_cdc_batch(scratch, spark.read.parquet(d), epoch=epoch)
    read_state(scratch).count()

    log_dir = os.path.join(workdir, "log")
    log = generate_cdc_log(spark, n_events, seed=42)
    batch_dirs = write_cdc_log(
        log, log_dir, n_batches=n_batches, dup_pct=5, seed=42, files_per_batch=64
    )

    table = make_sequences_table(spark, os.path.join(workdir, "table"), n_buckets=n_buckets)
    t0 = time.perf_counter()
    for epoch, d in enumerate(batch_dirs):
        batch = spark.read.parquet(d)
        apply_cdc_batch(table, batch, epoch=epoch)
    # force the final state to be consumable (count is the sink action)
    final_rows = read_state(table).count()
    elapsed = time.perf_counter() - t0
    delivered = int(n_events * 1.05)  # dup_pct=5 redelivery included
    return {
        "ingest_sec": round(elapsed, 3),
        "events_per_sec": round(delivered / elapsed, 1),
        "final_rows": final_rows,
        "n_events": delivered,
    }


def main() -> None:
    from ton_etl_spark.session import get_spark

    try:  # Firecracker lazy-snapshot mitigation (scripts/prefault.py)
        from scripts.prefault import ensure_prefaulted

        # 64 GB (not 32): the ingest job + page cache + JVM heap overshoot a
        # 32 GB prefault on a cold boot, and the overshoot pages fault at
        # ~45× cost — measured as the main source of the ~10-20% gap between
        # cold-boot (driver) and warm-VM (session) ingest numbers (BENCH.md)
        ensure_prefaulted(float(os.environ.get("SPARK_GRAFT_PREFAULT_GB", "64")))
    except Exception:
        pass

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(app_name="bench", master=f"local[{CPUS}]", extra_conf=BENCH_CONF)
    # warm the suite once (untimed): JVM JIT + python worker spawn otherwise
    # land entirely in the first timed query
    from ton_etl_spark.plans.queries import QUERIES

    QUERIES[HEADLINE[0]](spark, SF_DIR).count()
    queries = run_headline(spark)
    with tempfile.TemporaryDirectory(prefix="cdc_bench_", dir="/dev/shm") as wd:
        queries["dup_clusters_graph"] = run_cc_graph(spark, wd)
        ingest = run_ingest(spark, BENCH_EVENTS, BENCH_BATCHES, wd)
    total = round(sum(queries.values()) + ingest["ingest_sec"], 3)
    out = {
        "metric": "headline suite + CDC ingest wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        # round-over-round trend signal: the fixed 15-query HEADLINE
        # subtotal, comparable across rounds 1-5 walls; the headline
        # `value` additionally carries the r6+ dup_clusters_graph CC
        # benchmark, which those earlier walls did not include
        "comparable_subtotal_sec": round(sum(queries[n] for n in HEADLINE), 3),
        "sf": _sf_label(SF_DIR),
        "cdc_ingest": ingest,
    }
    # last recorded N→4N scaling result (produced by `bench.py --scaling`,
    # see BENCH.md for methodology)
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "SCALING.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as fh:
            out["scaling"] = json.load(fh)
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        from scripts.scaling_bench import run_scaling

        run_scaling()
    else:
        main()
