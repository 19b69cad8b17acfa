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
    "orders_with_recent_events",
    "doc_token_stats",
    "exact_dedup_docs",
    "minhash_near_dups",
    "embedding_topk",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
BENCH_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "2000000"))
BENCH_BATCHES = int(os.environ.get("SPARK_GRAFT_BENCH_BATCHES", "4"))


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


def run_ingest(spark, n_events: int, n_batches: int, workdir: str) -> dict:
    """The primary-metric job: generate a CDC log (not timed), then time
    end-to-end apply (validate → reduce → MERGE) into a lake table."""
    from ton_etl_spark.cdc.apply import apply_cdc_batch, make_sequences_table, read_state
    from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log

    log_dir = os.path.join(workdir, "log")
    log = generate_cdc_log(spark, n_events, seed=42)
    batch_dirs = write_cdc_log(log, log_dir, n_batches=n_batches, dup_pct=5, seed=42)

    table = make_sequences_table(
        spark, os.path.join(workdir, "table"), n_buckets=int(CPUS) if str(CPUS).isdigit() else 32
    )
    delivered = 0
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

        ensure_prefaulted(float(os.environ.get("SPARK_GRAFT_PREFAULT_GB", "32")))
    except Exception:
        pass

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    queries = run_headline(spark)
    with tempfile.TemporaryDirectory(prefix="cdc_bench_") as wd:
        ingest = run_ingest(spark, BENCH_EVENTS, BENCH_BATCHES, wd)
    total = round(sum(queries.values()) + ingest["ingest_sec"], 3)
    out = {
        "metric": "headline suite + CDC ingest wall time",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(SF_DIR),
        "cdc_ingest": ingest,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        from scripts.scaling_bench import run_scaling

        run_scaling()
    else:
        main()
