#!/usr/bin/env python
"""A/B measurement for the round-7 connected-components changes, on the
standing ``dup_clusters_graph`` bench graph (600k pseudo-random edges over
200k nodes + a 5k chain forcing full alternation depth — bench.py's
``run_cc_graph`` shape).

Three arms, interleaved to ride out host CPU-delivery swings (BENCH.md):

  pre_fold   — the round-6 implementation (eager localCheckpoint, then the
               convergence checksum as a SECOND action per round), imported
               verbatim from git history so the A/B compares real code, not
               a reconstruction.
  folded     — HEAD default: lazy localCheckpoint materialized by the
               round's checksum — one Spark job per round.
  reliable   — HEAD with ``checkpoint_dir=`` (persist + reliable
               checkpoint): the cluster fault-tolerance trade.

Per arm: wall time, Spark job count (statusTracker, AQE off so the count
is deterministic), and the output checksum — identical outputs are part
of the measurement's claim.  Appends a JSON line; the curated numbers
live in BENCH.md.

Usage: python scripts/cc_checkpoint_bench.py [--repeats 3]
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRE_FOLD_REV = "dab40f7"  # last round-6 tree, before the checksum fold


def _load_pre_fold(tmp: str):
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{PRE_FOLD_REV}:ton_etl_spark/operators/graph.py"],
        check=True, capture_output=True, text=True,
    ).stdout
    path = os.path.join(tmp, "graph_pre_fold.py")
    with open(path, "w") as fh:
        fh.write(src)
    spec = importlib.util.spec_from_file_location("graph_pre_fold", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _bench_edges(spark, workdir: str):
    from pyspark.sql import functions as F

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
    return spark.read.parquet(path)


def _run_arm(spark, edges, fn, kwargs, group: str) -> dict:
    from pyspark.sql import functions as F

    sc = spark.sparkContext
    sc.setJobGroup(group, group, True)
    t0 = time.perf_counter()
    out = fn(edges, **kwargs)
    sig = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64("id", "component")).alias("h"),
    ).first()
    wall = time.perf_counter() - t0
    jobs = len(sc.statusTracker().getJobIdsForGroup(group))
    sc.setJobGroup("", "")
    return {"wall_sec": round(wall, 3), "jobs": jobs,
            "out": [int(sig["n"]), int(sig["h"])]}


def main() -> None:
    repeats = 3
    if "--repeats" in sys.argv:
        repeats = int(sys.argv[sys.argv.index("--repeats") + 1])

    from ton_etl_spark.operators.graph import connected_components
    from ton_etl_spark.session import get_spark

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name="cc_ab", master="local[32]",
        extra_conf={
            # deterministic job counts for the A/B (mirrors the pytest gate)
            "spark.sql.adaptive.enabled": "false",
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )
    results: dict[str, list[dict]] = {"pre_fold": [], "folded": [], "reliable": []}
    with tempfile.TemporaryDirectory(prefix="cc_ab_", dir="/dev/shm") as wd:
        pre = _load_pre_fold(wd)
        edges = _bench_edges(spark, wd)
        edges.count()  # warm the scan
        arms = [
            ("pre_fold", pre.connected_components, {}),
            ("folded", connected_components, {}),
            ("reliable", connected_components,
             {"checkpoint_dir": os.path.join(wd, "ckpt")}),
        ]
        for rep in range(repeats):  # interleaved: host regime hits all arms
            for name, fn, kw in arms:
                results[name].append(
                    _run_arm(spark, edges, fn, dict(kw), f"{name}-{rep}"))
    outs = {tuple(r["out"]) for rs in results.values() for r in rs}
    best = {k: min(r["wall_sec"] for r in v) for k, v in results.items()}
    jobs = {k: v[0]["jobs"] for k, v in results.items()}
    summary = {
        "bench": "cc_checkpoint_ab", "graph": "dup_clusters_graph shape",
        "repeats": repeats, "identical_outputs": len(outs) == 1,
        "best_wall_sec": best, "jobs_per_run": jobs,
        "fold_wall_cut_pct": round(
            100 * (best["pre_fold"] - best["folded"]) / best["pre_fold"], 1),
        "reliable_overhead_pct": round(
            100 * (best["reliable"] - best["folded"]) / best["folded"], 1),
        "runs": results,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
