#!/usr/bin/env python
"""Round-8 optimization micro-benchmarks (guide §1.4 noop-sink isolation).

NOT part of the driver contract — ``bench.py`` is the frozen measurement.
This file reproduces the per-stage numbers cited in OPTIMIZATION_r08.md:
each target is timed with the noop sink (computation, not sink) or an
explicit count, warm (the last of N repeats), in one session, at
``$SPARK_GRAFT_SF_DIR`` (default sf1.0 — the scale the round optimized).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
REPEATS = int(os.environ.get("SPARK_GRAFT_EXTRA_REPEATS", "3"))


def _timed(fn, n=REPEATS):
    el = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        el = time.perf_counter() - t0
    return round(el, 3)


def main() -> None:
    from pyspark.sql import functions as F

    from ton_etl_spark.session import get_spark

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = get_spark(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        extra_conf={
            "spark.shuffle.compress": "false",
            "spark.shuffle.spill.compress": "false",
            "spark.sql.files.maxPartitionBytes": "32m",
            "spark.local.dir": "/dev/shm/spark-local",
        },
    )
    out: dict = {"sf_dir": SF_DIR, "repeats": REPEATS, "note": "warm = last repeat"}

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    from ton_etl_spark.plans.queries import QUERIES

    # warm the session once
    QUERIES["pricing_summary"](spark, SF_DIR).count()

    # 1. connected components on the bench.py CC graph shape
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    with tempfile.TemporaryDirectory(prefix="bx_cc_", dir="/dev/shm") as wd:
        times = [bench.run_cc_graph(spark, wd) for _ in range(REPEATS)]
    out["cc_graph_605k_edges_sec"] = times

    # 2. embedding near-dup pairs (uncapped / capped), warm
    from ton_etl_spark.operators.dedup import embedding_near_dups
    from ton_etl_spark.plans.queries import (
        _EMB_BUCKET_CAP,
        _EMB_DIM,
        _EMB_MINCOS,
        _EMB_PLANES,
        _EMB_SEED,
        _EMB_TABLES,
        load_table,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    kw = dict(
        dim=_EMB_DIM, min_cosine=_EMB_MINCOS, n_planes=_EMB_PLANES,
        n_tables=_EMB_TABLES, seed=_EMB_SEED,
    )
    out["embedding_pairs_uncapped_sec"] = _timed(
        lambda: noop(embedding_near_dups(emb, **kw))
    )
    out["embedding_pairs_capped_sec"] = _timed(
        lambda: noop(embedding_near_dups(emb, max_bucket_size=_EMB_BUCKET_CAP, **kw))
    )

    # 3. minhash signatures + full pairs, warm
    from ton_etl_spark.operators.dedup import minhash_lsh_pairs, minhash_signatures

    docs = load_table(spark, SF_DIR, "documents")
    out["minhash_signatures_sec"] = _timed(
        lambda: noop(minhash_signatures(docs.select("doc_id", "text")))
    )
    out["minhash_pairs_sec"] = _timed(
        lambda: noop(minhash_lsh_pairs(docs, min_jaccard_est=0.4))
    )

    # 4. segment_dedup / lww snapshot / pack_chunks warm query bodies
    for q in ["segment_dedup", "cdc_lww_snapshot", "pack_chunks", "exact_dedup_docs"]:
        out[f"{q}_warm_sec"] = _timed(lambda q=q: QUERIES[q](spark, SF_DIR).count())

    print(json.dumps(out))


if __name__ == "__main__":
    main()
