#!/usr/bin/env python
"""Two-parallelism scaling benchmark (sandbox substitution for the N→4N
executor criterion in BASELINE.json).

Pre-writes one CDC log, zips the package, then runs the IDENTICAL ingest job
via ``spark-submit --py-files`` at local[8] and local[32]; reports events/sec
at both and efficiency = (ev/s@32 ÷ ev/s@8) ÷ 4.  Results are appended to
BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import zipfile
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_EVENTS = int(os.environ.get("SPARK_GRAFT_SCALING_EVENTS", "4000000"))
N_BATCHES = int(os.environ.get("SPARK_GRAFT_SCALING_BATCHES", "4"))
MASTERS = ["local[8]", "local[32]"]


def _spark_submit() -> str:
    cand = shutil.which("spark-submit")
    if cand:
        return cand
    import pyspark

    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def _zip_package(dest: str) -> str:
    zpath = os.path.join(dest, "ton_etl_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(REPO, "ton_etl_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return zpath


def run_scaling() -> dict:
    from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log
    from ton_etl_spark.session import get_spark

    work = tempfile.mkdtemp(prefix="scaling_")
    log_dir = os.path.join(work, "log")

    spark = get_spark(app_name="scaling_gen", master="local[32]")
    log = generate_cdc_log(spark, N_EVENTS, seed=42)
    write_cdc_log(log, log_dir, n_batches=N_BATCHES, dup_pct=5, seed=42)
    spark.stop()

    zpath = _zip_package(work)
    submit = _spark_submit()
    results = {}
    for master in MASTERS:
        table_dir = os.path.join(work, f"table_{master.replace('[', '_').replace(']', '')}")
        cmd = [
            submit,
            "--master",
            master,
            "--py-files",
            zpath,
            os.path.join(REPO, "scripts", "ingest_job.py"),
            master,
            log_dir,
            table_dir,
            "32",
        ]
        out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
        line = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not line:
            raise RuntimeError(f"ingest job failed for {master}:\n{out.stderr[-4000:]}")
        results[master] = json.loads(line[-1])

    r8, r32 = results["local[8]"], results["local[32]"]
    eff = (r32["events_per_sec"] / r8["events_per_sec"]) / 4.0
    summary = {
        "n_events": r8["events"],
        "events_per_sec_local8": r8["events_per_sec"],
        "events_per_sec_local32": r32["events_per_sec"],
        "speedup_8_to_32": round(r32["events_per_sec"] / r8["events_per_sec"], 3),
        "scaling_efficiency": round(eff, 3),
        "final_rows_equal": r8["final_rows"] == r32["final_rows"],
    }
    print(json.dumps(summary))

    stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%M UTC")
    with open(os.path.join(REPO, "BENCH.md"), "a") as fh:
        fh.write(
            f"\n## Scaling run {stamp}\n\n"
            f"Identical ingest job (spark-submit --py-files, {r8['events']:,} delivered "
            f"events, {N_BATCHES} epochs) at two parallelism levels on the same input "
            f"(sandbox substitution for N vs 4N executors):\n\n"
            f"| master | events/sec | elapsed (s) | final rows |\n|---|---|---|---|\n"
            f"| local[8] | {r8['events_per_sec']:,} | {r8['elapsed_sec']} | {r8['final_rows']:,} |\n"
            f"| local[32] | {r32['events_per_sec']:,} | {r32['elapsed_sec']} | {r32['final_rows']:,} |\n\n"
            f"speedup 8→32 = {summary['speedup_8_to_32']}×, "
            f"**scaling efficiency = {summary['scaling_efficiency']}** "
            f"(gate: ≥0.8); identical final state at both levels: "
            f"{summary['final_rows_equal']}.\n"
        )
    shutil.rmtree(work, ignore_errors=True)
    return summary


if __name__ == "__main__":
    run_scaling()
