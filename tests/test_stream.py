"""Streaming tail: availableNow replay over the delivery files must reach
oracle state; a restart from checkpoint must be exactly-once (no
double-apply of batches that committed before the 'crash')."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.cdc.apply import final_state_oracle, read_full_log, read_state
from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log
from ton_etl_spark.cdc.stream import run_stream_to_completion, start_cdc_stream
from ton_etl_spark.lake.table import LakeTable

N = 3000


@pytest.fixture(scope="module")
def stream_log(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("slog"))
    log = generate_cdc_log(spark, N, seed=11)
    write_cdc_log(log, root, n_batches=6, dup_pct=10, seed=11)
    return root


def _rows(df):
    return sorted([tuple(r) for r in df.collect()])


def test_stream_reaches_oracle(spark, stream_log, tmp_path):
    glob_path = os.path.join(stream_log, "phase=*/__seq=*")
    table = run_stream_to_completion(
        spark,
        glob_path,
        str(tmp_path / "tbl"),
        str(tmp_path / "ckpt"),
        lineage_root=str(tmp_path / "lin"),
        max_files_per_trigger=3,
    )
    got = _rows(read_state(table))
    want = _rows(final_state_oracle(read_full_log(spark, stream_log)))
    assert got == want and len(got) > 0


def test_stream_restart_from_checkpoint(spark, stream_log, tmp_path):
    """Process part of the log, stop, restart with the same checkpoint:
    already-committed epochs must not re-apply; final state == oracle."""
    glob_path = os.path.join(stream_log, "phase=*/__seq=*")
    tbl_root, ckpt = str(tmp_path / "tbl2"), str(tmp_path / "ckpt2")

    q = start_cdc_stream(spark, glob_path, tbl_root, ckpt, max_files_per_trigger=1)
    # let some batches commit, then stop mid-stream ("crash")
    import time

    deadline = time.time() + 120
    while time.time() < deadline:
        if LakeTable.exists(tbl_root) and LakeTable.load(spark, tbl_root).current_version() >= 2:
            break
        time.sleep(0.5)
    q.stop()
    v_crash = LakeTable.load(spark, tbl_root).current_version()
    assert v_crash >= 2

    table = run_stream_to_completion(spark, glob_path, tbl_root, ckpt, max_files_per_trigger=1)
    # every epoch applied exactly once: the recent-key record is unique
    keys = table.current().recent_commit_keys
    assert len(keys) == len(set(keys))
    got = _rows(read_state(table))
    want = _rows(final_state_oracle(read_full_log(spark, stream_log)))
    assert got == want


def test_stream_observed_delivery_metrics(spark, tmp_path):
    """observe() metrics ride the source scan: per-micro-batch delivered
    event counts and lsn bounds appear in the streaming progress (SURVEY A9,
    the reference's messages/sec consumer counters)."""
    from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log
    from ton_etl_spark.cdc.stream import start_cdc_stream

    log_dir = str(tmp_path / "olog")
    log = generate_cdc_log(spark, 2000, seed=27)
    write_cdc_log(log, log_dir, n_batches=2, dup_pct=10, seed=27)
    q = start_cdc_stream(
        spark,
        log_glob=os.path.join(log_dir, "phase=*/__seq=*"),
        table_root=str(tmp_path / "otbl"),
        checkpoint_dir=str(tmp_path / "ockpt"),
        max_files_per_trigger=8,
    )
    q.awaitTermination(300)
    observed = [
        p["observedMetrics"]["delivery"]
        for p in (q.recentProgress or [])
        if p.get("observedMetrics", {}).get("delivery")
    ]
    assert observed, "no observed metrics in progress"
    total = sum(m["events"] for m in observed)
    assert total >= 2000  # duplicates included
    assert min(m["min_lsn"] for m in observed) == 0
    assert max(m["max_lsn"] for m in observed) == 1999
