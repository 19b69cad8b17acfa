"""Metrics drain: every micro-batch's progress (input rows, durations,
observed delivery counters) lands as a row in a queryable LakeTable via a
StreamingQueryListener, survives a stream restart, and feeds the
dashboard queries (ingest rate, batch-duration percentiles) — the
prometheus_exporter parity surface (reference
prometheus_exporter/main.py:88-106)."""

import os

from pyspark.sql import functions as F

from ton_etl_spark.cdc.apply import read_full_log
from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log
from ton_etl_spark.cdc.stream import run_stream_to_completion
from ton_etl_spark.streaming.observability import (
    attach_metrics_recorder,
    batch_duration_percentiles,
    detach_metrics_recorder,
    ingest_rate_windows,
    make_metrics_table,
)


def test_metrics_recorder_drains_progress_and_survives_restart(spark, tmp_path):
    log_dir = str(tmp_path / "mlog1")
    log = generate_cdc_log(spark, 2000, seed=33)
    write_cdc_log(log, log_dir, n_batches=4, dup_pct=10, seed=33)
    # glob spans sibling dirs so the restart below can deliver NEW files
    glob_path = os.path.join(str(tmp_path), "mlog*", "phase=*", "__seq=*")
    metrics_root = str(tmp_path / "metrics")

    def _rows_by_batch(timeout=60.0, want_input_total=None):
        # listener delivery is asynchronous (rows can land after
        # awaitTermination) — poll until the totals converge
        import time

        deadline = time.time() + timeout
        rows = {}
        while time.time() < deadline:
            m = make_metrics_table(spark, metrics_root).read()
            rows = {(r["run_id"], r["batch_id"]): r for r in m.collect()}
            total = sum(r["num_input_rows"] for r in rows.values())
            if want_input_total is not None and total >= want_input_total:
                break
            time.sleep(0.5)
        return rows

    rec = attach_metrics_recorder(spark, metrics_root)
    try:
        run_stream_to_completion(
            spark, glob_path, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
            max_files_per_trigger=4,
        )
        delivered = read_full_log(spark, log_dir).count()
        rows = _rows_by_batch(want_input_total=delivered)
        assert not rec.errors, rec.errors
        assert {b for _, b in rows} >= {0, 1, 2, 3}  # one row per applied epoch
        # the stream persists each micro-batch, so the trigger's counters
        # are exact (one execution pass) and must equal the delivered log
        assert sum(r["num_input_rows"] for r in rows.values()) == delivered
        assert sum(r["events"] for r in rows.values() if r["events"]) == delivered
        assert all(
            r["num_input_rows"] > 0 and r["trigger_ms"] > 0
            for r in rows.values()
        )
        lsn_max = read_full_log(spark, log_dir).agg(F.max("lsn")).first()[0]
        assert max(r["max_lsn"] for r in rows.values() if r["max_lsn"] is not None) == lsn_max
        n_first_run = len(rows)

        # restart the SAME checkpoint with new files: old rows survive, the
        # new run's batches append under its own run_id
        delivered2 = 500  # dup_pct=0 below
        write_cdc_log(
            generate_cdc_log(spark, 500, seed=34), str(tmp_path / "mlog2"),
            n_batches=1, dup_pct=0, seed=34,
        )
        run_stream_to_completion(
            spark, glob_path, str(tmp_path / "tbl"), str(tmp_path / "ckpt"),
            max_files_per_trigger=4,
        )
        rows2 = _rows_by_batch(want_input_total=delivered + delivered2)
        assert not rec.errors, rec.errors
        assert sum(r["num_input_rows"] for r in rows2.values()) == delivered + delivered2
        assert len(rows2) > n_first_run
        assert len({run for run, _ in rows2}) == 2
        # first run's rows are untouched by the restart
        assert all(k in rows2 for k in rows)
        m2 = make_metrics_table(spark, metrics_root).read()

        # dashboard queries over the metrics table
        rate = ingest_rate_windows(m2, window_sec=3600).collect()
        assert len(rate) >= 1
        assert (
            sum(r["events_total"] for r in rate)
            == m2.agg(F.sum("num_input_rows")).first()[0]
        )
        assert all(r["events_per_sec"] > 0 for r in rate)
        lat = batch_duration_percentiles(m2, window_sec=3600).collect()
        assert len(lat) >= 1
        assert all(r["p50"] > 0 and r["p95"] >= r["p50"] for r in lat)
    finally:
        detach_metrics_recorder(spark, rec)


def test_wait_for_and_drain_do_not_burn_timeout(spark, tmp_path):
    """drain() needs no expected count — it returns at quiescence,
    including the zero-row case — and wait_for returns promptly once the
    rows are there, with recorded errors neither blocking a satisfied wait
    nor aborting an unsatisfied one (one recorder serves every query on
    the session, so stream A's old error must not fail a wait for stream
    B's rows)."""
    import time

    rec = attach_metrics_recorder(spark, str(tmp_path / "m0"))
    try:
        t0 = time.time()
        assert rec.drain(idle=0.3, timeout=30.0) == 0  # nothing ever fired
        assert time.time() - t0 < 5.0  # quiesced, did not burn the timeout
        rec.errors.append(RuntimeError("stream A append failed"))
        rec.rows_written = 3
        t0 = time.time()
        assert rec.wait_for(3, timeout=30.0) is True  # error does not gate
        assert time.time() - t0 < 5.0
        assert rec.wait_for(4, timeout=0.5) is False  # timeout, not abort
    finally:
        detach_metrics_recorder(spark, rec)


def test_batch_duration_windows_key_off_batch_end(spark, tmp_path):
    """StreamingQueryProgress.timestamp is the TRIGGER START; a batch that
    starts at 00:59:40 and runs 30 s belongs to the 01:00 window (its end),
    and its reported delay is the trigger duration."""
    m = make_metrics_table(spark, str(tmp_path / "mend"))
    rows = [
        # (query, run, batch, start_ts, input, trigger_ms, add_batch, ev, lo, hi)
        ("q", "r", 0, "2026-01-01T00:59:40.000Z", 10, 30_000, 1000, None, None, None),
        ("q", "r", 1, "2026-01-01T00:10:00.000Z", 10, 5_000, 1000, None, None, None),
    ]
    m.append(spark.createDataFrame(rows, m.current().schema), commit_key="seed")
    got = {
        r["window_start"].strftime("%H:%M"): r
        for r in batch_duration_percentiles(m.read(), window_sec=3600).collect()
    }
    # batch 0 ends at 01:00:10 -> the 01:00 window, NOT the 00:00 one
    assert set(got) == {"01:00", "00:00"}
    assert got["01:00"]["p50"] == 30.0
    assert got["00:00"]["p50"] == 5.0


def test_metrics_recorder_retention_bounds_table(spark, tmp_path):
    """Round-6: the metrics LakeTable inside an unbounded stream is swept
    by wall-clock horizon — old rows age out, snapshots expire, file count
    stays O(buckets) over a long synthetic run."""
    import datetime as dt

    from ton_etl_spark.streaming.observability import MetricsRecorder

    rec = MetricsRecorder(
        spark, str(tmp_path / "mret"), retain_seconds=3600.0,
        retention_every=10, keep_last_snapshots=2,
        retention_grace_seconds=0.0,
    )
    now = dt.datetime.now(dt.timezone.utc)

    def _iso(t):
        return t.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"

    for i in range(30):
        # first 20 rows are 2h stale, the rest current
        ts = now - dt.timedelta(hours=2) if i < 20 else now
        rec._record({
            "id": "q1", "runId": "r1", "batchId": i,
            "timestamp": _iso(ts), "numInputRows": 1,
            "durationMs": {"triggerExecution": 5, "addBatch": 3},
            "observedMetrics": {},
        })
    assert rec.rows_written == 30 and not rec.errors
    rows = rec.table.read().select("batch_id").collect()
    got = sorted(r["batch_id"] for r in rows)
    assert got == list(range(20, 30))  # stale rows swept, current kept
    assert len(rec.table.current().files) <= 4  # 2 buckets, post-sweep
    snaps = [f for f in os.listdir(os.path.join(rec.table.root, "_meta"))
             if f.startswith("v") and f.endswith(".json")]
    assert len(snaps) <= 3
    # replay keys survive retention: re-recording an old batch is a no-op
    before = rec.table.current_version()
    rec._record({
        "id": "q1", "runId": "r1", "batchId": 29,
        "timestamp": _iso(now), "numInputRows": 1,
        "durationMs": {}, "observedMetrics": {},
    })
    assert rec.table.current_version() == before
