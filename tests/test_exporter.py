"""Prometheus exporter parity: reference gauge math, exposition format, HTTP.

Reference twin semantics under test (prometheus_exporter/gauges/performance/
performance.py): eviction at max_event_ts - interval*factor, percentile =
sorted[int((n-1)*f)], average = round(sum/len), TPS = sum(tx_count)/interval.
"""

import urllib.request

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.streaming.exporter import (
    GaugeRegistry,
    index_percentiles,
    rolling_delay_gauges,
    rolling_tps_gauge,
    start_metrics_server,
    update_delivery_gauges,
    update_performance_gauges,
)


def _ref_percentile(sorted_data, fraction):
    # performance.py:152-157
    if not sorted_data:
        return None
    return sorted_data[int((len(sorted_data) - 1) * fraction)]


def _ref_delay_metrics(delays):
    # performance.py:131-143
    s = sorted(delays)
    return {
        "average": round(sum(s) / len(s)),
        "p50": _ref_percentile(s, 0.5),
        "p75": _ref_percentile(s, 0.75),
        "p95": _ref_percentile(s, 0.95),
        "tx_count": len(s),
    }


# ---------------------------------------------------------------- registry


def test_render_escapes_and_sorts():
    reg = GaugeRegistry()
    reg.describe("g_one", 'help with "quotes" and \\slash\nnewline')
    reg.set("g_one", {"col": 'va"l\\ue\n'}, 1.5)
    reg.set("g_one", None, 3)
    reg.set("g_zero", {"a": "1", "b": "2"}, float("inf"))
    text = reg.render()
    lines = text.splitlines()
    assert lines[0] == '# HELP g_one help with "quotes" and \\\\slash\\nnewline'
    assert lines[1] == "# TYPE g_one gauge"
    assert lines[2] == "g_one 3"  # unlabeled sorts before labeled
    assert lines[3] == 'g_one{col="va\\"l\\\\ue\\n"} 1.5'
    assert lines[4] == "# TYPE g_zero gauge"
    assert lines[5] == 'g_zero{a="1",b="2"} +Inf'
    assert text.endswith("\n")


def test_clear_drops_stale_series():
    reg = GaugeRegistry()
    reg.set("g", {"col": "old"}, 1)
    reg.clear("g")
    reg.set("g", {"col": "new"}, 2)
    assert 'col="old"' not in reg.render()
    assert reg.get("g", {"col": "new"}) == 2
    assert reg.get("g", {"col": "old"}) is None


# ---------------------------------------------------- percentiles / gauges


@pytest.mark.parametrize("n", [1, 2, 5, 19, 20, 100])
def test_index_percentiles_match_reference(spark, n):
    import random

    rnd = random.Random(42 + n)
    vals = [rnd.randint(0, 1000) for _ in range(n)]
    df = spark.createDataFrame([(v,) for v in vals], "delay long")
    row = index_percentiles(df, "delay", [0.5, 0.75, 0.95]).collect()[0]
    s = sorted(vals)
    assert row["p_0_5"] == _ref_percentile(s, 0.5)
    assert row["p_0_75"] == _ref_percentile(s, 0.75)
    assert row["p_0_95"] == _ref_percentile(s, 0.95)


def test_index_percentiles_grouped(spark):
    rows = [("a", v) for v in [5, 1, 9, 3]] + [("b", v) for v in [10, 20]]
    df = spark.createDataFrame(rows, "cls string, delay long")
    got = {r["cls"]: r for r in index_percentiles(df, "delay", [0.5], ["cls"]).collect()}
    assert got["a"]["p_0_5"] == _ref_percentile(sorted([5, 1, 9, 3]), 0.5)
    assert got["b"]["p_0_5"] == _ref_percentile(sorted([10, 20]), 0.5)


def test_rolling_delay_gauges_match_reference_twin(spark):
    # ts spread so the eviction threshold (max_ts - interval*factor) bites
    rows = []
    for i in range(50):
        rows.append(("p2p", 1000 + i * 10, float(i % 7) * 3 + 1))
    df = spark.createDataFrame(rows, "cls string, ts long, delay double")
    interval, factor = 200, 2
    max_ts = 1000 + 49 * 10
    kept = [d for (_, t, d) in rows if t >= max_ts - interval * factor]
    ref = _ref_delay_metrics(kept)
    out = {
        r["col"]: r["value"]
        for r in rolling_delay_gauges(
            df, "delay", "ts", "cls", interval_sec=interval, interval_factor=factor
        )
    }
    assert out["tx_count"] == ref["tx_count"] and ref["tx_count"] < len(rows)
    assert out["average"] == float(ref["average"])
    assert out["p50"] == ref["p50"]
    assert out["p75"] == ref["p75"]
    assert out["p95"] == ref["p95"]


def test_rolling_tps_matches_reference(spark):
    # tps.py:47-56 — sum(tx_count)/interval over the surviving block window
    rows = [(100 + i, 10 + i) for i in range(20)]
    df = spark.createDataFrame(rows, "gen_utime long, tx_count long")
    interval = 5
    max_ts = 119
    ref = sum(c for (t, c) in rows if t >= max_ts - interval) / interval
    assert rolling_tps_gauge(df, interval_sec=interval) == ref
    assert rolling_tps_gauge(df.where(F.lit(False)), interval_sec=interval) is None


def test_update_performance_gauges_labels(spark):
    rows = [("p2p", 100, 5.0), ("p2p", 101, 7.0), ("jetton", 102, 9.0)]
    df = spark.createDataFrame(rows, "cls string, ts long, delay double")
    reg = GaugeRegistry()
    n = update_performance_gauges(
        reg, df, "ton_etl_common_operations", "ops", class_col="cls",
        delay_col="delay", ts_col="ts", interval_sec=1000,
    )
    assert n == 10  # 2 classes x 5 stats
    assert reg.get("ton_etl_common_operations", {"col": "tx_count", "class": "p2p"}) == 2.0
    assert reg.get("ton_etl_common_operations", {"col": "p95", "class": "jetton"}) == 9.0
    text = reg.render()
    assert '# HELP ton_etl_common_operations ops' in text
    assert 'ton_etl_common_operations{class="p2p",col="p50"}' in text


# ------------------------------------------------------------------- http


def test_http_metrics_roundtrip():
    reg = GaugeRegistry()
    reg.set("up", None, 1)
    srv, port = start_metrics_server(reg)
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            assert r.status == 200
            assert "version=0.0.4" in r.headers["Content-Type"]
            body = r.read().decode()
        assert "up 1" in body
        # registry updates are visible on the next scrape without restart
        reg.set("up", None, 0)
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            assert "up 0" in r.read().decode()
        code = None
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
        except urllib.error.HTTPError as e:
            code = e.code
        assert code == 404
    finally:
        srv.shutdown()
        srv.server_close()


# ---------------------------------------------------- delivery integration


def test_update_delivery_gauges_from_metrics_table(spark):
    rows = [
        ("q", "r", 0, "2026-01-01T00:00:00.000Z", 1000, 2000, 1500, 1000, 0, 999),
        ("q", "r", 1, "2026-01-01T00:00:10.000Z", 3000, 1000, 800, 3000, 1000, 3999),
        # stale: far before the window anchored at the latest trigger
        ("q", "r", 2, "2025-12-31T00:00:00.000Z", 99999, 9000, 8000, 99999, 0, 0),
    ]
    metrics = spark.createDataFrame(
        rows,
        "query_id string, run_id string, batch_id long, batch_ts string, "
        "num_input_rows long, trigger_ms long, add_batch_ms long, events long, "
        "min_lsn long, max_lsn long",
    )
    reg = GaugeRegistry()
    update_delivery_gauges(reg, metrics, window_sec=300)
    assert reg.get("ton_etl_ingest_rows_total") == 1000 + 3000 + 99999
    # window holds only the two 2026 batches: 4000 rows over 3000 ms
    assert reg.get("ton_etl_ingest_rows_per_sec") == pytest.approx(4000 / 3.0)
    # reference index math on [1000, 2000]: p50 -> int(0.5)=idx 0,
    # p95 -> int(0.95)=idx 0 (the upper element needs n*0.95 to cross 1)
    assert reg.get("ton_etl_ingest_batch_ms", {"col": "p50"}) == 1000
    assert reg.get("ton_etl_ingest_batch_ms", {"col": "p95"}) == 1000


def test_rolling_delay_gauges_empty_window_skips_update(spark):
    """Reference behavior: no data in the window => no metric update, not
    a crash (performance.py _calc_metrics returning None)."""
    df = spark.createDataFrame([], "ts long, delay double")
    assert rolling_delay_gauges(df, "delay", "ts", interval_sec=10) == []
    full = spark.createDataFrame([(100, 5.0)], "ts long, delay double")
    # fully-evicted: anchor far past every event
    assert rolling_delay_gauges(full, "delay", "ts", interval_sec=10,
                                now_ts=10_000) == []


def test_update_table_layout_gauges(spark, tmp_path):
    """Layout-health gauges mirror describe's demand signals (shared
    thresholds, no drift) and track live commits across refreshes —
    small_files drops after a bin-pack, clustering overlap appears per
    stats column."""
    from ton_etl_spark.lake.maintenance import compact_small_files
    from ton_etl_spark.lake.table import LakeTable
    from ton_etl_spark.streaming.exporter import (
        GaugeRegistry,
        update_table_layout_gauges,
    )

    schema = spark.createDataFrame([], "k long, v long").schema
    t = LakeTable.create(spark, str(tmp_path / "lay"), schema=schema,
                         key_cols=["k"], n_buckets=2, stats_cols=["v"],
                         target_file_rows=200)
    t.append(spark.range(500).selectExpr("id AS k", "id AS v"),
             commit_key="big")
    for i in range(3):
        t.append(spark.range(500 + i * 10, 510 + i * 10)
                 .selectExpr("id AS k", "id AS v"), commit_key=f"s{i}")

    reg = GaugeRegistry()
    update_table_layout_gauges(reg, t)
    lbl = {"table": "lay"}
    assert reg.get("ton_etl_table_rows", lbl) == 530.0
    assert reg.get("ton_etl_table_files", lbl) == float(len(t.current().files))
    n_small = reg.get("ton_etl_table_small_files", lbl)
    assert n_small is not None and n_small >= 6  # 3 sliver epochs x 2 buckets
    ov = reg.get("ton_etl_table_clustering_overlap", {**lbl, "col": "v"})
    assert ov is not None and 0.0 <= ov <= 1.0
    assert "ton_etl_table_small_files" in reg.render()

    # a refresh after maintenance reflects the new snapshot
    compact_small_files(t, small_rows=100, commit_key="bp")
    update_table_layout_gauges(reg, t)
    assert reg.get("ton_etl_table_small_files", lbl) < n_small
    assert reg.get("ton_etl_table_rows", lbl) == 530.0  # content untouched

    # CLI surface: --layout-table rides the metrics command
    import contextlib
    import io

    from ton_etl_spark.cli import main

    mroot = str(tmp_path / "m")
    mrows = spark.createDataFrame(
        [("q", "r", 0, "2026-01-01T00:00:00.000Z", 10, 20, 15, 10, 0, 9)],
        "query_id string, run_id string, batch_id long, batch_ts string, "
        "num_input_rows long, trigger_ms long, add_batch_ms long, "
        "events long, min_lsn long, max_lsn long",
    )
    mt = LakeTable.create(spark, mroot, schema=mrows.schema,
                          key_cols=["batch_id"], n_buckets=2)
    mt.append(mrows, commit_key="seed")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["metrics", "--metrics-root", mroot,
                     "--layout-table", t.root]) == 0
    text = buf.getvalue()
    assert 'ton_etl_table_rows{table="lay"} 530' in text
    assert "ton_etl_table_clustering_overlap" in text


def test_layout_gauges_retire_stale_series_and_disambiguate(spark, tmp_path):
    """Review fixes: (a) a series that becomes unscoreable (full rewrite
    collapses buckets to single files => overlap None) must DISAPPEAR from
    /metrics, not keep exporting its last value — label-scoped, leaving
    other tables' series intact; (b) two monitored roots sharing a leaf
    name get distinct labels via the CLI fallback."""
    from ton_etl_spark.lake.maintenance import rewrite_buckets
    from ton_etl_spark.lake.table import LakeTable
    from ton_etl_spark.streaming.exporter import (
        GaugeRegistry,
        update_table_layout_gauges,
    )

    schema = spark.createDataFrame([], "k long, v long").schema

    def mk(root, n):
        t = LakeTable.create(spark, root, schema=schema, key_cols=["k"],
                             n_buckets=2, stats_cols=["v"],
                             target_file_rows=50)
        t.append(spark.range(n).selectExpr("id AS k", "xxhash64(id) AS v"),
                 commit_key="seed")
        return t

    t1 = mk(str(tmp_path / "a" / "docs"), 400)
    t2 = mk(str(tmp_path / "b" / "docs"), 400)

    reg = GaugeRegistry()
    update_table_layout_gauges(reg, t1, label="a/docs")
    update_table_layout_gauges(reg, t2, label="b/docs")
    ov1 = reg.get("ton_etl_table_clustering_overlap",
                  {"table": "a/docs", "col": "v"})
    assert ov1 is not None  # unsorted v: many files, scoreable + overlapping

    # shrink below one target file per bucket, then collapse: a single
    # stats-carrying file per bucket has no pairs => overlap unscoreable
    from ton_etl_spark.lake.maintenance import delete_where

    delete_where(t1, where_in={"k": list(range(80, 400))}, commit_key="shrink")
    rewrite_buckets(t1, commit_key="collapse")
    assert all(
        sum(1 for f in t1.current().files if f.bucket == b) == 1 for b in (0, 1)
    )
    update_table_layout_gauges(reg, t1, label="a/docs")
    assert reg.get("ton_etl_table_clustering_overlap",
                   {"table": "a/docs", "col": "v"}) is None  # retired
    # the OTHER table's series survives the label-scoped clear
    assert reg.get("ton_etl_table_clustering_overlap",
                   {"table": "b/docs", "col": "v"}) is not None

    # CLI duplicate-basename fallback: both roots end in .../docs
    import contextlib
    import io

    from ton_etl_spark.cli import main

    mrows = spark.createDataFrame(
        [("q", "r", 0, "2026-01-01T00:00:00.000Z", 1, 2, 1, 1, 0, 1)],
        "query_id string, run_id string, batch_id long, batch_ts string, "
        "num_input_rows long, trigger_ms long, add_batch_ms long, "
        "events long, min_lsn long, max_lsn long",
    )
    mroot = str(tmp_path / "m")
    mt = LakeTable.create(spark, mroot, schema=mrows.schema,
                          key_cols=["batch_id"], n_buckets=2)
    mt.append(mrows, commit_key="seed")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["metrics", "--metrics-root", mroot,
                     "--layout-table", t1.root,
                     "--layout-table", t2.root]) == 0
    text = buf.getvalue()
    # full roots as labels: BOTH tables exported, no silent collision
    assert f'table="{t1.root}"' in text and f'table="{t2.root}"' in text
