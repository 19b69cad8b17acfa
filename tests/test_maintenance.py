"""Lake maintenance: tombstone GC honors the redelivery horizon, snapshot
expiry frees storage without breaking current reads or idempotency, and
rewrite compaction collapses buckets to one file."""

import os

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.cdc.apply import apply_cdc_batch, make_sequences_table, read_state
from ton_etl_spark.cdc.schema import CDC_EVENT_SCHEMA
from ton_etl_spark.lake.maintenance import expire_snapshots, gc_tombstones, rewrite_buckets
from ton_etl_spark.lake.table import LakeTable


@pytest.fixture()
def table_with_tombstones(spark, tmp_path):
    t = make_sequences_table(spark, str(tmp_path / "t"), n_buckets=4)
    batch = spark.createDataFrame(
        [
            ("k1", "c", 10, 10, [1, 2], 2, "web"),
            ("k2", "d", 20, 20, None, None, "web"),   # old tombstone
            ("k3", "d", 90, 90, None, None, "web"),   # recent tombstone
            ("k4", "u", 40, 40, [7], 1, "web"),
        ],
        schema=CDC_EVENT_SCHEMA,
    )
    apply_cdc_batch(t, batch, epoch=0)
    return t


def test_gc_tombstones_respects_horizon(spark, table_with_tombstones):
    t = table_with_tombstones
    raw_before = t.read().count()
    assert raw_before == 4  # 2 live + 2 tombstones
    res = gc_tombstones(t, horizon_lsn=50, commit_key="gc-1")
    assert res["applied"]
    raw = t.read()
    assert raw.count() == 3  # k2's tombstone (lsn 20 <= 50) gone
    assert raw.where((F.col("doc_id") == "k3") & (F.col("op") == "d")).count() == 1
    # consumer view unchanged
    assert sorted(r["doc_id"] for r in read_state(t).collect()) == ["k1", "k4"]
    # recent tombstone still blocks stale resurrection
    stale = spark.createDataFrame(
        [("k3", "u", 60, 60, [9], 1, "web")], schema=CDC_EVENT_SCHEMA
    )
    apply_cdc_batch(t, stale, epoch=1)
    assert read_state(t).where(F.col("doc_id") == "k3").count() == 0
    # idempotent on commit_key
    assert gc_tombstones(t, horizon_lsn=50, commit_key="gc-1")["applied"] is False


def test_expire_snapshots_frees_files_keeps_current(spark, table_with_tombstones, tmp_path):
    t = table_with_tombstones
    # a few more versions
    for e in (1, 2):
        b = spark.createDataFrame(
            [(f"n{e}", "c", 100 + e, 100 + e, [e], 1, "web")], schema=CDC_EVENT_SCHEMA
        )
        apply_cdc_batch(t, b, epoch=e)
    cur = t.current_version()
    state_before = sorted(tuple(r) for r in read_state(t).collect())
    old_files = {f.path for f in t.snapshot(1).files}

    res = expire_snapshots(t, keep_last=1)
    assert res["removed_snapshots"] >= 1
    # current read identical
    assert sorted(tuple(r) for r in read_state(t).collect()) == state_before
    # time-travel to an expired version now fails
    with pytest.raises(FileNotFoundError):
        t.snapshot(0)
    # files exclusive to expired snapshots are gone from disk
    kept = {f.path for f in t.snapshot(cur).files}
    for p in old_files - kept:
        assert not os.path.exists(os.path.join(t.root, p))
    # batch idempotency survives expiry (commit keys live in the snapshot)
    assert apply_cdc_batch(t, spark.createDataFrame([], CDC_EVENT_SCHEMA), epoch=1)[
        "applied"
    ] is False


def test_rewrite_compacts_multi_file_buckets(spark, tmp_path):
    # appends accumulate one file per bucket per commit; rewrite collapses
    schema = spark.createDataFrame([], "k string, v long").schema
    t = LakeTable.create(spark, str(tmp_path / "a"), schema=schema, key_cols=["k"], n_buckets=2)
    for i in range(3):
        t.append(spark.createDataFrame([(f"k{i}", i)], schema), commit_key=f"a{i}")
    files_before = len(t.current().files)
    assert files_before >= 3
    res = rewrite_buckets(t, commit_key="compact-1")
    assert res["applied"]
    snap = t.current()
    per_bucket = {}
    for f in snap.files:
        per_bucket[f.bucket] = per_bucket.get(f.bucket, 0) + 1
    assert all(n == 1 for n in per_bucket.values())
    assert t.read().count() == 3
