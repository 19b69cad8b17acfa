"""Replay-equality: the incremental MERGE path must reach the exact same
final state as the one-pass oracle, under out-of-order delivery, duplicate
redelivery, interleaved c/u/d with hot-key skew, and mid-stream additive
schema evolution — with exact token-array equality (BASELINE.json gate)."""

import os

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.cdc.generator import generate_cdc_log, write_cdc_log
from ton_etl_spark.cdc.apply import (
    final_state_oracle,
    read_full_log,
    read_state,
    replay_log_batched,
)
from ton_etl_spark.cdc.schema import CDC_EVENT_SCHEMA_EVOLVED

N_EVENTS = 4000


@pytest.fixture(scope="module")
def log_dirs(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cdclog"))
    log = generate_cdc_log(spark, N_EVENTS, seed=7)
    batch_dirs = write_cdc_log(log, root, n_batches=8, dup_pct=12, seed=7)
    return root, batch_dirs


def _sorted_rows(df):
    return [
        r.asDict()
        for r in df.orderBy("doc_id").select(*[f.name for f in CDC_EVENT_SCHEMA_EVOLVED.fields]).collect()
    ]


def test_replay_equality(spark, log_dirs, tmp_path):
    root, batch_dirs = log_dirs
    table = replay_log_batched(
        spark, batch_dirs, str(tmp_path / "seq_table"), lineage_root=str(tmp_path / "lineage")
    )
    got = _sorted_rows(read_state(table))
    oracle = _sorted_rows(final_state_oracle(read_full_log(spark, root)))
    assert len(got) == len(oracle) > 0
    for g, o in zip(got, oracle):
        assert g == o, f"mismatch for {o['doc_id']}: {g} != {o}"
    # exact token-array equality incl. element types
    for g in got:
        if g["tokens"] is not None:
            assert all(isinstance(t, int) for t in g["tokens"])
            assert g["n_tok"] == len(g["tokens"])


def test_schema_evolved_mid_stream(spark, log_dirs, tmp_path):
    root, batch_dirs = log_dirs
    table = replay_log_batched(spark, batch_dirs, str(tmp_path / "t2"))
    snap = table.current()
    names = [f.name for f in snap.schema.fields]
    assert "extra_meta" in names  # column arrived mid-replay
    # phase-0 files on disk genuinely lack the column
    import pyarrow.parquet as pq

    phase0 = [d for d in batch_dirs if "phase=0" in d][0]
    f = [x for x in os.listdir(phase0) if x.endswith(".parquet")][0]
    assert "extra_meta" not in pq.ParquetFile(os.path.join(phase0, f)).schema_arrow.names


def test_epoch_idempotency(spark, log_dirs, tmp_path):
    """Re-applying an already-committed epoch is a no-op (exactly-once)."""
    from ton_etl_spark.cdc.apply import apply_cdc_batch, make_sequences_table

    root, batch_dirs = log_dirs
    table = replay_log_batched(spark, batch_dirs, str(tmp_path / "t3"))
    before = table.current_version()
    batch = spark.read.parquet(batch_dirs[0])
    res = apply_cdc_batch(table, batch, epoch=0)
    assert res["applied"] is False
    assert table.current_version() == before


def test_tombstones_block_stale_resurrection(spark, tmp_path):
    """A delete applied first must not be undone by a stale lower-LSN event
    arriving in a later epoch."""
    from ton_etl_spark.cdc.apply import apply_cdc_batch, make_sequences_table
    from ton_etl_spark.cdc.schema import CDC_EVENT_SCHEMA

    table = make_sequences_table(spark, str(tmp_path / "t4"), n_buckets=4)
    delete = spark.createDataFrame(
        [("k1", "d", 100, 100, None, None, "web")], schema=CDC_EVENT_SCHEMA
    )
    stale = spark.createDataFrame(
        [("k1", "u", 50, 50, [1, 2, 3], 3, "web")], schema=CDC_EVENT_SCHEMA
    )
    apply_cdc_batch(table, delete, epoch=0)
    apply_cdc_batch(table, stale, epoch=1)
    assert read_state(table).where(F.col("doc_id") == "k1").count() == 0


def test_lineage_covers_log(spark, log_dirs, tmp_path):
    from ton_etl_spark.lake.table import LakeTable

    root, batch_dirs = log_dirs
    replay_log_batched(
        spark, batch_dirs, str(tmp_path / "t5"), lineage_root=str(tmp_path / "lin5")
    )
    lin = LakeTable.load(spark, str(tmp_path / "lin5")).read()
    agg = lin.agg(
        F.min("min_lsn").alias("lo"), F.max("max_lsn").alias("hi"), F.sum("event_count").alias("n")
    ).collect()[0]
    assert agg["lo"] == 0 and agg["hi"] == N_EVENTS - 1
    assert agg["n"] >= N_EVENTS  # duplicates included


def test_read_state_lsn_range_skips_files(spark, log_dirs, tmp_path):
    """Incremental consumer probe: read_state(lsn_range=(lo, None)) equals
    the filter truth, and with the default stats_cols=['lsn'] bounds the
    probe skips manifest files — proven by corrupting every data file whose
    lsn bounds sit entirely below the probe."""
    import os as _os

    root, batch_dirs = log_dirs
    table = replay_log_batched(spark, batch_dirs, str(tmp_path / "seq_lsn"))
    full = read_state(table)
    lo = full.agg(F.percentile_approx("lsn", 0.95)).first()[0]
    want = {r["doc_id"] for r in full.where(F.col("lsn") >= lo).collect()}
    got = {r["doc_id"] for r in read_state(table, lsn_range=(lo, None)).collect()}
    assert got == want and len(want) > 0
    skippable = [f for f in table.current().files
                 if f.stats and "lsn" in f.stats and f.stats["lsn"][1] < lo]
    assert skippable, "expected at least one skippable file below the probe"
    for f in skippable:
        with open(_os.path.join(table.root, f.path), "wb") as fh:
            fh.write(b"corrupt")
    again = {r["doc_id"] for r in read_state(table, lsn_range=(lo, None)).collect()}
    assert again == want
