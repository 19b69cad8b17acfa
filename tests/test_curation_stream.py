"""End-to-end streaming curation (SURVEY composition of the LLM-pipeline
operators inside the CDC loop): a document stream is gated, deduped
within-batch and against the growing corpus index, mixture-sampled, and
committed exactly-once — and the final admitted corpus must equal the
batch curated-corpus pipeline (DuckDB oracle, same gates/salt/dedup) over
the same log, including across a crash-restart.  Delivery is
doc_id-ordered, which is what makes streaming first-seen-wins equal the
batch oracle's min-id-wins."""

import json
import os
import time

import duckdb
import pytest
from pyspark.sql import functions as F

from ton_etl_spark.lake.table import LakeTable
from ton_etl_spark.plans.queries import _SW
from ton_etl_spark.streaming.curation import (
    curate_batch,
    make_curated_table,
    make_decision_table,
    read_corpus,
    start_curation_stream,
)

_STOP = ["the", "of", "and", "to", "in"]


def _good_text(i: int) -> str:
    # 18 words, 1/3 stopwords, no punctuation: quality ≈ 0.74, rep 0
    return " ".join(
        _STOP[j % 5] if j % 3 == 0 else f"w{i}x{j}" for j in range(18)
    )


def _make_rows():
    """120 docs, ids 0..119 in order: per 6-block — 3 good unique, 1 too
    short (gate), 1 verbatim dup of the previous block's first good doc,
    1 good unique.  Sources alternate."""
    rows = []
    for i in range(120):
        src = "web" if (i // 6) % 2 == 0 else "books"
        k = i % 6
        if k == 3:
            text = "short text here"  # < 10 words -> gate
        elif k == 4 and i >= 10:
            # dup of the PREVIOUS block's k==0 good doc (maybe other batch);
            # k==4 docs themselves can't be the target — their text is a
            # copy, so chaining to them would reference a text nobody has
            text = _good_text(i - 10)
        else:
            text = _good_text(i)
        rows.append((i, text, src))
    return rows


_ORACLE_SQL = f"""
WITH feats AS (
  SELECT doc_id, source, text,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM docs WHERE text IS NOT NULL
), scored AS (
  SELECT doc_id, source, ws, len(ws) AS n_words,
         0.4 * LEAST(CAST(len(ws) AS DOUBLE) / 50.0, 1.0)
         + 0.2 * (CASE WHEN len(ws) > 0 AND
                       CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws)
                       BETWEEN 3.0 AND 8.0 THEN 1.0 ELSE 0.5 END)
         + 0.2 * LEAST(5.0 * (CASE WHEN len(ws) > 0
                  THEN CAST(len(list_filter(ws, x -> x IN ({_SW}))) AS DOUBLE) / len(ws)
                  ELSE 0.0 END), 1.0)
         + 0.2 * (1.0 - LEAST(5.0 * (CASE WHEN length(text) > 0
                  THEN CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
                       / length(text) ELSE 0.0 END), 1.0)) AS quality,
         CASE WHEN len(ws) >= 3
              THEN 1.0 - CAST(len(list_distinct(
                     list_transform(generate_series(1, len(ws) - 2),
                                    i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2]))
                   )) AS DOUBLE) / (len(ws) - 2)
              ELSE 0.0 END AS rep_ratio
  FROM feats
), gated AS (
  SELECT doc_id, source, md5(array_to_string(ws, ' ')) AS fp
  FROM scored
  WHERE quality >= 0.5 AND rep_ratio <= 0.2 AND n_words >= 10
), deduped AS (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM gated
)
SELECT doc_id, source FROM deduped
WHERE rn = 1
  AND substr(md5('curate' || CAST(doc_id AS VARCHAR)), 1, 8) < '80000000'
"""


@pytest.fixture(scope="module")
def doc_log(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dlog"))
    rows = _make_rows()
    for b in range(6):  # 20 id-ordered docs per file, file mtimes ascending
        chunk = rows[b * 20 : (b + 1) * 20]
        d = os.path.join(root, f"b{b}")
        spark.createDataFrame(
            chunk, "doc_id long, text string, source string"
        ).coalesce(1).write.parquet(d)
        ts = time.time() - 600 + b * 10
        for fn in os.listdir(d):
            os.utime(os.path.join(d, fn), (ts, ts))
    return root


def _oracle_rows(doc_log):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW docs AS SELECT * FROM '{doc_log}/*/*.parquet'")
    return sorted(con.sql(_ORACLE_SQL).fetchall())


def test_curation_stream_matches_batch_oracle_across_restart(spark, doc_log, tmp_path):
    glob_path = os.path.join(doc_log, "b*")
    tbl, dcs = str(tmp_path / "tbl"), str(tmp_path / "dec")
    idx, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")

    # phase 1: process some batches, then "crash"
    q = start_curation_stream(
        spark, glob_path, tbl, dcs, idx, ckpt, max_files_per_trigger=1
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if LakeTable.exists(tbl) and LakeTable.load(spark, tbl).current_version() >= 2:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    assert LakeTable.load(spark, tbl).current_version() >= 2

    # phase 2: restart from the same checkpoint, drain
    q2 = start_curation_stream(
        spark, glob_path, tbl, dcs, idx, ckpt, max_files_per_trigger=1
    )
    q2.awaitTermination(300)

    table = LakeTable.load(spark, tbl)
    got = sorted(
        (r["doc_id"], r["source"]) for r in read_corpus(table).collect()
    )
    want = _oracle_rows(doc_log)
    assert got == want and len(got) > 10

    # decision audit: exactly one decision per delivered doc, dups point at
    # the true earlier original (id-6 by construction)
    dec = LakeTable.load(spark, dcs).read()
    rows = {r["doc_id"]: r for r in dec.collect()}
    assert sorted(rows) == list(range(120))
    by_kind = {}
    for r in rows.values():
        by_kind[r["decision"]] = by_kind.get(r["decision"], 0) + 1
    assert by_kind["gate"] == 20  # every k==3 doc (k==4 with i<10 is good)
    n_dups = by_kind.get("dup_corpus", 0) + by_kind.get("dup_batch", 0)
    assert n_dups == 19  # every k==4 doc with i>=10
    for i, r in rows.items():
        if r["decision"] in ("dup_corpus", "dup_batch"):
            assert r["match_id"] == i - 10, (i, r)
    assert by_kind["admitted"] == len(got)
    assert sum(by_kind.values()) == 120

    # exactly-once: replaying an already-committed epoch is a full no-op
    v_t, v_d = table.current_version(), LakeTable.load(spark, dcs).current_version()
    batch0 = spark.read.parquet(os.path.join(doc_log, "b0"))
    res = curate_batch(
        spark, table, LakeTable.load(spark, dcs), idx, batch0, epoch=0
    )
    assert res["applied"] is False
    assert LakeTable.load(spark, tbl).current_version() == v_t
    assert LakeTable.load(spark, dcs).current_version() == v_d


def test_curation_index_rebuilds_from_table_after_sidecar_loss(spark, doc_log, tmp_path):
    """Crash mid-index-append retracts the sidecar; the next batch must
    rebuild the index from the curated table — INCLUDING sampled-out rows
    (the full dedup horizon), so a dup of a sampled-out doc still drops."""
    tbl, dcs = str(tmp_path / "tbl"), str(tmp_path / "dec")
    idx = str(tmp_path / "idx")
    table = make_curated_table(spark, tbl)
    decisions = make_decision_table(spark, dcs)

    schema = "doc_id long, text string, source string"
    b0 = spark.createDataFrame(
        [(i, _good_text(i), "web") for i in range(10)], schema
    )
    curate_batch(spark, table, decisions, idx, b0, epoch=0)
    stored = {r["doc_id"]: r["admitted"] for r in table.read().collect()}
    assert len(stored) == 10 and not all(stored.values())
    sampled_out = min(i for i, adm in stored.items() if not adm)

    # crash mid-append: the sidecar is gone
    os.remove(os.path.join(idx, "_minhash_meta.json"))

    b1 = spark.createDataFrame(
        [(100, _good_text(sampled_out), "web"),  # dup of a sampled-OUT doc
         (101, _good_text(101), "web")],
        schema,
    )
    curate_batch(spark, table, decisions, idx, b1, epoch=1)
    with open(os.path.join(idx, "_minhash_meta.json")) as fh:
        assert json.load(fh)["epoch"] == 1  # rebuilt + advanced
    dec = {r["doc_id"]: r for r in decisions.read().where(F.col("epoch") == 1).collect()}
    assert dec[100]["decision"] == "dup_corpus" and dec[100]["match_id"] == sampled_out
    assert dec[101]["decision"] in ("admitted", "sampled_out")
    assert 100 not in {r["doc_id"] for r in table.read().collect()}


def test_curation_stream_retention_bounds_sidecars(spark, doc_log, tmp_path):
    """Round-6: an unbounded curation loop must not grow its sidecar
    state forever.  With retention on, decision rows age out past the
    epoch horizon, both tables' snapshot metadata expires, file counts
    stay bounded — and the curated corpus still equals the batch oracle
    (retention never touches content or replay keys)."""
    glob_path = os.path.join(doc_log, "b*")
    tbl, dcs = str(tmp_path / "tbl"), str(tmp_path / "dec")
    idx, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")
    # retention_groups=1 compacts the WHOLE curated table each sweep —
    # fine at this 8-bucket test scale and makes the file-count bound
    # below exact.  The production default is rolling groups (4), whose
    # bound is O(buckets × every × groups) files, constant in epochs but
    # too loose to assert tightly over a 6-epoch run.
    q = start_curation_stream(
        spark, glob_path, tbl, dcs, idx, ckpt, max_files_per_trigger=1,
        retain_epochs=2, retention_every=2, retention_groups=1,
        keep_last_snapshots=2, retention_grace_seconds=0.0,
    )
    q.awaitTermination(300)

    # replay equality unaffected
    got = sorted(
        (r["doc_id"], r["source"])
        for r in read_corpus(LakeTable.load(spark, tbl)).collect()
    )
    assert got == _oracle_rows(doc_log)

    # decisions hold only the retention window: the batch-5 sweep ran at
    # horizon 5-2=3, so epochs <=3 are gone and 4..5 survive
    d = LakeTable.load(spark, dcs)
    epochs = {r["epoch"] for r in d.read().select("epoch").distinct().collect()}
    assert epochs == {4, 5}

    # bounded storage: file counts collapse to O(buckets), snapshot
    # metadata to O(keep_last) — not O(epochs)
    t = LakeTable.load(spark, tbl)
    assert len(d.current().files) <= 8     # 4 buckets, post-sweep compact
    assert len(t.current().files) <= 8     # 8 buckets, rolling-compacted
    for root in (tbl, dcs):
        snaps = [f for f in os.listdir(os.path.join(root, "_meta"))
                 if f.startswith("v") and f.endswith(".json")]
        assert len(snaps) <= 3, (root, snaps)

    # idempotency survives retention: replaying an old epoch is a no-op
    # even though its decision rows were swept
    batch0 = spark.read.parquet(os.path.join(doc_log, "b0"))
    res = curate_batch(spark, t, d, idx, batch0, epoch=0)
    assert res["applied"] is False
    assert {r["epoch"] for r in d.read().select("epoch").distinct().collect()} == {4, 5}


def test_curation_stream_binpack_retention(spark, doc_log, tmp_path):
    """retention_binpack_rows: the curated corpus' rolling maintenance
    coalesces only sliver files — correctness identical to the batch
    oracle, and files that reached the threshold survive maintenance by
    reference (never rewritten)."""
    glob_path = os.path.join(doc_log, "b*")
    tbl, dcs = str(tmp_path / "tbl"), str(tmp_path / "dec")
    idx, ckpt = str(tmp_path / "idx"), str(tmp_path / "ckpt")
    q = start_curation_stream(
        spark, glob_path, tbl, dcs, idx, ckpt, max_files_per_trigger=1,
        retain_epochs=2, retention_every=2, retention_groups=1,
        retention_binpack_rows=3, keep_last_snapshots=2,
        retention_grace_seconds=0.0,
    )
    q.awaitTermination(300)
    got = sorted(
        (r["doc_id"], r["source"])
        for r in read_corpus(LakeTable.load(spark, tbl)).collect()
    )
    assert got == _oracle_rows(doc_log)
    # settled files (>= threshold rows) were packed once and then carried
    # by reference: every above-threshold file in the final snapshot must
    # predate the last maintenance commit's slivers
    t = LakeTable.load(spark, tbl)
    assert any(f.rows >= 3 for f in t.current().files)
