"""Named snapshot refs (the Iceberg tag role): a tag pins the exact dataset
a training run consumed — readable by name forever, retained through
expire_snapshots however far the table advances, released by deleting the
tag."""

import json
import os

import pytest

from ton_etl_spark.cdc.apply import apply_cdc_batch, make_sequences_table, read_state
from ton_etl_spark.cdc.schema import CDC_EVENT_SCHEMA
from ton_etl_spark.lake.maintenance import expire_snapshots


def _apply(spark, t, epoch, rows):
    batch = spark.createDataFrame(rows, schema=CDC_EVENT_SCHEMA)
    apply_cdc_batch(t, batch, epoch=epoch)


@pytest.fixture()
def table3(spark, tmp_path):
    """Three data versions: v1 (k1), v2 (+k2), v3 (k1 updated)."""
    t = make_sequences_table(spark, str(tmp_path / "t"), n_buckets=4)
    _apply(spark, t, 0, [("k1", "c", 10, 10, [1, 2], 2, "web")])
    _apply(spark, t, 1, [("k2", "c", 20, 20, [3], 1, "web")])
    _apply(spark, t, 2, [("k1", "u", 30, 30, [9, 9], 2, "web")])
    return t


def test_tag_read_roundtrip(spark, table3):
    t = table3
    v = t.current_version() - 1  # before k1's update
    assert t.tag("train-run", version=v) == v
    assert t.tags() == {"train-run": v}
    assert t.resolve_tag("train-run") == v

    by_tag = {r["doc_id"]: r["tokens"] for r in read_state(t, tag="train-run").collect()}
    by_ver = {r["doc_id"]: r["tokens"] for r in read_state(t, version=v).collect()}
    assert by_tag == by_ver == {"k1": [1, 2], "k2": [3]}
    # current moved on
    assert {r["doc_id"]: r["tokens"] for r in read_state(t).collect()} == {"k1": [9, 9], "k2": [3]}

    assert t.delete_tag("train-run") is True
    assert t.delete_tag("train-run") is False
    assert t.tags() == {}


def test_tag_conflicts_validation_and_replace(spark, table3):
    t = table3
    t.tag("gold")  # defaults to current
    assert t.resolve_tag("gold") == t.current_version()
    with pytest.raises(ValueError, match="already exists"):
        t.tag("gold", version=1)
    t.tag("gold", version=1, replace=True)
    assert t.resolve_tag("gold") == 1

    with pytest.raises(ValueError, match="invalid tag name"):
        t.tag("../escape")
    with pytest.raises(KeyError, match="no such tag"):
        t.resolve_tag("nope")
    with pytest.raises(FileNotFoundError):
        t.tag("future", version=999)
    with pytest.raises(ValueError, match="version OR tag"):
        t.read(version=1, tag="gold")


def test_expire_keeps_tagged_snapshot(spark, table3):
    t = table3
    pinned = 2  # v0=create, v1=k1, v2=k1+k2, v3=k1 updated
    t.tag("pinned", version=pinned)
    pinned_files = {f.path for f in t.snapshot(pinned).files}
    want = {r["doc_id"]: r["tokens"] for r in read_state(t, version=pinned).collect()}

    res = expire_snapshots(t, keep_last=1, grace_seconds=0)
    assert pinned in res["kept_versions"]
    # untagged old versions are gone, the tagged one fully readable
    with pytest.raises(FileNotFoundError):
        t.snapshot(0)
    for p in pinned_files:
        assert os.path.exists(os.path.join(t.root, p))
    got = {r["doc_id"]: r["tokens"] for r in read_state(t, tag="pinned").collect()}
    assert got == want == {"k1": [1, 2], "k2": [3]}

    # releasing the tag makes the version expirable again
    t.delete_tag("pinned")
    expire_snapshots(t, keep_last=1, grace_seconds=0)
    with pytest.raises(FileNotFoundError):
        t.snapshot(pinned)
    cur_files = {f.path for f in t.current().files}
    for p in pinned_files - cur_files:
        assert not os.path.exists(os.path.join(t.root, p))


def test_cli_tag(spark, table3, capsys):
    from ton_etl_spark.cli import main

    root = table3.root
    assert main(["tag", "--table", root, "--set", "release-1", "--version", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["version"] == 2 and out["tags"] == {"release-1": 2}

    assert main(["describe", "--table", root]) == 0
    desc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert desc["tags"] == {"release-1": 2}

    assert main(["tag", "--table", root, "--delete", "release-1"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["deleted"] == "release-1" and out["tags"] == {}
