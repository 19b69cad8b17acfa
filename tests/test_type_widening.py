"""Opt-in lossless type widening (the Iceberg v2 `promote` evolution set):
int→…→bigint, float→double, decimal precision growth, arrays element-wise.
Off by default — the reference evolves additively only, and the BASELINE
token-array contract is frozen-typed; a table that opts in widens its
schema in place with NO file rewrite (Spark 4's Parquet readers upcast old
narrow files under the widened read schema — asserted here by reading
pre-widen files back through the widened snapshot)."""

import pytest
from pyspark.sql import functions as F, types as T

from ton_etl_spark.cdc.apply import read_state
from ton_etl_spark.lake.merge import merge_lww
from ton_etl_spark.lake.table import LakeTable, _merge_schemas, _widen_type


def _mk(spark, root, widening, schema=None, **kw):
    schema = schema or T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    return LakeTable.create(
        spark,
        root,
        schema=schema,
        key_cols=["doc_id"],
        n_buckets=4,
        type_widening=widening,
        **kw,
    )


def _batch(spark, rows, ntok_t="int", tok_t="int"):
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.IntegerType() if ntok_t == "int" else T.LongType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType() if tok_t == "int" else T.LongType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_widen_type_lattice():
    assert _widen_type(T.IntegerType(), T.LongType()).simpleString() == "bigint"
    assert _widen_type(T.LongType(), T.ShortType()).simpleString() == "bigint"
    assert _widen_type(T.FloatType(), T.DoubleType()).simpleString() == "double"
    assert (
        _widen_type(T.ArrayType(T.IntegerType()), T.ArrayType(T.LongType())).simpleString()
        == "array<bigint>"
    )
    assert (
        _widen_type(T.DecimalType(10, 2), T.DecimalType(20, 2)).simpleString()
        == "decimal(20,2)"
    )
    # lossy pairs are not promotions
    assert _widen_type(T.StringType(), T.LongType()) is None
    assert _widen_type(T.DecimalType(10, 2), T.DecimalType(10, 4)) is None
    assert _widen_type(T.DoubleType(), T.LongType()) is None


def test_off_by_default_rejects_type_change(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), widening=False)
    wide = _batch(spark, [("a", 1, [1])], ntok_t="long", tok_t="long")
    with pytest.raises(ValueError, match="incompatible evolution"):
        t.append(wide)


def test_append_widens_and_old_files_upcast(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), widening=True)
    t.append(_batch(spark, [("a", 2, [1, 2])]))  # narrow int32 files on disk
    big = 2**40
    t.append(_batch(spark, [("b", 1, [big])], ntok_t="long", tok_t="long"))
    snap = t.current()
    got = {f.name: f.dataType.simpleString() for f in snap.schema.fields}
    assert got["n_tok"] == "bigint" and got["tokens"] == "array<bigint>"
    rows = {r["doc_id"]: r for r in t.read().collect()}
    # pre-widen file read through the widened schema, values exact
    assert rows["a"]["tokens"] == [1, 2] and rows["a"]["n_tok"] == 2
    assert rows["b"]["tokens"] == [big]


def test_narrower_incoming_casts_up_keeps_wide(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), widening=True)
    t.append(_batch(spark, [("a", 1, [2**40])], ntok_t="long", tok_t="long"))
    t.append(_batch(spark, [("b", 3, [1, 2, 3])]))  # int batch into bigint table
    snap = t.current()
    assert snap.schema["n_tok"].dataType.simpleString() == "bigint"
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["b"]["n_tok"] == 3 and rows["b"]["tokens"] == [1, 2, 3]


def test_lossy_change_still_rejected_with_widening(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), widening=True)
    bad = spark.createDataFrame(
        [("a", "oops", [1])],
        T.StructType(
            [
                T.StructField("doc_id", T.StringType()),
                T.StructField("n_tok", T.StringType()),
                T.StructField("tokens", T.ArrayType(T.IntegerType())),
            ]
        ),
    )
    with pytest.raises(ValueError, match="incompatible evolution"):
        t.append(bad)


def test_merge_lww_widens_mid_stream(spark, tmp_path):
    """CDC shape: epoch 1 delivers int32 token arrays, epoch 2's producer
    upgraded to int64 — the merge widens in place and both epochs' winners
    carry exact token arrays (BASELINE per-row invariant)."""
    env = [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
    ]
    schema = T.StructType(
        env
        + [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
        ]
    )
    t = LakeTable.create(
        spark,
        str(tmp_path / "t"),
        schema=schema,
        key_cols=["doc_id"],
        n_buckets=4,
        type_widening=True,
    )
    b1 = spark.createDataFrame(
        [("c", 1, 10, "a", [1, 2]), ("c", 2, 20, "b", [3])], schema
    )
    merge_lww(t, b1, commit_key="e1")
    wide = T.StructType(
        env
        + [
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.LongType())),
        ]
    )
    big = 2**40
    b2 = spark.createDataFrame(
        [("u", 3, 30, "b", [big]), ("c", 4, 40, "d", [5])], wide
    )
    merge_lww(t, b2, commit_key="e2")
    assert t.current().schema["tokens"].dataType.simpleString() == "array<bigint>"
    rows = {r["doc_id"]: r["tokens"] for r in read_state(t).collect()}
    assert rows == {"a": [1, 2], "b": [big], "d": [5]}


def test_stats_bounds_survive_widening(spark, tmp_path):
    """File-skipping bounds written as int32 stay usable after the column
    widens — the read path tolerates mixed-width encodings, and the
    residual filter keeps results exact either way."""
    t = _mk(spark, str(tmp_path / "t"), widening=True, stats_cols=["n_tok"])
    t.append(_batch(spark, [("a", 5, [1]), ("b", 100, [2])]))
    t.append(_batch(spark, [("c", 2**40, [3])], ntok_t="long", tok_t="long"))
    got = sorted(r["doc_id"] for r in t.read(where={"n_tok": (50, None)}).collect())
    assert got == ["b", "c"]


def test_widening_survives_append_rebase(spark, tmp_path):
    """The CAS-losing append's metadata-only rebase re-merges its schema
    against the NEW current snapshot — a WIDE loser rebasing onto a
    narrow winner must keep the widened schema (and vice versa would cast
    up), not raise.  Race forced with the same publish hook the
    concurrency suite uses."""
    from tests.test_concurrency import _hooked_publish

    root = str(tmp_path / "t")
    t1 = _mk(spark, root, widening=True)
    t2 = LakeTable.load(spark, root)

    # t2's first publish attempt loses to t1's narrow int append
    _hooked_publish(t2, lambda: t1.append(_batch(spark, [("a", 1, [1])])))
    assert t2.append(_batch(spark, [("b", 1, [2**40])], ntok_t="long", tok_t="long"))
    snap = t2.current()
    assert snap.schema["tokens"].dataType.simpleString() == "array<bigint>"
    rows = {r["doc_id"]: r["tokens"] for r in t2.read().collect()}
    assert rows == {"a": [1], "b": [2**40]}
