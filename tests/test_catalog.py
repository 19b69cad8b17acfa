"""Catalog-driven schema generation + table sync (reference:
datalake/generate_schema.py type rules, metadata_snapshot.py get-or-create)."""

import pytest

from ton_etl_spark.lake.catalog import (
    catalog_to_avro_schema,
    catalog_to_spark_schema,
    diff_catalog_schema,
    sync_table_from_catalog,
)
from ton_etl_spark.sources.avro import avro_to_spark_type, parse_schema

# A messages-like information_schema.columns dump (deterministic fixture —
# no live database; the reference reads the same shape via psycopg2).
MESSAGES_CATALOG = [
    {"column_name": "msg_hash", "data_type": "character varying", "is_nullable": "NO", "ordinal_position": 1},
    {"column_name": "source", "data_type": "character varying", "is_nullable": "YES", "ordinal_position": 2},
    {"column_name": "value", "data_type": "bigint", "is_nullable": "YES", "ordinal_position": 3},
    {"column_name": "opcode", "data_type": "integer", "is_nullable": "YES", "ordinal_position": 4},
    {"column_name": "bounce", "data_type": "boolean", "is_nullable": "YES", "ordinal_position": 5},
    {"column_name": "fwd_fee", "data_type": "numeric", "is_nullable": "YES", "ordinal_position": 6},
    {"column_name": "comment", "data_type": "text", "is_nullable": "YES", "ordinal_position": 7},
    {"column_name": "direction", "data_type": "USER-DEFINED", "is_nullable": "YES", "ordinal_position": 8},
    {"column_name": "extra", "data_type": "jsonb", "is_nullable": "YES", "ordinal_position": 9},
]


def test_avro_schema_matches_reference_layout():
    got = catalog_to_avro_schema(
        MESSAGES_CATALOG, "messages", ignore_fields=["extra"], cdc_meta=True
    )
    assert got == {
        "namespace": "ton",
        "type": "record",
        "name": "messages",
        "fields": [
            {"name": "msg_hash", "type": "string"},
            {"name": "source", "type": ["string", "null"]},
            {"name": "value", "type": ["long", "null"]},
            {"name": "opcode", "type": ["int", "null"]},
            {"name": "bounce", "type": ["boolean", "null"]},
            {"name": "fwd_fee", "type": ["double", "null"]},
            {"name": "comment", "type": ["string", "null"]},
            {"name": "direction", "type": ["string", "null"]},  # USER-DEFINED -> string
            {"name": "__lsn", "type": ["long"]},
            {"name": "__id", "type": ["string"]},
        ],
    }


def test_spark_and_avro_paths_agree():
    """catalog -> avro -> spark must equal catalog -> spark directly, so the
    two consumers (OCF files, LakeTable) can never diverge."""
    import json

    avro = catalog_to_avro_schema(MESSAGES_CATALOG, "messages", cdc_meta=True)
    via_avro = avro_to_spark_type(parse_schema(json.dumps(avro)))
    direct = catalog_to_spark_schema(MESSAGES_CATALOG, cdc_meta=True)
    assert [(f.name, f.dataType) for f in via_avro.fields] == [
        (f.name, f.dataType) for f in direct.fields
    ]


def test_unsupported_type_fails_loudly():
    with pytest.raises(ValueError, match="timestamp.*created_at"):
        catalog_to_spark_schema(
            [{"column_name": "created_at", "data_type": "timestamp without time zone",
              "is_nullable": "YES"}]
        )


def test_ordinal_position_orders_fields():
    shuffled = list(reversed(MESSAGES_CATALOG))
    assert [f.name for f in catalog_to_spark_schema(shuffled).fields] == [
        r["column_name"] for r in MESSAGES_CATALOG
    ]


def test_sync_create_then_noop_then_evolve(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t, rep = sync_table_from_catalog(
        spark, root, MESSAGES_CATALOG, key_cols=["msg_hash"], n_buckets=4
    )
    assert rep["action"] == "created"
    v0 = t.current_version()

    # some data under the created schema
    t.append(
        spark.createDataFrame([("h1", 10), ("h2", 20)], "msg_hash string, value long"),
        commit_key="seed",
    )

    # unchanged catalog -> noop, no new version
    vmid = t.current_version()
    _, rep = sync_table_from_catalog(spark, root, MESSAGES_CATALOG, key_cols=["msg_hash"])
    assert rep["action"] == "noop" and t.current_version() == vmid

    # catalog gains a column -> one metadata-only commit; old rows null-fill
    grown = MESSAGES_CATALOG + [
        {"column_name": "trace_id", "data_type": "character varying",
         "is_nullable": "YES", "ordinal_position": 10}
    ]
    _, rep = sync_table_from_catalog(spark, root, grown, key_cols=["msg_hash"])
    assert rep["action"] == "evolved" and rep["added"] == ["trace_id"]
    assert t.current_version() == vmid + 1
    rows = t.read().select("msg_hash", "trace_id").collect()
    assert len(rows) == 2 and all(r["trace_id"] is None for r in rows)

    # re-sync of the same grown catalog: idempotent via the digest commit key
    _, rep = sync_table_from_catalog(spark, root, grown, key_cols=["msg_hash"])
    assert rep["action"] == "noop" and t.current_version() == vmid + 1
    assert v0 <= vmid


def test_sync_type_change_rejected_before_commit(spark, tmp_path):
    root = str(tmp_path / "tbl")
    t, _ = sync_table_from_catalog(spark, root, MESSAGES_CATALOG, key_cols=["msg_hash"])
    v = t.current_version()
    mutated = [dict(r) for r in MESSAGES_CATALOG]
    mutated[2]["data_type"] = "character varying"  # value: bigint -> varchar
    with pytest.raises(ValueError, match="value"):
        sync_table_from_catalog(spark, root, mutated, key_cols=["msg_hash"])
    assert t.current_version() == v  # nothing was written


def test_sync_dropped_column_kept_with_warning(spark, tmp_path, caplog):
    root = str(tmp_path / "tbl")
    t, _ = sync_table_from_catalog(spark, root, MESSAGES_CATALOG, key_cols=["msg_hash"])
    shrunk = [r for r in MESSAGES_CATALOG if r["column_name"] != "comment"]
    with caplog.at_level("WARNING"):
        _, rep = sync_table_from_catalog(spark, root, shrunk, key_cols=["msg_hash"])
    assert rep["action"] == "noop" and rep["missing_in_catalog"] == ["comment"]
    assert "comment" in [f.name for f in t.current().schema.fields]
    assert any("comment" in m for m in caplog.messages)


def test_diff_reports_added_and_removed():
    a = catalog_to_spark_schema(MESSAGES_CATALOG[:5])
    b = catalog_to_spark_schema(MESSAGES_CATALOG[2:])
    added, removed, widened = diff_catalog_schema(a, b)
    assert added == ["fwd_fee", "comment", "direction", "extra"]
    assert removed == ["msg_hash", "source"]
    assert widened == []


def test_sync_widens_type_on_opted_in_table(spark, tmp_path):
    """A source-side column promotion (opcode integer -> bigint) converges
    through sync when the table opted into type_widening: one metadata
    commit, report lists the widened column, pre-widen rows read upcast."""
    from pyspark.sql import Row

    root = str(tmp_path / "tbl")
    t, _ = sync_table_from_catalog(
        spark, root, MESSAGES_CATALOG, key_cols=["msg_hash"], type_widening=True
    )
    t.append(spark.createDataFrame(
        [Row(msg_hash="m1", opcode=7)],
        "msg_hash string, opcode int",
    ))
    mutated = [dict(r) for r in MESSAGES_CATALOG]
    mutated[3]["data_type"] = "bigint"  # opcode: integer -> bigint
    t2, rep = sync_table_from_catalog(spark, root, mutated, key_cols=["msg_hash"])
    assert rep["action"] == "evolved" and rep["widened"] == ["opcode"]
    assert t2.current().schema["opcode"].dataType.simpleString() == "bigint"
    got = {r["msg_hash"]: r["opcode"] for r in t2.read().collect()}
    assert got == {"m1": 7}
    # idempotent: the same catalog again is a noop
    _, rep2 = sync_table_from_catalog(spark, root, mutated, key_cols=["msg_hash"])
    assert rep2["action"] == "noop"


def test_sync_narrower_catalog_is_noop_when_widening(spark, tmp_path):
    """Catalog says int but the table already widened to bigint: nothing to
    publish — the stored wider type absorbs narrow source rows."""
    root = str(tmp_path / "tbl")
    mutated = [dict(r) for r in MESSAGES_CATALOG]
    mutated[3]["data_type"] = "bigint"
    sync_table_from_catalog(
        spark, root, mutated, key_cols=["msg_hash"], type_widening=True
    )
    t, rep = sync_table_from_catalog(spark, root, MESSAGES_CATALOG, key_cols=["msg_hash"])
    assert rep["action"] == "noop"
    assert t.current().schema["opcode"].dataType.simpleString() == "bigint"


def test_sync_type_change_still_rejected_without_opt_in(spark, tmp_path):
    root = str(tmp_path / "tbl")
    sync_table_from_catalog(spark, root, MESSAGES_CATALOG, key_cols=["msg_hash"])
    mutated = [dict(r) for r in MESSAGES_CATALOG]
    mutated[3]["data_type"] = "bigint"
    with pytest.raises(ValueError, match="opcode"):
        sync_table_from_catalog(spark, root, mutated, key_cols=["msg_hash"])
