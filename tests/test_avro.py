"""Avro interchange: the reference lake's on-disk format (OCF files under
hive-style ``adding_date=`` partitions, ``datalake/main.py:136-186``) must
round-trip through the jar-less pure-Python path, and Avro-framed CDC
values must flow through the UNCHANGED JSON envelope pipeline."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ton_etl_spark.cdc.envelope import parse_cdc_envelope, to_kafka_frames
from ton_etl_spark.cdc.generator import generate_cdc_log
from ton_etl_spark.sources.avro import (
    avro_values_to_json,
    encode_avro_values,
    encode_datum,
    parse_schema,
    read_avro,
    read_ocf_bytes,
    spark_to_avro_schema,
    write_avro,
    write_ocf_bytes,
)

REF_SCHEMA = {
    "type": "record",
    "name": "messages",
    "fields": [
        {"name": "msg_hash", "type": ["null", "string"], "default": None},
        {"name": "value", "type": ["null", "long"], "default": None},
        {"name": "body_boc", "type": ["null", "bytes"], "default": None},
        {"name": "created_at", "type": ["null", "long"], "default": None},
        {"name": "direction", "type": ["null", {"type": "enum", "name": "dir", "symbols": ["in", "out"]}], "default": None},
    ],
}


def _ref_rows(n):
    return [
        {
            "msg_hash": f"h{i:04d}",
            "value": i * 1000 if i % 7 else None,
            "body_boc": bytes([i % 256, (i * 3) % 256]) if i % 5 else None,
            "created_at": 1700000000 + i,
            "direction": "in" if i % 2 else "out",
        }
        for i in range(n)
    ]


def test_golden_datum_bytes():
    """Pin the binary encoding to the published spec examples so a
    self-consistent-but-wrong codec cannot round-trip its way past CI."""
    lsc = parse_schema("long")
    for v, want in [(0, b"\x00"), (-1, b"\x01"), (1, b"\x02"), (-2, b"\x03"),
                    (2, b"\x04"), (-64, b"\x7f"), (64, b"\x80\x01")]:
        out = bytearray()
        encode_datum(lsc, v, out)
        assert bytes(out) == want, (v, bytes(out))
    out = bytearray()
    encode_datum(parse_schema("string"), "foo", out)
    assert bytes(out) == b"\x06foo"
    out = bytearray()
    encode_datum(parse_schema(["null", "string"]), None, out)
    assert bytes(out) == b"\x00"


def test_ocf_corrupt_sync_fails_loudly():
    data = bytearray(write_ocf_bytes(REF_SCHEMA, _ref_rows(10), codec="null"))
    data[-3] ^= 0xFF  # flip a byte inside the trailing sync marker
    with pytest.raises(ValueError, match="sync"):
        read_ocf_bytes(bytes(data))


def test_reference_layout_reads_distributed(spark, tmp_path):
    """Files laid out exactly as the reference flushes them (one OCF per
    flush under adding_date=...) decode via the distributed binaryFile +
    mapInPandas path, per-file lineage preserved."""
    root = str(tmp_path / "lake" / "messages")
    rows = _ref_rows(137)
    for day, (lo, hi) in {"20260101": (0, 60), "20260102": (60, 137)}.items():
        d = os.path.join(root, f"adding_date={day}")
        os.makedirs(d)
        with open(os.path.join(d, "deadbeef.avro"), "wb") as fh:
            fh.write(write_ocf_bytes(REF_SCHEMA, rows[lo:hi]))

    df = read_avro(spark, root, use_datasource=False)
    got = sorted(
        (r["msg_hash"], r["value"], r["body_boc"], r["direction"]) for r in df.collect()
    )
    want = sorted((r["msg_hash"], r["value"], r["body_boc"], r["direction"]) for r in rows)
    assert got == want
    # lineage column maps each row to the file (and thus hive partition) it
    # came from — the jar-less stand-in for partition-column recovery
    days = df.select(
        F.regexp_extract("_source_file", r"adding_date=(\d+)", 1).alias("d")
    ).groupBy("d").count().collect()
    assert {r["d"]: r["count"] for r in days} == {"20260101": 60, "20260102": 77}


def test_write_read_round_trip_spark_types(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, "a", [1.0, 2.0], {"k": 10}, b"\x00\x01", True, 1.5),
            (2, None, [], {}, None, None, None),
        ],
        "id long, s string, arr array<double>, m map<string,long>, "
        "b binary, flag boolean, f double",
    )
    path = str(tmp_path / "out")
    n = write_avro(df, path, use_datasource=False)
    assert n == 2
    back = read_avro(spark, path, use_datasource=False).drop("_source_file")
    a = sorted(back.collect(), key=lambda r: r["id"])
    b = sorted(df.collect(), key=lambda r: r["id"])
    assert [r.asDict() for r in a] == [r.asDict() for r in b]


def test_avro_envelope_equals_json_envelope(spark):
    """Avro-framed (Confluent wire) CDC values through avro_values_to_json →
    parse_cdc_envelope must yield EXACTLY the rows the JSON framing yields,
    including binary payload fields surviving the base64 bridge."""
    events = generate_cdc_log(spark, 400, seed=11)
    json_frames = to_kafka_frames(events)
    env_schema = {
        "type": "record",
        "name": "envelope",
        "fields": [
            *[
                {"name": f.name, "type": ["null", _avro_of(f.dataType)], "default": None}
                for f in events.schema.fields
                if f.name not in ("op", "lsn", "ts_ms")
            ],
            {"name": "__op", "type": ["null", "string"], "default": None},
            {"name": "__table", "type": ["null", "string"], "default": None},
            {"name": "__lsn", "type": ["null", "long"], "default": None},
            {"name": "__source_ts_ms", "type": ["null", "long"], "default": None},
        ],
    }
    avro_frames = encode_avro_values(json_frames, env_schema, confluent_wire=True)
    bridged = avro_values_to_json(avro_frames, env_schema, confluent_wire=True)

    want = parse_cdc_envelope(json_frames, events.schema).orderBy("lsn").collect()
    got = parse_cdc_envelope(bridged, events.schema).orderBy("lsn").collect()
    assert len(got) == len(want) > 0
    assert [r.asDict() for r in got] == [r.asDict() for r in want]

    # garbage value -> corrupt-record drop, not a crash
    junk = spark.createDataFrame(
        [(b"\x00\x00\x00\x00\x01\xff\xff",), (None,)], "value binary"
    )
    assert parse_cdc_envelope(
        avro_values_to_json(junk, env_schema, confluent_wire=True), events.schema
    ).count() == 0


def _avro_of(dt):
    return spark_to_avro_schema(dt)


def test_lake_migration_from_avro(spark, tmp_path):
    """The migration path a reference user actually runs: their Avro lake →
    read_avro → LWW merge into a LakeTable, state == per-key max-lsn rows."""
    from ton_etl_spark.lake.merge import merge_lww
    from ton_etl_spark.lake.table import LakeTable

    root = str(tmp_path / "avro_lake")
    os.makedirs(root)
    schema = {
        "type": "record",
        "name": "seqs",
        "fields": [
            {"name": "doc_id", "type": ["null", "long"], "default": None},
            {"name": "text", "type": ["null", "string"], "default": None},
            {"name": "op", "type": ["null", "string"], "default": None},
            {"name": "lsn", "type": ["null", "long"], "default": None},
            {"name": "ts_ms", "type": ["null", "long"], "default": None},
        ],
    }
    rows = [
        {"doc_id": i % 50, "text": f"v{i}", "op": "c", "lsn": i, "ts_ms": 1000 + i}
        for i in range(200)
    ]
    with open(os.path.join(root, "a.avro"), "wb") as fh:
        fh.write(write_ocf_bytes(schema, rows))

    df = read_avro(spark, root, use_datasource=False).drop("_source_file")
    t = LakeTable.create(
        spark, str(tmp_path / "tbl"), schema=df.schema, key_cols=["doc_id"], n_buckets=4
    )
    merge_lww(t, df, commit_key="avro-import")
    got = {r["doc_id"]: r["text"] for r in t.read().collect()}
    assert got == {i: f"v{150 + i}" for i in range(50)}


def _evolved_files(root, with_conflict=False):
    """Two-generation lake: file 1 = v1 schema (doc_id, text); file 2 = v2
    adds n_tok (the reference evolves additively — createdb.sql ALTERs via
    datalake/generate_schema.py) and drops text."""
    os.makedirs(root, exist_ok=True)
    v1 = {
        "type": "record",
        "name": "docs",
        "fields": [
            {"name": "doc_id", "type": ["null", "long"], "default": None},
            {"name": "text", "type": ["null", "string"], "default": None},
        ],
    }
    v2 = {
        "type": "record",
        "name": "docs",
        "fields": [
            {"name": "doc_id", "type": ["null", "long"], "default": None},
            {
                "name": "n_tok",
                "type": ["null", "string" if with_conflict else "long"],
                "default": None,
            },
        ],
    }
    with open(os.path.join(root, "gen1.avro"), "wb") as fh:
        fh.write(write_ocf_bytes(v1, [{"doc_id": i, "text": f"t{i}"} for i in range(3)]))
    with open(os.path.join(root, "gen2.avro"), "wb") as fh:
        fh.write(
            write_ocf_bytes(
                v2,
                [
                    {"doc_id": i, "n_tok": f"n{i}" if with_conflict else i * 10}
                    for i in range(3, 6)
                ],
            )
        )


def test_read_avro_additive_schema_evolution(spark, tmp_path):
    """Round-6 fix for the first-file schema pin (sources/avro.py): each
    file decodes against its OWN writer schema and conforms to the additive
    union — the added column is NULL for old files, the removed column is
    NULL for new files, and no rows or columns are silently dropped."""
    root = str(tmp_path / "lake")
    _evolved_files(root)
    df = read_avro(spark, root, use_datasource=False)
    assert set(df.columns) == {"doc_id", "text", "n_tok", "_source_file"}
    got = {r["doc_id"]: (r["text"], r["n_tok"]) for r in df.collect()}
    assert got == {
        **{i: (f"t{i}", None) for i in range(3)},       # added col → NULL
        **{i: (None, i * 10) for i in range(3, 6)},     # removed col → NULL
    }


def test_read_avro_reader_schema_pins_columns(spark, tmp_path):
    """Explicit reader_schema skips discovery: absent columns are NULL,
    columns outside the reader schema are dropped."""
    from pyspark.sql import types as T

    root = str(tmp_path / "lake")
    _evolved_files(root)
    rs = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), True),
            T.StructField("n_tok", T.LongType(), True),
        ]
    )
    df = read_avro(spark, root, use_datasource=False, reader_schema=rs)
    assert set(df.columns) == {"doc_id", "n_tok", "_source_file"}
    got = {r["doc_id"]: r["n_tok"] for r in df.collect()}
    assert got == {0: None, 1: None, 2: None, 3: 30, 4: 40, 5: 50}


def test_read_avro_conflicting_types_raise(spark, tmp_path):
    """Same column name with different Avro types across files must fail
    loudly, not coerce — silent coercion loses data."""
    root = str(tmp_path / "lake")
    _evolved_files(root, with_conflict=True)
    with open(os.path.join(root, "gen3.avro"), "wb") as fh:
        fh.write(
            write_ocf_bytes(
                {
                    "type": "record",
                    "name": "docs",
                    "fields": [
                        {"name": "doc_id", "type": ["null", "long"], "default": None},
                        {"name": "n_tok", "type": ["null", "long"], "default": None},
                    ],
                },
                [{"doc_id": 9, "n_tok": 9}],
            )
        )
    with pytest.raises(ValueError, match="conflicting Avro types.*n_tok"):
        read_avro(spark, root, use_datasource=False)


# ---------------------------------------------------------------------------
# logical types (round-7: decimal / date / timestamp-millis / -micros) —
# jar-less reads must surface the same Spark types + values the spark-avro
# datasource documents for the reference's decimal-heavy lake schemas
# (datalake/athena_ddl.sql:348-354)
# ---------------------------------------------------------------------------


def test_logical_decimal_golden_wire_bytes():
    """Decimal logical type: unscaled two's-complement big-endian bytes per
    spec — golden byte checks both directions, bytes and fixed carriers."""
    import decimal

    from ton_etl_spark.sources.avro import decode_datum

    sc = parse_schema(
        {"type": "bytes", "logicalType": "decimal", "precision": 10, "scale": 2}
    )
    out = bytearray()
    encode_datum(sc, decimal.Decimal("123.45"), out)
    # zigzag len(2)=4, then 0x3039 = 12345
    assert bytes(out) == b"\x04\x30\x39"
    v, _ = decode_datum(sc, bytes(out), 0)
    assert v == decimal.Decimal("123.45")
    neg = bytearray()
    encode_datum(sc, decimal.Decimal("-0.07"), neg)
    assert bytes(neg) == b"\x02\xf9"  # -7 two's complement, minimal length
    v, _ = decode_datum(sc, bytes(neg), 0)
    assert v == decimal.Decimal("-0.07")
    # fixed carrier pads to the declared size
    fx = parse_schema(
        {"type": "fixed", "name": "d8", "size": 8,
         "logicalType": "decimal", "precision": 18, "scale": 4}
    )
    out = bytearray()
    encode_datum(fx, decimal.Decimal("-1.5000"), out)
    assert bytes(out) == (-15000).to_bytes(8, "big", signed=True)
    v, _ = decode_datum(fx, bytes(out), 0)
    assert v == decimal.Decimal("-1.5")
    # 38-digit decimal survives (no context rounding at Spark's max precision)
    big = parse_schema(
        {"type": "bytes", "logicalType": "decimal", "precision": 38, "scale": 0}
    )
    huge = decimal.Decimal(10**38 - 1)
    out = bytearray()
    encode_datum(big, huge, out)
    v, _ = decode_datum(big, bytes(out), 0)
    assert v == huge


def test_logical_temporal_golden():
    import datetime as dt

    from ton_etl_spark.sources.avro import decode_datum

    date_sc = parse_schema({"type": "int", "logicalType": "date"})
    ms_sc = parse_schema({"type": "long", "logicalType": "timestamp-millis"})
    us_sc = parse_schema({"type": "long", "logicalType": "timestamp-micros"})
    d = dt.date(2023, 3, 14)
    out = bytearray()
    encode_datum(date_sc, d, out)
    v, _ = decode_datum(date_sc, bytes(out), 0)
    assert v == d
    t = dt.datetime(2023, 3, 14, 1, 59, 26, 535000, tzinfo=dt.timezone.utc)
    out = bytearray()
    encode_datum(ms_sc, t, out)
    v, _ = decode_datum(ms_sc, bytes(out), 0)
    assert v == t
    t_us = t.replace(microsecond=535897)
    out = bytearray()
    encode_datum(us_sc, t_us, out)
    v, _ = decode_datum(us_sc, bytes(out), 0)
    assert v == t_us
    # pre-epoch instant: floor-division millis stay consistent
    pre = dt.datetime(1969, 12, 31, 23, 59, 59, 499000, tzinfo=dt.timezone.utc)
    out = bytearray()
    encode_datum(ms_sc, pre, out)
    v, _ = decode_datum(ms_sc, bytes(out), 0)
    assert v == pre


def test_unknown_or_misplaced_logical_ignored():
    """Spec: unknown logical types and annotations on the wrong physical
    type are ignored — the column stays its physical Spark type."""
    from pyspark.sql import types as T

    from ton_etl_spark.sources.avro import avro_to_spark_type

    assert avro_to_spark_type(
        parse_schema({"type": "string", "logicalType": "uuid"})
    ) == T.StringType()
    assert avro_to_spark_type(
        parse_schema({"type": "string", "logicalType": "decimal", "precision": 9})
    ) == T.StringType()
    assert avro_to_spark_type(
        parse_schema({"type": "long", "logicalType": "date"})
    ) == T.LongType()
    # decimal without precision is invalid per spec -> physical bytes
    assert avro_to_spark_type(
        parse_schema({"type": "bytes", "logicalType": "decimal"})
    ) == T.BinaryType()


def test_logical_types_jarless_spark_roundtrip(spark, tmp_path):
    """write_avro → read_avro (both jar-less) round-trips DecimalType /
    TimestampType / DateType with the schema the spark-avro datasource
    would produce — the r6 'What's missing #3' fidelity gap."""
    import datetime as dt
    import decimal

    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [
            (1, decimal.Decimal("12345.6789"),
             dt.datetime(2023, 5, 1, 12, 30, 45, 123456),
             dt.date(2023, 5, 1),
             dt.datetime(2023, 5, 1, 7, 0, 0, 5)),
            (2, decimal.Decimal("-0.0001"),
             dt.datetime(1969, 12, 31, 23, 59, 59, 999999),
             dt.date(1969, 12, 31),
             dt.datetime(1969, 12, 31, 1, 2, 3)),
            (3, None, None, None, None),
        ],
        "id long, dec decimal(18,4), ts timestamp, d date, ntz timestamp_ntz",
    )
    path = str(tmp_path / "logical")
    assert write_avro(df, path, use_datasource=False) == 3
    back = read_avro(spark, path, use_datasource=False).drop("_source_file")
    assert back.schema["dec"].dataType == T.DecimalType(18, 4)
    assert back.schema["ts"].dataType == T.TimestampType()
    assert back.schema["d"].dataType == T.DateType()
    assert back.schema["ntz"].dataType == T.TimestampNTZType()
    a = sorted([r.asDict() for r in back.collect()], key=lambda r: r["id"])
    b = sorted([r.asDict() for r in df.collect()], key=lambda r: r["id"])
    assert a == b


def test_envelope_bridge_strips_logical_types(spark):
    """A Debezium writer schema annotating bytes with logicalType decimal
    must still surface base64 RAW bytes through avro_values_to_json — the
    envelope path decodes money downstream (functions/debezium.py), so
    pre-converted Decimals would break it."""
    import base64

    schema = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "k", "type": ["null", "string"], "default": None},
            {"name": "amount",
             "type": ["null", {"type": "bytes", "logicalType": "decimal",
                               "precision": 20, "scale": 2}],
             "default": None},
        ],
    }
    payload = json.dumps(
        {"k": "a", "amount": base64.b64encode(b"\x30\x39").decode()}
    ).encode()
    frames = spark.createDataFrame([(payload,)], "value binary")
    wired = encode_avro_values(frames, schema)
    back = avro_values_to_json(wired, schema).collect()
    doc = json.loads(bytes(back[0]["value"]).decode())
    assert doc["amount"] == base64.b64encode(b"\x30\x39").decode()


def test_file_schema_json_unparseable_raises_clear(tmp_path):
    from ton_etl_spark.sources.avro import _file_schema_json, _union_file_schemas

    bad = tmp_path / "junk.avro"
    bad.write_bytes(b"\x00" * 4096)
    with pytest.raises(ValueError, match="unparseable Avro header"):
        _file_schema_json(str(bad))
    with pytest.raises(ValueError, match="junk.avro"):
        _union_file_schemas([str(bad)])
