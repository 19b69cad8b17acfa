"""Avro interchange: read/write the reference lake's on-disk format.

The reference datalake buffers Kafka messages into Avro object container
files and ships them to S3 under hive-style ``adding_date=YYYYMMDD/``
partitions (``datalake/main.py:136-186`` DataFileWriter + flush-then-
commit; ``datalake/generate_schema.py`` derives the writer schemas).  A
user migrating from it lands here with terabytes of ``.avro`` files, so
this module gives the engine a working Avro path in BOTH deployment
shapes:

- **With the spark-avro jar** (any real cluster): ``read_avro`` /
  ``write_avro`` delegate to the native ``format("avro")`` datasource —
  JVM decode, whole-stage codegen, the fast path.
- **Without the jar** (this sandbox, jar-less edge boxes): a pure-Python
  implementation of the PUBLIC Avro 1.x spec (binary encoding + object
  container file framing — https://avro.apache.org/docs/current/
  specification/) runs DISTRIBUTED: ``binaryFile`` lists the files into
  one row each, ``mapInPandas`` decodes file-sized Arrow batches on the
  executors.  No shuffle — the job is embarrassingly parallel over files
  (the reference flushes ~file-sized chunks, so one file ≈ one task is
  the right granularity), and the decoded rows stream straight into
  whatever plan the caller builds on top.  Python-loop decode is the
  documented cost of jar-less operation, not the recommended hot path.

Scope: the full core spec minus logical-type coercion — null, boolean,
int, long, float, double, bytes, string, fixed, enum, array, map, union,
record (nested, named refs), deflate + null codecs.  Logical types ride
their physical encoding (Debezium decimals stay bytes; decode with
``functions.debezium.decode_debezium_decimal``).  Unions must be
``[null, X]`` — the only shape the reference's generated schemas emit.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import json
import os
import struct
import uuid
import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MAGIC = b"Obj\x01"

# ---------------------------------------------------------------------------
# datum codec (Avro binary encoding)
# ---------------------------------------------------------------------------


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: bytearray, n: int) -> None:
    n = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_long(buf: bytes, pos: int) -> tuple[int, int]:
    shift = acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc), pos
        shift += 7


class _Schema:
    """Resolved schema node: ``kind`` + kind-specific attrs.  Named types
    are registered so records can reference themselves / each other."""

    __slots__ = (
        "kind", "fields", "items", "values", "symbols", "size", "branches",
        "name", "logical", "precision", "scale",
    )

    def __init__(self, kind: str):
        self.kind = kind
        self.logical = None  # decimal | date | timestamp-millis | timestamp-micros
        self.precision = None
        self.scale = 0


_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}

# logical type → physical types it may annotate (Avro spec §Logical Types);
# an annotation on the wrong physical type is IGNORED per spec, not an error
_LOGICAL_CARRIERS = {
    "decimal": ("bytes", "fixed"),
    "date": ("int",),
    "timestamp-millis": ("long",),
    "timestamp-micros": ("long",),
    # wall-clock-without-zone (Spark TimestampNTZType)
    "local-timestamp-millis": ("long",),
    "local-timestamp-micros": ("long",),
}


def _attach_logical(sc: _Schema, node: dict) -> None:
    lt = node.get("logicalType")
    if lt not in _LOGICAL_CARRIERS or sc.kind not in _LOGICAL_CARRIERS[lt]:
        return
    if lt == "decimal":
        prec = node.get("precision")
        if prec is None:
            return  # spec: decimal without precision is invalid → ignore
        sc.precision = int(prec)
        sc.scale = int(node.get("scale", 0))
    sc.logical = lt


def parse_schema(node, named: dict | None = None) -> _Schema:
    """Avro schema JSON (already-loaded value or JSON string) → resolved tree."""
    if named is None:
        named = {}
    if isinstance(node, str):
        s = node.strip()
        if s.startswith("{") or s.startswith("["):
            return parse_schema(json.loads(s), named)
        if node in _PRIMITIVES:
            return _Schema(node)
        if node in named:
            return named[node]
        raise ValueError(f"unknown type reference {node!r}")
    if isinstance(node, list):
        sc = _Schema("union")
        sc.branches = [parse_schema(b, named) for b in node]
        return sc
    t = node["type"]
    if t in _PRIMITIVES:
        # {"type": "bytes", "logicalType": "decimal", ...}: the supported
        # logical types (decimal / date / timestamp-millis / -micros, what
        # the reference's decimal-heavy lake schemas use —
        # datalake/athena_ddl.sql:348-354) annotate the physical type;
        # unknown logicals and Debezium's extra connect.* props ride the
        # physical type untouched per the Avro spec.
        sc = _Schema(t)
        _attach_logical(sc, node)
        return sc
    if t == "record":
        sc = _Schema("record")
        sc.name = node["name"]
        named[sc.name] = sc
        sc.fields = [(f["name"], parse_schema(f["type"], named)) for f in node["fields"]]
        return sc
    if t == "array":
        sc = _Schema("array")
        sc.items = parse_schema(node["items"], named)
        return sc
    if t == "map":
        sc = _Schema("map")
        sc.values = parse_schema(node["values"], named)
        return sc
    if t == "enum":
        sc = _Schema("enum")
        sc.name = node["name"]
        sc.symbols = list(node["symbols"])
        named[sc.name] = sc
        return sc
    if t == "fixed":
        sc = _Schema("fixed")
        sc.name = node["name"]
        sc.size = int(node["size"])
        _attach_logical(sc, node)
        named[sc.name] = sc
        return sc
    return parse_schema(t, named)  # {"type": {...}} wrapper


def _logical_encode(sc: _Schema, v):
    """Python Decimal/date/datetime → the logical type's physical value."""
    lt = sc.logical
    if lt == "decimal":
        n = _decimal_to_unscaled(v, sc.scale)
        if sc.kind == "fixed":
            return n.to_bytes(sc.size, "big", signed=True)
        return n.to_bytes(max(1, (n.bit_length() + 8) // 8), "big", signed=True)
    if lt == "date":
        d = v.date() if isinstance(v, _dt.datetime) else v
        return (d - _EPOCH_DATE).days
    if lt == "timestamp-millis":
        # floor division: spec millis, consistent for pre-epoch instants
        return _timestamp_to_micros(v) // 1000
    if lt == "timestamp-micros":
        return _timestamp_to_micros(v)
    if lt in ("local-timestamp-millis", "local-timestamp-micros"):
        # wall-clock semantics: take the naive clock reading as-is
        naive = v.replace(tzinfo=None) if v.tzinfo is not None else v
        us = (naive - _EPOCH_NAIVE) // _US
        return us // 1000 if lt.endswith("millis") else us
    return v


def encode_datum(sc: _Schema, v, out: bytearray) -> None:
    k = sc.kind
    if sc.logical is not None:
        v = _logical_encode(sc, v)
    if k == "null":
        return
    if k == "boolean":
        out.append(1 if v else 0)
    elif k in ("int", "long"):
        _write_long(out, int(v))
    elif k == "float":
        out += struct.pack("<f", float(v))
    elif k == "double":
        out += struct.pack("<d", float(v))
    elif k == "bytes":
        b = bytes(v)
        _write_long(out, len(b))
        out += b
    elif k == "string":
        b = v.encode("utf-8")
        _write_long(out, len(b))
        out += b
    elif k == "fixed":
        b = bytes(v)
        if len(b) != sc.size:
            raise ValueError(f"fixed {sc.name}: {len(b)} != {sc.size}")
        out += b
    elif k == "enum":
        _write_long(out, sc.symbols.index(v))
    elif k == "union":
        idx = _union_branch(sc, v)
        _write_long(out, idx)
        encode_datum(sc.branches[idx], v, out)
    elif k == "record":
        for name, fsc in sc.fields:
            encode_datum(fsc, v.get(name) if isinstance(v, dict) else getattr(v, name), out)
    elif k == "array":
        items = list(v)
        if items:
            _write_long(out, len(items))
            for it in items:
                encode_datum(sc.items, it, out)
        _write_long(out, 0)
    elif k == "map":
        pairs = list(v.items()) if isinstance(v, dict) else list(v)
        if pairs:
            _write_long(out, len(pairs))
            for mk, mv in pairs:
                b = mk.encode("utf-8")
                _write_long(out, len(b))
                out += b
                encode_datum(sc.values, mv, out)
        _write_long(out, 0)
    else:
        raise ValueError(f"unsupported kind {k}")


def _union_branch(sc: _Schema, v) -> int:
    if v is None:
        for i, b in enumerate(sc.branches):
            if b.kind == "null":
                return i
        raise ValueError("None for union without null branch")
    for i, b in enumerate(sc.branches):
        if b.kind != "null":
            return i
    raise ValueError("union has no non-null branch")


_EPOCH_UTC = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
_EPOCH_DATE = _dt.date(1970, 1, 1)
_US = _dt.timedelta(microseconds=1)
_DEC_CTX = decimal.Context(prec=100)  # scaleb must never round a 38-digit unscaled


def _decimal_from_unscaled(raw: bytes, scale: int) -> decimal.Decimal:
    return decimal.Decimal(int.from_bytes(raw, "big", signed=True)).scaleb(
        -scale, _DEC_CTX
    )


def _decimal_to_unscaled(v, scale: int) -> int:
    d = v if isinstance(v, decimal.Decimal) else decimal.Decimal(str(v))
    scaled = d.scaleb(scale, _DEC_CTX)
    unscaled = int(scaled)
    if scaled != unscaled:
        raise ValueError(f"decimal {d} does not fit scale {scale}")
    return unscaled


def _timestamp_to_micros(v) -> int:
    # naive datetimes are UTC instants (Spark session tz is pinned UTC and
    # the spark-avro datasource stores instants); exact integer arithmetic —
    # float .timestamp() loses microseconds past 2^53 ns
    if isinstance(v, _dt.datetime):
        aware = v if v.tzinfo is not None else v.replace(tzinfo=_dt.timezone.utc)
        return (aware - _EPOCH_UTC) // _US
    raise ValueError(f"timestamp logical type expects datetime, got {type(v)}")


_EPOCH_NAIVE = _dt.datetime(1970, 1, 1)


def _logical_decode(sc: _Schema, v):
    lt = sc.logical
    if lt == "decimal":
        return _decimal_from_unscaled(v, sc.scale)
    if lt == "date":
        return _EPOCH_DATE + _dt.timedelta(days=v)
    if lt == "timestamp-millis":
        return _EPOCH_UTC + _dt.timedelta(milliseconds=v)
    if lt == "timestamp-micros":
        return _EPOCH_UTC + _dt.timedelta(microseconds=v)
    if lt == "local-timestamp-millis":
        return _EPOCH_NAIVE + _dt.timedelta(milliseconds=v)
    if lt == "local-timestamp-micros":
        return _EPOCH_NAIVE + _dt.timedelta(microseconds=v)
    return v


def decode_datum(sc: _Schema, buf: bytes, pos: int) -> tuple[object, int]:
    k = sc.kind
    if k == "null":
        return None, pos
    if k == "boolean":
        return buf[pos] != 0, pos + 1
    if k in ("int", "long"):
        v, pos = _read_long(buf, pos)
        return (v if sc.logical is None else _logical_decode(sc, v)), pos
    if k == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if k == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if k in ("bytes", "string"):
        n, pos = _read_long(buf, pos)
        raw = buf[pos : pos + n]
        if k == "string":
            return raw.decode("utf-8"), pos + n
        if sc.logical == "decimal":
            return _decimal_from_unscaled(raw, sc.scale), pos + n
        return bytes(raw), pos + n
    if k == "fixed":
        raw = bytes(buf[pos : pos + sc.size])
        if sc.logical == "decimal":
            return _decimal_from_unscaled(raw, sc.scale), pos + sc.size
        return raw, pos + sc.size
    if k == "enum":
        i, pos = _read_long(buf, pos)
        return sc.symbols[i], pos
    if k == "union":
        i, pos = _read_long(buf, pos)
        return decode_datum(sc.branches[i], buf, pos)
    if k == "record":
        rec = {}
        for name, fsc in sc.fields:
            rec[name], pos = decode_datum(fsc, buf, pos)
        return rec, pos
    if k == "array":
        out = []
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with explicit byte size — skip the size long
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                v, pos = decode_datum(sc.items, buf, pos)
                out.append(v)
    if k == "map":
        out = {}
        while True:
            n, pos = _read_long(buf, pos)
            if n == 0:
                return out, pos
            if n < 0:
                n = -n
                _, pos = _read_long(buf, pos)
            for _ in range(n):
                ln, pos = _read_long(buf, pos)
                mk = buf[pos : pos + ln].decode("utf-8")
                pos += ln
                out[mk], pos = decode_datum(sc.values, buf, pos)
    raise ValueError(f"unsupported kind {k}")


# ---------------------------------------------------------------------------
# object container file framing
# ---------------------------------------------------------------------------


def write_ocf_bytes(
    schema_json: str | dict,
    rows,
    codec: str = "deflate",
    sync: bytes | None = None,
    rows_per_block: int = 1000,
) -> bytes:
    """Rows (dicts matching the record schema) → one OCF byte string."""
    sj = schema_json if isinstance(schema_json, str) else json.dumps(schema_json)
    sc = parse_schema(sj)
    sync = sync or uuid.uuid4().bytes
    out = bytearray(_MAGIC)
    meta_sc = parse_schema({"type": "map", "values": "bytes"})
    encode_datum(
        meta_sc,
        {"avro.schema": sj.encode(), "avro.codec": codec.encode()},
        out,
    )
    out += sync
    rows = list(rows)
    for i in range(0, max(len(rows), 0), rows_per_block):
        block = rows[i : i + rows_per_block]
        body = bytearray()
        for r in block:
            encode_datum(sc, r, body)
        if codec == "deflate":
            body = zlib.compress(bytes(body))[2:-4]  # raw deflate per spec
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        _write_long(out, len(block))
        _write_long(out, len(body))
        out += body
        out += sync
    return bytes(out)


def read_ocf_bytes(data: bytes) -> tuple[str, list[dict]]:
    """One OCF byte string → (writer schema JSON, decoded rows)."""
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta_sc = parse_schema({"type": "map", "values": "bytes"})
    meta, pos = decode_datum(meta_sc, data, 4)
    sj = meta["avro.schema"].decode()
    codec = meta.get("avro.codec", b"null").decode()
    sc = parse_schema(sj)
    sync = data[pos : pos + 16]
    pos += 16
    rows: list[dict] = []
    while pos < len(data):
        n, pos = _read_long(data, pos)
        size, pos = _read_long(data, pos)
        body = data[pos : pos + size]
        pos += size
        if codec == "deflate":
            body = zlib.decompress(body, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec}")
        bp = 0
        for _ in range(n):
            v, bp = decode_datum(sc, body, bp)
            rows.append(v)
        if data[pos : pos + 16] != sync:
            raise ValueError("sync marker mismatch (corrupt block boundary)")
        pos += 16
    return sj, rows


# ---------------------------------------------------------------------------
# schema mapping
# ---------------------------------------------------------------------------

_AVRO_TO_SPARK = {
    "null": T.NullType(),
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bytes": T.BinaryType(),
    "string": T.StringType(),
}


def avro_to_spark_type(sc: _Schema) -> T.DataType:
    # logical types first — what the spark-avro datasource returns for the
    # reference's decimal-heavy schemas (datalake/athena_ddl.sql:348-354)
    if sc.logical == "decimal":
        if sc.precision > 38:
            raise ValueError(
                f"decimal precision {sc.precision} exceeds Spark's max 38"
            )
        return T.DecimalType(sc.precision, sc.scale)
    if sc.logical == "date":
        return T.DateType()
    if sc.logical in ("timestamp-millis", "timestamp-micros"):
        return T.TimestampType()
    if sc.logical in ("local-timestamp-millis", "local-timestamp-micros"):
        return T.TimestampNTZType()
    if sc.kind in _AVRO_TO_SPARK:
        return _AVRO_TO_SPARK[sc.kind]
    if sc.kind in ("fixed",):
        return T.BinaryType()
    if sc.kind == "enum":
        return T.StringType()
    if sc.kind == "union":
        non_null = [b for b in sc.branches if b.kind != "null"]
        if len(non_null) != 1:
            raise ValueError("only [null, X] unions map to a Spark column")
        return avro_to_spark_type(non_null[0])
    if sc.kind == "record":
        return T.StructType(
            [T.StructField(n, avro_to_spark_type(f), True) for n, f in sc.fields]
        )
    if sc.kind == "array":
        return T.ArrayType(avro_to_spark_type(sc.items), True)
    if sc.kind == "map":
        return T.MapType(T.StringType(), avro_to_spark_type(sc.values), True)
    raise ValueError(f"unsupported kind {sc.kind}")


_SPARK_TO_AVRO = {
    T.BooleanType(): "boolean",
    T.IntegerType(): "int",
    T.ShortType(): "int",
    T.ByteType(): "int",
    T.LongType(): "long",
    T.FloatType(): "float",
    T.DoubleType(): "double",
    T.BinaryType(): "bytes",
    T.StringType(): "string",
}


def spark_to_avro_schema(dt: T.DataType, name: str = "row", _path: str = "") -> object:
    """Spark type → Avro schema JSON value (every field nullable, matching
    the reference's generated schemas — ``datalake/generate_schema.py``)."""
    if dt in _SPARK_TO_AVRO:
        return _SPARK_TO_AVRO[dt]
    if isinstance(dt, T.DecimalType):
        return {
            "type": "bytes",
            "logicalType": "decimal",
            "precision": dt.precision,
            "scale": dt.scale,
        }
    if isinstance(dt, T.TimestampType):
        # micros: Spark's native timestamp resolution (lossless round-trip)
        return {"type": "long", "logicalType": "timestamp-micros"}
    if isinstance(dt, T.TimestampNTZType):
        return {"type": "long", "logicalType": "local-timestamp-micros"}
    if isinstance(dt, T.DateType):
        return {"type": "int", "logicalType": "date"}
    if isinstance(dt, T.StructType):
        return {
            "type": "record",
            "name": name,
            "fields": [
                {
                    "name": f.name,
                    "type": ["null", spark_to_avro_schema(f.dataType, f"{name}_{f.name}")],
                    "default": None,
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": ["null", spark_to_avro_schema(dt.elementType, name)]}
    if isinstance(dt, T.MapType):
        if not isinstance(dt.keyType, T.StringType):
            raise ValueError("Avro maps require string keys")
        return {"type": "map", "values": ["null", spark_to_avro_schema(dt.valueType, name)]}
    raise ValueError(f"no Avro mapping for Spark type {dt}")


def _has_avro_datasource(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.spark.sql.avro.AvroFileFormat")
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# distributed read / write
# ---------------------------------------------------------------------------


def read_avro(
    spark: SparkSession,
    path: str,
    use_datasource: bool | None = None,
    reader_schema: T.StructType | None = None,
) -> DataFrame:
    """Read a directory/glob of Avro object container files as a DataFrame.

    ``use_datasource=None`` auto-detects the spark-avro jar and prefers it
    (JVM decode); without it the pure-Python spec implementation decodes
    file-per-task via ``binaryFile`` + ``mapInPandas``.  Hive-style
    partition directories in the path (the reference's
    ``adding_date=YYYYMMDD/``) surface as columns in datasource mode; in
    jar-less mode derive them from ``_source_file`` if needed — the column
    is appended so lineage survives the decode.

    Mixed-schema file sets (the reference's lake evolves additively —
    ``createdb.sql`` ALTERs propagating through
    ``datalake/generate_schema.py``) are handled in jar-less mode by
    decoding each file against its OWN embedded writer schema
    (``read_ocf_bytes``) and conforming to the additive union of all file
    schemas: a column absent from a file surfaces as NULL for its rows, in
    both the added-later and removed-later directions.  Pass
    ``reader_schema`` to skip the header-discovery pass and pin the output
    columns explicitly (columns absent from a file → NULL; file columns
    outside the reader schema → dropped).  Same-named fields with
    conflicting Spark types across files raise — silent coercion loses
    data."""
    if use_datasource is None:
        use_datasource = _has_avro_datasource(spark)
    if use_datasource:
        df = spark.read.format("avro").load(path)
        if reader_schema is not None:
            # honor the same reader-schema contract as the jar-less decoder
            # — otherwise code written against it in the sandbox would
            # silently change shape on a cluster with the jar
            df = _conform_to_reader_schema(df, reader_schema)
        return df

    if reader_schema is not None:
        spark_schema = reader_schema
    else:
        spark_schema = _union_file_schemas(_list_avro_files(path))
    out_schema = T.StructType(
        list(spark_schema.fields) + [T.StructField("_source_file", T.StringType(), True)]
    )
    names = [f.name for f in out_schema.fields]

    def _decode(batches):
        for pdf in batches:
            for path_, content in zip(pdf["path"], pdf["content"]):
                _, rows = read_ocf_bytes(bytes(content))
                pdf_out = pd.DataFrame(rows) if rows else pd.DataFrame()
                pdf_out["_source_file"] = path_
                # conform to the union schema: absent columns (schema
                # evolution in either direction) become NULL via an
                # object-dtype column — never NaN-float, which can trip
                # the Arrow cast for integral types.
                for n in names:
                    if n not in pdf_out.columns:
                        pdf_out[n] = pd.Series([None] * len(pdf_out), dtype=object)
                yield pdf_out[names]

    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", "*.avro")
        .load(path)
    )
    return files.select("path", "content").mapInPandas(_decode, out_schema)


def _conform_to_reader_schema(df: DataFrame, reader_schema: T.StructType) -> DataFrame:
    """Project ``df`` onto ``reader_schema``: absent columns -> typed NULL,
    extra columns -> dropped, present columns -> cast to the reader type.
    Keeps the datasource (jar) branch of ``read_avro`` on the same
    reader-schema contract as the jar-less decoder."""
    return df.select(*[
        (F.col(f.name).cast(f.dataType) if f.name in df.columns
         else F.lit(None).cast(f.dataType)).alias(f.name)
        for f in reader_schema.fields
    ])


def _list_avro_files(path: str) -> list[str]:
    import glob as _glob

    pat = path if "*" in path else os.path.join(path, "**", "*.avro")
    hits = sorted(_glob.glob(pat, recursive=True))
    if not hits:
        raise FileNotFoundError(f"no .avro files under {path}")
    return hits


def _file_schema_json(fpath: str) -> str:
    """Writer schema JSON of one OCF, reading only the header region.

    Headers are KBs, and schema discovery runs on the driver over EVERY
    file of a migrated lake (10^4–10^5 files) — so read tiered: 64 KB
    covers real headers, 4 MB a pathological multi-MB schema, 64 MB as
    the hard last tier.  A flat multi-MB read per file would turn plan
    time into tens of GB of driver I/O — and the final tier is CAPPED
    because a corrupt or non-OCF file must raise a clear error, not pull
    a multi-GB file into driver RAM across the 16-thread discovery pool."""
    with open(fpath, "rb") as fh:
        head = b""
        last_err: Exception | None = None
        for more in (64 << 10, (4 << 20) - (64 << 10), (64 << 20) - (4 << 20)):
            head += fh.read(more)
            try:
                sj, _ = _read_header_only(head)
                json.loads(sj)
                return sj
            except Exception as e:
                last_err = e
    raise ValueError(
        f"unparseable Avro header in {fpath} (no valid OCF header within "
        f"the first 64 MB): {last_err}"
    )


def _union_file_schemas(files: list[str]) -> T.StructType:
    """Additive union of the files' writer schemas, first-seen field order.

    Driver-side header reads only (the jar-less path already assumes a
    shared filesystem — see ``write_avro``), thread-pooled because each is
    a small independent I/O wait; distinct schema JSONs are memoised so an
    evolved lake with millions of files but a handful of schema versions
    parses each version once.  ``ex.map`` preserves input order, keeping
    the first-seen field order deterministic; its results are consumed
    AS THEY ARRIVE (each yielded schema string is dropped right after the
    dedup check) — collecting them into a list first would hold 10^6
    multi-KB strings on the driver at once for a lake with a handful of
    distinct versions."""
    from concurrent.futures import ThreadPoolExecutor

    fields: dict[str, T.StructField] = {}
    seen_json: set[str] = set()
    with ThreadPoolExecutor(max_workers=min(16, max(1, len(files)))) as ex:
        for fpath, sj in zip(files, ex.map(_file_schema_json, files)):
            if sj in seen_json:
                continue
            seen_json.add(sj)
            sc = parse_schema(sj)
            if sc.kind != "record":
                raise ValueError("top-level Avro schema must be a record")
            for f in avro_to_spark_type(sc).fields:
                prev = fields.get(f.name)
                if prev is None:
                    fields[f.name] = T.StructField(f.name, f.dataType, True)
                elif prev.dataType != f.dataType:
                    raise ValueError(
                        f"conflicting Avro types for column {f.name!r}: "
                        f"{prev.dataType} vs {f.dataType} (in {fpath}); pass "
                        "reader_schema= to resolve explicitly"
                    )
    return T.StructType(list(fields.values()))


def _read_header_only(data: bytes) -> tuple[str, bytes]:
    if data[:4] != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta_sc = parse_schema({"type": "map", "values": "bytes"})
    meta, pos = decode_datum(meta_sc, data, 4)
    return meta["avro.schema"].decode(), data[pos : pos + 16]


def write_avro(
    df: DataFrame,
    path: str,
    codec: str = "deflate",
    use_datasource: bool | None = None,
) -> int:
    """Write a DataFrame as Avro object container files, one file per
    partition (the caller controls file count/size with coalesce /
    repartition, same as any Spark write).  Returns rows written.

    Jar-less mode encodes each Arrow batch stream on its executor and
    writes ``part-<uuid>.avro`` directly under ``path`` — valid wherever
    the executors and driver share the filesystem (local mode, NFS); a
    multi-node object-store deployment should ship the jar and take the
    datasource path instead."""
    spark = df.sparkSession
    if use_datasource is None:
        use_datasource = _has_avro_datasource(spark)
    if use_datasource:
        df.write.format("avro").mode("overwrite").save(path)
        return -1

    avro_schema = spark_to_avro_schema(df.schema, "row")
    sj = json.dumps(avro_schema)
    os.makedirs(path, exist_ok=True)
    cols = df.columns

    def _encode(batches):
        rows: list[dict] = []
        for pdf in batches:
            for rec in pdf.to_dict("records"):
                rows.append({c: _to_py(rec[c]) for c in cols})
        n = 0
        if rows:
            data = write_ocf_bytes(sj, rows, codec=codec)
            fn = os.path.join(path, f"part-{uuid.uuid4().hex}.avro")
            with open(fn + ".tmp", "wb") as fh:
                fh.write(data)
            os.rename(fn + ".tmp", fn)  # publish whole files only
            n = len(rows)
        yield pd.DataFrame({"n": [n]})

    counts = df.mapInPandas(_encode, "n long").groupBy().sum("n").collect()
    return int(counts[0][0])


def _to_py(v):
    """Arrow/pandas cell → plain Python for the datum encoder."""
    import numpy as np

    if v is None or v is pd.NaT or (isinstance(v, float) and v != v):
        return None
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, np.ndarray):
        return [_to_py(x) for x in v]
    if isinstance(v, (list, tuple)):
        return [_to_py(x) for x in v]
    if isinstance(v, dict):
        return {k: _to_py(x) for k, x in v.items()}
    return v


# ---------------------------------------------------------------------------
# envelope bridge: Avro-framed CDC values → the JSON envelope path
# ---------------------------------------------------------------------------


def _strip_logical(node):
    """Schema JSON value with every ``logicalType`` annotation removed —
    the envelope bridge decodes physical values only."""
    if isinstance(node, dict):
        return {
            k: _strip_logical(v) for k, v in node.items() if k != "logicalType"
        }
    if isinstance(node, list):
        return [_strip_logical(v) for v in node]
    return node


def avro_values_to_json(
    frames: DataFrame,
    writer_schema: str | dict,
    value_col: str = "value",
    confluent_wire: bool = False,
) -> DataFrame:
    """Kafka frames whose ``value`` is a single Avro datum → the same
    frames with ``value`` re-encoded as the JSON document
    :func:`ton_etl_spark.cdc.envelope.parse_cdc_envelope` expects, so the
    WHOLE existing envelope path (corrupt-record guard, op filter, table
    routing, meta strip) is reused unchanged — decode once at the edge,
    keep the JVM plan after it.

    ``confluent_wire=True`` strips the Confluent Schema Registry framing
    (magic 0x00 + 4-byte schema id) the standard Debezium+Avro deployment
    prepends.  ``bytes`` fields become base64 strings (what Spark's
    ``from_json`` expects for a binary column); undecodable values become
    NULL and fall into the envelope's corrupt-record drop.

    Logical-type annotations are STRIPPED before decoding: the envelope
    path owns its value semantics downstream (Debezium decimals decode
    via ``functions/debezium.py`` from the base64 bytes+scale, matching
    the reference ``datalake/converters/converter.py:41-47``), so the
    wire bytes must arrive raw, not pre-converted to Python Decimals."""
    import base64

    sj = json.dumps(
        _strip_logical(
            json.loads(writer_schema) if isinstance(writer_schema, str) else writer_schema
        )
    )

    @F.pandas_udf("string")
    def _datum_to_json(vals: pd.Series) -> pd.Series:
        sc = parse_schema(sj)

        def conv(b):
            if b is None:
                return None
            try:
                raw = bytes(b)
                if confluent_wire:
                    if raw[:1] != b"\x00":
                        return None
                    raw = raw[5:]
                v, _ = decode_datum(sc, raw, 0)
                return json.dumps(_jsonable(v))
            except Exception:
                return None  # -> corrupt-record drop downstream

        def _jsonable(v):
            if isinstance(v, bytes):
                return base64.b64encode(v).decode()
            if isinstance(v, dict):
                return {k: _jsonable(x) for k, x in v.items()}
            if isinstance(v, list):
                return [_jsonable(x) for x in v]
            return v

        return pd.Series([conv(b) for b in vals])

    return frames.withColumn(value_col, _datum_to_json(F.col(value_col)).cast("binary"))


def encode_avro_values(
    frames: DataFrame,
    writer_schema: str | dict,
    value_col: str = "value",
    confluent_wire: bool = False,
) -> DataFrame:
    """Test/bench twin of :func:`avro_values_to_json`: JSON-valued Kafka
    frames → single-datum Avro values (optionally Confluent-framed), i.e.
    what a Debezium+Avro producer would put on the wire.  Logical types
    are stripped symmetrically with the decoder — the wire carries
    physical values."""
    sj = json.dumps(
        _strip_logical(
            json.loads(writer_schema) if isinstance(writer_schema, str) else writer_schema
        )
    )

    @F.pandas_udf("binary")
    def _json_to_datum(vals: pd.Series) -> pd.Series:
        import base64

        sc = parse_schema(sj)
        byte_fields = set()
        if sc.kind == "record":
            for n, f in sc.fields:
                branches = f.branches if f.kind == "union" else [f]
                if any(b.kind == "bytes" for b in branches):
                    byte_fields.add(n)

        def conv(b):
            if b is None:
                return None
            d = json.loads(bytes(b).decode("utf-8"))
            for k in byte_fields:
                if d.get(k) is not None:
                    d[k] = base64.b64decode(d[k])
            out = bytearray(b"\x00\x00\x00\x00\x01" if confluent_wire else b"")
            encode_datum(sc, d, out)
            return bytes(out)

        return pd.Series([conv(b) for b in vals])

    return frames.withColumn(value_col, _json_to_datum(F.col(value_col)))
