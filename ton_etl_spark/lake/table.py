"""LakeTable — a minimal, from-scratch versioned Parquet table format.

Plays the role Iceberg/Postgres play in the reference pipeline
(ton-etl keeps keyed state in Postgres with ``ON CONFLICT`` upserts,
``parser/db.py:258-330``, and append-only S3 Avro/Parquet partitions,
``datalake/main.py:147-186``).  No Iceberg jars are available in this
environment, so the table format itself is built here on public Spark +
filesystem APIs.  Design goals, in order:

1. **Atomic, versioned commits** — a commit is (a) new data files under a
   fresh commit directory, then (b) a new immutable snapshot JSON, then
   (c) an atomic ``os.replace`` of the ``_current`` pointer.  Readers only
   ever see the file list of a published snapshot, so a crashed writer
   leaves garbage data files but never a torn table (the same
   write-files-then-commit ordering the reference uses: upload to S3,
   *then* Kafka commit, ``datalake/main.py:147-186``).
2. **Idempotent re-application** — every commit carries an application-level
   ``commit_key`` (e.g. the streaming ``(checkpoint_epoch)``).  A commit
   whose key was already applied is skipped, which is what makes
   ``foreachBatch`` retries exactly-once (reference analog:
   ``ON CONFLICT DO NOTHING`` + Athena ``EXCEPT`` dedup,
   ``parser/db.py:279-283``, ``datalake_daily_sync.py:301-328``).
   The applied-key record is BOUNDED, not O(history): keys in the RESERVED
   streaming namespace (``WATERMARK_PREFIXES``, i.e. ``epoch=N`` where
   Spark guarantees monotone batch ids) are covered by a high-watermark
   integer, and the last ``RECENT_KEYS_MAX`` keys are kept verbatim for
   everything else.  Watermark coverage is opt-in by prefix precisely so
   an ad-hoc numeric key (``backfill=3`` after ``backfill=7``) can never
   be silently swallowed; reserved-prefix skips are logged.
   Upgrade note (pre-release): tables written before watermark coverage
   became opt-in may carry ``commit_watermarks`` under other prefixes;
   those stored watermarks are now ignored, so a replay of such an old key
   is deduplicated only within the recent-keys window.  No such deployed
   tables exist; if one ever does, migrate its non-``epoch`` watermarks
   into ``recent_commit_keys`` before upgrading.
3. **Hash-bucketed layout** — every data file belongs to one bucket of
   ``pmod(murmur3(key), n_buckets)`` (Spark's ``F.hash``; see
   ``bucket_of``).  The bucket function is RECORDED in the snapshot
   (``properties['bucket_fn']``) and validated on every bucket-dependent
   operation — a reader/writer built against a different hash fails loudly
   instead of silently mis-pruning.  MERGE reads and rewrites only the
   buckets touched by the incoming batch (bucket pruning), so a small
   change batch against a 100 TB table rewrites a bounded slice, not the
   world.  At 1000-executor scale ``n_buckets`` is sized so one bucket is
   a few GB (reference analog: ``bucketed_by address ×10``,
   ``datalake/metadata_snapshot.py:88-89``).
   **Per-bucket manifests** keep commit metadata O(touched buckets): the
   snapshot JSON stores only a bucket→manifest-file pointer map; the file
   lists live in immutable per-bucket manifest JSONs (Iceberg-style).  A
   commit writes new manifests for the buckets it touched and re-points
   the rest — at 10^4 epochs × 10^5 files the snapshot stays a few KB
   instead of growing quadratically in driver I/O.
4. **Additive schema evolution** — the snapshot stores the table schema;
   a commit may widen it with new nullable columns.  Readers pass the
   *current* schema to the Parquet scan, so old files yield NULL for
   late-added columns (reference analog: ``ALTER TABLE ... ADD COLUMN IF
   NOT EXISTS``, ``parser/createdb.sql:93,114-121``, and Glue auto-create,
   ``datalake_daily_sync.py:268-296``).

Concurrency contract: single writer per table (exactly how the reference
runs one consumer-group per sink table) — and since round 4 the contract
is ENFORCED, not just documented: ``_publish`` is an optimistic
compare-and-swap on the ``_current`` pointer, so a second writer racing a
commit gets ``CommitConflictError`` instead of silently dropping the
winner's snapshot.  Readers are lock-free.
"""

from __future__ import annotations

import json
import logging
import os
import re
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG = logging.getLogger(__name__)

META_DIR = "_meta"
MANIFEST_DIR = os.path.join(META_DIR, "manifests")
DATA_DIR = "data"
CURRENT_PTR = "_current"
BUCKET_COL = "__bucket"

# bounded idempotency record (see module docstring §2)
RECENT_KEYS_MAX = 1024
_NUMERIC_KEY = re.compile(r"(.*)=(\d+)\Z")

# Watermark coverage is OPT-IN per prefix: only keys in this reserved
# streaming namespace ('epoch=<batch_id>', issued by cdc/apply and
# cdc/stream, where Spark guarantees monotone batch ids) are covered by
# the high-watermark integer.  Any other numeric-suffixed key (an ad-hoc
# 'backfill=3' issued after 'backfill=7', or a second writer with a fresh
# checkpoint) is deduplicated within the recent-keys window ONLY — it can
# never be silently swallowed by a watermark whose monotonicity contract
# it does not honor.
WATERMARK_PREFIXES = frozenset({"epoch"})

# recorded in Snapshot.properties and validated on every bucket-dependent
# operation: changing the hash silently mis-prunes existing tables
BUCKET_FN_ID = "murmur3_v1"


class CommitConflictError(Exception):
    """Another writer published a snapshot after this commit read its base
    version.  The losing commit's data files are unreferenced orphans
    (``expire_snapshots`` collects them); the table itself is untouched.
    Retry the whole operation — it must re-read the NEW current state, not
    just re-publish (the merge's winners were computed against stale
    data)."""


def _numeric_epoch(commit_key: str) -> tuple[str, int] | None:
    """('epoch', 42) for 'epoch=42'; None for non-numeric keys.  The PREFIX
    is part of the watermark identity: 'compact=3' must never be considered
    covered because stream epochs reached 'epoch=99'."""
    m = _NUMERIC_KEY.match(commit_key)
    return (m.group(1), int(m.group(2))) if m else None


def bucket_of(key_cols: list[str], n_buckets: int):
    """Bucket id of a key — ``pmod(murmur3(key), n)``, DELIBERATELY identical
    to Spark's ``HashPartitioning.partitionIdExpression`` (``F.hash`` is
    murmur3 with the same seed 42).  Consequence: any shuffle hashed on the
    key columns with ``numPartitions == n_buckets`` (a plain ``groupBy`` with
    ``spark.sql.shuffle.partitions = n_buckets``) yields output partitions
    that ARE the storage buckets — the MERGE write needs no further
    repartition, saving a full-payload shuffle per commit.  This is the
    local-format analog of Iceberg's storage-partitioned join/write."""
    return F.pmod(F.hash(*[F.col(c) for c in key_cols]), F.lit(n_buckets)).cast("int")


@dataclass
class DataFile:
    path: str  # relative to table root
    bucket: int
    rows: int
    # per-column [min, max] bounds harvested from the Parquet footer at
    # commit time (Iceberg's file-level column metrics).  None/absent column
    # => no bounds known => the file can never be skipped on that column.
    stats: dict[str, list[Any]] | None = None

    def to_json(self) -> dict[str, Any]:
        d: dict[str, Any] = {"path": self.path, "bucket": self.bucket, "rows": self.rows}
        if self.stats:
            d["stats"] = self.stats
        return d

    @staticmethod
    def from_json(d: dict[str, Any]) -> "DataFile":
        return DataFile(
            path=d["path"], bucket=int(d["bucket"]), rows=int(d["rows"]),
            stats=d.get("stats"),
        )


def _stats_encode(v: Any) -> Any:
    """JSON-encodable, ORDER-PRESERVING encoding for footer bounds and
    predicate values — both sides of every skip comparison go through this,
    so the only requirement is that the encoding preserve the column's
    order.  int/float/bool/str are ordered as-is; datetime/date use
    ISO-8601 (lexicographic == chronological for a fixed format — pyarrow
    returns naive UTC for Spark-written timestamps).  Anything else
    (binary, nested, decimal) returns None => no stats recorded => never
    skipped."""
    import datetime as _dt

    if isinstance(v, bool) or v is None:
        return None  # bool bounds are useless; NULL has no order
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, _dt.datetime):
        # canonicalize to NAIVE UTC: a tz-aware predicate against a naive
        # stored bound (or vice versa) would compare the '+00:00' suffix
        # lexicographically and mis-order exact-boundary values — which on
        # the skip side means silently dropping a matching file
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return None


def _stats_encodable(dt: "T.DataType") -> bool:
    """Whether ``_stats_encode`` can ever produce bounds for values of this
    Spark type — the TYPE-level twin of the value-level encoder.  Callers
    that reason about missing bounds (e.g. ``zorder_needed``'s coverage
    rule) must not treat a column that can NEVER carry bounds (boolean,
    decimal, binary, nested) as 'needs a rewrite to record them' — the
    rewrite would record nothing and the check would fire forever."""
    return isinstance(
        dt,
        (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.StringType,
            T.TimestampType, T.TimestampNTZType, T.DateType,
        ),
    )


def _file_may_match_in(f: DataFile, enc_in: dict[str, list]) -> bool:
    """Conservative in-list skip test: False only when the file's [min,
    max] bounds prove NO probe value can be present.  ``enc_in`` values
    are pre-encoded AND sorted (once per read), so each file test is a
    bisect, not a scan — a 10^4-value probe list over a 10^5-file snapshot
    stays O(files × log values) driver work.  A probe value that failed to
    encode keeps the column unprunable (empty list sentinel)."""
    import bisect

    if not f.stats:
        return True
    for col, vals in enc_in.items():
        if not vals:  # unencodable probe value present: cannot prune
            continue
        bounds = f.stats.get(col)
        if not bounds:
            continue
        fmin, fmax = bounds
        try:
            i = bisect.bisect_left(vals, fmin)
            if i >= len(vals) or vals[i] > fmax:
                return False
        except TypeError:
            continue  # mixed encodings: unknowable, keep the file
    return True


def _conform_where_in(
    schema: T.StructType, where_in: dict[str, list]
) -> dict[str, list]:
    """Cast ``where_in`` probe values to their column's Spark type BEFORE
    bucket hashing, manifest encoding, and the residual filter — dropping
    values the type cannot represent (they can equal no stored row).

    One conversion, three consumers.  The alternative — letting Spark
    coerce inside ``isin`` — is unsound twice over: under ANSI mode (the
    Spark 4 default) a string column probed with an int CASTS THE COLUMN
    and throws CAST_INVALID_INPUT on the first non-numeric row, and the
    coerced comparison ('07' = 7) would disagree with the bucket hash of
    the stringified probe, silently missing rows in pruned reads.  After
    conformance every comparison is same-type: no column cast, no ANSI
    crash, hash and filter agree.  NULLs pass through (they never match
    ``isin`` but the encoder's unprunable sentinel must see them);
    unknown columns pass through so the filter raises Spark's own
    unresolved-column error."""
    import datetime as _dt
    from decimal import Decimal, InvalidOperation

    names = set(schema.fieldNames())
    out: dict[str, list] = {}
    for col, vals in where_in.items():
        if col not in names:
            out[col] = list(vals)
            continue
        dt = schema[col].dataType
        conv: list = []
        for v in vals:
            if v is None:
                conv.append(None)
                continue
            try:
                if isinstance(
                    dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
                ):
                    if isinstance(v, bool):
                        continue
                    if isinstance(v, float) and not v.is_integer():
                        continue  # 7.5 can equal no integral value
                    if isinstance(v, Decimal) and v % 1 != 0:
                        continue  # int() would TRUNCATE Decimal('7.5') to 7
                    conv.append(int(v))
                elif isinstance(dt, (T.FloatType, T.DoubleType)):
                    if isinstance(v, bool):
                        continue
                    conv.append(float(v))
                elif isinstance(dt, T.StringType):
                    conv.append(v if isinstance(v, str) else str(v))
                elif isinstance(dt, T.DecimalType):
                    conv.append(v if isinstance(v, Decimal) else Decimal(str(v)))
                elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                    if isinstance(v, str):
                        conv.append(_dt.datetime.fromisoformat(v))
                    elif isinstance(v, _dt.datetime):
                        conv.append(v)
                    # anything else (epoch int/float) is dropped: guessing
                    # the unit (s/ms/us) risks a silent wrong match, and
                    # passing it raw is an ANSI analysis error — the
                    # contract is "unrepresentable matches nothing"
                elif isinstance(dt, T.DateType):
                    if isinstance(v, str):
                        conv.append(_dt.date.fromisoformat(v))
                    elif isinstance(v, _dt.date):
                        conv.append(v)  # datetime is a date subclass: ok
                elif isinstance(dt, T.BooleanType):
                    if not isinstance(v, bool):
                        continue
                    conv.append(v)
                else:
                    conv.append(v)  # binary/nested: as-given
            except (TypeError, ValueError, InvalidOperation):
                continue  # unrepresentable in the column type
        out[col] = conv
    return out


def _conform_where_bounds(
    schema: T.StructType, where: dict[str, tuple]
) -> dict[str, tuple]:
    """Cast ``where`` range bounds to their column's Spark type, for the
    same two reasons as ``_conform_where_in``: under ANSI a mistyped bound
    CASTS THE COLUMN (a string column with an int bound throws
    CAST_INVALID_INPUT on the first non-numeric row), and a raw-typed
    bound compares as mixed-type against the manifest stats, silently
    disabling file skipping.  Range semantics differ from point probes:

    - a bound the type cannot represent RAISES ValueError (dropping it
      would silently widen the range — the opposite of a probe value,
      which can simply match nothing);
    - a fractional bound on an integral column rounds INWARD (lo: ceil,
      hi: floor), which is exactly equivalent;
    - ISO-8601 strings conform to date/timestamp columns — the only form
      a JSON surface like ``maintain --delete-where`` can express.

    NULL bounds (open-ended) and unknown columns pass through."""
    import datetime as _dt
    import math
    from decimal import Decimal, InvalidOperation

    names = set(schema.fieldNames())

    def one(col, v, is_lo: bool):
        if v is None or col not in names:
            return v
        dt = schema[col].dataType
        try:
            if isinstance(
                dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ):
                if isinstance(v, bool):
                    raise ValueError
                if isinstance(v, str):
                    v = float(v) if ("." in v or "e" in v.lower()) else int(v)
                if isinstance(v, int):
                    return v
                v = float(v)  # Decimal and friends round inward too
                return math.ceil(v) if is_lo else math.floor(v)
            if isinstance(dt, (T.FloatType, T.DoubleType)):
                if isinstance(v, bool):
                    raise ValueError
                return float(v)
            if isinstance(dt, T.StringType):
                if not isinstance(v, str):
                    # int 7 -> "7" would silently switch the caller from
                    # numeric to lexicographic order; make them choose
                    raise ValueError
                return v
            if isinstance(dt, T.DecimalType):
                return v if isinstance(v, Decimal) else Decimal(str(v))
            if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
                if isinstance(v, str):
                    return _dt.datetime.fromisoformat(v)
                if isinstance(v, _dt.datetime):
                    return v
                raise ValueError  # epoch ints: unit guess = silent wrong range
            if isinstance(dt, T.DateType):
                if isinstance(v, str):
                    return _dt.date.fromisoformat(v)
                if isinstance(v, _dt.date):
                    return v
                raise ValueError
            return v
        except (TypeError, ValueError, InvalidOperation):
            raise ValueError(
                f"where bound {v!r} is not representable in column "
                f"{col!r} of type {dt.simpleString()}"
            ) from None

    return {
        col: (one(col, lo, True), one(col, hi, False))
        for col, (lo, hi) in where.items()
    }


def _encode_probe_lists(conv, where_in: dict[str, list]) -> dict[str, list]:
    """Pre-encode ``where_in`` probe lists for ``_file_may_match_in`` —
    the ONE implementation of the sentinel contract (sorted for the bisect;
    ``[]`` marks a column unprunable when any probe value is NULL or
    unencodable / unorderable), shared by ``LakeTable.read`` and
    ``maintenance.delete_where``.  The skip test's exactness depends on
    every call site encoding identically, so this must not be inlined."""
    enc_in: dict[str, list] = {}
    for c, vals in where_in.items():
        ev = [_stats_encode(conv(v)) for v in vals]
        try:
            enc_in[c] = sorted(ev) if None not in ev else []
        except TypeError:
            enc_in[c] = []
    return enc_in


def _file_may_match(f: DataFile, enc_where: dict[str, tuple[Any, Any]]) -> bool:
    """Conservative skip test: False only when a file's stored [min, max]
    bounds PROVE no row can satisfy every range.  Missing stats (old
    manifests, un-tracked columns, un-encodable predicate values) keep the
    file — skipping is an optimization, never a filter.  ``enc_where``
    values are PRE-ENCODED via ``_stats_encode`` (done once per read, not
    once per file — a snapshot can list 10^5 files)."""
    if not f.stats:
        return True
    for col, (plo, phi) in enc_where.items():
        bounds = f.stats.get(col)
        if not bounds:
            continue
        fmin, fmax = bounds
        # mixed encodings (e.g. int bound vs str predicate) would raise on
        # compare — treat as unknowable, keep the file
        try:
            if plo is not None and fmax < plo:
                return False
            if phi is not None and fmin > phi:
                return False
        except TypeError:
            continue
    return True


@dataclass
class Snapshot:
    version: int
    schema_json: str
    n_buckets: int
    key_cols: list[str]
    # bucket -> manifest file path (relative to table root); the per-bucket
    # file lists live in those immutable manifests, not here
    manifests: dict[int, str] = field(default_factory=dict)
    # bounded idempotency record: per-PREFIX high watermarks over numeric
    # '<prefix>=N' keys plus the most recent keys verbatim (see module
    # docstring §2)
    commit_watermarks: dict[str, int] = field(default_factory=dict)
    recent_commit_keys: list[str] = field(default_factory=list)
    properties: dict[str, str] = field(default_factory=dict)
    # set by LakeTable when loading, so .files can resolve manifests
    _root: str | None = field(default=None, repr=False, compare=False)

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(json.loads(self.schema_json))

    def has_commit_key(self, commit_key: str) -> bool:
        if commit_key in self.recent_commit_keys:
            return True
        pn = _numeric_epoch(commit_key)
        if pn is None or pn[0] not in WATERMARK_PREFIXES:
            return False
        wm = self.commit_watermarks.get(pn[0], -1)
        if pn[1] <= wm:
            # visible, not silent: for a checkpoint replay this is the
            # expected exactly-once skip; for an out-of-order writer it is
            # the first symptom of a broken monotonicity contract.
            _LOG.info(
                "commit key %r already covered by %r watermark %d — skipping",
                commit_key,
                pn[0],
                wm,
            )
            return True
        return False

    def advanced_keys(self, commit_key: str | None) -> tuple[dict[str, int], list[str]]:
        """(watermarks, recent keys) after recording ``commit_key``."""
        wms = dict(self.commit_watermarks)
        if commit_key is None:
            return wms, list(self.recent_commit_keys)
        pn = _numeric_epoch(commit_key)
        if pn is not None and pn[0] in WATERMARK_PREFIXES:
            wms[pn[0]] = max(wms.get(pn[0], -1), pn[1])
        recent = (self.recent_commit_keys + [commit_key])[-RECENT_KEYS_MAX:]
        return wms, recent

    def files_for(self, buckets: list[int] | None = None) -> list[DataFile]:
        """Resolve the data-file list from the per-bucket manifests (only
        the manifests of ``buckets`` are opened when given)."""
        if self._root is None:
            raise ValueError("snapshot not bound to a table root")
        sel = self.manifests
        if buckets is not None:
            bset = set(buckets)
            sel = {b: p for b, p in sel.items() if b in bset}
        ordered = [sel[b] for b in sorted(sel)]
        if len(ordered) <= 4:
            out: list[DataFile] = []
            for rel in ordered:
                with open(os.path.join(self._root, rel)) as fh:
                    out.extend(DataFile.from_json(f) for f in json.load(fh))
            return out
        # many buckets: open manifests concurrently — serial ~ms opens add a
        # fixed driver cost per read that hurts scaling (same Amdahl note as
        # the commit-time footer stats)
        from concurrent.futures import ThreadPoolExecutor

        def _load(rel: str) -> list[DataFile]:
            with open(os.path.join(self._root, rel)) as fh:
                return [DataFile.from_json(f) for f in json.load(fh)]

        with ThreadPoolExecutor(max_workers=16) as pool:
            parts = list(pool.map(_load, ordered))
        return [f for part in parts for f in part]

    @property
    def files(self) -> list[DataFile]:
        return self.files_for()

    def to_json(self) -> dict[str, Any]:
        return {
            "version": self.version,
            "schema_json": self.schema_json,
            "n_buckets": self.n_buckets,
            "key_cols": self.key_cols,
            "manifests": {str(b): p for b, p in self.manifests.items()},
            "commit_watermarks": self.commit_watermarks,
            "recent_commit_keys": self.recent_commit_keys,
            "properties": self.properties,
        }

    @staticmethod
    def from_json(d: dict[str, Any]) -> "Snapshot":
        if "manifests" not in d:
            raise ValueError(
                "unsupported snapshot layout (pre-manifest format with a "
                "'files' list); this engine reads the per-bucket-manifest "
                "format — rewrite the table or migrate its metadata"
            )
        return Snapshot(
            version=int(d["version"]),
            schema_json=d["schema_json"],
            n_buckets=int(d["n_buckets"]),
            key_cols=list(d["key_cols"]),
            manifests={int(b): p for b, p in d["manifests"].items()},
            commit_watermarks={k: int(v) for k, v in d["commit_watermarks"].items()},
            recent_commit_keys=list(d["recent_commit_keys"]),
            properties=dict(d.get("properties", {})),
        )


# Safe lossless promotion chains (the Iceberg v2 `promote` set, which is
# also exactly what Spark 4's Parquet readers upcast in place — verified:
# int32 files read under a bigint/double/array<bigint> schema return the
# original values, so widening needs NO file rewrite).
_INT_RANK = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}


def _widen_type(a: T.DataType, b: T.DataType) -> T.DataType | None:
    """The narrower-to-wider merge of two types, or None when the pair is
    not on a lossless promotion chain.  Arrays widen element-wise (a
    per-field promotion, same as Iceberg's nested-field promotion)."""
    sa, sb = a.simpleString(), b.simpleString()
    if sa == sb:
        return a
    if sa in _INT_RANK and sb in _INT_RANK:
        return a if _INT_RANK[sa] >= _INT_RANK[sb] else b
    if {sa, sb} == {"float", "double"}:
        return T.DoubleType()
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType) and a.scale == b.scale:
        return a if a.precision >= b.precision else b
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        el = _widen_type(a.elementType, b.elementType)
        if el is not None:
            return T.ArrayType(el, a.containsNull or b.containsNull)
    return None


def _merge_schemas(
    base: T.StructType, incoming: T.StructType, allow_widening: bool = False
) -> T.StructType:
    """Additive schema union: base columns keep position; new incoming
    columns are appended as nullable.  Type changes are rejected by
    default (the reference only ever evolves additively); with
    ``allow_widening`` (the table's ``type_widening`` property, Iceberg's
    ``promote``) a column may move UP a lossless chain — tinyint→…→bigint,
    float→double, decimal precision growth, arrays element-wise — and the
    merged schema takes the wider side regardless of which side is new
    (a narrower incoming batch is simply cast up by ``_conform``).
    Lossy changes (string→int, bigint→int as the *merged* result, scale
    changes) still fail loudly."""
    base_names = {f.name: f for f in base.fields}
    out = list(base.fields)
    for f in incoming.fields:
        if f.name in base_names:
            # nullability differences (e.g. parquet round-trip relaxing
            # containsNull) are not evolution; compare erased types only
            bf = base_names[f.name]
            if f.dataType.simpleString() != bf.dataType.simpleString():
                wide = _widen_type(bf.dataType, f.dataType) if allow_widening else None
                if wide is None:
                    raise ValueError(
                        f"incompatible evolution for column {f.name}: "
                        f"{bf.dataType} -> {f.dataType}"
                    )
                if wide.simpleString() != bf.dataType.simpleString():
                    out[out.index(bf)] = T.StructField(f.name, wide, True)
        else:
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out)


class LakeTable:
    """A bucketed, versioned Parquet table with atomic commits."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)

    # ------------------------------------------------------------------ paths
    @property
    def _meta(self) -> str:
        return os.path.join(self.root, META_DIR)

    def _snapshot_path(self, version: int) -> str:
        return os.path.join(self._meta, f"v{version}.json")

    # ------------------------------------------------------------------ lifecycle
    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 16,
        properties: dict[str, str] | None = None,
        target_file_rows: int | None = None,
        stats_cols: list[str] | None = None,
        sort_cols: list[str] | None = None,
        type_widening: bool = False,
        bloom_cols: list[str] | None = None,
    ) -> "LakeTable":
        """``target_file_rows``: when set, every commit splits each bucket's
        output at this row count (``maxRecordsPerFile``) instead of writing
        one file per bucket — the Iceberg ``write.target-file-size`` role.
        Without it a hot/compacted bucket becomes one multi-GB file: a
        straggler task and an executor-memory hazard at 100 TB.  Rows, not
        bytes, because rows are what the writer can bound deterministically;
        size n_buckets × target_file_rows so a file lands in the hundreds
        of MB for the table's row width.

        ``stats_cols``: columns whose per-file [min, max] bounds are
        harvested from the Parquet footers at commit time and stored in the
        manifests (Iceberg column metrics).  ``read(where=...)`` skips files
        whose bounds cannot match — on a 100 TB table an LSN/time range
        probe then opens O(matching files), not the world.  Footer opens are
        already paid by the commit's row-count stat, so the bounds are free.

        ``sort_cols``: cluster rows WITHIN each bucket by these columns at
        every write (``sortWithinPartitions`` — a per-task sort, no added
        exchange, so the zero-shuffle merge path keeps its plan).  Combined
        with ``target_file_rows`` the files of a bucket get tight, mostly
        disjoint ``stats_cols`` ranges, which is what makes skipping
        effective (the Iceberg write-order / clustering role).

        ``bloom_cols``: write a Parquet bloom filter for these columns into
        every data file.  min/max bounds cannot prune an EQUALITY probe on
        a high-cardinality, un-clustered column (every file of a bucket
        spans the full doc_id range, so a point lookup otherwise decodes
        every row group of the key's bucket); the bloom lets the reader
        drop whole row groups from footer metadata alone — Spark's Parquet
        scan applies bloom-level row-group filtering for pushed-down ``=``
        and ``IN`` predicates by default (``parquet.filter.bloom.enabled``).
        Blooms are sized from ``target_file_rows`` (an upper bound on
        per-file NDV) when set, else parquet-mr's default cap applies.
        Cost is write-side CPU plus ~1%% file size; pick the column(s) a
        serving/point-lookup path actually probes (typically the key).

        ``type_widening``: opt in to lossless type promotion on evolution
        (int→…→bigint, float→double, decimal precision, arrays
        element-wise — the Iceberg ``promote`` set).  Off by default: the
        reference evolves additively only, and the per-row token-array
        equality contract is easiest to audit when types are frozen.  No
        file rewrite on widen — Spark 4's Parquet readers upcast old
        narrow files under the widened read schema in place."""
        t = cls(spark, root)
        os.makedirs(t._meta, exist_ok=True)
        os.makedirs(os.path.join(t.root, MANIFEST_DIR), exist_ok=True)
        os.makedirs(os.path.join(t.root, DATA_DIR), exist_ok=True)
        props = {**(properties or {}), "bucket_fn": BUCKET_FN_ID}
        if type_widening:
            props["type_widening"] = "true"
        if target_file_rows is not None:
            if target_file_rows <= 0:
                raise ValueError("target_file_rows must be positive")
            props["target_file_rows"] = str(int(target_file_rows))
        field_names = {f.name for f in schema.fields}
        for prop, cols in (
            ("stats_cols", stats_cols),
            ("sort_cols", sort_cols),
            ("bloom_cols", bloom_cols),
        ):
            if cols:
                unknown = sorted(set(cols) - field_names)
                if unknown:
                    raise ValueError(f"{prop} not in schema: {unknown}")
                props[prop] = ",".join(cols)
        snap = Snapshot(
            version=0,
            schema_json=json.dumps(schema.jsonValue()),
            n_buckets=n_buckets,
            key_cols=list(key_cols),
            properties=props,
        )
        snap._root = t.root
        t._publish(snap)
        return t

    @classmethod
    def get_or_create(cls, spark: SparkSession, root: str, **create_kwargs) -> "LakeTable":
        """Race-safe exists-or-create: when two processes boot against the
        same fresh root simultaneously, the CAS in ``_publish`` makes the
        slower ``create`` raise ``CommitConflictError`` — here that means
        the table now exists, so load it instead of failing startup.

        When the table already exists the ``create_kwargs`` are NOT applied
        (the stored snapshot wins — creation-time layout is immutable here;
        see ``maintenance.rebucket`` for bucket-count evolution), but any
        divergence between what the caller asked for and what the table
        actually is gets logged: a pre-existing table silently ignoring a
        caller's new ``stats_cols``/``n_buckets`` defaults is how file
        skipping ends up inactive with nobody noticing."""
        if cls.exists(root):
            t = cls.load(spark, root)
            t._warn_create_kwargs_divergence(create_kwargs)
            return t
        try:
            return cls.create(spark, root, **create_kwargs)
        except CommitConflictError:
            t = cls.load(spark, root)
            t._warn_create_kwargs_divergence(create_kwargs)
            return t

    def _warn_create_kwargs_divergence(self, kw: dict) -> None:
        snap = self.current()
        props = snap.properties
        want: dict[str, Any] = {}
        have: dict[str, Any] = {}
        if "n_buckets" in kw and kw["n_buckets"] != snap.n_buckets:
            want["n_buckets"], have["n_buckets"] = kw["n_buckets"], snap.n_buckets
        if "key_cols" in kw and list(kw["key_cols"]) != snap.key_cols:
            want["key_cols"], have["key_cols"] = list(kw["key_cols"]), snap.key_cols
        if "schema" in kw:
            asked = {f.name for f in kw["schema"].fields}
            stored = {f.name for f in snap.schema.fields}
            if asked - stored:  # additive evolution makes extra stored cols fine
                want["schema_fields"] = sorted(asked)
                have["schema_fields"] = sorted(stored)
        for prop in ("stats_cols", "sort_cols", "bloom_cols"):
            if kw.get(prop):
                asked_s = ",".join(kw[prop])
                if props.get(prop, "") != asked_s:
                    want[prop], have[prop] = asked_s, props.get(prop)
        if kw.get("target_file_rows") is not None:
            asked_r = str(int(kw["target_file_rows"]))
            if props.get("target_file_rows") != asked_r:
                want["target_file_rows"] = asked_r
                have["target_file_rows"] = props.get("target_file_rows")
        if kw.get("type_widening") and not self._widening(snap):
            want["type_widening"] = "true"
            have["type_widening"] = props.get("type_widening")
        if want:
            _LOG.warning(
                "get_or_create(%s): table exists; requested settings differ from "
                "the stored snapshot and were IGNORED: requested=%s stored=%s",
                self.root, want, have,
            )

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.exists(os.path.join(os.path.abspath(root), META_DIR, CURRENT_PTR))

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        t = cls(spark, root)
        t.current()  # raises if missing
        return t

    def drop(self) -> None:
        shutil.rmtree(self.root, ignore_errors=True)

    # ------------------------------------------------------------------ snapshots
    def current_version(self) -> int:
        with open(os.path.join(self._meta, CURRENT_PTR)) as fh:
            return int(fh.read().strip())

    def current(self) -> Snapshot:
        return self.snapshot(self.current_version())

    def snapshot(self, version: int) -> Snapshot:
        with open(self._snapshot_path(version)) as fh:
            snap = Snapshot.from_json(json.load(fh))
        snap._root = self.root
        return snap

    # ------------------------------------------------------------------ tags
    # Named immutable refs to snapshot versions (the Iceberg tag role).
    # The training-data use: tag the snapshot a model trained on
    # ("run-2026-08-17") and the exact dataset stays reproducible — tagged
    # versions are PINNED against expire_snapshots, so the files survive
    # retention however far current() advances.

    _TAG_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")

    def _tag_path(self, name: str) -> str:
        if not self._TAG_RE.match(name):
            raise ValueError(f"invalid tag name: {name!r}")
        return os.path.join(self._meta, "tags", f"{name}.json")

    def tag(self, name: str, version: int | None = None, replace: bool = False) -> int:
        """Pin ``version`` (default: current) under ``name``.  Creation is
        O_EXCL-atomic: two writers racing the same fresh name get exactly
        one winner, same contract as the snapshot CAS.  ``replace=True``
        moves an existing tag atomically instead."""
        v = self.current_version() if version is None else int(version)
        self.snapshot(v)  # raises if the version does not exist
        path = self._tag_path(name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        payload = json.dumps({"version": v})
        if replace:
            tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as fh:
                fh.write(payload)
            os.replace(tmp, path)
        else:
            try:
                with open(path, "x") as fh:
                    fh.write(payload)
            except FileExistsError:
                raise ValueError(
                    f"tag {name!r} already exists (at v{self.resolve_tag(name)}); "
                    "pass replace=True to move it"
                ) from None
        return v

    def tags(self) -> dict[str, int]:
        d = os.path.join(self._meta, "tags")
        out: dict[str, int] = {}
        if os.path.isdir(d):
            for fn in sorted(os.listdir(d)):
                if fn.endswith(".json") and not fn.startswith("."):
                    with open(os.path.join(d, fn)) as fh:
                        out[fn[: -len(".json")]] = int(json.load(fh)["version"])
        return out

    def resolve_tag(self, name: str) -> int:
        path = self._tag_path(name)
        try:
            with open(path) as fh:
                return int(json.load(fh)["version"])
        except FileNotFoundError:
            raise KeyError(f"no such tag: {name!r}") from None

    def delete_tag(self, name: str) -> bool:
        """Drop the ref (the pinned snapshot becomes expirable again).
        Returns False when the tag did not exist."""
        try:
            os.unlink(self._tag_path(name))
            return True
        except FileNotFoundError:
            return False

    def _publish(self, snap: Snapshot) -> None:
        """Compare-and-swap publish: write snapshot JSON, then atomically
        flip the ``_current`` pointer — but ONLY if the pointer still reads
        ``snap.version - 1`` (the base this commit was planned against).

        This enforces the single-writer contract instead of documenting it
        (Iceberg's optimistic concurrency on the catalog pointer; reference
        analog: Postgres serializes the upserts transactionally,
        ``parser/db.py:258-330``).  Two writers racing the old
        last-write-wins ``os.replace`` could silently drop a committed
        snapshot; now the slower writer gets ``CommitConflictError`` and
        must retry from the new current state (its data files become
        orphans; ``expire_snapshots`` collects them).  The check-and-swap
        runs under an exclusive ``flock`` — kernel-released on process
        death, so no stale-lock recovery path — and the critical section
        is two small metadata writes, never Spark work.  On an object
        store without atomic rename, swap this for a catalog CAS
        (DynamoDB/Glue conditional put); the contract is identical."""
        import fcntl

        ptr = os.path.join(self._meta, CURRENT_PTR)
        with open(os.path.join(self._meta, "_commit.lock"), "w") as lk:
            fcntl.flock(lk, fcntl.LOCK_EX)
            try:
                cur = self.current_version() if os.path.exists(ptr) else -1
                if cur != snap.version - 1:
                    raise CommitConflictError(
                        f"table {self.root}: commit planned against version "
                        f"{snap.version - 1} but current is {cur} — another "
                        f"writer committed first; retry from the new state"
                    )
                path = self._snapshot_path(snap.version)
                tmp = path + ".tmp"
                with open(tmp, "w") as fh:
                    json.dump(snap.to_json(), fh)
                os.replace(tmp, path)
                ptr_tmp = ptr + ".tmp"
                with open(ptr_tmp, "w") as fh:
                    fh.write(str(snap.version))
                os.replace(ptr_tmp, ptr)
            finally:
                fcntl.flock(lk, fcntl.LOCK_UN)

    def has_commit(self, commit_key: str) -> bool:
        return self.current().has_commit_key(commit_key)

    @staticmethod
    def _target_file_rows(snap: Snapshot) -> int | None:
        v = snap.properties.get("target_file_rows")
        return int(v) if v else None

    @staticmethod
    def _prop_cols(snap: Snapshot, prop: str) -> list[str]:
        v = snap.properties.get(prop)
        return [c for c in v.split(",") if c] if v else []

    @staticmethod
    def _widening(snap: Snapshot) -> bool:
        return snap.properties.get("type_widening", "").lower() in ("1", "true")

    def _session_tz_bounds(
        self, where: dict[str, tuple[Any, Any]]
    ) -> dict[str, tuple[Any, Any]]:
        """Naive datetime bounds are session-local (that is how the Spark
        residual filter interprets them); make that explicit so
        ``_stats_encode`` canonicalizes them to the UTC the stored bounds
        use.  Non-datetime values pass through untouched.  Spark accepts
        offset-style timezone ids ('+09:00', 'GMT+8') that ZoneInfo does
        not — those are parsed as fixed offsets; anything unrecognizable
        disables skipping for that bound (``None`` => unbounded => every
        file kept; the residual filter stays correct)."""
        conv = self._session_tz_converter()
        return {c: (conv(lo), conv(hi)) for c, (lo, hi) in where.items()}

    def _session_tz_converter(self):
        """Shared naive-datetime → session-tz-aware converter for skip-side
        predicate encoding (see ``_session_tz_bounds`` for the contract);
        returns a callable so in-list probes reuse the same resolution."""
        import datetime as _dt
        import re as _re

        tz: _dt.tzinfo | None | bool = None  # False => unresolvable

        def _resolve_tz() -> _dt.tzinfo | bool:
            name = self.spark.conf.get("spark.sql.session.timeZone", "UTC")
            try:
                from zoneinfo import ZoneInfo

                return ZoneInfo(name)
            except Exception:
                m = _re.fullmatch(
                    r"(?:GMT|UTC)?([+-])(\d{1,2})(?::?(\d{2}))?", name
                )
                if not m:
                    return False
                sign = 1 if m.group(1) == "+" else -1
                delta = _dt.timedelta(
                    hours=int(m.group(2)), minutes=int(m.group(3) or 0)
                )
                return _dt.timezone(sign * delta)

        def conv(v):
            nonlocal tz
            if isinstance(v, _dt.datetime) and v.tzinfo is None:
                if tz is None:
                    tz = _resolve_tz()
                if tz is False:
                    return None  # unknown session tz: never skip on this bound
                return v.replace(tzinfo=tz)
            return v

        return conv

    # ------------------------------------------------------------------ bucketing
    def check_bucket_fn(self, snap: Snapshot) -> None:
        """Fail loudly if the table was written with a different bucket hash:
        pruning/merging with a mismatched function silently reads the wrong
        buckets and loses LWW updates."""
        fn = snap.properties.get("bucket_fn")
        if fn != BUCKET_FN_ID:
            raise ValueError(
                f"table {self.root} records bucket_fn={fn!r} but this engine "
                f"computes {BUCKET_FN_ID!r}; refusing bucket-dependent operation"
            )

    def bucket_expr(self, n_buckets: int | None = None, key_cols: list[str] | None = None):
        snap = self.current()
        self.check_bucket_fn(snap)
        snap_keys = key_cols if key_cols is not None else snap.key_cols
        n = n_buckets if n_buckets is not None else snap.n_buckets
        return bucket_of(snap_keys, n)

    # ------------------------------------------------------------------ read
    def read(
        self,
        buckets: list[int] | None = None,
        version: int | None = None,
        where: dict[str, tuple[Any, Any]] | None = None,
        tag: str | None = None,
        where_in: dict[str, list] | None = None,
    ) -> DataFrame:
        """Scan the table at a snapshot.  ``buckets`` prunes at file level —
        only the Parquet files registered for those buckets are opened.

        ``where`` maps column -> (lo, hi) inclusive range (either bound
        None for open-ended); ranges on different columns are ANDed.  Files
        whose manifest [min, max] bounds (``stats_cols``) cannot intersect
        the range are never opened — manifest-level data skipping, the
        Iceberg metrics-pruning role.  The range predicates are ALSO applied
        to the returned DataFrame, so results are exact whether or not a
        file carries bounds: skipping is an I/O optimization, the residual
        filter is the truth (and Parquet row-group pushdown still applies
        inside the files that survive).

        ``tag``: read at a named ref instead of a numeric version (the
        reproducible-training-set path — see :meth:`tag`).

        ``where_in`` maps column -> collection of probe values (the
        point-lookup path — reference analog: the per-key online SELECTs in
        ``parser/db.py:112-256``); columns AND together, values within a
        column OR.  Three pruning layers compose: (1) when the probe
        columns cover the table's key columns, the candidate BUCKETS are
        computed by hashing the probe keys (one tiny local-relation job) —
        a point lookup on a 100 TB table opens one bucket's files; (2)
        files whose [min, max] bounds contain no probe value are skipped;
        (3) the residual ``isin`` filter is pushed to the Parquet scan,
        where per-file bloom filters (``bloom_cols``) do the row-group
        work.  As with ``where``, skipping is an optimization and the
        residual filter is the truth — results are exact regardless of
        which layers fire.

        Probe values are conformed to the column's type first
        (``_conform_where_in``): an int probe on a string column looks up
        the string form, a string probe on a long column is parsed, and a
        value the type cannot represent matches nothing — never an ANSI
        runtime cast error, and never a hash/filter disagreement."""
        if tag is not None:
            if version is not None:
                raise ValueError("pass version OR tag, not both")
            version = self.resolve_tag(tag)
        snap = self.snapshot(version) if version is not None else self.current()
        if where:
            where = _conform_where_bounds(snap.schema, where)
        if where_in:
            where_in = _conform_where_in(snap.schema, where_in)
            if any(len(v) == 0 for v in where_in.values()):
                # a probe list that is empty (or emptied by conformance —
                # no value representable in the column type) matches
                # nothing: skip the scan entirely
                return self.spark.createDataFrame([], snap.schema)
        if where_in and buckets is None:
            buckets = self._probe_buckets(snap, where_in)
        if buckets is not None:
            # pruning correctness depends on the bucket hash matching
            self.check_bucket_fn(snap)
        files = snap.files_for(buckets)
        if where_in:
            enc_in = _encode_probe_lists(self._session_tz_converter(), where_in)
            files = [f for f in files if _file_may_match_in(f, enc_in)]
        if where:
            # A NAIVE datetime bound means session-local time to the
            # residual filter below, but the stored bounds are UTC — attach
            # the session tz before encoding, or a non-UTC session would
            # compare wall-clock strings against UTC bounds and silently
            # skip matching files.  Encode once here, not per file.
            enc = {
                c: (_stats_encode(lo), _stats_encode(hi))
                for c, (lo, hi) in self._session_tz_bounds(where).items()
            }
            files = [f for f in files if _file_may_match(f, enc)]
        schema = snap.schema
        if not files:
            return self.spark.createDataFrame([], schema)
        paths = [os.path.join(self.root, f.path) for f in files]
        # explicit schema => old files yield NULL for late-added columns
        # (additive evolution), and column pruning/pushdown still apply.
        df = self.spark.read.schema(schema).parquet(*paths)
        if where:
            for col, (lo, hi) in where.items():
                if lo is not None:
                    df = df.where(F.col(col) >= F.lit(lo))
                if hi is not None:
                    df = df.where(F.col(col) <= F.lit(hi))
        if where_in:
            for col, vals in where_in.items():
                df = df.where(F.col(col).isin(list(vals)))
        return df

    _PROBE_BUCKET_MAX_COMBOS = 4096

    def _probe_buckets(
        self, snap: Snapshot, where_in: dict[str, list]
    ) -> list[int] | None:
        """Candidate buckets for a key-covering point lookup, or None when
        bucket pruning cannot apply (probe misses a key column, or the key
        cross-product is too large to enumerate).  The probe keys are hashed
        through the SAME Spark expression that routed writes (``bucket_of``
        over the snapshot's key schema — a Python reimplementation of
        murmur3 would be a silent-corruption risk), as one local-relation
        job over at most ``_PROBE_BUCKET_MAX_COMBOS`` rows."""
        import itertools

        if not set(snap.key_cols) <= set(where_in):
            return None
        sizes = [len(where_in[k]) for k in snap.key_cols]
        n_combos = 1
        for s in sizes:
            n_combos *= s
        if n_combos == 0 or n_combos > self._PROBE_BUCKET_MAX_COMBOS:
            return None
        self.check_bucket_fn(snap)
        key_fields = T.StructType(
            [snap.schema[k] for k in snap.key_cols]  # exact key types: the
            # murmur3 of int32 and int64 differ, so probe literals must be
            # cast to the stored key schema before hashing
        )
        combos = list(itertools.product(*(where_in[k] for k in snap.key_cols)))
        try:
            kdf = self.spark.createDataFrame(combos, key_fields)
            expr = bucket_of(snap.key_cols, snap.n_buckets)
            return sorted(
                {r[0] for r in kdf.select(expr.alias("b")).distinct().collect()}
            )
        except (TypeError, ValueError):
            # a probe value that mismatches the key schema (wrong Python
            # type, NULL against a non-nullable key field) cannot be hashed
            # — fall back to the unpruned path rather than crashing the
            # read/delete; the residual isin filter stays the truth, same
            # as a probe on a non-key column
            return None

    def changes(self, from_version: int, to_version: int | None = None) -> DataFrame:
        """Incremental changelog between two snapshots (Iceberg
        incremental-read role; reference analog: the daily Airflow job
        exporting only rows newer than the last sync,
        ``datalake_daily_sync.py:412-630``).

        Returns the rows whose stored content differs, tagged
        ``_change_type`` ∈ {insert, delete}; an updated key appears as a
        delete of its old payload plus an insert of the new one.  Metadata
        does the pruning: only buckets whose MANIFEST POINTER changed
        between the snapshots are read at either version — an incremental
        consumer of a 100 TB table scans the touched slice, never the
        world.  A pure compaction rewrites manifests without changing rows
        and therefore yields zero change rows (at the cost of re-reading
        the compacted buckets)."""
        new_snap = (
            self.snapshot(to_version) if to_version is not None else self.current()
        )
        old_snap = self.snapshot(from_version)
        touched = [
            b
            for b in set(old_snap.manifests) | set(new_snap.manifests)
            if old_snap.manifests.get(b) != new_snap.manifests.get(b)
        ]
        schema = new_snap.schema
        old = _conform(self.read(buckets=touched, version=old_snap.version), schema)
        new = _conform(self.read(buckets=touched, version=new_snap.version), schema)
        ins = new.exceptAll(old).withColumn("_change_type", F.lit("insert"))
        dele = old.exceptAll(new).withColumn("_change_type", F.lit("delete"))
        return ins.unionByName(dele)

    # ------------------------------------------------------------------ write
    def _write_commit_files(
        self,
        df: DataFrame,
        commit_id: str,
        n_buckets: int,
        key_cols: list[str],
        pre_partitioned: bool = False,
        target_file_rows: int | None = None,
        stats_cols: list[str] | None = None,
        sort_cols: list[str] | None = None,
        bloom_cols: list[str] | None = None,
        sort_exprs: list | None = None,
    ) -> list[DataFile]:
        """Write ``df`` as one directory tree partitioned by bucket; return the
        produced files tagged with their bucket.  One output file per bucket
        by default (a MERGE batch touches a bounded set of buckets, so files
        stay coarse); with ``target_file_rows`` set (the table property, see
        ``create``) each bucket's output is split at that row count via
        ``maxRecordsPerFile`` — an intra-task split, so the pre-partitioned
        merge path keeps its zero-exchange plan while a hot or freshly
        compacted bucket still lands as N bounded files in the per-bucket
        manifest instead of one multi-GB straggler.

        ``pre_partitioned=True``: caller guarantees ``df`` is already
        hash-partitioned on the key columns with numPartitions==n_buckets
        (e.g. it is the output of a groupBy(key) run with
        ``spark.sql.shuffle.partitions = n_buckets``).  Because
        ``bucket_of`` equals Spark's partition-id expression, each task then
        holds whole buckets and the dynamic-partition write needs NO
        repartition exchange (write parallelism is n_buckets by design —
        the zero-exchange trade; size n_buckets to the cluster).  Otherwise
        an explicit repartition keeps the snapshot's file count
        O(n_buckets) — skipping it would fan out to n_partitions ×
        n_buckets files (measured 2× end-to-end regression from distributed
        listing on every read)."""
        commit_rel = os.path.join(DATA_DIR, commit_id)
        commit_abs = os.path.join(self.root, commit_rel)
        out = df.withColumn(BUCKET_COL, bucket_of(key_cols, n_buckets))
        if not pre_partitioned:
            out = out.repartition(n_buckets, F.col(BUCKET_COL))
        if sort_exprs is not None:
            # caller-supplied clustering expressions (e.g. a z-order value)
            # replace the table's declared sort_cols for THIS commit; an
            # expression sorts without materializing a physical column
            out = out.sortWithinPartitions(BUCKET_COL, *sort_exprs)
        elif sort_cols:
            # per-task sort, no exchange: leading BUCKET_COL keeps each
            # bucket's rows contiguous (the dynamic-partition writer needs
            # that sort anyway — pre-sorting folds both into one), and the
            # trailing sort_cols cluster rows so maxRecordsPerFile splits
            # land with tight, near-disjoint stats ranges
            out = out.sortWithinPartitions(BUCKET_COL, *sort_cols)
        writer = out.write.mode("overwrite")
        if target_file_rows is not None:
            writer = writer.option("maxRecordsPerFile", int(target_file_rows))
        for c in bloom_cols or ():
            # per-column parquet-mr bloom; NDV bounded by the file row cap
            # when known, so the filter is sized instead of defaulting to
            # the max-bytes cap
            writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
            if target_file_rows is not None:
                writer = writer.option(
                    f"parquet.bloom.filter.expected.ndv#{c}", int(target_file_rows)
                )
        writer.partitionBy(BUCKET_COL).parquet(commit_abs)
        # stat the produced files with a thread pool: footer opens are
        # ~ms each but serial over n_buckets files they add up to a fixed
        # driver-side cost per commit that hurts scaling (Amdahl)
        from concurrent.futures import ThreadPoolExecutor

        todo: list[tuple[str, int]] = []
        for entry in os.listdir(commit_abs):
            if not entry.startswith(f"{BUCKET_COL}="):
                continue
            bucket = int(entry.split("=", 1)[1])
            bdir = os.path.join(commit_abs, entry)
            for fn in os.listdir(bdir):
                if fn.endswith(".parquet"):
                    todo.append((os.path.join(commit_rel, entry, fn), bucket))

        def _stat(item: tuple[str, int]) -> DataFile:
            import pyarrow.parquet as pq

            rel, bucket = item
            md = pq.ParquetFile(os.path.join(self.root, rel)).metadata
            stats: dict[str, list[Any]] | None = None
            if stats_cols:
                # fold row-group footer bounds into one [min, max] per column;
                # a column missing bounds in ANY row group records nothing
                # (a partial bound could wrongly skip the file)
                idx = {
                    md.schema.column(j).name: j for j in range(md.num_columns)
                }
                stats = {}
                for col in stats_cols:
                    j = idx.get(col)
                    if j is None:
                        continue
                    lo = hi = None
                    ok = True
                    for g in range(md.num_row_groups):
                        s = md.row_group(g).column(j).statistics
                        if s is None or not s.has_min_max:
                            ok = False
                            break
                        smin, smax = _stats_encode(s.min), _stats_encode(s.max)
                        if smin is None or smax is None:
                            ok = False
                            break
                        lo = smin if lo is None else min(lo, smin)
                        hi = smax if hi is None else max(hi, smax)
                    if ok and lo is not None:
                        stats[col] = [lo, hi]
                stats = stats or None
            return DataFile(path=rel, bucket=bucket, rows=md.num_rows, stats=stats)

        with ThreadPoolExecutor(max_workers=16) as pool:
            files = list(pool.map(_stat, todo))
        return files

    def _write_manifest(self, bucket: int, files: list[DataFile], commit_id: str) -> str:
        """Write one immutable per-bucket manifest; return its rel path."""
        rel = os.path.join(MANIFEST_DIR, f"{commit_id}-b{bucket}.json")
        path = os.path.join(self.root, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump([f.to_json() for f in files], fh)
        os.replace(tmp, path)
        return rel

    def append(
        self, df: DataFrame, commit_key: str | None = None, max_rebases: int = 8
    ) -> bool:
        """Append rows (no key dedup).  Returns False if commit_key already
        applied.  Metadata cost: one new manifest per TOUCHED bucket; the
        rest of the table re-points to its existing manifests.

        Concurrency: an append's DATA FILES are valid against any base
        version (appends are order-independent), so losing the CAS to a
        concurrent writer triggers a METADATA-ONLY rebase — re-read the new
        current snapshot, rebuild the touched manifests, re-publish — up to
        ``max_rebases`` times.  No Spark re-execution, no file rewrite: the
        expensive half of the commit runs exactly once (the Iceberg
        fast-append retry).  A MERGE/overwrite conflict still raises —
        its winners were computed against stale data and must be
        re-derived."""
        snap = self.current()
        if commit_key is not None and snap.has_commit_key(commit_key):
            return False
        self.check_bucket_fn(snap)
        schema = _merge_schemas(snap.schema, df.schema, self._widening(snap))
        df = _conform(df, schema)
        commit_id = f"c{snap.version + 1}-{uuid.uuid4().hex[:8]}"
        new_files = self._write_commit_files(
            df, commit_id, snap.n_buckets, snap.key_cols,
            target_file_rows=self._target_file_rows(snap),
            stats_cols=self._prop_cols(snap, "stats_cols"),
            sort_cols=self._prop_cols(snap, "sort_cols"),
            bloom_cols=self._prop_cols(snap, "bloom_cols"),
        )
        by_bucket: dict[int, list[DataFile]] = {}
        for f in new_files:
            by_bucket.setdefault(f.bucket, []).append(f)
        for attempt in range(max_rebases + 1):
            if attempt > 0:
                snap = self.current()  # rebase on the NEW current
                if commit_key is not None and snap.has_commit_key(commit_key):
                    # another writer applied this very key while we raced
                    return False
                schema = _merge_schemas(snap.schema, schema, self._widening(snap))
            manifests = dict(snap.manifests)
            for b, nf in by_bucket.items():
                old = snap.files_for([b]) if b in manifests else []
                manifests[b] = self._write_manifest(
                    b, old + nf, f"{commit_id}-r{attempt}" if attempt else commit_id
                )
            wm, recent = snap.advanced_keys(commit_key)
            new_snap = Snapshot(
                version=snap.version + 1,
                schema_json=json.dumps(schema.jsonValue()),
                n_buckets=snap.n_buckets,
                key_cols=snap.key_cols,
                manifests=manifests,
                commit_watermarks=wm,
                recent_commit_keys=recent,
                properties=snap.properties,
            )
            new_snap._root = self.root
            try:
                self._publish(new_snap)
                return True
            except CommitConflictError:
                if attempt == max_rebases:
                    raise
        raise AssertionError("unreachable")

    def overwrite_buckets(
        self,
        df: DataFrame,
        buckets: list[int],
        commit_key: str | None = None,
        schema: T.StructType | None = None,
        pre_partitioned: bool = False,
        max_rebases: int = 4,
        base_version: int | None = None,
        sort_exprs: list | None = None,
        extra_stats_cols: list[str] | None = None,
        keep_files: dict[int, list["DataFile"]] | None = None,
        properties_update: dict[str, str] | None = None,
    ) -> bool:
        """Copy-on-write commit: replace all files of ``buckets`` with ``df``
        (which must contain exactly the surviving rows for those buckets).
        This is the write half of MERGE.  Returns False on duplicate
        commit_key (idempotent replay).

        ``base_version`` is the snapshot version the caller DERIVED ``df``
        from (merge read the bucket contents there; compaction listed its
        files there).  Passing it anchors both the CAS and the rebase
        validation to the true derivation base — without it, a commit
        landing between the caller's read and this call would pass the CAS
        and be silently clobbered.  Callers that read and commit in one
        breath may omit it (the entry-time ``current()`` is then the base).

        Concurrency: losing the CAS to a concurrent writer triggers a
        METADATA-ONLY rebase — but, unlike ``append`` (whose data files are
        valid against any base), a bucket replacement's surviving rows were
        computed FROM the base contents of ``buckets``, so the rebase is
        legal only when every interleaved commit is provably irrelevant to
        that computation: it touched none of our replaced buckets, and
        changed neither the schema nor the bucket layout.  Under those
        checks the already-written files and manifests re-point onto the
        new current snapshot unchanged (Iceberg's partition-scoped
        conflict validation).  Anything else re-raises
        ``CommitConflictError`` and the caller must re-derive.  This is
        what lets a background compactor (``lake/maintenance.py``) run
        against a live streaming merge: the two touch disjoint bucket
        groups almost always, and the loser re-points instead of
        re-running Spark.

        ``sort_exprs``: clustering expressions replacing the declared
        ``sort_cols`` for this commit only (the z-order rewrite path).
        ``extra_stats_cols``: harvest file bounds for these columns in
        addition to the declared ``stats_cols`` — files written by LATER
        commits won't carry them (and are simply never skipped on them;
        skipping stays an optimization).

        ``keep_files``: FILE-granular replacement — for each replaced
        bucket, these existing DataFiles are carried into the new
        manifest unchanged (not rewritten, not deleted); ``df`` must then
        hold the surviving rows of the bucket's OTHER files only.  The
        caller owns the exactness argument (e.g. a range delete keeps
        exactly the files whose bounds exclude the range).  Conflict
        granularity stays the bucket — kept files ride in the bucket's
        rewritten manifest.

        ``properties_update``: table properties merged into the published
        snapshot (e.g. z-order promoting its columns into ``stats_cols``
        so LATER commits keep recording their bounds).  Rides the same
        CAS; keys not listed keep their current values."""
        snap = (
            self.snapshot(base_version) if base_version is not None else self.current()
        )
        if commit_key is not None and self.current().has_commit_key(commit_key):
            return False
        self.check_bucket_fn(snap)
        new_schema = (
            schema
            if schema is not None
            else _merge_schemas(snap.schema, df.schema, self._widening(snap))
        )
        df = _conform(df, new_schema)
        commit_id = f"c{snap.version + 1}-{uuid.uuid4().hex[:8]}"
        stats_cols = self._prop_cols(snap, "stats_cols")
        if extra_stats_cols:
            stats_cols = list(dict.fromkeys((stats_cols or []) + list(extra_stats_cols)))
        new_files = self._write_commit_files(
            df, commit_id, snap.n_buckets, snap.key_cols,
            pre_partitioned=pre_partitioned,
            target_file_rows=self._target_file_rows(snap),
            stats_cols=stats_cols,
            sort_cols=self._prop_cols(snap, "sort_cols"),
            bloom_cols=self._prop_cols(snap, "bloom_cols"),
            sort_exprs=sort_exprs,
        )
        bset = set(buckets)
        stray = sorted({f.bucket for f in new_files} - bset)
        if stray:
            # a row landing outside the replace-set would shadow live data
            raise ValueError(f"overwrite produced rows in unreplaced buckets {stray}")
        by_bucket: dict[int, list[DataFile]] = {}
        for b, kept in (keep_files or {}).items():
            if b not in bset:
                raise ValueError(f"keep_files bucket {b} outside replace-set")
            if kept:
                by_bucket[b] = list(kept)
        for f in new_files:
            by_bucket.setdefault(f.bucket, []).append(f)
        new_manifests = {
            b: self._write_manifest(b, nf, commit_id) for b, nf in by_bucket.items()
        }
        base = snap  # the snapshot the surviving rows were derived from
        for attempt in range(max_rebases + 1):
            if attempt > 0:
                snap = self.current()
                if commit_key is not None and snap.has_commit_key(commit_key):
                    # another writer applied this very key while we raced
                    return False
                # safe-rebase validation: every interleaved commit must be
                # irrelevant to the replaced buckets' derivation
                unsafe = None
                if snap.n_buckets != base.n_buckets or snap.properties.get(
                    "bucket_fn"
                ) != base.properties.get("bucket_fn"):
                    unsafe = "bucket layout changed"
                elif snap.schema_json != base.schema_json:
                    unsafe = "schema changed"
                elif any(
                    snap.manifests.get(b) != base.manifests.get(b) for b in bset
                ):
                    unsafe = "overlapping bucket replaced"
                if unsafe:
                    raise CommitConflictError(
                        f"table {self.root}: bucket replacement planned against "
                        f"version {base.version} cannot rebase onto "
                        f"{snap.version} ({unsafe}); re-derive from the new "
                        "current state"
                    )
            manifests = {b: p for b, p in snap.manifests.items() if b not in bset}
            manifests.update(new_manifests)
            wm, recent = snap.advanced_keys(commit_key)
            new_snap = Snapshot(
                version=snap.version + 1,
                schema_json=json.dumps(new_schema.jsonValue()),
                n_buckets=snap.n_buckets,
                key_cols=snap.key_cols,
                manifests=manifests,
                commit_watermarks=wm,
                recent_commit_keys=recent,
                properties=(
                    {**snap.properties, **properties_update}
                    if properties_update
                    else snap.properties
                ),
            )
            new_snap._root = self.root
            try:
                self._publish(new_snap)
                return True
            except CommitConflictError:
                if attempt == max_rebases:
                    raise
        raise AssertionError("unreachable")


def _conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project df onto schema column order, adding NULLs for missing cols."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            # cast only on real type mismatch; Spark 4 rejects casts between
            # array types differing only in containsNull
            if have[f.name].simpleString() == f.dataType.simpleString():
                cols.append(F.col(f.name))
            else:
                cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)
