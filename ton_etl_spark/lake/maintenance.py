"""Table maintenance: compaction rewrite, tombstone GC, snapshot expiry.

Reference analogs: the daily Airflow CTAS repartition/rewrite that compacts
each partition into a bounded file set (``datalake_daily_sync.py:298-337``,
``bucket_count=1`` at :301-310) and the `dedup_depth` horizon beyond which
old data is considered settled (``:412-630``).  Iceberg analog:
``rewrite_data_files`` + ``expire_snapshots``.

Scale notes: a rewrite is a full copy-on-write of the selected buckets —
at 100 TB you compact *bucket subsets* on a rolling schedule (the
``buckets`` parameter), never the world in one commit; snapshot expiry is
pure driver-side metadata work plus file deletes.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import functions as F

from ton_etl_spark.cdc.schema import LSN_COL, OP_COL
from ton_etl_spark.lake.table import DATA_DIR, MANIFEST_DIR, LakeTable, Snapshot


def rewrite_buckets(
    table: LakeTable,
    buckets: list[int] | None = None,
    predicate=None,
    commit_key: str | None = None,
) -> dict:
    """Copy-on-write rewrite of ``buckets`` (default: all), keeping only
    rows matching ``predicate`` (default: all rows).  Collapses each bucket
    back to one file — the small-file compaction half — and applies row GC
    — the filter half.  Idempotent on ``commit_key``."""
    snap = table.current()
    if commit_key is not None and snap.has_commit_key(commit_key):
        return {"applied": False, "buckets": []}
    if buckets is None:
        buckets = sorted(snap.manifests.keys())
    df = table.read(buckets=buckets)
    if predicate is not None:
        df = df.where(predicate)
    ok = table.overwrite_buckets(df, buckets, commit_key=commit_key,
                                 schema=snap.schema, base_version=snap.version)
    return {"applied": ok, "buckets": buckets}


def gc_tombstones(
    table: LakeTable,
    horizon_lsn: int,
    buckets: list[int] | None = None,
    commit_key: str | None = None,
) -> dict:
    """Drop delete-tombstones whose LSN is at or below ``horizon_lsn``.

    Tombstones are retained in storage so stale lower-LSN redeliveries
    cannot resurrect a deleted key (see lake/merge.py).  Once the source's
    redelivery horizon has passed ``horizon_lsn`` (the reference's maturity
    window / dedup_depth analog), tombstones at or below it can never be
    outranked and are safe to GC.  Calling this with a horizon ahead of the
    redelivery bound re-opens the resurrection window — the caller owns
    that contract."""
    keep = ~((F.col(OP_COL) == "d") & (F.col(LSN_COL) <= F.lit(horizon_lsn)))
    return rewrite_buckets(table, buckets=buckets, predicate=keep, commit_key=commit_key)


def default_small_rows(table: LakeTable, snap: Snapshot) -> int | None:
    """The ONE definition of a 'small' (pack-candidate) file — half the
    table's ``target_file_rows``, None when no target is declared.
    Shared by ``compact_small_files`` and the ``describe`` CLI's
    ``small_files`` demand signal so the metric an operator watches and
    the threshold ``--binpack`` acts on can never drift apart."""
    target = table._target_file_rows(snap)
    return max(1, target // 2) if target else None


def compact_small_files(
    table: LakeTable,
    buckets: list[int] | None = None,
    small_rows: int | None = None,
    min_input_files: int = 2,
    commit_key: str | None = None,
) -> dict:
    """Bin-pack compaction (the Iceberg ``rewrite_data_files`` binpack
    strategy role): per bucket, coalesce only the files BELOW the size
    threshold into fresh packed files, leaving well-sized files
    byte-untouched — they are carried into the new manifest by reference
    (``overwrite_buckets(keep_files=)``), never opened, never rewritten.

    This is the write-amplification fix for a streaming ingest loop at
    100 TB: each epoch appends one small file per touched bucket, so after
    the first full compaction a bucket is one big file plus a few slivers
    — ``rewrite_buckets`` would re-copy the big file every maintenance
    cycle (full bucket I/O for a few thousand new rows), while bin-pack
    I/O is proportional to the NEW data only.  Tombstones ride along
    unfiltered (row GC stays ``gc_tombstones``' contract).

    ``small_rows``: files with fewer rows are pack candidates (default:
    half the table's ``target_file_rows``).  ``min_input_files``: a bucket
    packs only when it has at least this many candidates — packing one
    small file into one small file is pure churn.  Idempotent on
    ``commit_key``; concurrency follows ``overwrite_buckets`` (bucket-
    granular conflicts, metadata-only rebase when disjoint)."""
    snap = table.current()
    if commit_key is not None and snap.has_commit_key(commit_key):
        return {"applied": False, "buckets": [], "packed_files": 0}
    if buckets is None:
        buckets = sorted(snap.manifests)
    if small_rows is not None:
        threshold = small_rows
    else:
        threshold = default_small_rows(table, snap)
        if threshold is None:
            raise ValueError(
                "compact_small_files needs a threshold: pass small_rows= "
                "or create the table with target_file_rows (without one "
                "there is no definition of 'small')"
            )
    bset_all = set(buckets)
    by_bucket: dict[int, list] = {}
    for f in snap.files:
        if f.bucket in bset_all:
            by_bucket.setdefault(f.bucket, []).append(f)
    keep_files: dict[int, list] = {}
    small_paths: list[str] = []
    touched: list[int] = []
    n_packed = 0
    for b in buckets:
        fs = by_bucket.get(b, [])
        small = [f for f in fs if f.rows < threshold]
        if len(small) < min_input_files:
            continue
        touched.append(b)
        keep_files[b] = [f for f in fs if f.rows >= threshold]
        small_paths += [os.path.join(table.root, f.path) for f in small]
        n_packed += len(small)
    if not touched:
        return {"applied": False, "buckets": [], "packed_files": 0}
    # explicit snapshot schema: old slivers NULL-fill late-added columns,
    # exactly like read()
    df = table.spark.read.schema(snap.schema).parquet(*small_paths)
    ok = table.overwrite_buckets(
        df, touched, commit_key=commit_key, schema=snap.schema,
        base_version=snap.version, keep_files=keep_files,
    )
    return {"applied": ok, "buckets": touched, "packed_files": n_packed}


def rolling_maintenance(
    table: LakeTable,
    epoch: int,
    every: int = 8,
    groups: int = 4,
    tombstone_horizon_lsn: int | None = None,
    zorder_cols: list[str] | None = None,
    zorder_overlap_threshold: float | None = None,
    binpack_small_rows: int | None = None,
) -> dict | None:
    """Automated maintenance policy for a long-running ingest loop: every
    ``every`` epochs, compact ONE rolling group of buckets (group id cycles
    with the epoch), optionally GC'ing tombstones at or below
    ``tombstone_horizon_lsn`` in the same rewrite.

    Rolling by bucket group is the 100 TB discipline: each maintenance
    commit rewrites 1/``groups`` of the table, so maintenance cost per
    epoch is bounded and amortized instead of a periodic full-table
    rewrite (reference analog: the daily CTAS compaction works one
    partition at a time, ``datalake_daily_sync.py:298-337``).  Over
    ``every × groups`` epochs every bucket gets compacted once.

    Returns None on non-maintenance epochs; otherwise the rewrite stats.
    Idempotent per epoch via the ``roll=<epoch>`` commit key (recent-keys
    dedup, so a foreachBatch retry doesn't compact twice).

    ``zorder_cols``: compact the group AS a z-order clustering rewrite
    (``rewrite_zorder``) instead of a plain collapse — the ingest loop
    then continuously restores multi-column skipping locality that
    inter-maintenance merges erode, one bucket group at a time.
    Mutually exclusive with ``tombstone_horizon_lsn`` (a z-order rewrite
    keeps every row; GC'ing inside it would fork the tombstone predicate
    into a second place).

    ``zorder_overlap_threshold``: make the z-order rewrite DEMAND-DRIVEN —
    the cycle's group is re-clustered only when its worst per-column
    ``clustering_overlap`` over ``zorder_cols`` exceeds the threshold
    (manifest math only, no Spark job for the check), so a well-clustered
    table pays zero rewrite I/O while a degrading ingest stream still
    self-heals.  Without it, every cycle rewrites its group
    unconditionally — correct but wasteful at 100 TB, where most cycles
    follow appends that touched few buckets.

    ``binpack_small_rows``: compact the group with ``compact_small_files``
    (threshold = this many rows) instead of a full collapse — maintenance
    I/O becomes proportional to the NEW data in the group, not the
    group's total size; a quiet group pays zero rewrites.  Mutually
    exclusive with the other strategies (tombstone GC must rewrite every
    file that may hold an expired tombstone; a z-order rewrite must
    rewrite every file to interleave)."""
    if zorder_cols and tombstone_horizon_lsn is not None:
        # validate BEFORE the epoch gate: a misconfigured ingest loop must
        # fail on its first call, not epochs later inside foreachBatch
        raise ValueError("pass zorder_cols OR tombstone_horizon_lsn, not both")
    if zorder_overlap_threshold is not None and not zorder_cols:
        raise ValueError("zorder_overlap_threshold requires zorder_cols")
    if binpack_small_rows is not None and (
        zorder_cols or tombstone_horizon_lsn is not None
    ):
        raise ValueError(
            "binpack_small_rows is mutually exclusive with zorder_cols / "
            "tombstone_horizon_lsn — bin-pack never opens well-sized files, "
            "which both of those strategies must rewrite"
        )
    if every <= 0 or (epoch + 1) % every != 0:
        return None
    snap = table.current()
    g = ((epoch + 1) // every - 1) % groups
    buckets = [b for b in sorted(snap.manifests) if b % groups == g]
    if not buckets:
        return None
    key = f"roll={epoch}-g{g}"
    if tombstone_horizon_lsn is not None:
        # delegate so the tombstone-retention predicate lives in ONE place
        return gc_tombstones(
            table, tombstone_horizon_lsn, buckets=buckets, commit_key=key
        )
    if zorder_cols:
        if zorder_overlap_threshold is not None:
            needed, worst, reason = zorder_needed(
                table, zorder_cols, zorder_overlap_threshold,
                version=snap.version, buckets=buckets,
            )
            if not needed:
                return {
                    "applied": False,
                    "buckets": buckets,
                    "overlap": worst,
                    "skipped": reason,
                }
        return rewrite_zorder(table, zorder_cols, buckets=buckets, commit_key=key)
    if binpack_small_rows is not None:
        return compact_small_files(
            table, buckets=buckets, small_rows=binpack_small_rows,
            commit_key=key,
        )
    return rewrite_buckets(table, buckets=buckets, commit_key=key)


def rebucket(
    table: LakeTable,
    new_n_buckets: int,
    commit_key: str | None = None,
) -> dict:
    """Bucket-count evolution: rewrite the whole table under a new bucket
    count and swap it in with ONE CAS snapshot publish.

    A table that grows 100× is otherwise stuck with its creation-time
    ``n_buckets`` (one bucket ≈ a few GB by design), which silently
    degrades merge parallelism and file sizing — the Iceberg analog is
    rewriting data under an evolved partition spec.  Mechanics:

    - ALL rows are read at the planning snapshot — including delete
      tombstones: dropping them here would re-open the stale-redelivery
      resurrection window that ``gc_tombstones`` manages deliberately.
    - One job, one shuffle (repartition on the NEW bucket expression —
      ``bucket_of(key, new_n)`` is the same ``murmur3_v1`` family, so
      ``check_bucket_fn`` keeps passing; the snapshot's per-version
      ``n_buckets`` is what readers and merges consult, so time-travel
      reads of old versions keep pruning with the OLD count).
    - The swap is a single ``_publish``: concurrently-committed epochs win
      the CAS and this raises ``CommitConflictError`` — a rebucket planned
      against a stale base holds stale rows and MUST be re-derived, never
      rebased (same contract as merge/overwrite, unlike append).  Run it
      between epochs of the ingest loop, or let the loop's next merge pick
      up the new count automatically from the snapshot.

    At 100 TB this is a full copy-on-write — schedule it like any spec
    rewrite (dedicated job, off-peak); the commit itself is metadata-light
    (one manifest per new bucket) and readers never see a mixed layout.
    Idempotent on ``commit_key``."""
    snap = table.current()
    if commit_key is not None and snap.has_commit_key(commit_key):
        return {"applied": False, "n_buckets": snap.n_buckets}
    table.check_bucket_fn(snap)
    if new_n_buckets <= 0:
        raise ValueError("new_n_buckets must be positive")
    if new_n_buckets == snap.n_buckets:
        return {"applied": False, "n_buckets": snap.n_buckets}
    df = table.read(version=snap.version)  # raw rows, tombstones included
    commit_id = f"c{snap.version + 1}-rb{uuid.uuid4().hex[:8]}"
    new_files = table._write_commit_files(
        df, commit_id, new_n_buckets, snap.key_cols,
        target_file_rows=table._target_file_rows(snap),
        stats_cols=table._prop_cols(snap, "stats_cols"),
        sort_cols=table._prop_cols(snap, "sort_cols"),
    )
    by_bucket: dict[int, list] = {}
    for f in new_files:
        by_bucket.setdefault(f.bucket, []).append(f)
    manifests = {
        b: table._write_manifest(b, fs, commit_id) for b, fs in by_bucket.items()
    }
    wm, recent = snap.advanced_keys(commit_key)
    new_snap = Snapshot(
        version=snap.version + 1,
        schema_json=snap.schema_json,
        n_buckets=new_n_buckets,
        key_cols=snap.key_cols,
        manifests=manifests,
        commit_watermarks=wm,
        recent_commit_keys=recent,
        properties=snap.properties,
    )
    new_snap._root = table.root
    table._publish(new_snap)  # CommitConflictError => loser re-derives
    return {
        "applied": True,
        "n_buckets": new_n_buckets,
        "files": len(new_files),
        "rows": sum(f.rows for f in new_files),
    }


def clustering_overlap(
    table: LakeTable,
    version: int | None = None,
    buckets: list[int] | None = None,
    files: list | None = None,
    cols: list[str] | None = None,
) -> dict:
    """Per-column clustering quality from manifest metadata alone: the
    fraction of same-bucket file pairs whose [min, max] bounds overlap.

    0.0 = files are range-disjoint (skipping prunes a point/range probe to
    one file per bucket — what ``sort_cols`` / ``rewrite_zorder`` produce
    fresh); 1.0 = every pair overlaps (bounds span the domain, skipping
    never fires — the signal to schedule a clustering rewrite).  Driver
    side over the manifest stats, no Spark job; O(files log files) per
    column even on a fully-overlapping table (pairs are counted via a
    sorted-endpoint identity, never enumerated), so a metrics refresh on
    a badly clustered table — exactly when the gauge matters — costs the
    same as on a healthy one.  Pairs counted per bucket because skipping
    competes only within a bucket's file set.

    Columns with mixed-type bounds (schema evolution) or no stats report
    null.  Buckets with a single stats-carrying file contribute no pairs.
    ``buckets`` restricts the metric to one bucket group — how
    ``rolling_maintenance``'s auto-z-order gate scores just the group it
    would rewrite this cycle.  ``files`` lets a caller that already
    loaded the manifest entries (``zorder_needed``) pass them in instead
    of re-reading every manifest from disk; ``cols`` restricts the
    scoring to the columns actually consumed.
    """
    if files is None:
        snap = table.snapshot(version) if version is not None else table.current()
        files = snap.files
        if buckets is not None:
            bset = set(buckets)
            files = [f for f in files if f.bucket in bset]
    seen = {c for f in files if f.stats for c in f.stats}
    cols = sorted(seen if cols is None else (seen & set(cols)))
    out: dict[str, float | None] = {}
    for c in cols:
        overlaps = 0
        try:
            by_bucket: dict[int, list] = {}
            for f in files:
                if f.stats and c in f.stats:
                    by_bucket.setdefault(f.bucket, []).append(tuple(f.stats[c]))
            for ranges in by_bucket.values():
                # sorted-endpoint identity: closed intervals i, j DON'T
                # overlap iff hi_i < lo_j or hi_j < lo_i, and since
                # hi >= lo at most one direction can hold — so each
                # non-overlapping unordered pair is counted exactly once
                # by sum_j |{i : hi_i < lo_j}| (i = j never qualifies).
                # Two sorts + a merge: O(n log n) regardless of how many
                # pairs overlap, vs the naive sweep's O(n * overlapping)
                # which goes quadratic exactly on the badly-clustered
                # tables the metric exists to flag.
                if len(ranges) < 2:
                    continue
                los = sorted(lo for lo, _ in ranges)
                his = sorted(hi for _, hi in ranges)
                disjoint = 0
                h = 0
                for lo in los:
                    while h < len(his) and his[h] < lo:
                        h += 1
                    disjoint += h
                n = len(ranges)
                overlaps += n * (n - 1) // 2 - disjoint
            total = sum(len(v) * (len(v) - 1) // 2 for v in by_bucket.values())
            out[c] = round(overlaps / total, 4) if total else None
        except TypeError:
            out[c] = None  # mixed-type bounds across commits
    return out


def zorder_needed(
    table: LakeTable,
    zorder_cols: list[str],
    threshold: float,
    version: int | None = None,
    buckets: list[int] | None = None,
) -> tuple[bool, float | None, str | None]:
    """Demand gate for a clustering rewrite — manifest math only, no Spark
    job.  Returns ``(needed, worst_overlap, skip_reason)``; the ONE gate
    shared by ``rolling_maintenance`` and the ``maintain`` CLI.

    A rewrite fires when EITHER holds:

    - a zorder column whose type CAN carry manifest bounds
      (``_stats_encodable``) has bounds on NO file in scope — the metric
      is completely blind to it, which happens exactly once per table:
      before the first rewrite on undeclared stats cols (treating that as
      "well-clustered" would skip the bootstrap forever).
      ``rewrite_zorder`` promotes its cols into ``stats_cols``, so after
      the bootstrap every commit records bounds and the gate runs on:
    - the worst per-column overlap among bounds-carrying files exceeds
      ``threshold`` — post-rewrite erosion shows up here directly,
      because fresh merge/append files carry (wide) recorded bounds.

    The blindness rule deliberately requires ZERO coverage, not full
    coverage: a column that can never encode (boolean/decimal/binary —
    excluded by type), or a stray all-NULL file that records no bounds,
    must not re-trigger a full rewrite every cycle — a rewrite cannot
    manufacture bounds for either.  Columns already PROMOTED into the
    ``stats_cols`` property are likewise exempt from the blind rule:
    promotion proves a bootstrap rewrite (or declared harvesting) already
    ran, so zero coverage there means the data records no bounds (e.g. a
    column that is all-NULL across the scored scope) — unimprovable, and
    without the exemption the gate would degenerate into an unconditional
    full-group rewrite every cycle.  A fully-covered scope with no
    scoreable pairs (single stats-carrying file per bucket) is genuinely
    unimprovable and skips."""
    from ton_etl_spark.lake.table import LakeTable, _stats_encodable

    snap = table.snapshot(version) if version is not None else table.current()
    files = snap.files
    if buckets is not None:
        bset = set(buckets)
        files = [f for f in files if f.bucket in bset]
    if not files:
        return False, None, "empty"
    field_types = {f.name: f.dataType for f in snap.schema.fields}
    unknown = sorted(set(zorder_cols) - set(field_types))
    if unknown:
        # same loud-misconfig contract as create()'s stats_cols check: a
        # typo'd column would otherwise just never fire the gate
        raise ValueError(f"zorder_cols not in schema: {unknown}")
    declared = set(LakeTable._prop_cols(snap, "stats_cols"))
    blind = sorted(
        c for c in zorder_cols
        if _stats_encodable(field_types[c])
        and c not in declared
        and not any(f.stats and c in f.stats for f in files)
    )
    ov = clustering_overlap(table, files=files, cols=list(zorder_cols))
    scores = [ov[c] for c in zorder_cols if ov.get(c) is not None]
    worst = max(scores) if scores else None
    if blind:
        return True, worst, None
    if worst is not None and worst > threshold:
        return True, worst, None
    return False, worst, "well-clustered"


def delete_where(
    table: LakeTable,
    where: dict | None = None,
    commit_key: str | None = None,
    protect_tombstones: bool = True,
    file_granular: bool = False,
    where_in: dict | None = None,
) -> dict:
    """Delete every row inside the ``where`` ranges (column -> inclusive
    (lo, hi), either bound None for open-ended but not both; ranges AND
    together — ``read(where=...)``'s contract, inverted).

    Stats-pruned: only buckets holding at least one file whose manifest
    [min, max] bounds can intersect the ranges are rewritten — deleting
    one day / one LSN span from a 100 TB table touches the few buckets'
    files that overlap it, not the world (Iceberg's metadata-pruned
    DELETE role; the commit unit here is the bucket, and maintenance
    keeps buckets split into bounded files, so bucket ≈ a small file
    set).  Files without bounds on a range column conservatively count
    as intersecting — pruning is an optimization, the predicate is the
    truth.

    Snapshot consistency: the prune list, the data read, and the CAS all
    anchor on ONE snapshot — the delete means "as of version v"; a
    commit racing into a replaced bucket conflicts (or legally rebases
    per ``overwrite_buckets``), and rows committed concurrently to other
    buckets are after this delete's snapshot by definition.

    NULL semantics match the read path: a NULL in a range column never
    matches a range, so such rows are always KEPT.  CDC delete
    tombstones (op='d') are also kept by default — dropping them
    re-opens the redelivery resurrection window that ``gc_tombstones``'s
    horizon contract exists to prevent; pass
    ``protect_tombstones=False`` only when the source's redelivery
    horizon has passed the deleted range.

    ``file_granular=True``: within each touched bucket, files whose
    bounds exclude the ranges are carried into the new manifest
    UNCHANGED — only intersecting files are read and rewritten (the
    Iceberg copy-on-write file-scoped DELETE).  Exact by the same
    argument as read-skipping: a file whose bounds exclude a range
    holds no matching row, so keeping it whole equals filtering it.
    This is the 100 TB operating point — a narrow LSN/day delete in a
    hot bucket rewrites a few files, not the bucket; the default stays
    bucket-granular because it also re-compacts what it touches.

    ``where_in`` maps column -> collection of probe values (AND with
    ``where``; values within a column OR) — the per-KEY delete
    (GDPR-style "remove these doc_ids"; reference analog: the per-key
    DELETE statements in ``parser/db.py``).  Pruning composes the read
    path's point-lookup layers: a probe covering the table's key columns
    restricts candidates to the buckets the keys hash to, and in-list
    manifest skipping (sorted-probe bisect) drops files whose bounds
    exclude every value.  A NULL or unencodable probe value keeps that
    column unprunable but never breaks exactness (NULL never matches
    ``isin`` — NULL rows are always kept, same as ranges)."""
    from ton_etl_spark.lake.table import (
        _encode_probe_lists,
        _file_may_match,
        _file_may_match_in,
        _stats_encode,
    )

    where = where or {}
    where_in = where_in or {}
    if any(lo is None and hi is None for lo, hi in where.values()):
        raise ValueError(
            "delete_where needs at least one bounded range; a (None, None) "
            "range would also delete NULL rows, contradicting the NULL-kept "
            "contract — use rewrite_buckets(predicate=...) for a full wipe"
        )
    if not where and not where_in:
        raise ValueError(
            "delete_where needs at least one bounded range or a where_in "
            "probe list"
        )
    snap = table.current()
    if where:
        from ton_etl_spark.lake.table import _conform_where_bounds

        where = _conform_where_bounds(snap.schema, where)
    if where_in:
        from ton_etl_spark.lake.table import _conform_where_in

        # same-typed probes before hashing/encoding/filtering — see
        # _conform_where_in for why raw values are unsound under ANSI
        where_in = _conform_where_in(snap.schema, where_in)
    if any(len(v) == 0 for v in where_in.values()):
        # an empty (or all-unrepresentable) probe list matches nothing;
        # the delete is a no-op
        return {"applied": False, "buckets": [], "deleted_rows": 0}
    if commit_key is not None and snap.has_commit_key(commit_key):
        return {"applied": False, "buckets": [], "deleted_rows": 0}
    enc = {
        c: (_stats_encode(lo), _stats_encode(hi))
        for c, (lo, hi) in table._session_tz_bounds(where).items()
    }
    enc_in: dict[str, list] = (
        _encode_probe_lists(table._session_tz_converter(), where_in)
        if where_in
        else {}
    )
    cand = table._probe_buckets(snap, where_in) if where_in else None
    buckets = sorted({
        f.bucket for f in snap.files
        if (cand is None or f.bucket in cand)
        and _file_may_match(f, enc) and _file_may_match_in(f, enc_in)
    })
    if not buckets:
        return {"applied": False, "buckets": [], "deleted_rows": 0}
    matched = F.lit(True)
    for col, (lo, hi) in where.items():
        if lo is not None:
            matched = matched & (F.col(col) >= F.lit(lo))
        if hi is not None:
            matched = matched & (F.col(col) <= F.lit(hi))
    for col, vals in where_in.items():
        matched = matched & F.col(col).isin(list(vals))
    keep = ~F.coalesce(matched, F.lit(False))  # NULL range col => kept
    if protect_tombstones and OP_COL in snap.schema.fieldNames():
        keep = keep | F.coalesce(F.col(OP_COL) == "d", F.lit(False))
    bset = set(buckets)
    before = sum(f.rows for f in snap.files if f.bucket in bset)
    keep_files = None
    if file_granular:
        keep_files = {b: [] for b in buckets}
        hit_paths = []
        for f in snap.files:
            if f.bucket not in bset:
                continue
            if _file_may_match(f, enc) and _file_may_match_in(f, enc_in):
                hit_paths.append(os.path.join(table.root, f.path))
            else:
                keep_files[f.bucket].append(f)
        src = table.spark.read.schema(snap.schema).parquet(*hit_paths)
        df = src.where(keep)
    else:
        df = table.read(buckets=buckets, version=snap.version).where(keep)
    ok = table.overwrite_buckets(
        df, buckets, commit_key=commit_key, schema=snap.schema,
        base_version=snap.version, keep_files=keep_files,
    )
    # post-commit re-read: exact unless another writer lands in these
    # buckets between our commit and this read (our own commit already
    # conflicts/rebases any interleaved touch of them)
    after = (
        sum(f.rows for f in table.current().files if f.bucket in bset)
        if ok else before
    )
    return {"applied": ok, "buckets": buckets, "deleted_rows": before - after}


def update_where(
    table: LakeTable,
    set_exprs: dict,
    where: dict | None = None,
    where_in: dict | None = None,
    commit_key: str | None = None,
    file_granular: bool = False,
) -> dict:
    """Predicate-scoped copy-on-write UPDATE (the Iceberg UPDATE role;
    reference analog: the targeted UPDATE statements the reference's
    daily sync issues against already-landed rows,
    ``datalake_daily_sync.py``).  Rows matching the predicate get
    ``set_exprs`` applied (column -> Spark Column or SQL expression
    string, cast back to the column's type so the schema never drifts);
    every other row — including non-matching rows inside touched files —
    is carried through byte-identical.

    The flagship use is in-place curation/compliance rewrites at the
    100 TB operating point: "redact PII in these doc_ids" or "re-score
    this day's quality column" rewrites only the buckets (or, with
    ``file_granular=True``, only the FILES) whose manifest stats can
    match the predicate — same pruning stack as :func:`delete_where`,
    same predicate contract (``where`` inclusive ranges AND
    ``where_in`` probe lists; NULL predicate columns never match, so
    NULL rows are never updated).

    Key columns cannot be set (the new value would belong in a different
    bucket — that is a delete+insert, not an update).  Envelope columns
    (op/lsn/ts_ms) CAN be set but rewriting them on a CDC table changes
    LWW ordering history — the caller owns that; updating payload
    columns (the redaction case) leaves ordering intact.

    Returns ``{"applied", "buckets", "updated_rows"}`` — ``updated_rows``
    is the exact matched count (one extra scan of the touched slice;
    compliance updates want the audited number)."""
    from ton_etl_spark.lake.table import (
        _conform_where_bounds,
        _conform_where_in,
        _encode_probe_lists,
        _file_may_match,
        _file_may_match_in,
        _stats_encode,
    )

    where = where or {}
    where_in = where_in or {}
    if not set_exprs:
        raise ValueError("update_where needs at least one set column")
    snap = table.current()
    field_types = {f.name: f.dataType for f in snap.schema.fields}
    unknown = sorted(set(set_exprs) - set(field_types))
    if unknown:
        raise ValueError(f"set columns not in schema: {unknown}")
    bad_keys = sorted(set(set_exprs) & set(snap.key_cols))
    if bad_keys:
        raise ValueError(
            f"cannot set key columns {bad_keys}: the updated row would "
            "hash to a different bucket — that is a delete+insert"
        )
    if any(lo is None and hi is None for lo, hi in where.values()):
        raise ValueError(
            "update_where needs bounded ranges; a (None, None) range would "
            "also update NULL rows, contradicting the NULL-kept contract"
        )
    if not where and not where_in:
        raise ValueError(
            "update_where needs at least one bounded range or a where_in "
            "probe list — for a full-table rewrite use rewrite_buckets"
        )
    if where:
        where = _conform_where_bounds(snap.schema, where)
    if where_in:
        where_in = _conform_where_in(snap.schema, where_in)
    if any(len(v) == 0 for v in where_in.values()):
        return {"applied": False, "buckets": [], "updated_rows": 0}
    if commit_key is not None and snap.has_commit_key(commit_key):
        return {"applied": False, "buckets": [], "updated_rows": 0}
    enc = {
        c: (_stats_encode(lo), _stats_encode(hi))
        for c, (lo, hi) in table._session_tz_bounds(where).items()
    }
    enc_in: dict[str, list] = (
        _encode_probe_lists(table._session_tz_converter(), where_in)
        if where_in
        else {}
    )
    cand = table._probe_buckets(snap, where_in) if where_in else None
    buckets = sorted({
        f.bucket for f in snap.files
        if (cand is None or f.bucket in cand)
        and _file_may_match(f, enc) and _file_may_match_in(f, enc_in)
    })
    if not buckets:
        return {"applied": False, "buckets": [], "updated_rows": 0}
    matched = F.lit(True)
    for col, (lo, hi) in where.items():
        if lo is not None:
            matched = matched & (F.col(col) >= F.lit(lo))
        if hi is not None:
            matched = matched & (F.col(col) <= F.lit(hi))
    for col, vals in where_in.items():
        matched = matched & F.col(col).isin(list(vals))
    matched = F.coalesce(matched, F.lit(False))  # NULL pred col => untouched
    bset = set(buckets)
    keep_files = None
    if file_granular:
        keep_files = {b: [] for b in buckets}
        hit_paths = []
        for f in snap.files:
            if f.bucket not in bset:
                continue
            if _file_may_match(f, enc) and _file_may_match_in(f, enc_in):
                hit_paths.append(os.path.join(table.root, f.path))
            else:
                keep_files[f.bucket].append(f)
        src = table.spark.read.schema(snap.schema).parquet(*hit_paths)
    else:
        src = table.read(buckets=buckets, version=snap.version)
    updated_rows = src.where(matched).count()
    proj = []
    for f in snap.schema.fields:
        if f.name in set_exprs:
            e = set_exprs[f.name]
            e = F.expr(e) if isinstance(e, str) else e
            proj.append(
                F.when(matched, e.cast(f.dataType))
                .otherwise(F.col(f.name)).alias(f.name)
            )
        else:
            proj.append(F.col(f.name))
    ok = table.overwrite_buckets(
        src.select(*proj), buckets, commit_key=commit_key, schema=snap.schema,
        base_version=snap.version, keep_files=keep_files,
    )
    return {"applied": ok, "buckets": buckets, "updated_rows": updated_rows}


def retention_sweep(
    table: LakeTable,
    where: dict,
    commit_key: str | None = None,
    keep_last: int = 2,
    grace_seconds: float = 600.0,
    compact: bool = False,
) -> dict:
    """Bounded-growth policy for append-only sidecar tables that live
    inside an unbounded stream (curation decisions, observability metrics,
    lineage): delete every row inside the ``where`` horizon ranges
    (``delete_where`` semantics — stats-pruned, and the rewrite collapses
    each touched bucket back to compact files), then expire snapshot
    metadata and unreferenced data files beyond the newest ``keep_last``
    versions.  Tagged snapshots always survive expiry — a tag pins what
    retention must never collect.  Idempotent per ``commit_key``; the
    expiry half is monotone and safe to repeat.

    Reference analog: the Postgres tables these sidecars replace are
    bounded by the reference's cron DELETEs/VACUUM; here the horizon is
    explicit and the replay contract is preserved because commit-key
    watermarks live in the snapshot, not in the expired history.

    ``compact=True``: also collapse every bucket's per-append file
    accumulation after the delete — the horizon delete only rewrites
    buckets holding EXPIRED rows, so a quiet period where nothing expires
    would otherwise let still-live append files pile up between sweeps.
    Sidecar tables are small by construction; a full compact per sweep
    cycle is bounded work."""
    d = delete_where(table, where, commit_key=commit_key)
    if compact and table.current().manifests:
        rewrite_buckets(
            table,
            commit_key=f"{commit_key}-compact" if commit_key else None,
        )
    e = expire_snapshots(table, keep_last=keep_last, grace_seconds=grace_seconds)
    return {**d, "expired": {k: v for k, v in e.items() if k != "kept_versions"}}


_ZORDER_TEMPORAL = {"timestamp": F.unix_micros, "timestamp_ntz": F.unix_micros,
                    "date": F.unix_date}
_ZORDER_NUMERIC = ("tinyint", "smallint", "int", "bigint", "float", "double", "long")


def _zorder_double(df, col: str):
    """Map a z-order dimension to a double for quantile binning.  ANSI mode
    rejects temporal→numeric casts, so temporals go through the epoch
    functions; decimals and the fixed-width numerics cast directly."""
    dtype = dict(df.dtypes)[col]
    fn = _ZORDER_TEMPORAL.get(dtype)
    if fn is not None:
        return fn(F.col(col)).cast("double")
    if dtype in _ZORDER_NUMERIC or dtype.startswith("decimal"):
        return F.col(col).cast("double")
    raise TypeError(
        f"z-order supports numeric/temporal columns; {col!r} is {dtype} "
        "(string locality doesn't survive bit interleaving — use bloom_cols "
        "for point lookups on strings)"
    )


def zorder_boundaries(
    df, cols: list[str], bits: int = 8, relative_error: float = 0.001
) -> dict[str, list[float]]:
    """Per-column quantile bin boundaries for the z-value (2^bits bins).

    Quantile bins, not min/max linear scaling: a skewed column (lsn hot at
    the head, value with outliers) would otherwise collapse into a few
    linear bins and the interleave would carry no information for it.
    One approxQuantile pass over the rewrite input, driver gets ≤
    (2^bits - 1) doubles per column — bounded metadata, like Delta's
    range-partition ids."""
    n_bins = 1 << bits
    probs = [i / n_bins for i in range(1, n_bins)]
    proj = df.select(*[_zorder_double(df, c).alias(c) for c in cols])
    out: dict[str, list[float]] = {}
    for c, qs in zip(cols, proj.approxQuantile(cols, probs, relative_error)):
        # constant / near-constant columns repeat boundaries; dedupe so the
        # binning expression stays minimal (empty => every row bins to 0)
        out[c] = sorted(set(qs))
    return out


def zorder_value(df, boundaries: dict[str, list[float]], bits: int = 8):
    """Morton (z-order) value as a pure Column expression — no UDF, no
    materialized column: bin each dimension by its quantile boundaries
    (count of boundaries ≤ value, NULL → bin 0 so NULL rows cluster
    together), then interleave the bin bits across dimensions.

    Column algebra only: the bin is one ``aggregate`` over a boundary
    array literal (O(2^bits) JVM adds per row, I/O-noise for a rewrite)
    and the interleave is a static unroll of shift/mask terms — the whole
    thing stays inside codegen."""
    cols = list(boundaries)
    n_dims = len(cols)
    if n_dims * bits > 63:
        # bit 63 is the sign bit and shiftleft wraps mod 64 past it —
        # either silently destroys the Morton order; fail instead
        raise ValueError(
            f"{n_dims} dims x {bits} bits = {n_dims * bits} z bits; the "
            "interleave must fit a signed long (<= 63) — lower bits or "
            "z-order fewer columns"
        )
    z = F.lit(0).cast("long")
    for d, c in enumerate(cols):
        bs = boundaries[c]
        v = _zorder_double(df, c)
        if bs:
            arr = F.array(*[F.lit(float(b)) for b in bs])
            bin_c = F.aggregate(
                arr,
                F.lit(0),
                lambda acc, b: acc + F.when(v >= b, 1).otherwise(0),
            ).cast("long")
        else:
            bin_c = F.lit(0).cast("long")
        for i in range(bits):
            bit = F.shiftright(bin_c, i).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, i * n_dims + d)
    return z


def rewrite_zorder(
    table: LakeTable,
    cols: list[str],
    buckets: list[int] | None = None,
    commit_key: str | None = None,
    bits: int = 8,
) -> dict:
    """Z-order clustering rewrite: re-sort each bucket's rows by the Morton
    interleave of ``cols`` so file-level [min, max] bounds get tight on
    EVERY listed column at once — multi-dimensional file skipping, where
    ``sort_cols`` clusters only its leading column (Iceberg/Delta
    ``rewrite_data_files(strategy => 'zorder')`` role).

    Runs on the existing copy-on-write path: same CAS commit, same rebase
    rules, same bucket layout (z-ordering changes clustering WITHIN
    buckets, never row→bucket routing).  Bounds for ``cols`` are
    harvested even when not declared as ``stats_cols`` — and the commit
    PROMOTES them into the ``stats_cols`` property, so every later
    merge/append keeps recording their bounds too.  Without the
    promotion, post-rewrite commits drop the bounds again: the files are
    unprunable on those columns, the overlap metric is blind to them,
    and ``zorder_needed``'s coverage rule would fire EVERY cycle on a
    merge-heavy table (merges rewrite whole buckets) — always-on full
    rewrites disguised as a demand gate.  With it, coverage stays 1 and
    the gate keys on the honest signal: measured overlap of the recorded
    bounds.  Later merge commits still sort by the declared ``sort_cols``
    — z-order locality decays as buckets take new writes, so schedule
    this like compaction (it IS a compaction, one rolling bucket group
    at a time at 100 TB — the ``buckets`` arg)."""
    snap = table.current()
    if commit_key is not None and snap.has_commit_key(commit_key):
        return {"applied": False, "buckets": []}
    if buckets is None:
        buckets = sorted(snap.manifests.keys())
    df = table.read(buckets=buckets)
    bounds = zorder_boundaries(df, cols, bits=bits)
    z = zorder_value(df, bounds, bits=bits)
    declared = LakeTable._prop_cols(snap, "stats_cols")
    promoted = list(dict.fromkeys(declared + list(cols)))
    ok = table.overwrite_buckets(
        df, buckets, commit_key=commit_key, schema=snap.schema,
        base_version=snap.version, sort_exprs=[z], extra_stats_cols=cols,
        properties_update=(
            {"stats_cols": ",".join(promoted)} if promoted != declared else None
        ),
    )
    return {"applied": ok, "buckets": buckets,
            "bins": {c: len(b) + 1 for c, b in bounds.items()}}


def expire_snapshots(
    table: LakeTable, keep_last: int = 1, grace_seconds: float = 600.0
) -> dict:
    """Delete snapshot metadata older than the newest ``keep_last``
    versions and any data file no kept snapshot references.  Time-travel
    reads to expired versions stop working (same contract as Iceberg
    ``expire_snapshots``); the commit-key history of the CURRENT snapshot
    is untouched, so batch idempotency is preserved.  TAGGED versions are
    always kept (Iceberg tag retention): a tag pins the exact dataset a
    training run consumed, so retention can never collect it — delete the
    tag to release it.

    ``grace_seconds``: files younger than this are never deleted even when
    unreferenced.  A concurrent commit writes its data files and manifest
    BEFORE publishing the snapshot that references them; without the grace
    window, maintenance running inside that gap would collect the
    about-to-be-published files and corrupt the commit (Iceberg's
    ``expire_snapshots`` carries the same ``older_than`` guard).  Pass 0
    only when the caller serializes expiry with writers."""
    import time

    cur = table.current_version()
    keep_versions = set(range(max(0, cur - keep_last + 1), cur + 1))
    keep_versions.update(table.tags().values())
    referenced: set[str] = set()
    referenced_manifests: set[str] = set()
    for v in keep_versions:
        s = table.snapshot(v)
        referenced_manifests.update(s.manifests.values())
        referenced.update(f.path for f in s.files)

    cutoff = time.time() - grace_seconds

    def _expired(path: str) -> bool:
        try:
            return os.path.getmtime(path) <= cutoff
        except OSError:
            return False

    removed_files = 0
    data_root = os.path.join(table.root, DATA_DIR)
    for commit_dir in list(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        cdir = os.path.join(data_root, commit_dir)
        for sub, _dirs, files in os.walk(cdir, topdown=False):
            for fn in files:
                full = os.path.join(sub, fn)
                rel = os.path.relpath(full, table.root)
                if rel not in referenced and _expired(full):
                    os.unlink(full)
                    removed_files += 1
            if not os.listdir(sub):
                os.rmdir(sub)

    # manifests referenced only by expired snapshots (same write-then-publish
    # race as data files, same grace guard)
    removed_manifests = 0
    man_root = os.path.join(table.root, MANIFEST_DIR)
    if os.path.isdir(man_root):
        for fn in os.listdir(man_root):
            rel = os.path.join(MANIFEST_DIR, fn)
            full = os.path.join(table.root, rel)
            if rel not in referenced_manifests and _expired(full):
                os.unlink(full)
                removed_manifests += 1

    removed_snaps = 0
    for v in range(0, cur):
        if v not in keep_versions:
            p = table._snapshot_path(v)
            if os.path.exists(p):
                os.unlink(p)
                removed_snaps += 1
    return {
        "kept_versions": sorted(keep_versions),
        "removed_files": removed_files,
        "removed_snapshots": removed_snaps,
        "removed_manifests": removed_manifests,
    }
