"""Structured Streaming tail of the change log.

The production analog of the reference's Kafka consumer loop
(``parser/main.py:85-143``): an unbounded source of CDC envelopes, applied
in micro-batches.  Two sources:

- ``start_cdc_stream``: file stream over already-decoded delivery parquet.
- ``start_cdc_envelope_stream``: file stream of Kafka-shaped frames
  (key/value binary + topic/partition/offset/timestamp — the exact column
  set of ``readStream.format("kafka")``) decoded by
  ``cdc.envelope.parse_cdc_envelope`` (Debezium JSON + ``__``-meta strip);
  swapping in a real broker is replacing the file source with
  ``cdc.envelope.kafka_source`` — every transformation downstream is
  identical.

The sink is the LakeTable MERGE inside ``foreachBatch``.

Exactly-once contract (reference analogs X1/X2/X6 in SURVEY.md §2.9):
Spark's checkpoint gives at-least-once ``foreachBatch`` invocations with a
stable ``batch_id``; the commit manifest key ``epoch=<batch_id>`` recorded
in the table snapshot makes re-executions no-ops — commit-then-checkpoint
ordering exactly mirrors the reference's "DB commit, then Kafka commit".
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ton_etl_spark.cdc.apply import apply_cdc_batch, make_lineage_table, make_sequences_table
from ton_etl_spark.cdc.schema import CDC_EVENT_SCHEMA_EVOLVED
from ton_etl_spark.lake.table import LakeTable


def _run_rolling_maintenance(
    table: LakeTable,
    lineage: LakeTable | None,
    batch_df: DataFrame,
    batch_id: int,
    every: int | None,
    groups: int,
    tombstone_retain_lsn: int | None,
) -> None:
    """Invoke the rolling maintenance policy on a maintenance epoch: one
    bucket group of the sink (optionally GC'ing tombstones below max
    applied LSN − retain window) plus a whole-table compaction of the
    small append-only lineage table.

    The GC horizon is derived from the LINEAGE table's recorded max_lsn
    (a few rows per epoch) rather than re-aggregating the micro-batch,
    which would re-read the whole delivery batch from the source — the
    lineage rows were computed on the same scan that fed the merge."""
    if not every or (batch_id + 1) % every != 0:
        return
    from ton_etl_spark.lake.maintenance import rolling_maintenance

    horizon = None
    if tombstone_retain_lsn is not None:
        if lineage is not None:
            mx = lineage.read().agg(F.max("max_lsn")).first()[0]
        else:
            mx = batch_df.agg(F.max("lsn")).first()[0]
        if mx is not None:
            horizon = mx - tombstone_retain_lsn
    rolling_maintenance(
        table, batch_id, every=every, groups=groups, tombstone_horizon_lsn=horizon
    )
    if lineage is not None:
        # append-only, one file per bucket per epoch — compact it whole;
        # it is small by construction
        rolling_maintenance(lineage, batch_id, every=every, groups=1)


def start_cdc_stream(
    spark: SparkSession,
    log_glob: str,
    table_root: str,
    checkpoint_dir: str,
    lineage_root: str | None = None,
    n_buckets: int = 16,
    max_files_per_trigger: int = 2,
    maintenance_every: int | None = None,
    maintenance_groups: int = 4,
    tombstone_retain_lsn: int | None = None,
    mart_root: str | None = None,
    mart_group_cols: tuple[str, ...] = ("source",),
    export_dir: str | None = None,
):
    """Start (or restart from checkpoint) the streaming tail.

    ``log_glob`` is a glob over delivery parquet files, e.g.
    ``<log>/phase=*/__seq=*``.  Restart with the same ``checkpoint_dir``
    resumes from the last committed source offset; batches that were
    applied but not checkpointed replay and are skipped by manifest.

    ``maintenance_every``: every K epochs, run the rolling maintenance
    policy (``lake.maintenance.rolling_maintenance``) on one bucket group
    of the sink table — and compact the append-only lineage table, whose
    per-commit files would otherwise grow without bound.  With
    ``tombstone_retain_lsn`` set, the same rewrite GCs tombstones older
    than (max applied LSN − retain window); ONLY set it when the source's
    redelivery/out-of-order horizon is genuinely bounded by that window —
    a GC ahead of the redelivery bound re-opens the resurrection window
    (see ``gc_tombstones``).

    ``mart_root``: maintain a derived aggregate mart (a streaming
    materialized view) alongside the sink — after each merge, the mart is
    folded forward from ``LakeTable.changes`` over exactly the version
    interval the merge produced (reference analog: the incremental
    nft_events build as a continuous process).  Crash-safe with no side
    channel: the refresh cursor is recovered from the mart's own commit
    keys (``last_synced_version``), so a crash between the merge and the
    refresh simply widens the next epoch's interval, and a replayed epoch
    whose merge was a manifest no-op refreshes nothing.

    ``export_dir``: keep an external-engine export (``lake/ddl.py``
    symlink manifest) in lockstep with the sink — refreshed after every
    commit, so Athena/DuckDB readers always see the latest published
    snapshot and never a torn one (the manifest write is an atomic
    replace).  The reference republishes its Athena tables on an airflow
    schedule (``datalake/airflow``); here the natural cadence is
    per-commit, since the refresh is one small metadata file."""
    table = make_sequences_table(spark, table_root, n_buckets=n_buckets)
    lineage = make_lineage_table(spark, lineage_root) if lineage_root else None

    src = (
        spark.readStream.schema(CDC_EVENT_SCHEMA_EVOLVED)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(log_glob)
    )
    # free per-micro-batch delivery counters in the streaming progress
    # (SURVEY A9; the reference's "N messages/sec" consumer log line) —
    # observed metrics ride the existing scan, no extra pass
    src = src.observe(
        "delivery",
        F.count(F.lit(1)).alias("events"),
        F.min("lsn").alias("min_lsn"),
        F.max("lsn").alias("max_lsn"),
    )

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # persist: apply_cdc_batch consumes the batch more than once (bucket
        # probe, lineage, merge) — caching it (a) reads the source files once
        # per trigger instead of per action and (b) makes the trigger's
        # progress counters (numInputRows, observed delivery events) exact
        # instead of accumulating one count per execution pass
        batch_df.persist()
        try:
            # reload table handle each batch: snapshot pointer may have advanced
            t = LakeTable.load(spark, table_root)
            apply_cdc_batch(t, batch_df, epoch=batch_id, lineage=lineage)
            _post_merge(t, batch_df, batch_id)
        finally:
            batch_df.unpersist()

    def _post_merge(t: LakeTable, batch_df: DataFrame, batch_id: int) -> None:
        if mart_root is not None:
            from ton_etl_spark.lake.incremental import (
                last_synced_version,
                make_agg_mart,
                rebuild_agg_mart,
                refresh_agg_mart,
            )

            mart = make_agg_mart(spark, mart_root, group_cols=list(mart_group_cols))
            frm = last_synced_version(mart)
            if frm is None:
                # no cursor: the mart may hold pre-existing content (manual
                # bootstrap, or the cursor key aged out of the recent-keys
                # window) — a delta from version 0 would double-count it, so
                # bootstrap with the full recompute, which is correct from
                # ANY prior state
                rebuild_agg_mart(mart, t, to_version=t.current_version())
            else:
                refresh_agg_mart(
                    mart, t, from_version=frm, to_version=t.current_version()
                )
        _run_rolling_maintenance(
            t,
            lineage,
            batch_df,
            batch_id,
            maintenance_every,
            maintenance_groups,
            tombstone_retain_lsn,
        )
        if export_dir is not None:
            from ton_etl_spark.lake.ddl import write_symlink_manifest

            # re-read the pointer: maintenance may have committed after the
            # merge; the export must name the latest published snapshot
            write_symlink_manifest(t, export_dir, version=t.current_version())

    query = (
        src.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    return query


def start_cdc_envelope_stream(
    spark: SparkSession,
    frames_glob: str,
    table_root: str,
    checkpoint_dir: str,
    lineage_root: str | None = None,
    n_buckets: int = 16,
    max_files_per_trigger: int = 2,
    table_filter: str | None = None,
):
    """Streaming tail over Kafka-SHAPED frames: decode the Debezium JSON
    envelope per micro-batch, then the same exactly-once MERGE as
    ``start_cdc_stream``.  ``from_json`` is a streamable projection, so the
    decode lives on the streaming DataFrame itself (JVM-side, codegen), not
    in foreachBatch."""
    from ton_etl_spark.cdc.envelope import KAFKA_FRAME_SCHEMA, parse_cdc_envelope

    make_sequences_table(spark, table_root, n_buckets=n_buckets)
    lineage = make_lineage_table(spark, lineage_root) if lineage_root else None

    frames = (
        spark.readStream.schema(KAFKA_FRAME_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frames_glob)
    )
    events = parse_cdc_envelope(frames, table=table_filter)

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        # persist for the same reasons as start_cdc_stream — and here each
        # re-execution would also re-run the from_json envelope decode
        batch_df.persist()
        try:
            t = LakeTable.load(spark, table_root)
            apply_cdc_batch(t, batch_df, epoch=batch_id, lineage=lineage)
        finally:
            batch_df.unpersist()

    return (
        events.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_cdc_multi_table_stream(
    spark: SparkSession,
    frames_glob: str,
    table_roots: dict[str, str],
    checkpoint_dir: str,
    lineage_roots: dict[str, str] | None = None,
    n_buckets: int = 16,
    max_files_per_trigger: int = 2,
    maintenance_every: int | None = None,
    maintenance_groups: int = 4,
    tombstone_retain_lsn: int | None = None,
    payload_schemas: dict | None = None,
):
    """One envelope stream fanned out to N LakeTables — the reference's
    topic→parsers routing (one consumed topic feeds several parser sinks,
    ``parser/parsers/__init__.py:118-132``; topics list
    ``datalake/topics.py:1-24``).

    ``table_roots`` maps a ``__table`` value to that sink's LakeTable root.
    The sinks may be HETEROGENEOUS: ``payload_schemas`` maps a table name
    to its own payload ``StructType`` (must carry the engine envelope
    columns doc_id/op/lsn/ts_ms; defaults to the tokenized-sequence
    schema) — the reference's parsers each produce a different table
    shape from the same topic.

    Decode is two-phase, sized to what each phase needs: the STREAM
    extracts only the routing field (``get_json_object`` of ``__table`` —
    one narrow JVM expression over every message), and each table's full
    Debezium decode (``from_json`` with THAT table's schema) runs inside
    ``foreachBatch`` on that table's slice only — so every message is
    full-decoded exactly once, with its own schema, and messages for
    tables this job does not own (or with unparseable routing) are
    dropped before any heavy parse, the same way the reference ignores
    topics absent from its routing map.

    ``maintenance_every``/``maintenance_groups``/``tombstone_retain_lsn``:
    the same rolling maintenance policy as ``start_cdc_stream``, applied to
    EVERY sink (and its lineage table) on maintenance epochs — without it a
    long-running multi-table stream's lineage tables grow one file per
    bucket per epoch without bound.

    Exactly-once is PER SINK: every table records ``epoch=<batch_id>`` in
    its OWN commit manifest.  A crash after table A committed epoch k but
    before table B did replays the micro-batch on restart — A's merge is a
    manifest no-op, B's applies — so each table independently converges to
    exactly-once without cross-table coordination (the same property the
    reference gets from per-sink consumer groups)."""
    from ton_etl_spark.cdc.envelope import (
        KAFKA_FRAME_SCHEMA,
        ROUTE_COL,
        parse_cdc_envelope,
    )
    from ton_etl_spark.cdc.schema import KEY_COLS

    from ton_etl_spark.cdc.schema import CDC_EVENT_SCHEMA_EVOLVED

    schemas = payload_schemas or {}
    for name, root in table_roots.items():
        if name in schemas:
            LakeTable.get_or_create(
                spark, root, schema=schemas[name], key_cols=KEY_COLS,
                n_buckets=n_buckets,
            )
        else:
            make_sequences_table(spark, root, n_buckets=n_buckets)
        # config-drift guard: restarting WITHOUT the schema a sink was built
        # with would decode its frames against the default sequences schema,
        # silently nulling the custom payload columns and letting those rows
        # win LWW over good stored data.  The sink's own persisted schema is
        # the source of truth — every stored payload column must survive the
        # decode we are about to run.
        stored = set(LakeTable.load(spark, root).current().schema.fieldNames())
        decode = set((schemas.get(name) or CDC_EVENT_SCHEMA_EVOLVED).fieldNames())
        missing = sorted(stored - decode)
        if missing:
            raise ValueError(
                f"table {name!r} at {root} stores columns {missing} that the "
                f"configured payload schema would not decode — pass the "
                f"table's schema in payload_schemas (config drift guard)"
            )
    lineages = {
        name: make_lineage_table(spark, root)
        for name, root in (lineage_roots or {}).items()
    }

    frames = (
        spark.readStream.schema(KAFKA_FRAME_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frames_glob)
    )
    routed = frames.withColumn(
        ROUTE_COL, F.get_json_object(F.col("value").cast("string"), "$.__table")
    ).where(F.col(ROUTE_COL).isin(list(table_roots)))

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            for name, root in table_roots.items():
                t = LakeTable.load(spark, root)
                # persist the DECODED slice too: the merge path consumes it
                # several times (bucket probe, lineage, merge, maintenance
                # max-lsn) and each action would otherwise re-run the heavy
                # from_json over the raw frames — this is what makes
                # "full-decoded exactly once" true, not just intended
                sl = parse_cdc_envelope(
                    batch_df.where(F.col(ROUTE_COL) == name),
                    payload_schema=schemas.get(name),
                ).persist()
                try:
                    apply_cdc_batch(t, sl, epoch=batch_id, lineage=lineages.get(name))
                    _run_rolling_maintenance(
                        t,
                        lineages.get(name),
                        sl,
                        batch_id,
                        maintenance_every,
                        maintenance_groups,
                        tombstone_retain_lsn,
                    )
                finally:
                    sl.unpersist()
        finally:
            batch_df.unpersist()

    return (
        routed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_cdc_catalog_stream(
    spark: SparkSession,
    frames_glob: str,
    catalog_provider,
    tables_dir: str,
    checkpoint_dir: str,
    lineage_dir: str | None = None,
    key_cols: list[str] | None = None,
    n_buckets: int = 16,
    max_files_per_trigger: int = 2,
    maintenance_every: int | None = None,
    maintenance_groups: int = 4,
    tombstone_retain_lsn: int | None = None,
    table_kwargs: dict | None = None,
):
    """Multi-table envelope stream whose ROUTING MAP IS THE CATALOG: before
    every micro-batch the stream polls ``catalog_provider()`` — a callable
    returning ``{table_name: information_schema.columns rows}`` — and
    converges each sink onto it via ``lake.catalog.sync_table_from_catalog``
    (create when absent, additive evolution when the catalog grew, loud
    failure on a type change — unless the sinks opt into ``type_widening``
    via ``table_kwargs``, in which case a lossless catalog promotion
    converges mid-stream: the widened schema publishes BEFORE the batch
    decodes, so the very frames that carry the first out-of-range values
    parse against the wide type).  The streaming end of the reference's
    catalog-driven auto-create: ``datalake/datalake_daily_sync.py:268-296``
    provisions targets from the Glue catalog on a schedule;
    ``datalake/metadata_snapshot.py:44-79`` get-or-creates from the live
    Postgres catalog.  Here the "schedule" is every micro-batch — the poll
    is O(columns) driver-side metadata work, so a new source table starts
    flowing within one trigger of appearing in the catalog.

    Sinks live at ``<tables_dir>/<table_name>`` (lineage, when enabled, at
    ``<lineage_dir>/<table_name>``).  Each slice decodes against its sink's
    STORED schema — a superset of the catalog under the additive-only
    contract — so a column the catalog dropped keeps decoding (new row
    images null it, which is the correct complete-image semantics), and a
    column the catalog just added decodes from this very batch onward.

    Events for tables not (yet) in the catalog are dropped before any heavy
    parse, exactly as the reference ignores topics absent from its routing
    map; history from before a table entered the catalog is backfilled with
    the offline replay path (``cdc.apply.replay_log_batched``), not the
    stream.  Exactly-once is per sink via each table's own commit manifest,
    as in ``start_cdc_multi_table_stream`` — a catalog that GROWS between a
    crash and the restart simply sees the replayed micro-batch apply to the
    new table and no-op on the old ones."""
    from ton_etl_spark.cdc.envelope import (
        KAFKA_FRAME_SCHEMA,
        ROUTE_COL,
        parse_cdc_envelope,
    )
    from ton_etl_spark.cdc.schema import KEY_COLS
    from ton_etl_spark.lake.catalog import sync_table_from_catalog

    key_cols = list(key_cols or KEY_COLS)

    frames = (
        spark.readStream.schema(KAFKA_FRAME_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(frames_glob)
    )
    # stream side extracts ONLY the routing field; no table filter here —
    # the table set is dynamic, so membership is decided per micro-batch
    routed = frames.withColumn(
        ROUTE_COL, F.get_json_object(F.col("value").cast("string"), "$.__table")
    ).where(F.col(ROUTE_COL).isNotNull())

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        catalog = catalog_provider()
        batch_df.persist()
        try:
            # which tables actually have rows this trigger: one tiny
            # distinct over the already-extracted route column.  Sink
            # provisioning/evolution below still converges on the WHOLE
            # catalog (O(columns) driver-side metadata), but the heavy
            # decode→merge path runs only for present tables — a catalog
            # of hundreds of tables must not cost hundreds of no-op Spark
            # job groups per trigger.
            present = {
                r[ROUTE_COL]
                for r in batch_df.select(ROUTE_COL).distinct().collect()
            }
            for name in sorted(catalog):
                root = os.path.join(tables_dir, name)
                t, _report = sync_table_from_catalog(
                    spark, root, catalog[name], key_cols=key_cols,
                    envelope=True, n_buckets=n_buckets,
                    **(table_kwargs or {}),
                )
                if name not in present:
                    continue
                lin = (
                    make_lineage_table(spark, os.path.join(lineage_dir, name))
                    if lineage_dir
                    else None
                )
                sl = parse_cdc_envelope(
                    batch_df.where(F.col(ROUTE_COL) == name),
                    payload_schema=t.current().schema,
                ).persist()
                try:
                    apply_cdc_batch(t, sl, epoch=batch_id, lineage=lin)
                    _run_rolling_maintenance(
                        t, lin, sl, batch_id,
                        maintenance_every, maintenance_groups, tombstone_retain_lsn,
                    )
                finally:
                    sl.unpersist()
        finally:
            batch_df.unpersist()

    return (
        routed.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_stream_to_completion(
    spark: SparkSession,
    log_glob: str,
    table_root: str,
    checkpoint_dir: str,
    **kw,
) -> LakeTable:
    q = start_cdc_stream(spark, log_glob, table_root, checkpoint_dir, **kw)
    q.awaitTermination()
    return LakeTable.load(spark, table_root)
