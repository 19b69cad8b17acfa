"""Last-writer-wins MERGE for LakeTable.

Semantics mirror the reference's guarded upserts and delete handling:

- LWW guard: apply an incoming row only if it is *newer* than the stored
  row — reference ``ON CONFLICT ... WHERE last_transaction_lt <
  EXCLUDED.last_transaction_lt`` (``parser/db.py:310-330``) and the
  rank-1-by-``lt desc`` snapshot queries (``datalake/athena_ddl.sql:659-669``).
- Delete handling: ``__op == 'd'`` removes the key — reference drops 'd'
  events for append marts (``parser/main.py:15-16``) but our keyed target
  table honors tombstones, matching "final Postgres state".
- Ordering/tie-break: events are ordered by ``(lsn, ts_ms, op_priority)``
  with op priority d > u > r > c, so redelivered duplicates and
  out-of-order arrival converge to the same state (order-insensitive by
  construction).

Scale design (the part the reference outsources to Postgres indexes):

1. **Two-stage, salt-aware batch reduce** — a micro-batch is first reduced
   per (key, salt) and then per key, so a hot doc_id with millions of
   churn events in one batch never lands on a single reducer.
2. **Bucket-pruned copy-on-write** — the target is hash-bucketed by key;
   only buckets touched by the batch are read and rewritten.
3. **Single shuffle join** — current-state (pruned buckets) ⟗ reduced
   batch on key; both sides are one-row-per-key so the join is the whole
   merge. AQE handles residual skew on the join itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ton_etl_spark.cdc.schema import OP_COL, LSN_COL, TS_COL, op_priority_expr
from ton_etl_spark.lake.table import LakeTable

DEFAULT_SALT = 16


def reduce_batch_lww(
    batch: DataFrame,
    key_cols: list[str],
    n_salts: int = DEFAULT_SALT,
) -> DataFrame:
    """Collapse a CDC micro-batch to one winning event per key.

    Winner = max by (lsn, ts_ms, op_priority). Two-stage aggregation:
    stage 1 groups by (key, salt) — salt derived from the ordering column so
    events of a hot key spread over ``n_salts`` reducers and each reducer
    emits one candidate; stage 2 reduces the ≤ n_salts candidates per key.
    Both stages are hash aggregations with map-side partial combine.
    """
    ord_expr = F.struct(
        F.col(LSN_COL).alias("lsn"),
        F.coalesce(F.col(TS_COL), F.lit(0)).alias("ts_ms"),
        op_priority_expr().alias("op_pri"),
    )
    payload = F.struct(*[F.col(c) for c in batch.columns])
    salted = batch.withColumn("__salt", F.pmod(F.xxhash64(F.col(LSN_COL)), F.lit(n_salts)))
    stage1 = salted.groupBy(*key_cols, "__salt").agg(
        F.max_by(payload, ord_expr).alias("__win"), F.max(ord_expr).alias("__ord")
    )
    stage2 = stage1.groupBy(*key_cols).agg(F.max_by(F.col("__win"), F.col("__ord")).alias("__win"))
    return stage2.select("__win.*")


def merge_lww(
    table: LakeTable,
    batch: DataFrame,
    commit_key: str | None = None,
    pre_reduced: bool = False,
    n_salts: int = DEFAULT_SALT,
) -> dict:
    """MERGE a CDC batch into ``table`` with LWW semantics.

    ``batch`` carries the CDC envelope (op/lsn/ts_ms) plus payload columns.
    The stored row for a key keeps the envelope of its winning event
    (columns ``op``/``lsn``/``ts_ms`` persist as ``last op/lsn/ts``), so a
    *stale* redelivered event always loses against the stored state — the
    MERGE is idempotent at row level, and ``commit_key`` makes it
    idempotent at batch level.

    Returns stats {applied, buckets, upserts, deletes} (applied=False when
    the commit_key was already committed).
    """
    snap = table.current()
    if commit_key is not None and commit_key in set(snap.commit_keys):
        return {"applied": False, "buckets": [], "rows_written": 0}
    key_cols = snap.key_cols

    # Buckets touched by this batch (≤ n_buckets ints, safe to collect).
    # Computed on the RAW batch — a superset of the post-validation touched
    # set, which is still correct for pruning — so the probe is a
    # column-pruned scan of just the key column + a tiny distinct, and the
    # expensive validate+reduce pipeline is consumed exactly once inside the
    # merge DAG (no persist, no double evaluation).
    bexpr = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(snap.n_buckets)).cast("int")
    buckets = [
        r["__b"] for r in batch.select(bexpr.alias("__b")).distinct().collect()
    ]

    reduced = batch if pre_reduced else reduce_batch_lww(batch, key_cols, n_salts)

    current = table.read(buckets=buckets)

    # align schemas additively (mid-stream new columns appear on the batch side)
    from ton_etl_spark.lake.table import _merge_schemas, _conform

    reduced_payload = reduced
    target_schema = _merge_schemas(snap.schema, reduced_payload.schema)
    cur = _conform(current, target_schema)
    inc = _conform(reduced_payload, target_schema)

    # One-row-per-key ⟗ one-row-per-key: full-outer join IS the merge.
    # Join on the key alone (the bucket is a pure function of the key, so
    # bucket equality is implied); the write then repartitions by bucket so
    # every bucket lands in exactly one output file — keeping the
    # snapshot's file count O(n_buckets), which is what makes later
    # bucket-pruned reads cheap. (An earlier variant joined on
    # (bucket, key): the join output came back hash-partitioned on BOTH
    # columns, the dynamic-partition write fanned out to
    # n_partitions × n_buckets files, and every subsequent read paid a
    # distributed file-listing job — a measured 2× end-to-end regression.)
    cur_a = cur.select(*[F.col(c).alias(f"__cur_{c}") for c in cur.columns])
    inc_a = inc.select(*[F.col(c).alias(f"__inc_{c}") for c in inc.columns])
    cond = [cur_a[f"__cur_{k}"] == inc_a[f"__inc_{k}"] for k in key_cols]
    joined = cur_a.join(inc_a, cond, "full_outer")

    inc_ord = F.struct(
        F.col(f"__inc_{LSN_COL}").alias("lsn"),
        F.coalesce(F.col(f"__inc_{TS_COL}"), F.lit(0)).alias("ts_ms"),
        op_priority_expr(F.col(f"__inc_{OP_COL}")).alias("op_pri"),
    )
    cur_ord = F.struct(
        F.col(f"__cur_{LSN_COL}").alias("lsn"),
        F.coalesce(F.col(f"__cur_{TS_COL}"), F.lit(0)).alias("ts_ms"),
        op_priority_expr(F.col(f"__cur_{OP_COL}")).alias("op_pri"),
    )
    inc_wins = F.col(f"__cur_{LSN_COL}").isNull() | (inc_ord > cur_ord)
    take_inc = F.col(f"__inc_{LSN_COL}").isNotNull() & inc_wins

    out_cols = [
        F.when(take_inc, F.col(f"__inc_{c}")).otherwise(F.col(f"__cur_{c}")).alias(c)
        for c in [f.name for f in target_schema.fields]
    ]
    # Tombstones ('d' winners) are KEPT in storage: if the delete row were
    # dropped here, a stale lower-LSN redelivery in a later batch would
    # resurrect the key.  Consumers read through ``read_state`` which filters
    # op != 'd'; a compaction pass may GC tombstones older than the
    # redelivery horizon (the reference's maturity window analog).
    merged = joined.select(*out_cols)

    ok = table.overwrite_buckets(merged, buckets, commit_key=commit_key, schema=target_schema)
    return {"applied": ok, "buckets": sorted(buckets)}
