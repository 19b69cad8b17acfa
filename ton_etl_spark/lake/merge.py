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

    reduced = batch if pre_reduced else reduce_batch_lww(batch, key_cols, n_salts)

    # buckets touched by this batch — tiny (≤ n_buckets ints), safe to collect
    bexpr = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(snap.n_buckets)).cast("int")
    reduced = reduced.withColumn("__b", bexpr).persist()
    buckets = [r["__b"] for r in reduced.select("__b").distinct().collect()]

    current = table.read(buckets=buckets)

    # align schemas additively (mid-stream new columns appear on the batch side)
    from ton_etl_spark.lake.table import _merge_schemas, _conform

    reduced_payload = reduced.drop("__b")
    target_schema = _merge_schemas(snap.schema, reduced_payload.schema)
    cur = _conform(current, target_schema)
    inc = _conform(reduced_payload, target_schema)

    # One-row-per-key ⟗ one-row-per-key: full-outer join IS the merge.
    # Both sides are pre-partitioned by bucket and the join key set is
    # (__b, key): HashPartitioning(__b) satisfies the join's clustering
    # requirement (a subset of the join keys), so the join adds NO extra
    # exchange and its output stays bucket-partitioned — the bucketed
    # write then needs no repartition either.  One shuffle per side total.
    nb = snap.n_buckets
    cur_a = cur.select(*[F.col(c).alias(f"__cur_{c}") for c in cur.columns]).withColumn(
        "__b_cur",
        F.pmod(F.xxhash64(*[F.col(f"__cur_{c}") for c in key_cols]), F.lit(nb)).cast("int"),
    ).repartition(nb, "__b_cur")
    inc_a = inc.select(*[F.col(c).alias(f"__inc_{c}") for c in inc.columns]).withColumn(
        "__b_inc",
        F.pmod(F.xxhash64(*[F.col(f"__inc_{c}") for c in key_cols]), F.lit(nb)).cast("int"),
    ).repartition(nb, "__b_inc")
    cond = [cur_a["__b_cur"] == inc_a["__b_inc"]] + [
        cur_a[f"__cur_{k}"] == inc_a[f"__inc_{k}"] for k in key_cols
    ]
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

    from ton_etl_spark.lake.table import BUCKET_COL

    out_cols = [
        F.when(take_inc, F.col(f"__inc_{c}")).otherwise(F.col(f"__cur_{c}")).alias(c)
        for c in [f.name for f in target_schema.fields]
    ]
    # Tombstones ('d' winners) are KEPT in storage: if the delete row were
    # dropped here, a stale lower-LSN redelivery in a later batch would
    # resurrect the key.  Consumers read through ``read_state`` which filters
    # op != 'd'; a compaction pass may GC tombstones older than the
    # redelivery horizon (the reference's maturity window analog).
    # Carrying the bucket through lets the write skip its repartition: the
    # join output is physically still bucket-partitioned.
    merged = joined.select(
        *out_cols, F.coalesce(F.col("__b_cur"), F.col("__b_inc")).alias(BUCKET_COL)
    )

    ok = table.overwrite_buckets(merged, buckets, commit_key=commit_key, schema=target_schema)
    reduced.unpersist()
    return {"applied": ok, "buckets": sorted(buckets)}
