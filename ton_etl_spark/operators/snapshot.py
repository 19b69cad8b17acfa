"""Latest-state / first-state / transition operators — SURVEY.md A1, W1-W3, T1/T2.

Reference: balances snapshot ``row_number() over (partition by address, asset
order by lt desc) = 1`` (``datalake/athena_ddl.sql:659-669``), first-state
rank (``datalake/nft_events.sql:54,83,111``), lag-based transition detection
(``nft_events.sql:147,174,190``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def lww_snapshot(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """One row per key: the last-writer (max by order_by) row.

    Implemented as ``max_by`` over the order struct rather than a
    ``row_number`` window (round-8 optimization, guide §2.3): the hash
    aggregate partially reduces map-side — a key's millions of events
    reach the exchange as one candidate per input partition — and nothing
    is sorted, where the window shuffled and sorted every row.  Winner is
    identical whenever ``order_by`` is a total order within each key.

    Callers must make ``order_by`` a TOTAL order within each key (include
    a unique tiebreaker such as the lsn/event id) — on exact ties the
    winner is shuffle-order-dependent (true of the row_number form too).
    Rows whose order key is NULL lose against any non-NULL row (the
    row_number form's ``desc``-nulls-last gave them the same fate)."""
    ord_expr = F.struct(*[c.alias(f"__o{i}") for i, c in enumerate(order_by)])
    payload = F.struct(*[F.col(c) for c in df.columns])
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.max_by(payload, ord_expr).alias("__win"))
        .select("__win.*")
    )


def first_state(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """One row per key: the earliest row (reference: deployer = first tx in
    trace, ``nft_events.sql:23-24``).

    NULL order keys sort LAST (a row with no timestamp is never "earliest"
    — also DuckDB/Postgres ASC default, so the operator and the SQL oracles
    agree on nullable keys; Spark's bare asc() would put NULLs first).
    Same total-order requirement as :func:`lww_snapshot`."""
    w = W.partitionBy(*keys).orderBy(*[c.asc_nulls_last() for c in order_by])
    cols = df.columns
    return (
        df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).select(*cols)
    )


def lag_transitions(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column],
    watch_col: str,
) -> DataFrame:
    """Rows where ``watch_col`` changed vs the previous row per key, with the
    previous value attached as ``prev_<watch_col>`` (reference: owner/content
    transition detection via lag(), ``nft_events.sql:147,174``).

    Null-safe: transitions to or from NULL count as changes (owner cleared
    on burn is a real transition).  First-row detection uses a separate
    has-predecessor marker, so a NULL previous VALUE is not mistaken for
    "no previous row"."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    prev = F.lag(F.col(watch_col), 1).over(w)
    has_prev = F.lag(F.lit(1), 1).over(w).isNotNull()
    return (
        df.withColumn(f"prev_{watch_col}", prev)
        .withColumn("__has_prev", has_prev)
        .where(
            F.col("__has_prev")
            & ~F.col(watch_col).eqNullSafe(F.col(f"prev_{watch_col}"))
        )
        .drop("__has_prev")
    )
