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
    """One row per key: the last-writer (max by order_by) row."""
    w = W.partitionBy(*keys).orderBy(*[c.desc() for c in order_by])
    cols = df.columns
    return (
        df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).select(*cols)
    )


def first_state(df: DataFrame, keys: list[str], order_by: list[Column]) -> DataFrame:
    """One row per key: the earliest row (reference: deployer = first tx in
    trace, ``nft_events.sql:23-24``)."""
    w = W.partitionBy(*keys).orderBy(*[c.asc() for c in order_by])
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
    transition detection via lag(), ``nft_events.sql:147,174``)."""
    w = W.partitionBy(*keys).orderBy(*order_by)
    prev = F.lag(F.col(watch_col), 1).over(w)
    return (
        df.withColumn(f"prev_{watch_col}", prev)
        .where(
            F.col(f"prev_{watch_col}").isNotNull()
            & (F.col(watch_col) != F.col(f"prev_{watch_col}"))
        )
    )
