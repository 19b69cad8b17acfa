"""As-of (time-travel) join — SURVEY.md J5.

Reference semantics: "latest price with price_ts < t per asset"
(``parser/db.py:392-405``, consumed by ``swap_volume.py:71-118``).  Spark
has no ASOF JOIN, so it is composed from a union + one window pass:

    union(left-tagged, right-tagged)
      → Window.partitionBy(key).orderBy(ts, side)   [right rows sort first
        at equal ts only for <=; for strict < the left row sorts first]
      → last(value, ignorenulls) over rows unbounded-preceding..current
      → keep left rows

One shuffle + one sort per key — the same cost as a sort-merge join, with
no range explosion; skew on a hot key is bounded by that key's own rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row, attach the value_cols of the latest right row with
    right_ts < left_ts (strict) or <= (non-strict), matching on ``on``."""
    lcols = left.columns
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    # project the right side first (renaming ts/values away from any left
    # column names), then fill the remaining left columns with NULLs
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    for c in lcols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.select(*l.columns)
    u = l.unionByName(r)
    # strict '<': at equal ts the left row must sort BEFORE the right row so
    # last() cannot see it; '<=': right first.
    side_order = F.col("__is_right").asc() if strict else F.col("__is_right").desc()
    # deterministic among right rows sharing a timestamp: break ties on the
    # carried values themselves (last one in this total order wins)
    tie = [F.col(f"__v_{c}").asc_nulls_first() for c in value_cols]
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), side_order, *tie)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = u.select(
        *lcols,
        F.col("__is_right"),
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return out.where(F.col("__is_right") == 0).drop("__is_right")
