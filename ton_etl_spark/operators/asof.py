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
    right_ts < left_ts (strict) or <= (non-strict), matching on ``on``.

    The carried values travel as ONE struct per right row, so the match is
    ATOMIC: the left row receives the latest right ROW's values including
    its NULL fields — a per-column ``last(ignorenulls)`` would instead mix
    fields from different right rows (chimera matches) and resurrect stale
    values whenever the latest value is legitimately NULL.  Right rows with
    a NULL timestamp are excluded up front: a NULL ts can never satisfy a
    range predicate, but under NULLS-FIRST ordering it would otherwise
    "precede" every left row and match them all."""
    lcols = left.columns
    # project the right side first (renaming ts/values away from any left
    # column names), then fill the remaining left columns with NULLs
    r = right.where(F.col(right_ts).isNotNull()).select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__ts"),
        F.lit(1).alias("__is_right"),
        F.struct(*[F.col(c).alias(c) for c in value_cols]).alias("__v"),
    )
    vtype = r.schema["__v"].dataType
    l = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(0).alias("__is_right"),
        F.lit(None).cast(vtype).alias("__v"),
    )
    for c in lcols:
        if c not in on:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    r = r.select(*l.columns)
    u = l.unionByName(r)
    # strict '<': at equal ts the left row must sort BEFORE the right row so
    # last() cannot see it; '<=': right first.
    side_order = F.col("__is_right").asc() if strict else F.col("__is_right").desc()
    # deterministic among right rows sharing a timestamp: lexicographic max
    # of the value struct wins (matches the oracle's ORDER BY v1 DESC, v2
    # DESC ... LIMIT 1 convention)
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), side_order, F.col("__v").asc_nulls_first())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    out = u.select(
        *lcols,
        F.col("__is_right"),
        F.last("__v", ignorenulls=True).over(w).alias("__vwin"),
    )
    return out.where(F.col("__is_right") == 0).select(
        *lcols, *[F.col("__vwin").getField(c).alias(c) for c in value_cols]
    )
