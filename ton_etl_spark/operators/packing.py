"""Sequence packing — the concat-and-chunk step of a pretraining data
pipeline: concatenate every document's tokens per corpus source (in a
deterministic order) into one virtual token stream, then chop the stream
into fixed-size training sequences ("packs").  A document that straddles a
pack boundary is split: the operator emits one row per (document, pack)
SEGMENT with the in-document token offsets, which is exactly the recipe a
loader needs to assemble training sequences without materializing the
token stream itself.

No reference analog (ton-etl stops at row-level marts); this is one of the
training-data operators the task brief adds as first-class.  Everything is
JVM-side column algebra — no UDF, no collect.

Scale shape (the part that matters at 100 TB): the naive plan is a window
``SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id)`` — ONE REDUCER
PER SOURCE, a guaranteed straggler when a corpus has few large sources.
Instead the running offset is computed as a two-level cumsum, all
declarative:

1. rows get a coarse ``seg = doc_id // seg_width`` (doc order is preserved
   across segment boundaries because seg is a prefix of the doc_id order);
2. the in-segment cumsum windows over (source, seg) — parallelism is
   n_sources x n_segments, bounded rows per partition;
3. per-segment totals (one tiny row per segment) window over source —
   the only per-source serial step sees n_segments rows, not n_docs;
4. the doc's global offset = segment-base + in-segment prefix.

The chunk explode is a narrow ``sequence(first_pack, last_pack)`` — a doc
spans at most ``ceil(n_tok / budget) + 1`` packs, so the fan-out is
bounded by payload size, never by corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ton_etl_spark.functions.text import words


def token_stream_offsets(
    docs: DataFrame,
    n_tok: Column,
    group_col: str = "source",
    order_col: str = "doc_id",
    seg_width: int = 4096,
) -> DataFrame:
    """Each doc's exclusive running-token offset within its group's stream
    (deterministic ``order_col`` order), via the two-level cumsum above.
    Adds columns ``__n_tok`` and ``__off``; drops zero/NULL-token docs
    (they occupy no stream positions).

    The drop happens AFTER the cumsum windows, not before (round-8, guide
    §4.2): a pre-window ``where`` gets alias-substituted through the
    ``__n_tok`` projection by filter pushdown, so the default word-count
    tokenizer regex ran twice per row (once in the pushed scan filter over
    every row, once in the projection).  Dropped rows cannot perturb the
    windows: non-positive/NULL counts are staged as NULL, which ``sum``
    and ``max`` skip — bit-identical offsets for the surviving rows."""
    from ton_etl_spark.operators.dedup import _widen_if_narrow

    # balance the scan before the (typically tokenizer-bearing) __n_tok
    # projection (guide §2.5): a one-row-group corpus file plans as ONE
    # task and the regex would run serially; no-op at cluster scale, and
    # applied below the projection so both window consumers still share
    # one canonical subtree (the ReuseExchange lock)
    docs = _widen_if_narrow(docs)
    d = docs.select("*", n_tok.cast("long").alias("__n_raw")).withColumn(
        "__n_tok", F.when(F.col("__n_raw") > 0, F.col("__n_raw"))
    ).drop("__n_raw")
    # floor, not cast (truncate-toward-zero): negative order values must
    # still map to monotone segment ids
    d = d.withColumn("__seg", F.floor(F.col(order_col) / F.lit(seg_width)).cast("long"))
    # NULL group/order rows can never match the inner seg_base join below
    # (NULL keys join nothing) — that drop has always been the operator's
    # contract.  Doing it EXPLICITLY before the window makes the two
    # consumers of this subtree (the join probe and the seg-totals
    # aggregate) canonically identical, so the scan + tokenizer + shuffle
    # execute ONCE via exchange reuse; without it, join constraint
    # inference adds IsNotNull(__seg) to the probe branch only and the
    # asymmetry defeats ReuseExchange (round-8, guide §2.4: one scan of
    # the corpus, not two).
    d = d.where(F.col(group_col).isNotNull() & F.col("__seg").isNotNull())
    # ROWS frame, not the default RANGE: RANGE is peer-inclusive, so two
    # rows sharing (group, order) would each absorb BOTH token counts and
    # claim overlapping stream positions (and diverge from the SQL oracle's
    # explicit ROWS BETWEEN frame)
    in_seg = (
        Window.partitionBy(group_col, "__seg")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn(
        "__pre", F.sum("__n_tok").over(in_seg) - F.col("__n_tok")
    )
    # the deferred drop (see docstring): sits ABOVE the window, so it is
    # not pushed into the scan and the tokenizer stays a single projection
    d = d.where(F.col("__n_tok").isNotNull())
    # segment totals from the WINDOWED frame, not a second scan of the
    # source: the inclusive prefix (__pre + __n_tok) of a segment's last
    # row IS the segment sum, and max over monotone prefixes selects it —
    # same exact integer value as sum(__n_tok), one less source scan and
    # the groupBy reuses the window's (group, seg) exchange (round-8
    # optimization, guide §2.4)
    seg_totals = d.groupBy(group_col, "__seg").agg(
        F.max(F.col("__pre") + F.col("__n_tok")).alias("__seg_tok")
    )
    seg_order = (
        Window.partitionBy(group_col)
        .orderBy("__seg")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg_base = seg_totals.withColumn(
        "__base", F.sum("__seg_tok").over(seg_order) - F.col("__seg_tok")
    ).select(group_col, "__seg", "__base")
    return (
        d.join(seg_base, on=[group_col, "__seg"], how="inner")
        .withColumn("__off", F.col("__base") + F.col("__pre"))
        .drop("__seg", "__pre", "__base")
    )


def pack_chunks(
    docs: DataFrame,
    budget: int,
    n_tok: Column | None = None,
    group_col: str = "source",
    order_col: str = "doc_id",
    id_cols: list[str] | None = None,
    seg_width: int = 4096,
) -> DataFrame:
    """Concat-and-chunk packing: (id_cols..., group_col, pack_id,
    seg_start, seg_len) — one row per (doc, pack) segment, where
    ``seg_start``/``seg_len`` are token offsets WITHIN the document and
    every pack holds exactly ``budget`` tokens (except each group's last).

    ``n_tok`` defaults to the whitespace/alnum word count of ``text`` —
    swap in a real tokenizer count column when one exists."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    if n_tok is None:
        n_tok = F.size(words(F.col("text")))
    if id_cols is None:
        id_cols = [order_col]
    d = token_stream_offsets(docs, n_tok, group_col, order_col, seg_width)
    # integer division: `/` is double math, which would round cumulative
    # offsets past 2^53 and mis-assign pack boundaries at extreme scale
    first = F.expr(f"__off div {int(budget)}")
    last = F.expr(f"(__off + __n_tok - 1) div {int(budget)}")
    p = F.col("pack_id")
    start = F.greatest(F.lit(0), p * budget - F.col("__off"))
    end = F.least(F.col("__n_tok"), (p + 1) * budget - F.col("__off"))
    return (
        d.select(
            *id_cols, group_col, "__off", "__n_tok",
            F.explode(F.sequence(first, last)).alias("pack_id"),
        )
        .select(
            *id_cols,
            group_col,
            "pack_id",
            start.cast("long").alias("seg_start"),
            (end - start).cast("long").alias("seg_len"),
        )
    )
