"""Distributed BPE tokenizer training — the vocabulary-induction step of a
tokens pipeline (Sennrich et al. 2016): iteratively merge the most
frequent adjacent symbol pair across the corpus until ``n_merges`` merges
are learned.

Spark-first decomposition (what makes this tractable at corpus scale):

- All counting runs over the WORD-FREQUENCY table, not the corpus: BPE
  statistics are invariant to where a word occurs, so one ``groupBy(word)``
  collapses billions of tokens to the distinct-word table (|V| ≪ corpus)
  and every later pass is over |V| rows weighted by count.
- Pair counting is a narrow explode + weighted hash-agg over that table.
- The per-round driver traffic is ONE row (the argmax pair) — the merge
  itself is applied distributively as a JVM ``aggregate`` fold over each
  word's symbol array (left-to-right, consuming merged symbols, exactly
  the reference semantics), never by collecting the vocabulary.
- Lineage is cut with ``localCheckpoint`` every few merges — an iterative
  self-referential plan otherwise grows exponentially in Catalyst.

Encoding new text with the learned merges is loop-until-fixpoint per word
— genuinely not expressible as a fixed-depth column expression — so
``bpe_encode`` is an Arrow-batched pandas UDF with the merge ranks
broadcast, the sanctioned UDF shape (vectorized batches, tiny broadcast
state), with a worker-lifetime word memo since Zipf makes most tokens
repeats.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ton_etl_spark.functions.text import words

END = "</w>"  # end-of-word marker, per the reference algorithm


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, count) over the corpus — the only corpus-wide pass."""
    return (
        docs.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def _initial_symbols(word: Column) -> Column:
    """chars + end-of-word marker: 'low' -> [l, o, w, </w>]."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _merge_fold(symbols: Column, a: Column, b: Column) -> Column:
    """One BPE merge applied left-to-right over a symbol array: every
    adjacent (a, b) becomes a+b, and a merged symbol is consumed (cannot
    chain into the next pair), matching the reference implementation.
    Pure JVM ``aggregate`` fold — no UDF."""
    merged = F.concat(a, b)

    def step(acc, s):
        # a freshly-merged trailing symbol can never equal `a` again
        # (a+b != a since b is non-empty), so consumed symbols cannot chain
        hit = (F.size(acc) > 0) & (F.element_at(acc, -1) == a) & (s == b)
        return F.when(
            hit, F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged))
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(symbols, F.array().cast("array<string>"), step)


def pair_counts(vocab: DataFrame, symbols_col: str = "symbols") -> DataFrame:
    """(a, b, n) — corpus-weighted counts of adjacent symbol pairs.
    Overlapping occurrences within one word count once per position, as in
    the reference counter."""
    s = F.col(symbols_col)
    pairs = F.expr(
        f"transform(slice({symbols_col}, 1, size({symbols_col}) - 1), "
        f"(x, i) -> struct(x as a, element_at({symbols_col}, i + 2) as b))"
    )
    return (
        vocab.where(F.size(s) >= 2)
        .select(F.col("count"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("count").alias("n"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    checkpoint_every: int = 8,
    checkpoint_dir: str | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    order.  Ties on count break by (a, b) lexicographically — deterministic
    across partitionings and runs (the reference breaks ties by dict order,
    which is insertion-dependent; a distributed trainer needs a total
    order).

    ``checkpoint_dir`` switches the periodic lineage cuts from
    ``localCheckpoint`` (executor-resident — an executor loss kills a
    long training run) to reliable ``checkpoint`` into that directory,
    the same fault-tolerance trade as ``connected_components``."""
    if checkpoint_dir is not None:
        docs.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)

    def _cut(df: DataFrame) -> DataFrame:
        return df.checkpoint() if checkpoint_dir is not None else df.localCheckpoint()

    vocab = _cut(word_counts(docs, text_col).select(
        _initial_symbols(F.col("word")).alias("symbols"), F.col("count")
    ))
    merges: list[tuple[str, str]] = []
    for i in range(n_merges):
        best = (
            pair_counts(vocab)
            .orderBy(F.desc("n"), F.asc("a"), F.asc("b"))
            .head(1)
        )
        if not best:
            break  # vocabulary fully merged
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        vocab = vocab.select(
            _merge_fold(F.col("symbols"), F.lit(a), F.lit(b)).alias("symbols"),
            F.col("count"),
        )
        if (i + 1) % checkpoint_every == 0:
            vocab = _cut(vocab)
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy encoder: repeatedly apply the LOWEST-RANK merge
    present in the word until none applies."""
    syms = list(word) + [END]
    while len(syms) >= 2:
        pairs = [(syms[j], syms[j + 1]) for j in range(len(syms) - 1)]
        ranked = [(ranks[p], j) for j, p in enumerate(pairs) if p in ranks]
        if not ranked:
            break
        _, j = min(ranked)
        syms[j : j + 2] = [syms[j] + syms[j + 1]]
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col``: the BPE symbol sequence of each document's
    normalized words under ``merges``.  Arrow-batched pandas UDF over the
    single text column; the merge table rides the closure (a few thousand
    entries — broadcast-sized).  A per-executor word memo exploits Zipf:
    most words in a batch are repeats."""
    import re

    from ton_etl_spark.functions.text import WORD_RE

    ranks = {pair: i for i, pair in enumerate(merges)}
    word_re = re.compile(WORD_RE)
    # captured by the UDF closure: each Python worker deserializes the
    # closure ONCE and reuses it across Arrow batches, so this dict lives
    # for the worker's lifetime — frequent words (Zipf) encode once per
    # worker, not once per batch.  Bounded: cleared at the cap rather than
    # LRU-evicted (eviction bookkeeping costs more than re-encoding the
    # rare tail that would overflow it).
    memo: dict[str, list[str]] = {}
    _MEMO_CAP = 1 << 20

    @F.pandas_udf("array<string>")
    def _encode(texts: pd.Series) -> pd.Series:
        def enc(text):
            if text is None:
                return None
            out: list[str] = []
            for w in word_re.findall(text.lower()):
                got = memo.get(w)
                if got is None:
                    if len(memo) >= _MEMO_CAP:
                        memo.clear()
                    got = memo[w] = _encode_word(w, ranks)
                out.extend(got)
            return out

        return texts.map(enc)

    return docs.withColumn(out_col, _encode(F.col(text_col)))
