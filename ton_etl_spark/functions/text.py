"""Text-analysis functions for training-data pipelines over `documents`.

All JVM-side built-ins (regexp/hash functions) — no Python in the hot
path — so they stay inside WholeStageCodegen and scale linearly. These fill
the role the reference's metadata/content parsers play
(``parser/parsers/accounts/nfts_parser.py``, ``datalake/README.md:135-167``)
for a tokenized-text lake.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

WORD_RE = "[a-z0-9]+"

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def words(text: Column) -> Column:
    """Lowercased word list (alnum runs)."""
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), 0)


# Each text-based function below delegates to an ``*_of_words`` twin taking
# an ALREADY-TOKENIZED words array.  Composing several of them over the
# same text clones the tokenizer regex into every reference — and the
# references inside higher-order functions (aggregate/filter/transform)
# sit outside codegen subexpression elimination, so the clones really
# re-run per row (measured in the round-8 plan audit; same finding as the
# minhash shingle staging).  Query paths stage ``words(text)`` as one
# projected column and call the ``*_of_words`` forms — regex once per row.


def word_count_of_words(ws: Column) -> Column:
    return F.size(ws).cast("long")


def word_count(text: Column) -> Column:
    return word_count_of_words(words(text))


def stopword_ratio_of_words(ws: Column) -> Column:
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop, w)))
    return F.when(F.size(ws) > 0, n_stop.cast("double") / F.size(ws)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    return stopword_ratio_of_words(words(text))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    return F.when(F.length(text) > 0, n_punct.cast("double") / F.length(text)).otherwise(
        F.lit(0.0)
    )


def avg_word_len_of_words(ws: Column) -> Column:
    total = F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return F.when(F.size(ws) > 0, total.cast("double") / F.size(ws)).otherwise(F.lit(0.0))


def avg_word_len(text: Column) -> Column:
    return avg_word_len_of_words(words(text))


def quality_score_of_words(ws: Column, text: Column) -> Column:
    """``quality_score`` over a staged words array; ``text`` is still
    needed for the punctuation ratio and the NULL guard (both look at the
    raw text, not the token list)."""
    wc = word_count_of_words(ws)
    len_ok = F.least(wc.cast("double") / F.lit(50.0), F.lit(1.0))
    awl = avg_word_len_of_words(ws)
    awl_ok = F.when((awl >= 3.0) & (awl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_ok = F.least(stopword_ratio_of_words(ws) * 5.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    score = (len_ok * 0.4 + awl_ok * 0.2 + stop_ok * 0.2 + punct_ok * 0.2).cast("double")
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(score)


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: long-enough, sane word length, some
    stopwords (natural language), not punctuation soup.  NULL text scores
    NULL — without the guard, ``least()`` (which skips NULL arguments)
    would hand a NULL document full length credit and score it 0.7, above
    most real short documents."""
    return quality_score_of_words(words(text), text)


LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "is"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "es": ["el", "la", "que", "de", "es"],
    "fr": ["le", "la", "et", "les", "des"],
}


def lang_scores(ws: Column) -> list[tuple[str, Column]]:
    """Ordered (lang, stopword-hit-count) columns, one per profile."""
    out = []
    for lang, stops in LANG_PROFILES.items():
        arr = F.array(*[F.lit(s) for s in stops])
        out.append((lang, F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))))
    return out


def lang_id_of_scores(scores: list[tuple[str, Column]]) -> Column:
    """Argmax fold over per-profile scores; ties broken by profile order.
    The when-chain clones each score expression several times, so callers
    on a hot path should stage the scores as real columns first (the
    clones are then cheap column refs, not re-scans of the words array)."""
    best_lang = F.lit("unknown")
    best_score = F.lit(0)
    for lang, score in scores:
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def lang_id(text: Column) -> Column:
    """Tiny n-gram-free language heuristic: score stopword hit-rate for a few
    language profiles; ties broken by profile order.  Deterministic and
    cheap; a real deployment swaps in fastText via mapInPandas."""
    return lang_id_of_scores(lang_scores(words(text)))


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram in
    the same document — the Gopher-style intra-document repetition signal
    (template/boilerplate/SEO-spam pages score high; natural prose scores
    near 0).  Computed as 1 - distinct/total over the NON-distinct n-gram
    list.  Documents with fewer than n words have no n-grams and score
    0.0; NULL text scores NULL (same contract as quality_score).  All
    array ops, JVM-side, no shuffle."""
    return repetition_ratio_of_words(words(text), text, n)


def repetition_ratio_of_words(ws: Column, text: Column, n: int = 3) -> Column:
    total = F.greatest(F.size(ws) - (n - 1), F.lit(0))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(total, F.lit(1))),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    ratio = F.when(
        total > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
    ).otherwise(F.lit(0.0))
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(ratio)


def fingerprint_of_words(ws: Column) -> Column:
    return F.md5(F.array_join(ws, " "))


def fingerprint(text: Column) -> Column:
    """Document content fingerprint (md5 of normalized words) — the exact-dup
    key (reference analog: sha256 content-hash filenames,
    ``datalake/main.py:162``)."""
    return fingerprint_of_words(words(text))
