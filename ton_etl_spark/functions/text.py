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


def word_count(text: Column) -> Column:
    return F.size(words(text)).cast("long")


def stopword_ratio(text: Column) -> Column:
    ws = words(text)
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop, w)))
    return F.when(F.size(ws) > 0, n_stop.cast("double") / F.size(ws)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n_punct = F.length(F.regexp_replace(text, "[^.,;:!?]", ""))
    return F.when(F.length(text) > 0, n_punct.cast("double") / F.length(text)).otherwise(
        F.lit(0.0)
    )


def avg_word_len(text: Column) -> Column:
    ws = words(text)
    total = F.aggregate(ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w))
    return F.when(F.size(ws) > 0, total.cast("double") / F.size(ws)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: long-enough, sane word length, some
    stopwords (natural language), not punctuation soup.  NULL text scores
    NULL — without the guard, ``least()`` (which skips NULL arguments)
    would hand a NULL document full length credit and score it 0.7, above
    most real short documents."""
    wc = word_count(text)
    len_ok = F.least(wc.cast("double") / F.lit(50.0), F.lit(1.0))
    awl = avg_word_len(text)
    awl_ok = F.when((awl >= 3.0) & (awl <= 8.0), F.lit(1.0)).otherwise(F.lit(0.5))
    stop_ok = F.least(stopword_ratio(text) * 5.0, F.lit(1.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5.0, F.lit(1.0))
    score = (len_ok * 0.4 + awl_ok * 0.2 + stop_ok * 0.2 + punct_ok * 0.2).cast("double")
    return F.when(text.isNull(), F.lit(None).cast("double")).otherwise(score)


def lang_id(text: Column) -> Column:
    """Tiny n-gram-free language heuristic: score stopword hit-rate for a few
    language profiles; ties broken by profile order.  Deterministic and
    cheap; a real deployment swaps in fastText via mapInPandas."""
    profiles = {
        "en": ["the", "and", "of", "to", "is"],
        "de": ["der", "die", "und", "ist", "nicht"],
        "es": ["el", "la", "que", "de", "es"],
        "fr": ["le", "la", "et", "les", "des"],
    }
    ws = words(text)
    best_lang = F.lit("unknown")
    best_score = F.lit(0)
    for lang, stops in profiles.items():
        arr = F.array(*[F.lit(s) for s in stops])
        score = F.size(F.filter(ws, lambda w: F.array_contains(arr, w)))
        is_better = score > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, score).otherwise(best_score)
    return best_lang


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """Fraction of word n-grams that are repeats of an earlier n-gram in
    the same document — the Gopher-style intra-document repetition signal
    (template/boilerplate/SEO-spam pages score high; natural prose scores
    near 0).  Computed as 1 - distinct/total over the NON-distinct n-gram
    list.  Documents with fewer than n words have no n-grams and score
    0.0; NULL text scores NULL (same contract as quality_score).  All
    array ops, JVM-side, no shuffle."""
    ws = words(text)
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


def fingerprint(text: Column) -> Column:
    """Document content fingerprint (md5 of normalized words) — the exact-dup
    key (reference analog: sha256 content-hash filenames,
    ``datalake/main.py:162``)."""
    return F.md5(F.array_join(words(text), " "))
