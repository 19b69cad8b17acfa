"""PII detection and redaction — a training-data curation stage.

A corpus pipeline scrubs personally identifiable text spans before
training (emails, phone numbers, IP addresses, card-like digit runs).
There is no reference analog (the reference moves structured chain data);
this sits beside the quality/language filters in ``functions/text.py`` as
part of the LLM-pipeline layer.

Spark-first: detection and replacement are ``regexp_count`` /
``regexp_replace`` Column expressions — JVM regex inside whole-stage
codegen, no Python in the hot path, trivially parallel (a pure ``select``
over the scan: no shuffle at any scale).

The built-in patterns deliberately stay in the regex subset Java
(Spark) and RE2 (DuckDB/Go) evaluate identically — char classes, bounded
repetition, ``\\b``, non-capturing groups; no backrefs, no lookaround —
so the DuckDB oracle reproduces redaction byte-for-byte.  They are
pragmatic screeners, not validators (no Luhn check, no RFC 5322): a
corpus scrub prefers false positives over leaked PII.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# insertion order = application order: email before phone/ccn so digit
# runs inside an address aren't half-eaten first; ipv4 before ccn so a
# dotted quad is never read as a card fragment
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ccn": r"\b\d{13,16}\b",
    "phone": r"\b\d{2,3}[-. ]\d{3}[-. ]\d{3}[-. ]\d{4}\b",
}


def pii_counts(text: Column, kinds: tuple[str, ...] | None = None) -> dict[str, Column]:
    """Per-kind match counts on the text AS GIVEN (kinds are counted
    independently — overlapping spans across kinds count once per kind)."""
    kinds = tuple(kinds or PII_PATTERNS)
    return {k: F.regexp_count(text, F.lit(PII_PATTERNS[k])) for k in kinds}


def redact_text(text: Column, kinds: tuple[str, ...] | None = None,
                token_fmt: str = "<{kind}>") -> Column:
    """Replace every match of each kind with its token, applied in
    ``PII_PATTERNS`` order (see the ordering note above)."""
    kinds = tuple(kinds or PII_PATTERNS)
    out = text
    for k in kinds:
        out = F.regexp_replace(out, PII_PATTERNS[k], token_fmt.format(kind=k))
    return out


def redact_pii(
    df: DataFrame,
    text_col: str,
    kinds: tuple[str, ...] | None = None,
    out_col: str | None = None,
    token_fmt: str = "<{kind}>",
    counts: bool = True,
) -> DataFrame:
    """Redact PII spans in ``text_col``; optionally add ``n_<kind>``
    count columns (counted on the ORIGINAL text, so the counts are
    independent of application order).  Pure projection — composes with
    any scan without adding an exchange."""
    kinds = tuple(kinds or PII_PATTERNS)
    unknown = [k for k in kinds if k not in PII_PATTERNS]
    if unknown:
        raise KeyError(f"unknown PII kinds {unknown}; known: {list(PII_PATTERNS)}")
    text = F.col(text_col)
    out = df
    if counts:
        for k, c in pii_counts(text, kinds).items():
            out = out.withColumn(f"n_{k}", c)
    return out.withColumn(out_col or text_col, redact_text(text, kinds, token_fmt))
