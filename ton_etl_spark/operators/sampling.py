"""Deterministic stratified sampling — the mixture-weighting step of a
training-data pipeline: each corpus source gets a target inclusion rate
(up-weight books, down-weight web, ...), and every document's keep/drop
decision is a PURE FUNCTION of (salt, doc id), not of partitioning, task
retries, or row order.

Why not ``DataFrame.sample``: its Bernoulli draw depends on row order
within partitions, so a retry, a repartition, or a second run over the
same data samples a DIFFERENT subset — useless for reproducible corpus
builds and for the exactly-once sink (a replayed batch must re-decide
identically).  Hash-threshold sampling re-derives the same subset from
the data itself, distributes with no extra shuffle (a per-row filter the
scan absorbs), and supports consistent sampling across tables (same id
=> same decision everywhere).

The uniform draw is the first 8 hex chars of ``md5(salt || id)`` compared
lexicographically against the rate's hex threshold — lowercase-hex order
equals numeric order, and md5 is available bit-identically in every
engine, so an external system (or the DuckDB oracle) reproduces the exact
subset.  All JVM built-ins; no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 1 << 32  # first 8 hex chars of the digest


def rate_threshold(rate: float) -> str:
    """Hex threshold such that P[substr(md5, 1, 8) < threshold] == rate
    (to 1/2^32 resolution).  rate=1.0 returns 'g', which is greater than
    every hex character, so nothing is dropped."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate >= 1.0:
        return "g"
    return format(int(rate * _HEX_SPACE), "08x")


def sample_hash(id_col: Column, salt: str = "") -> Column:
    """The document's uniform draw as an 8-hex-char string."""
    return F.substring(F.md5(F.concat(F.lit(salt), id_col.cast("string"))), 1, 8)


def sample_mixture(
    df: DataFrame,
    rates: dict[str, float],
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its group's rate, deterministically in
    (salt, id).  Groups absent from ``rates`` get ``default_rate``
    (default: dropped — an explicit mixture is a whitelist)."""
    thr = F.lit(rate_threshold(default_rate))
    for g, r in sorted(rates.items()):
        thr = F.when(F.col(group_col) == F.lit(g), F.lit(rate_threshold(r))).otherwise(thr)
    return df.where(sample_hash(F.col(id_col), salt) < thr)
