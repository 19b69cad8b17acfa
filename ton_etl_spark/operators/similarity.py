"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_bruteforce``: exact top-k vs a query vector — one narrow
  scan computing the dot product with JVM higher-order functions
  (``F.zip_with``/``F.aggregate``), then a global top-k (Spark's
  ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — a per-partition
  heap + driver merge of k×partitions rows, NOT a full sort/shuffle).
- ``lsh_ann_topk``: the scale path — random-hyperplane buckets from a
  deterministic seed; the query probes only its own bucket (+ optional
  multi-probe neighbors), so the scan is ~1/2^planes of the corpus.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _cosine(a: Column, b: Column) -> Column:
    return (_dot(a, b) / (_norm(a) * _norm(b))).cast("double")


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG object: pure hash →
    gaussian-ish via sum of uniforms)."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            # xorshift-style integer hash, mapped to [-1, 1)
            h = (seed * 1000003 + p * 8191 + d * 131) & 0xFFFFFFFF
            h ^= h >> 13
            h = (h * 0x5BD1E995) & 0xFFFFFFFF
            h ^= h >> 15
            row.append((h / 2**31) - 1.0)
        planes.append(row)
    return planes


def _hyperplane_bucket(vec: Column, n_planes: int, seed: int, dim: int = 64) -> Column:
    """Sign-sketch bucket id: bit p = (vec · plane_p) >= 0."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        arr = F.array(*[F.lit(float(x)) for x in plane])
        bit = (_dot(vec, arr) >= 0).cast("long")
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def cosine_topk_bruteforce(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a constant query vector."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.select(
        F.col(id_col),
        F.round(_cosine(F.col(vec_col), q), 6).alias("cosine"),
    )
    # TakeOrderedAndProject: no full shuffle. Tie-break on id for determinism.
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def lsh_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 4,
    seed: int = 42,
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's hyperplane bucket plus all
    buckets within ``multiprobe`` bit-flips, exact cosine within.

    Recall/scan-fraction tradeoff is data-dependent: tightly-clustered
    embeddings tolerate more planes; weakly-clustered (near-random) vectors
    need few planes + multiprobe (hyperplane agreement probability is
    (1 - θ/π)^planes)."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qb = 0
    for p, plane in enumerate(planes):
        dot = sum(a * b for a, b in zip(query_vec, plane))
        qb |= (1 if dot >= 0 else 0) << p
    probe = {qb}
    frontier = {qb}
    for _ in range(multiprobe):
        frontier = {b ^ (1 << p) for b in frontier for p in range(n_planes)}
        probe |= frontier
    bucketed = emb.withColumn(
        "__bucket", _hyperplane_bucket(F.col(vec_col), n_planes, seed, dim)
    ).where(F.col("__bucket").isin(list(probe)))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = bucketed.select(
        F.col(id_col), F.round(_cosine(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)
