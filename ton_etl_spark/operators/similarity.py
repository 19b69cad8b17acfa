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


def ivf_centroids(
    emb: DataFrame,
    n_cells: int,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_iters: int = 2,
) -> list[list[float]]:
    """Deterministic distributed k-means for IVF cells.

    Init = hash-picked corpus vectors (no RNG object); each iteration is one
    distributed pass: assign every vector to its nearest centroid (argmin
    over the broadcast centroid literals, JVM-side) then recompute means via
    posexplode + groupBy.  Centroids are collected to the driver — that IS
    the IVF contract: the cell table is small index metadata (n_cells × dim
    floats), everything per-vector stays distributed."""
    taken = (
        emb.select(F.col(id_col), F.col(vec_col))
        .withColumn("__r", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__r")
        .limit(n_cells)
        .collect()
    )
    cents = [[float(x) for x in r[vec_col]] for r in taken]
    for _ in range(n_iters):
        assigned = emb.select(
            F.col(vec_col), _nearest_cell(F.col(vec_col), cents).alias("cell")
        )
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("i", "v"))
            .groupBy("cell", "i")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("ms"))
            .collect()
        )
        new = list(cents)
        for r in means:
            new[r["cell"]] = [float(s["m"]) for s in r["ms"]]
        cents = new
    return cents


def _nearest_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """argmin_{c} squared-L2(vec, centroid_c) as a JVM expression: array_min
    over (distance, cell) structs of the broadcast centroid literals."""
    pairs = []
    for c, cent in enumerate(centroids):
        arr = F.array(*[F.lit(float(x)) for x in cent])
        d2 = F.aggregate(
            F.zip_with(vec, arr, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        pairs.append(F.struct(d2.alias("d"), F.lit(c).alias("cell")))
    return F.array_min(F.array(*pairs))["cell"]


def ivf_ann_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into ``n_cells``
    k-means cells, probe only the ``nprobe`` cells whose centroids are
    nearest the query, exact cosine within.

    100 TB shape: the cell assignment is a write-once index column — a real
    deployment partitions the table BY cell so a probe is partition pruning,
    scanning ~nprobe/n_cells of the corpus; the centroid math rides along as
    driver-side metadata exactly like Iceberg partition stats.  Pass a
    precomputed ``centroids`` list to reuse an index across queries."""
    dim = len(query_vec)
    if centroids is None:
        centroids = ivf_centroids(emb, n_cells, dim, id_col, vec_col, seed)
    qd = [
        (sum((a - b) * (a - b) for a, b in zip(query_vec, cent)), c)
        for c, cent in enumerate(centroids)
    ]
    probe = [c for _, c in sorted(qd)[:nprobe]]
    scanned = emb.withColumn(
        "__cell", _nearest_cell(F.col(vec_col), centroids)
    ).where(F.col("__cell").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = scanned.select(
        F.col(id_col), F.round(_cosine(F.col(vec_col), q), 6).alias("cosine")
    )
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
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: probe the query's hyperplane bucket plus all
    buckets within ``multiprobe`` bit-flips, in each of ``n_tables``
    independent hash tables (OR across tables), exact cosine within.

    Per-plane agreement probability for a neighbor at angle θ is 1 - θ/π,
    so one table's recall is (that)^planes — weak for weakly-clustered
    corpora; L independent tables lift a per-table hit rate p to
    1-(1-p)^L while the scan stays ~L × bucket-fraction of the corpus.
    The whole probe is ONE filtered scan (no explode): a row survives if
    ANY table's sign-sketch lands in that table's probe set."""
    dim = len(query_vec)
    keep = None
    for t in range(n_tables):
        tseed = seed + 7919 * t
        planes = _hyperplanes(dim, n_planes, tseed)
        qb = 0
        for p, plane in enumerate(planes):
            dot = sum(a * b for a, b in zip(query_vec, plane))
            qb |= (1 if dot >= 0 else 0) << p
        probe = {qb}
        frontier = {qb}
        for _ in range(multiprobe):
            frontier = {b ^ (1 << p) for b in frontier for p in range(n_planes)}
            probe |= frontier
        hit = _hyperplane_bucket(F.col(vec_col), n_planes, tseed, dim).isin(
            list(probe)
        )
        keep = hit if keep is None else (keep | hit)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = emb.where(keep).select(
        F.col(id_col), F.round(_cosine(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)
