"""Similarity search over an embedding column (array<float>).

- ``cosine_topk_bruteforce``: exact top-k vs a query vector — one narrow
  scan computing the dot product with JVM higher-order functions
  (``F.zip_with``/``F.aggregate``), then a global top-k (Spark's
  ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — a per-partition
  heap + driver merge of k×partitions rows, NOT a full sort/shuffle).
- ``lsh_ann_topk``: the scale path — random-hyperplane buckets from a
  deterministic seed; the query probes only its own bucket (+ optional
  multi-probe neighbors), so the scan is ~1/2^planes of the corpus.

Index materialization (the 100 TB deployment): ``with_ivf_cells`` /
``with_lsh_buckets`` stamp the cell/bucket assignment as a real column
ONCE at write time, and ``write_ivf_index`` / ``write_lsh_index`` persist
the table partitioned by it, so a probe is parquet partition pruning —
the query-time scan touches only ~nprobe/n_cells (IVF) or the probed
buckets' (LSH) files, never the whole corpus.  ``ivf_ann_topk`` /
``lsh_ann_topk`` accept the pre-indexed table and skip the sketch
recompute entirely (reference analog: partition-pruned Athena scans,
athena_ddl.sql:30-31).
"""

from __future__ import annotations

import json
import math
import os

# module-level: pandas_udf type hints (pd.Series) are strings under
# `from __future__ import annotations` and resolve in MODULE globals —
# a function-local import leaves them unresolvable (UNSUPPORTED_SIGNATURE)
import pandas as pd  # noqa: F401
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
    """Exact cosine top-k against a constant query vector.

    Round-8 optimization (guide §4.2): scoring runs in a vectorized
    mapInPandas kernel instead of interpreted higher-order folds,
    reproducing the JVM expression bit-for-bit: the dot accumulates
    float64(v) * q_d sequentially over dimensions (zip_with promoted the
    float element to double), while the corpus norm squares the RAW
    float32 element first (the un-cast ``_norm`` multiplied in float) and
    accumulates the widened product; the query norm is a pure-double fold.
    Rows whose vector is NULL or of a different length score NULL cosine
    (the old zip_with null-padding), NaNs propagate.  The final
    round/order/limit stays JVM-side, so the plan remains
    TakeOrderedAndProject — no full sort, no shuffle."""
    import math

    from pyspark.sql.types import DoubleType, StructField, StructType

    q = [float(x) for x in query_vec]
    dim = len(q)
    nq = 0.0
    for x in q:  # sequential double fold, exactly _norm over the literal
        nq += x * x
    nq = math.sqrt(nq)
    # deliberately NOT _widen_if_narrow'd: the scoring kernel is a single
    # cheap pass, and the balance exchange costs more than it saves
    # (A/B at 20k vectors: 0.27 s unwidened vs 0.43 s widened)
    src = emb.select(F.col(id_col), F.col(vec_col))
    out_schema = StructType(
        [
            StructField(id_col, src.schema[id_col].dataType),
            StructField("cosine", DoubleType()),
        ]
    )

    def kernel(batches):
        import numpy as np
        import pandas as pd

        qa = np.array(q, dtype=np.float64)
        for pdf in batches:
            cells = pdf[vec_col].to_numpy()
            ok = np.array(
                [v is not None and len(v) == dim for v in cells], dtype=bool
            )
            out = np.full(len(cells), np.nan)
            if ok.any():
                v32 = np.stack(
                    [np.asarray(c, dtype=np.float32) for c, m in zip(cells, ok) if m]
                )
                dot = np.zeros(len(v32))
                na = np.zeros(len(v32))
                for d in range(dim):
                    col64 = v32[:, d].astype(np.float64)
                    dot += col64 * qa[d]
                    # float32 multiply THEN widen — the un-cast JVM fold
                    na += (v32[:, d] * v32[:, d]).astype(np.float64)
                with np.errstate(divide="ignore", invalid="ignore"):
                    out[ok] = dot / (np.sqrt(na) * nq)
            cos = pd.Series(out)
            cos[~ok] = None
            yield pd.DataFrame({id_col: pdf[id_col], "cosine": cos})

    scored = src.mapInPandas(kernel, out_schema).select(
        F.col(id_col), F.round(F.col("cosine"), 6).alias("cosine")
    )
    # TakeOrderedAndProject: no full shuffle. Tie-break on id for determinism.
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def _init_pick(
    emb: DataFrame, n_cells: int, id_col: str, vec_col: str, seed: int
) -> DataFrame:
    """k-means init: the ``n_cells`` corpus vectors with the smallest
    deterministic hash — an ``orderBy().limit()`` that Spark plans as
    TakeOrderedAndProject (per-partition top-N + driver merge of n_cells
    rows), NEVER a full sort (plan-locked in tests/test_plans.py)."""
    return (
        emb.select(F.col(id_col), F.col(vec_col))
        .withColumn("__r", F.xxhash64(F.col(id_col), F.lit(seed)))
        .orderBy("__r")
        .limit(n_cells)
    )


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
    taken = _init_pick(emb, n_cells, id_col, vec_col, seed).collect()
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


def fixed_centroids(
    n_cells: int, dim: int, seed: int = 42, scale: float = 1.0
) -> list[list[float]]:
    """Data-independent pseudo-random centroids in [-scale, scale) — same
    integer hash as ``_hyperplanes`` with a cell-axis offset.  A valid (if
    unlearned) coarse quantizer: because they are pure literals, an IVF
    probe over them is SQL-expressible and therefore oracle-checkable; use
    ``ivf_centroids`` when you want a learned index instead.  ``scale``
    should roughly match the data's per-component spread — centroids with
    much larger norms than the data degenerate to a single Voronoi cell."""
    return [
        [x * scale for x in row]
        for row in _hyperplanes(dim, n_cells, seed ^ 0x9E3779B9)
    ]


def with_ivf_cells(
    emb: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """Stamp the nearest-centroid cell id as a real column — the write-once
    IVF index step.  Persist the result partitioned by ``cell_col``
    (``write_ivf_index``) and every subsequent probe is partition pruning
    instead of a full-corpus argmin recompute."""
    return emb.withColumn(cell_col, _nearest_cell(F.col(vec_col), centroids))


def ivf_probe_cells(
    query_vec: list[float], centroids: list[list[float]], nprobe: int
) -> list[int]:
    """The ``nprobe`` cell ids whose centroids are nearest the query
    (driver-side arithmetic over index metadata — ties break on cell id,
    matching ``_nearest_cell``'s struct ordering)."""
    qd = [
        (sum((a - b) * (a - b) for a, b in zip(query_vec, cent)), c)
        for c, cent in enumerate(centroids)
    ]
    return [c for _, c in sorted(qd)[:nprobe]]


def invalidate_sidecar(path: str, name: str) -> None:
    """Remove an existing sidecar BEFORE overwriting index data files.

    The sidecar is the index's validity marker (sidecar-last contract), so
    a REBUILD over an existing index must first retract it: otherwise a
    crash between the data overwrites leaves the old sidecar validating a
    half-rewritten index and probes silently drop candidates.  With the
    sidecar gone, probes fail loudly for the duration of the rebuild
    window, which is the honest behavior."""
    p = os.path.join(path, name)
    if os.path.exists(p):
        os.remove(p)


def publish_sidecar(path: str, name: str, meta: dict) -> None:
    """Write the sidecar LAST and atomically (tmp file + ``os.replace``):
    a crash mid-write must not leave a truncated-but-parseable sidecar."""
    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, name + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh)
    os.replace(tmp, os.path.join(path, name))


def write_ivf_index(
    emb: DataFrame,
    path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> None:
    """Materialize the IVF index: assign cells once, write parquet
    partitioned by the cell column, and persist the centroids as sidecar
    metadata (`_ivf_meta.json` — in a real lake this lives in table
    properties; the layout is what matters: one directory per cell, so a
    probe's ``cell IN (...)`` filter becomes partition pruning and the scan
    reads only the probed cells' files).  Sidecar-last, retracted first on
    rebuild: see ``invalidate_sidecar``."""
    invalidate_sidecar(path, "_ivf_meta.json")
    with_ivf_cells(emb, centroids, vec_col, cell_col).write.mode(
        "overwrite"
    ).partitionBy(cell_col).parquet(path)
    meta = {"centroids": centroids, "vec_col": vec_col, "cell_col": cell_col}
    publish_sidecar(path, "_ivf_meta.json", meta)


def read_ivf_index(spark, path: str) -> tuple[DataFrame, dict]:
    """Open a materialized IVF index → (DataFrame with the stored cell
    column, sidecar metadata).  Pass the metadata to ``ivf_ann_topk`` as
    ``index_meta`` so the probe's centroids/columns are the index's own."""
    with open(os.path.join(path, "_ivf_meta.json")) as fh:
        meta = json.load(fh)
    return spark.read.parquet(path), meta


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
    cell_col: str | None = None,
    index_meta: dict | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into ``n_cells``
    k-means cells, probe only the ``nprobe`` cells whose centroids are
    nearest the query, exact cosine within.

    Two modes:
    - ``cell_col=None`` (ad-hoc): assigns cells on the fly — a full-corpus
      argmin per query.  Fine for one-off batch jobs; wrong shape for
      repeated lookups.
    - ``cell_col="ivf_cell"`` (indexed, the 100 TB path): ``emb`` is a
      table already stamped by ``with_ivf_cells`` (ideally written via
      ``write_ivf_index`` so the column is the parquet partition key);
      ``centroids`` is required and must be the index's own metadata.  The
      probe filters on the STORED column — partition pruning, no recompute.
    - ``index_meta`` (preferred for indexed mode): the dict returned by
      ``read_ivf_index``'s sidecar — centroids, vec_col, and cell_col are
      taken from it, so probe parameters CANNOT silently diverge from what
      the index was built with (a mismatched manual ``centroids`` would
      select wrong cells with no error).
    """
    if index_meta is not None:
        centroids = index_meta["centroids"]
        vec_col = index_meta["vec_col"]
        cell_col = index_meta["cell_col"]
    dim = len(query_vec)
    if cell_col is not None:
        if centroids is None:
            raise ValueError("indexed probe requires the index's centroids")
        if cell_col not in emb.columns:
            raise ValueError(f"column {cell_col!r} not in table; build the index first")
    elif centroids is None:
        centroids = ivf_centroids(emb, n_cells, dim, id_col, vec_col, seed)
    probe = ivf_probe_cells(query_vec, centroids, nprobe)
    if cell_col is not None:
        scanned = emb.where(F.col(cell_col).isin(probe))
    else:
        scanned = emb.withColumn(
            "__cell", _nearest_cell(F.col(vec_col), centroids)
        ).where(F.col("__cell").isin(probe))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = scanned.select(
        F.col(id_col), F.round(_cosine(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


def lsh_query_buckets(
    query_vec: list[float],
    n_planes: int = 4,
    seed: int = 42,
    multiprobe: int = 1,
    n_tables: int = 1,
) -> dict[int, list[int]]:
    """Per-table probe sets for a query: its own sign-sketch bucket plus all
    buckets within ``multiprobe`` bit-flips (driver-side, index metadata)."""
    dim = len(query_vec)
    out: dict[int, list[int]] = {}
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
        out[t] = sorted(probe)
    return out


def with_lsh_buckets(
    emb: DataFrame,
    dim: int,
    n_planes: int = 4,
    seed: int = 42,
    n_tables: int = 1,
    vec_col: str = "embedding",
    tbl_col: str = "lsh_tbl",
    bucket_col: str = "lsh_bucket",
) -> DataFrame:
    """Stamp the multi-table sign-sketch as index rows: each input row
    explodes into ``n_tables`` copies tagged (table, bucket) — the standard
    L-tables LSH storage tradeoff (L× space for 1-(1-p)^L recall).  Persist
    partitioned by (tbl, bucket) (``write_lsh_index``) and a probe reads
    only the probed buckets' partitions of each table."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                _hyperplane_bucket(
                    F.col(vec_col), n_planes, seed + 7919 * t, dim
                ).alias("b"),
            )
            for t in range(n_tables)
        ]
    )
    return (
        emb.withColumn("__tb", F.explode(pairs))
        .withColumn(tbl_col, F.col("__tb.t"))
        .withColumn(bucket_col, F.col("__tb.b"))
        .drop("__tb")
    )


def write_lsh_index(
    emb: DataFrame,
    path: str,
    dim: int,
    n_planes: int = 4,
    seed: int = 42,
    n_tables: int = 1,
    vec_col: str = "embedding",
    tbl_col: str = "lsh_tbl",
    bucket_col: str = "lsh_bucket",
    id_col: str = "vec_id",
) -> None:
    """Materialize the LSH index: sketch once, write parquet partitioned by
    (table, bucket) with the sketch params as sidecar metadata, so probes
    are partition pruning — the per-query full-corpus sketch recompute
    disappears.  The sidecar is written last (probes require it), so a
    crash mid-build fails loudly instead of serving partial data; on a
    REBUILD the old sidecar is retracted before the data overwrite so a
    crash can never leave it validating half-rewritten buckets."""
    invalidate_sidecar(path, "_lsh_meta.json")
    sketched = with_lsh_buckets(
        emb, dim, n_planes, seed, n_tables, vec_col, tbl_col, bucket_col
    )
    sketched.write.mode("overwrite").partitionBy(tbl_col, bucket_col).parquet(path)
    meta = {
        # full row schema: a legitimately EMPTY corpus writes no files under
        # the partitioned layout, so readers need the schema out-of-band to
        # answer "no candidates" instead of failing inference
        "schema_json": sketched.schema.json(),
        "dim": dim,
        "n_planes": n_planes,
        "seed": seed,
        "n_tables": n_tables,
        "vec_col": vec_col,
        "tbl_col": tbl_col,
        "bucket_col": bucket_col,
        # recorded so index consumers (probe_lsh_near_dups) never have to
        # guess the build-time id column out of band
        "id_col": id_col,
    }
    publish_sidecar(path, "_lsh_meta.json", meta)


def append_to_lsh_index(new_emb: DataFrame, path: str) -> dict:
    """Grow an existing hyperplane-LSH index by one ingested batch — the
    embedding twin of ``dedup.append_to_minhash_index``: the batch is
    sketched with the index's own sidecar params and appended as new
    parquet files under the same (table, bucket) partitioning; the corpus
    is never re-read or re-sketched.  Vector dims are validated against
    the sidecar up front (a model swap would null-bucket everything).

    Crash contract (sidecar-last, versioned): retract sidecar → append →
    re-publish with ``appends`` bumped; a crash mid-append leaves probes
    failing loudly, and recovery is a fresh ``write_lsh_index``.

    Returns {"appended": n_rows, "appends": total_append_count}."""
    with open(os.path.join(path, "_lsh_meta.json")) as fh:
        m = json.load(fh)
    vec_col = m["vec_col"]
    bad = new_emb.where(F.size(F.col(vec_col)) != m["dim"]).limit(1).count()
    if bad:
        raise ValueError(
            f"append vectors do not match the index dim={m['dim']} "
            f"(found a row with a different {vec_col} length)"
        )
    invalidate_sidecar(path, "_lsh_meta.json")
    sketched = with_lsh_buckets(
        new_emb, m["dim"], m["n_planes"], m["seed"], m["n_tables"],
        vec_col, m["tbl_col"], m["bucket_col"],
    )
    n = new_emb.count()
    sketched.write.mode("append").partitionBy(
        m["tbl_col"], m["bucket_col"]
    ).parquet(path)
    m["appends"] = int(m.get("appends", 0)) + 1
    publish_sidecar(path, "_lsh_meta.json", m)
    return {"appended": n, "appends": m["appends"]}


def read_lsh_index(spark, path: str) -> tuple[DataFrame, dict]:
    """Open a materialized LSH index → (DataFrame with stored (tbl, bucket)
    columns, sketch params)."""
    with open(os.path.join(path, "_lsh_meta.json")) as fh:
        meta = json.load(fh)
    reader = spark.read
    if "schema_json" in meta:  # pre-schema sidecars fall back to inference
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType.fromJson(json.loads(meta["schema_json"])))
    return reader.parquet(path), meta


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
    tbl_col: str | None = None,
    bucket_col: str | None = None,
    index_meta: dict | None = None,
) -> DataFrame:
    """Approximate top-k: probe the query's hyperplane bucket plus all
    buckets within ``multiprobe`` bit-flips, in each of ``n_tables``
    independent hash tables (OR across tables), exact cosine within.

    Per-plane agreement probability for a neighbor at angle θ is 1 - θ/π,
    so one table's recall is (that)^planes — weak for weakly-clustered
    corpora; L independent tables lift a per-table hit rate p to
    1-(1-p)^L while the scan stays ~L × bucket-fraction of the corpus.

    Ad-hoc mode (``tbl_col=None``): the whole probe is ONE filtered scan
    (no explode) — a row survives if ANY table's sign-sketch lands in that
    table's probe set — but the sketch is recomputed over the corpus per
    query.  Indexed mode (``tbl_col``/``bucket_col`` set): ``emb`` is an
    index built by ``with_lsh_buckets``/``write_lsh_index`` with the SAME
    (n_planes, seed, n_tables); the probe filters on the stored columns
    (partition pruning) and de-duplicates candidates hit in several tables
    before scoring.  Prefer ``index_meta`` (the dict from
    ``read_lsh_index``): sketch params and column names are taken from the
    index's own sidecar, so they CANNOT silently diverge from the build —
    a manual seed/n_planes mismatch would probe wrong buckets and return
    a wrong or empty top-k with no error."""
    if index_meta is not None:
        n_planes = index_meta["n_planes"]
        seed = index_meta["seed"]
        n_tables = index_meta["n_tables"]
        vec_col = index_meta["vec_col"]
        tbl_col = index_meta["tbl_col"]
        bucket_col = index_meta["bucket_col"]
    probes = lsh_query_buckets(query_vec, n_planes, seed, multiprobe, n_tables)
    if (tbl_col is None) != (bucket_col is None):
        raise ValueError("pass both tbl_col and bucket_col, or neither")
    if tbl_col is not None:
        for c in (tbl_col, bucket_col):
            if c not in emb.columns:
                raise ValueError(f"column {c!r} not in table; build the index first")
        keep = None
        for t, pb in probes.items():
            hit = (F.col(tbl_col) == t) & F.col(bucket_col).isin(pb)
            keep = hit if keep is None else (keep | hit)
        cand = emb.where(keep).dropDuplicates([id_col])
    else:
        dim = len(query_vec)
        keep = None
        for t, pb in probes.items():
            hit = _hyperplane_bucket(
                F.col(vec_col), n_planes, seed + 7919 * t, dim
            ).isin(pb)
            keep = hit if keep is None else (keep | hit)
        cand = emb.where(keep)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col(id_col), F.round(_cosine(F.col(vec_col), q), 6).alias("cosine")
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(k)


# ---------------------------------------------------------------------------
# Product quantization (PQ / IVF-PQ): the memory-compression scale path.
#
# At the 100 TB operating point the embedding payload itself is the
# bottleneck: 10^10 vectors x 64 float32 = 2.5 TB that every ANN probe's
# candidate scan must move.  PQ stores each vector as M one-byte codes
# (32x smaller at dim 64 / M 8): split the vector into M subvectors,
# k-means each subspace to K<=256 centroids ("codebooks"), encode each
# subvector as its nearest centroid id.  A query never decodes: the
# asymmetric-distance computation (ADC) precomputes the K distances from
# the query's m-th subvector to subspace m's centroids ONCE (an M x K
# lookup table, driver-side metadata math), and a stored vector's
# approximate distance is M table lookups + a sum — done vectorized in
# one Arrow-batched pandas UDF over the code column.  Composing with IVF
# (`write_ivfpq_index`) gives the faiss-style IVF-PQ layout: partition
# pruning picks the probed cells' files, ADC scores only their codes.
#
# Everything is deterministic: training samples are hash-picked
# (xxhash64, no RNG), k-means init is first-K-by-hash, ties break on
# centroid id; the same corpus + seed always yields the same index.
# No reference analog; training-data-pipeline operator per the brief.
# ---------------------------------------------------------------------------


def pq_train(
    emb: DataFrame,
    dim: int,
    m: int = 8,
    k: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    n_train: int = 4096,
    n_iters: int = 8,
) -> list:
    """Train PQ codebooks: ``m`` subspaces x ``k`` centroids each.

    Training pulls a deterministic hash-picked sample of ``n_train``
    vectors to the driver and runs numpy k-means per subspace — the
    standard PQ recipe (codebooks need thousands of examples, not the
    corpus; faiss trains the same way), and the only driver-side data of
    the whole pipeline.  Returns ``codebooks[m][k][dim//m]`` floats
    (index metadata, ~m*k*dim/m floats = k*dim)."""
    import numpy as np

    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    if not 1 < k <= 256:
        raise ValueError("k must be in (1, 256] (codes are one byte)")
    d = dim // m
    sample = _init_pick(emb, n_train, id_col, vec_col, seed).collect()
    x = np.asarray([list(r[vec_col]) for r in sample], dtype=np.float64)
    if x.shape[0] < k:
        raise ValueError(f"training sample {x.shape[0]} smaller than k={k}")
    books = []
    for mi in range(m):
        sub = x[:, mi * d:(mi + 1) * d]
        # init: first k DISTINCT subvectors in hash order (duplicates would
        # seed empty centroids)
        seen: dict = {}
        for row in sub:
            seen.setdefault(row.tobytes(), row)
            if len(seen) == k:
                break
        cents = np.asarray(list(seen.values()), dtype=np.float64)
        if cents.shape[0] < k:
            raise ValueError(
                f"subspace {mi}: only {cents.shape[0]} distinct training "
                f"subvectors for k={k} — lower k or enlarge n_train"
            )
        for _ in range(n_iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    cents[c] = sub[mask].mean(axis=0)
                # empty centroid: keep its position (deterministic; a
                # code that never wins simply goes unused)
        books.append(cents.tolist())
    return books


def _pq_encode_udf(codebooks: list):
    """Arrow-batched encoder: embedding -> ``m`` one-byte codes as binary.
    Vectorized numpy per batch (no per-row Python): reshape to
    (n, m, d), argmin squared-L2 against each subspace's centroids."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    d = books[0].shape[1]

    @pandas_udf("binary")
    def encode(vecs: pd.Series) -> pd.Series:
        bad = sum(1 for v in vecs if v is None or len(v) != m * d)
        if bad:
            raise ValueError(
                f"pq encode: {bad} row(s) with NULL or wrong-length embedding "
                f"(expected {m * d} floats); PQ rows must carry full vectors"
            )
        x = np.asarray([np.asarray(v, dtype=np.float64) for v in vecs])
        if x.size == 0:
            return pd.Series([], dtype=object)
        x = x.reshape(len(x), m, d)
        codes = np.empty((len(x), m), dtype=np.uint8)
        for mi in range(m):
            d2 = ((x[:, mi, None, :] - books[mi][None, :, :]) ** 2).sum(axis=2)
            codes[:, mi] = d2.argmin(axis=1).astype(np.uint8)
        return pd.Series([c.tobytes() for c in codes])

    return encode


def with_pq_codes(
    emb: DataFrame,
    codebooks: list,
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """Stamp each vector's PQ code (binary, ``m`` bytes) — the write-once
    encode step.  Persist WITHOUT the raw vector column and the stored
    index is ~4*dim/m times smaller than the float32 corpus."""
    return emb.withColumn(code_col, _pq_encode_udf(codebooks)(F.col(vec_col)))


def pq_adc_topk(
    coded: DataFrame,
    query_vec: list[float],
    codebooks: list,
    topk: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Approximate top-k by asymmetric distance: one M x K lookup table
    from the query (driver metadata math), one vectorized gather+sum per
    Arrow batch over the codes, then TakeOrderedAndProject for the k
    winners (no full sort/shuffle).  Returns (id, approx squared-L2)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    books = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    d = books[0].shape[1]
    q = np.asarray(query_vec, dtype=np.float64).reshape(m, d)
    lut = np.stack([
        ((q[mi][None, :] - books[mi]) ** 2).sum(axis=1) for mi in range(m)
    ])  # (m, k)

    @pandas_udf("double")
    def adc(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype=float)
        bad = sum(1 for c in codes if c is None or len(c) != m)
        if bad:
            raise ValueError(
                f"pq adc: {bad} row(s) with NULL or wrong-length pq_code "
                f"(expected {m} bytes); re-encode the index before probing"
            )
        c = np.frombuffer(b"".join(codes), dtype=np.uint8).reshape(len(codes), m)
        return pd.Series(lut[np.arange(m)[None, :], c].sum(axis=1))

    scored = coded.select(F.col(id_col), adc(F.col(code_col)).alias("approx_d2"))
    return scored.orderBy(F.col("approx_d2").asc(), F.col(id_col).asc()).limit(topk)


def write_ivfpq_index(
    emb: DataFrame,
    path: str,
    centroids: list[list[float]],
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
    code_col: str = "pq_code",
) -> None:
    """Materialize the faiss-style IVF-PQ layout: (id, pq_code) parquet
    partitioned by IVF cell — the raw vectors are NOT stored, so the
    index is both partition-prunable (probe -> cells -> files) and
    ~4*dim/m times smaller than the corpus.  Sidecar-last publish with
    retract-first on rebuild, same contract as the IVF/LSH indexes."""
    invalidate_sidecar(path, "_ivfpq_meta.json")
    df = with_ivf_cells(emb, centroids, vec_col, cell_col)
    df = with_pq_codes(df, codebooks, vec_col, code_col)
    df.select(id_col, code_col, cell_col).write.mode("overwrite").partitionBy(
        cell_col
    ).parquet(path)
    publish_sidecar(path, "_ivfpq_meta.json", {
        "centroids": centroids, "codebooks": codebooks,
        "id_col": id_col, "cell_col": cell_col, "code_col": code_col,
        "vec_col": vec_col, "dim": len(centroids[0]),
    })


def read_ivfpq_index(spark, path: str) -> tuple[DataFrame, dict]:
    with open(os.path.join(path, "_ivfpq_meta.json")) as fh:
        meta = json.load(fh)
    return spark.read.parquet(path), meta


def ivfpq_ann_topk(
    index_df: DataFrame,
    index_meta: dict,
    query_vec: list[float],
    topk: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-PQ probe: pick the ``nprobe`` nearest cells (driver metadata
    math), partition-prune to their files, ADC-score only their codes.
    The scan cost is ~nprobe/n_cells of an already-32x-compressed index."""
    cells = ivf_probe_cells(query_vec, index_meta["centroids"], nprobe)
    pruned = index_df.where(F.col(index_meta["cell_col"]).isin(cells))
    return pq_adc_topk(
        pruned, query_vec, index_meta["codebooks"], topk=topk,
        id_col=index_meta["id_col"], code_col=index_meta["code_col"],
    )


def ivfpq_rerank_topk(
    index_df: DataFrame,
    index_meta: dict,
    query_vec: list[float],
    emb,
    topk: int = 10,
    candidates: int = 100,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ with exact re-ranking — the standard recall-restoring step:
    ADC over the compressed index nominates ``candidates`` ids
    (partition-pruned, cheap), then ONLY those raw vectors are fetched
    and scored exactly (squared-L2, same metric as ADC), and the true
    top-k of the candidate set is returned.

    ``emb`` is the raw-vector store: a DataFrame, or a LakeTable keyed
    by ``id_col`` — the LakeTable path composes with the engine's point
    lookup (``read(where_in=)``), so the fetch opens only the buckets
    (and stats/bloom-surviving files) holding the candidate ids.  The
    candidate id list is collected to the driver — ~``candidates`` ints,
    the same metadata-sized probe contract as every point lookup."""
    cand = ivfpq_ann_topk(
        index_df, index_meta, query_vec, topk=candidates, nprobe=nprobe
    )
    ids = [r[index_meta["id_col"]] for r in cand.collect()]
    if not ids:
        src = emb.read() if hasattr(emb, "read") else emb
        return src.select(
            F.col(id_col), F.lit(0.0).alias("exact_d2")
        ).limit(0)
    if hasattr(emb, "read"):  # LakeTable: bucket/stats/bloom-pruned fetch
        src = emb.read(where_in={id_col: ids})
    else:
        src = emb.where(F.col(id_col).isin(ids))
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    d2 = F.aggregate(
        F.zip_with(F.col(vec_col), q, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = src.select(F.col(id_col), d2.alias("exact_d2"))
    return scored.orderBy(F.col("exact_d2").asc(), F.col(id_col).asc()).limit(topk)


def append_to_ivfpq_index(new_emb: DataFrame, path: str) -> dict:
    """Incrementally grow a materialized IVF-PQ index: the new vectors are
    assigned + encoded with the index's OWN sidecar centroids/codebooks
    and appended as new parquet files under the same cell partitioning —
    the corpus is never re-read, re-assigned, or re-encoded, so the
    append costs O(new vectors) regardless of index size (the same
    contract as ``append_to_lsh_index``; quantizers are frozen at build
    time, the standard faiss add-after-train semantics — retrain and
    rebuild when drift warrants it).

    Crash contract (sidecar-last, versioned): retract sidecar → append →
    re-publish with ``appends`` bumped; a crash mid-append leaves probes
    failing loudly, recovery is a fresh ``write_ivfpq_index``.

    Returns {"appended": n_rows, "appends": total_append_count}."""
    with open(os.path.join(path, "_ivfpq_meta.json")) as fh:
        m = json.load(fh)
    vec_col = m["vec_col"]
    bad = new_emb.where(F.size(F.col(vec_col)) != m["dim"]).limit(1).count()
    if bad:
        raise ValueError(
            f"append vectors do not match the index dim={m['dim']} "
            f"(found a row with a different {vec_col} length)"
        )
    invalidate_sidecar(path, "_ivfpq_meta.json")
    df = with_ivf_cells(new_emb, m["centroids"], vec_col, m["cell_col"])
    df = with_pq_codes(df, m["codebooks"], vec_col, m["code_col"])
    n = new_emb.count()
    df.select(m["id_col"], m["code_col"], m["cell_col"]).write.mode(
        "append"
    ).partitionBy(m["cell_col"]).parquet(path)
    m["appends"] = int(m.get("appends", 0)) + 1
    publish_sidecar(path, "_ivfpq_meta.json", m)
    return {"appended": n, "appends": m["appends"]}
