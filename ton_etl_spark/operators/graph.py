"""Distributed connected components — the clustering step of a dedup
pipeline: near-dup PAIRS (minhash/simhash/embedding LSH output) only say
"these two match"; choosing one representative per duplicate *cluster*
needs the components of the match graph.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log n) rounds regardless of component diameter, unlike naive min-label
propagation which needs diameter rounds (a 10^6-long chain of pairwise
near-dups would take 10^6 rounds).  Each round is one groupBy + one join
on the node id; no collect, no driver-side graph.  Lineage is cut with
``localCheckpoint`` every round — iterative self-referential plans
otherwise grow exponentially in Catalyst.

No reference analog; first-class training-data operator per the task
brief.  Cluster-representative selection after components is a plain
``groupBy(component).min(id)`` — the same shape as ``exact_dedup``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Undirected edge set as (big, small) pairs, self-loops dropped."""
    a, b = F.col("__a"), F.col("__b")
    return (
        edges.where(a != b)
        .select(F.greatest(a, b).alias("__a"), F.least(a, b).alias("__b"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every STRICTLY LARGER neighbor to
    m = min(neighborhood ∪ {u}).  Operates on the symmetrized adjacency."""
    adj = edges.unionByName(
        edges.select(F.col("__b").alias("__a"), F.col("__a").alias("__b"))
    )
    m = adj.groupBy("__a").agg(F.min("__b").alias("__mn")).select(
        "__a", F.least(F.col("__mn"), F.col("__a")).alias("__m")
    )
    return (
        adj.join(m, on="__a")
        .where(F.col("__b") > F.col("__a"))
        .select(F.col("__b").alias("__a"), F.col("__m").alias("__b"))
        .where(F.col("__a") != F.col("__b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u over its SMALLER neighbors N (edges arrive as
    (big=u, small)): connect every v in N ∪ {u} to m = min(N).

    Output is already in canonical (big, small) orientation: every emitted
    edge points at __m = min(N(u)), which is strictly smaller than the
    first component (__m <= every v in N < u, and the __a != __b filter
    removes the v == __m equality), and ``distinct`` has been applied — so
    wrapping the result in ``_canon`` again would only re-derive the same
    rows through one more full exchange."""
    m = edges.groupBy("__a").agg(F.min("__b").alias("__m"))
    with_m = edges.join(m, on="__a")
    out = with_m.select(F.col("__b").alias("__a"), F.col("__m").alias("__b")).unionByName(
        with_m.select(F.col("__a"), F.col("__m").alias("__b"))
    )
    return out.where(F.col("__a") != F.col("__b")).distinct()


def _checksum(edges: DataFrame) -> tuple[int, int]:
    r = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.bit_xor(F.xxhash64(F.col("__a"), F.col("__b"))), F.lit(0)
        ).alias("h"),
    ).first()
    return int(r["n"]), int(r["h"])


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``, where
    ``component`` is the smallest node id in the node's connected
    component (root rows ``id == component`` included; a node whose only
    edges are self-loops is its own singleton component).  Raises if the
    alternation has not converged after ``max_iter`` rounds (far beyond
    the O(log n) bound for any realistic graph)."""
    # checkpoint the RAW edges once: both the canon seed and the singleton
    # backfill below consume them, and the input is often an expensive plan
    # (an LSH pipeline) that must not execute twice
    raw = edges.select(
        F.col(src).alias("__a"), F.col(dst).alias("__b")
    ).localCheckpoint()
    all_nodes = (
        raw.select(F.col("__a").alias("id"))
        .unionByName(raw.select(F.col("__b").alias("id")))
        .where(F.col("id").isNotNull())
        .distinct()
    )
    e = _canon(raw).localCheckpoint()
    if not e.head(1):
        # every node is a singleton (self-loop-only inputs)
        return all_nodes.withColumn("component", F.col("id"))
    prev = _checksum(e)
    for _ in range(max_iter):
        # _small_star output is canonical + distinct (see its docstring):
        # no _canon pass per round, one exchange fewer
        e = _small_star(_large_star(e)).localCheckpoint()
        cur = _checksum(e)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # fixpoint is a forest of stars (big, root); components = star edges
    # plus each root itself, plus singletons whose only edges were
    # self-loops (dropped by _canon but still 'appearing in edges')
    nodes = e.select(F.col("__a").alias("id"), F.col("__b").alias("component"))
    roots = e.select(F.col("__b").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    connected = nodes.unionByName(roots).distinct()
    singles = all_nodes.join(
        connected.select("id"), on="id", how="left_anti"
    ).withColumn("component", F.col("id"))
    return connected.unionByName(singles)


def cluster_representatives(
    components: DataFrame, id_col: str = "id", comp_col: str = "component"
) -> DataFrame:
    """One row per cluster: (component, keep_id, n_members) — keep the
    smallest id, the ``exact_dedup`` convention."""
    return components.groupBy(comp_col).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_members")
    )
