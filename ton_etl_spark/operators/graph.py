"""Distributed connected components — the clustering step of a dedup
pipeline: near-dup PAIRS (minhash/simhash/embedding LSH output) only say
"these two match"; choosing one representative per duplicate *cluster*
needs the components of the match graph.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — converges in
O(log n) rounds regardless of component diameter, unlike naive min-label
propagation which needs diameter rounds (a 10^6-long chain of pairwise
near-dups would take 10^6 rounds).  Each round is one groupBy + one join
on the node id; no collect, no driver-side graph.  Lineage is cut every
round (iterative self-referential plans otherwise grow exponentially in
Catalyst) with a LAZY checkpoint the round's convergence checksum
materializes — one Spark job per round; ``checkpoint_dir=`` upgrades the
cuts to reliable checkpoints for cluster fault tolerance.

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
    checkpoint_dir: str | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """(id, component) for every node appearing in ``edges``, where
    ``component`` is the smallest node id in the node's connected
    component (root rows ``id == component`` included; a node whose only
    edges are self-loops is its own singleton component).  Raises if the
    alternation has not converged after ``max_iter`` rounds (far beyond
    the O(log n) bound for any realistic graph).

    Lineage cuts are LAZY (``eager=False``): each round's convergence
    checksum is the action that materializes that round's checkpoint, so
    a round costs exactly ONE Spark job — the checksum is folded into the
    round's own materialization instead of running as a second scan.

    ``checkpoint_dir`` switches the per-round lineage cuts from
    ``localCheckpoint`` (executor-resident blocks — one lost executor on
    a real cluster kills a long CC job mid-iteration) to RELIABLE
    ``checkpoint`` into that directory (HDFS/object store on a cluster).
    Each round's frame is persisted before the reliable cut so the
    checkpoint save reads the cached blocks instead of recomputing the
    round; the previous round's cache is dropped as soon as the next
    round lands.  Costs one extra save job per round — the fault-
    tolerance trade, quantified in BENCH.md.

    ``stats`` (optional dict) receives ``{"rounds": k}`` for job-count
    assertions in tests."""
    reliable = checkpoint_dir is not None
    if reliable:
        edges.sparkSession.sparkContext.setCheckpointDir(checkpoint_dir)
    pinned: list[DataFrame] = []

    def _cut(df: DataFrame) -> DataFrame:
        if not reliable:
            return df.localCheckpoint(eager=False)
        df = df.persist()
        pinned.append(df)
        return df.checkpoint(eager=False)

    def _drop_pins(keep_last: int) -> None:
        while len(pinned) > keep_last:
            pinned.pop(0).unpersist()

    # checkpoint the RAW edges once: both the canon seed and the singleton
    # backfill below consume them, and the input is often an expensive plan
    # (an LSH pipeline) that must not execute twice
    raw = edges.select(F.col(src).alias("__a"), F.col(dst).alias("__b"))
    raw = raw.localCheckpoint(eager=False) if not reliable else _cut(raw)
    all_nodes = (
        raw.select(F.col("__a").alias("id"))
        .unionByName(raw.select(F.col("__b").alias("id")))
        .where(F.col("id").isNotNull())
        .distinct()
    )
    e = _cut(_canon(raw))
    # this first checksum is the action that materializes BOTH the raw and
    # canon checkpoints; its count doubles as the emptiness check
    prev = _checksum(e)
    rounds = 0
    if prev[0] == 0:
        # every node is a singleton (self-loop-only inputs)
        if stats is not None:
            stats["rounds"] = 0
        return all_nodes.withColumn("component", F.col("id"))
    for _ in range(max_iter):
        # _small_star output is canonical + distinct (see its docstring):
        # no _canon pass per round, one exchange fewer
        e = _cut(_small_star(_large_star(e)))
        cur = _checksum(e)  # materializes the round's checkpoint
        rounds += 1
        # raw stays pinned (the singleton backfill still reads it);
        # earlier rounds' caches are dead once the new round landed
        if reliable:
            _drop_pins(keep_last=2)
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    if stats is not None:
        stats["rounds"] = rounds
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
