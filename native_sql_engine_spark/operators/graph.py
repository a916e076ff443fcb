"""Distributed graph analytics over edge-list DataFrames.

Beyond the reference's surface (it has no graph operators at all); included
because corpus-level analyses — link graphs for quality signals, co-occurrence
graphs for dedup cluster ranking — are standard large-pipeline workloads.

Scale design: an edge list is just a DataFrame partitioned by ``src``; every
PageRank iteration is one shuffle of the small rank frontier (the edge table
is hash-partitioned by src ONCE and reused), then one hash-agg on dst — the
same plan a dedicated Pregel engine would lower to for this workload.
Executor memory per iteration is O(nodes/partitions), never O(edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..materialize import materialize


def out_degrees(edges: DataFrame) -> DataFrame:
    """Out-degree per source node of a directed edge list (src, dst)."""
    return edges.groupBy("src").agg(F.count("*").alias("outdeg"))


def _pagerank_edge_state(edges: DataFrame) -> DataFrame:
    """PageRank's reusable edge state (src, dst, w), hash-partitioned by src
    — the un-persisted plan, exposed so plan-stability tests can golden the
    subtree that the cache otherwise hides inside an InMemoryRelation."""
    n_part = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "200"))
    dedup = edges.select("src", "dst").repartition(n_part, "src").dropDuplicates(["src", "dst"])
    deg = out_degrees(dedup)
    return dedup.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    symmetric: bool = False,
) -> DataFrame:
    """PageRank by power iteration over a directed edge list (src, dst).

    Nodes are the union of sources and destinations.  Dangling nodes (no
    outgoing edges) redistribute nothing — the standard simplification when
    the caller guarantees a symmetric edge set, as the co-purchase battery
    query does.  Fixed iteration count keeps the result a pure function of
    the input (oracle-checkable); callers wanting convergence can loop on the
    returned frontier.

    ``symmetric=True`` declares every node has both in- and out-edges (true
    for co-occurrence graphs by construction): the per-iteration
    keep-isolated-nodes outer join is then provably a no-op and is skipped,
    halving the work per power step.

    Returns (node, rank) with ranks summing to ~1 on symmetric graphs.
    """
    # Build the reusable edge state hash-partitioned by src.  outdeg comes
    # from a map-side-combined aggregate joined back on src (NOT a window
    # count: WindowExec would buffer a hub node's entire neighbor list in
    # one task, while the join streams — skew-safe at power-law hubs).
    # The explicit repartition(src) FIRST is what makes the edge state
    # reusable: HashPartitioning(src) satisfies the distribution required by
    # the (src, dst) dedup, the outdeg aggregate, the deg join AND every
    # iteration's rank join, so the raw edge list crosses the network exactly
    # once and each power step shuffles only the rank frontier.  persist()
    # (not localCheckpoint) is what carries that partitioning across
    # iterations: an InMemoryTableScan reports the cached plan's
    # HashPartitioning (AQE may not change a cached plan's output
    # partitioning by default), while a localCheckpoint scan under AQE
    # reports UnknownPartitioning and every iteration re-exchanges the full
    # edge table (measured on the before-plan: one Exchange per iteration
    # over Scan ExistingRDD).  Partition count tracks the session's
    # shuffle-partition setting, not a local constant.
    contrib = _pagerank_edge_state(edges).persist()
    if symmetric:
        # nodes only seed the count and the uniform frontier; no need to
        # materialize them — one distinct over the checkpointed edge state
        nodes = contrib.select(F.col("src").alias("node")).distinct()
        n = contrib.agg(F.countDistinct("src")).first()[0]
    else:
        nodes = materialize(
            contrib.select(F.col("src").alias("node"))
            .union(contrib.select(F.col("dst").alias("node")))
            .distinct()
        )
        n = nodes.count()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        incoming = (
            contrib.join(ranks, contrib.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("mass"))
        )
        if symmetric:
            # every node has inbound mass — no outer join needed
            ranks = incoming.select(
                F.col("dst").alias("node"),
                (F.lit(teleport) + F.lit(damping) * F.col("mass")).alias("rank"),
            )
        else:
            # left join keeps nodes with no inbound mass at the teleport floor
            ranks = nodes.join(incoming, nodes.node == incoming.dst, "left").select(
                "node",
                (F.lit(teleport) + F.lit(damping) * F.coalesce("mass", F.lit(0.0))).alias(
                    "rank"
                ),
            )
    return ranks


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int = 3,
    edges_materialized: bool = False,
) -> DataFrame:
    """BFS hop distance from a source node set over a directed edge list.

    Classic frontier expansion: each hop is ONE join-shuffle (frontier ⋈
    edges, both sides keyed on the join column) plus a left-anti probe
    against the visited set — the Pregel lowering of BFS.  Frontiers are
    localCheckpoint'd so the per-hop plan never re-expands earlier hops,
    and the visited set is a union of materialized frontiers (size bounded
    by nodes, not paths — no combinatorial blowup at any depth).

    ``sources`` must have a single ``node`` column.  Returns (node, dist)
    for every node within ``max_hops``; unreached nodes are absent.

    ``edges_materialized=True`` declares that the caller already
    deduplicated AND materialized (checkpoint/persist) the edge list, so
    the internal distinct+checkpoint is skipped — callers whose ``sources``
    derive from the same expensive edge pipeline should materialize it
    once themselves and derive both inputs from that, otherwise the edge
    build runs twice (once into the edge checkpoint, once into the
    frontier checkpoint).
    """
    if not edges_materialized:
        edges = materialize(edges.select("src", "dst").distinct())
    else:
        edges = edges.select("src", "dst")
    frontier = materialize(sources.select("node").distinct().withColumn("dist", F.lit(0)))
    visited = frontier
    for hop in range(1, max_hops + 1):
        reached = (
            edges.join(frontier, edges.src == frontier.node)
            .select(F.col("dst").alias("node"))
            .distinct()
        )
        frontier = materialize(
            reached.join(visited, "node", "left_anti").withColumn("dist", F.lit(hop))
        )
        visited = visited.union(frontier)
    return visited


def triangle_count(edges: DataFrame) -> DataFrame:
    """Exact triangle count of an undirected graph (given as a symmetric
    directed edge list) via degree-ordered orientation.

    Each undirected edge is kept only in the direction from the lower
    (degree, id) endpoint to the higher — so every triangle materializes as
    exactly ONE wedge a→b→c plus a closing-edge lookup, and the wedge count
    per node is bounded by its ORIENTED out-degree (≤ √(2·|E|) for any
    graph), not its raw degree.  That bound is what keeps the intermediate
    linear-ish on power-law graphs where the naive wedge join explodes on
    hubs.  Three hash joins total, all on edge keys.

    Returns a single row (n_triangles,).
    """
    e = edges.select("src", "dst").distinct()
    deg = e.groupBy("src").agg(F.count("*").alias("d")).select(
        F.col("src").alias("node"), "d"
    )
    oriented = materialize(
        e.join(deg.select(F.col("node").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("node").alias("dst"), F.col("d").alias("dd")), "dst")
        .filter(
            (F.col("ds") < F.col("dd"))
            | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
        )
        .select("src", "dst")
    )
    o2 = oriented.select(F.col("src").alias("mid"), F.col("dst").alias("far"))
    wedges = oriented.join(o2, oriented.dst == o2.mid).select(
        F.col("src").alias("a"), F.col("far").alias("c")
    )
    closing = oriented.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return wedges.join(closing, ["a", "c"]).agg(F.count("*").alias("n_triangles"))
