"""Distributed graph analytics over edge-list DataFrames.

Beyond the reference's surface (it has no graph operators at all); included
because corpus-level analyses — link graphs for quality signals, co-occurrence
graphs for dedup cluster ranking — are standard large-pipeline workloads.

Scale design: an edge list is just a DataFrame partitioned by ``src``; every
PageRank iteration is one shuffle (join on src, then hash-agg on dst), which
is the same plan a dedicated Pregel engine would lower to for this workload.
Edges and out-degrees are computed once and cached; the rank frontier (one
row per node, two columns) is the only thing that changes between iterations,
so executor memory per iteration is O(nodes/partitions), never O(edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    """Out-degree per source node of a directed edge list (src, dst)."""
    return edges.groupBy("src").agg(F.count("*").alias("outdeg"))


def pagerank(edges: DataFrame, iterations: int = 3, damping: float = 0.85) -> DataFrame:
    """PageRank by power iteration over a directed edge list (src, dst).

    Nodes are the union of sources and destinations.  Dangling nodes (no
    outgoing edges) redistribute nothing — the standard simplification when
    the caller guarantees a symmetric edge set, as the co-purchase battery
    query does.  Fixed iteration count keeps the result a pure function of
    the input (oracle-checkable); callers wanting convergence can loop on the
    returned frontier.

    Returns (node, rank) with ranks summing to ~1 on symmetric graphs.
    """
    # localCheckpoint (not cache): materializes once on the executors AND
    # truncates lineage, so the per-iteration plan stays flat instead of
    # re-expanding the whole upstream graph every power step — the standard
    # iterative-algorithm discipline on Spark.
    edges = edges.select("src", "dst").distinct().localCheckpoint()
    deg = out_degrees(edges)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()
    # contribution edges: src -> dst carrying 1/outdeg, reused every iteration
    contrib = edges.join(deg, "src").select(
        "src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w")
    ).localCheckpoint()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        incoming = (
            contrib.join(ranks, contrib.src == ranks.node)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("w")).alias("mass"))
        )
        # left join keeps nodes with no inbound mass at the teleport floor
        ranks = nodes.join(incoming, nodes.node == incoming.dst, "left").select(
            "node",
            (F.lit(teleport) + F.lit(damping) * F.coalesce("mass", F.lit(0.0))).alias("rank"),
        )
    return ranks
