"""Iterative graph algorithms over edge DataFrames.

- transitive_closure: subClassOf-to-root walk (reference:
  src/interface.py:52-64 recursive per-node; src/extract_domain_range.py:
  136-152 approximates ONE extra hop — we compute the true fixpoint, an
  improvement the survey calls out in §2.9 G6).
- n_hop_neighbors: ConceptNet-style bounded expansion (reference:
  src/build_ng/concept_net.py:92-124).

Both use doubling/iterated hash joins with per-round localCheckpoint to cut
lineage; small dimension tables, so rounds are cheap; for web-scale edges
the same loop holds (joins shuffle on the join key; AQE splits skewed hubs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transitive_closure(
    edges: DataFrame, max_iter: int = 20
) -> DataFrame:
    """edges(child, parent) -> all (child, ancestor) pairs (fixpoint)."""
    closure = edges.select("child", F.col("parent").alias("ancestor")).dropDuplicates()
    closure = closure.localCheckpoint(eager=True)
    for _ in range(max_iter):
        # join current closure's frontier with direct edges one more hop
        nxt = (
            closure.alias("c")
            .join(edges.alias("e"), F.col("c.ancestor") == F.col("e.child"))
            .select(F.col("c.child").alias("child"), F.col("e.parent").alias("ancestor"))
        )
        merged = closure.unionByName(nxt).dropDuplicates().localCheckpoint(eager=True)
        if merged.count() == closure.count():
            return merged
        closure = merged
    return closure


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    all_nodes: DataFrame | None = None,
) -> DataFrame:
    """Classic (unnormalized) PageRank over (src, dst) edges for a fixed
    iteration count: rank := (1-d) + d · Σ rank(in-neighbor)/outdeg.

    The KG-usage ranking primitive (event/entity importance over the built
    narrative graph) and the engine's second iterative-joins algorithm
    family beside connected components. One hash join + one aggregate per
    iteration, per-round localCheckpoint cuts lineage; dangling-node mass
    is not redistributed (documented simplification — nodes with no
    out-edges contribute nothing). Deterministic up to float summation
    order; gate values are scaled with a wide margin.
    """
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
    )
    if all_nodes is not None:
        nodes = nodes.unionByName(all_nodes.select("node"))
    nodes = nodes.dropDuplicates().localCheckpoint(eager=True)
    outdeg = edges.groupBy("src").agg(F.count("*").alias("d")).localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0))
    for _ in range(iterations):
        contribs = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("d")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("m"))
        )
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (F.lit(1.0 - damping) + F.lit(damping) * F.coalesce("m", F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks


def n_hop_neighbors(
    edges: DataFrame, seeds: DataFrame, hops: int = 2
) -> DataFrame:
    """(src, dst) edges + seeds(node) -> (node, hop) reachable within `hops`
    (directed; hop = first distance at which the node is reached)."""
    spark = edges.sparkSession
    visited = seeds.select("node").dropDuplicates().withColumn("hop", F.lit(0))
    frontier = visited
    for h in range(1, hops + 1):
        nxt = (
            edges.join(
                F.broadcast(frontier.select("node")),
                edges["src"] == F.col("node"),
                "left_semi",
            )
            .select(F.col("dst").alias("node"))
            .dropDuplicates()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h))
        )
        nxt = nxt.localCheckpoint(eager=True)
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited
