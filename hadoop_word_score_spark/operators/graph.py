"""Graph analytics beyond connected components: PageRank (EXT).

The iterative-linear-algebra shape on Spark — same driver-loop-over-
declarative-rounds family as dedup's label propagation and BPE's merge
rounds, but with float state: each iteration is one join of the edge list
against the current rank vector, a groupBy-sum of contributions, and a
left join back onto the node set. Nothing corpus-sized collects; per-round
shuffles carry (node, rank) pairs and the edge relation's (src, dst) keys.

Scale notes:
  - Edges and the node set are materialized ONCE (localCheckpoint) and
    sized to the edge relation, so every round replays materialized blocks
    instead of re-deriving the graph (the components lesson,
    tools/components_ab.py: 1.4x at 2M edges).
  - Rank state is checkpointed per round: the plan stays one-round deep
    instead of growing a 3-round lineage of joins.
  - Undirected use (edges emitted in both directions) guarantees every
    node in the edge list has outdegree >= 1, so no dangling-mass term is
    needed; rank mass is exactly conserved at every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """PageRank over an edge list; returns (node, rank).

    ``edges`` rows are directed (src -> dst); pass both directions for an
    undirected graph. Every src must also appear as a node (true by
    construction here: nodes = src UNION dst), and there must be no
    dangling nodes receiving rank they cannot redistribute — emit
    undirected edges to guarantee it. Ranks start uniform and sum to 1.0
    after every round (conservation is what the tests pin).
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select("dst"))
        .distinct()
        .localCheckpoint()
    )
    n = nodes.count()  # one scalar action over the (bounded) node set
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    r = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(iterations):
        contribs = (
            e.join(r, e["src"] == r["node"])
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        r = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n)
                    + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint()  # keep the plan one round deep
        )
    return r
