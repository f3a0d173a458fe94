"""Iterative graph analytics over DataFrame joins — PageRank.

Beyond connected components (cluster.py), corpus pipelines use link
analysis for source weighting: Common Crawl derives per-host ranks
from the web graph (the public `cc-pagerank` datasets) and quality
mixes weight domains by centrality. The same shape applies to any
entity graph a warehouse already has (here: the customer<->supplier
bipartite graph implied by orders x lineitem).

PageRank here is the textbook power iteration (Page et al. 1999),
run a FIXED number of rounds in integer fixed-point so every engine
replays it bit-for-bit:

    rank_0(v)   = SCALE div N
    contrib(u)  = rank_t(u) div outdeg(u)          (integer division)
    rank_t+1(v) = (15*SCALE) div (100*N)
                  + (85 * sum_{u->v} contrib(u)) div 100

Every term is a BIGINT; sums of integers are order-invariant, so the
result is independent of partitioning/join order — the same
fixed-point-before-sum contract as BM25/LM scoring. With
damping 0.85 the true ranks are approached geometrically; 5 rounds
is the demo depth (the oracle unrolls the same 5 rounds as CTEs).

Scale shape: one shuffle join (edges x ranks on src) plus one
groupBy (dst) per round — the Pregel message-passing pattern
expressed in DataFrame ops, which is exactly what GraphX/GraphFrames
lower to. Lineage is cut per round with an eager localCheckpoint
(the connected-components/suffix-array pattern) so 5 rounds don't
nest 5 plans. Driver-side state is two bounded scalars (node count,
loop index).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**15


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 5,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Returns (node, rank_fp) for every node appearing in ``edges``.

    ``edges`` is a directed edge list; callers wanting undirected
    semantics union both directions first. Every node must have at
    least one out-edge (symmetric edge lists guarantee it) — there
    is deliberately no dangling-mass term, and the oracle states the
    same recurrence.
    """
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.count()  # bounded driver scalar (one int)
    base = (15 * SCALE) // (100 * n)
    rank = nodes.withColumn(
        "rank_fp", F.lit(SCALE // n).cast("long")
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        contrib = (
            e.join(rank, e["src"] == rank["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank_fp div outdeg").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        rank = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.expr("(85 * coalesce(s, 0)) div 100")
                )
                .cast("long")
                .alias("rank_fp"),
            )
            .localCheckpoint(eager=True)
        )
    return rank
