"""Connected components over near-duplicate pairs — dedup cluster
resolution (north-star).

Pairwise dedup (Jaccard / MinHash / SimHash) yields edges; the
keep/drop decision needs the transitive closure: if A~B and B~C then
A, B, C are one duplicate cluster even when A~C was never scored.
``connected_components`` assigns every node the minimum node id
reachable through the edge set — the canonical "keeper" id.

Algorithm: iterative min-label propagation.

    label(v) <- min(label(v), min over neighbors' labels)

repeated until a fixpoint. Each round is one join + one aggregation
(both on the node key), localCheckpoint'ed to truncate lineage —
the standard large-graph pattern (GraphX/GraphFrames do the same
under the hood); rounds needed = graph diameter, which is tiny for
near-dup clusters. This is the engine's one genuinely *iterative*
algorithm — driver-side loop, convergence-checked, bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Returns (node_col, cluster_id): min reachable id per node.
    Singletons (no edges) keep their own id."""
    # undirected: materialize both directions once
    fwd = edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"))
    und = fwd.unionByName(
        edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"))
    ).distinct()
    und = und.localCheckpoint(eager=True)

    labels = nodes.select(
        F.col(node_col).alias("u"), F.col(node_col).alias("label")
    ).localCheckpoint(eager=True)

    for _ in range(max_iterations):
        neighbor_min = (
            und.join(labels, und["v"] == labels["u"], "inner")
            .select(und["u"].alias("u"), F.col("label"))
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
                (F.coalesce(F.col("nbr_label"), F.col("label")) < F.col("label")).alias(
                    "__changed"
                ),
            )
        ).localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.drop("__changed")
        if changed == 0:
            break

    return labels.select(F.col("u").alias(node_col), F.col("label").alias("cluster_id"))
