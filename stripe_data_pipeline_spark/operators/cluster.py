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

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "doc_id",
    src_col: str = "doc_a",
    dst_col: str = "doc_b",
    max_iterations: int = 25,
    check_every: int = 1,
    jump_from: int = 3,
) -> DataFrame:
    """Returns (node_col, cluster_id): min reachable id per node.
    Singletons (no edges) keep their own id.

    r15 optimization round (guide §1.2/§5, VERDICT r14 #1): the
    convergence check no longer runs a separate count job per round —
    a ``pyspark.sql.Observation`` on the round's eager checkpoint
    accumulates the changed-row count INSIDE the job that already
    materializes the round, so the driver reads a metric that is
    free. ``check_every`` is kept for API compatibility but is now a
    no-op: with the metric riding the existing job there is nothing
    to space out, and the loop simply stops at the first round that
    changed nothing (extra rounds after convergence were label-stable
    no-ops before, so the fixpoint — and the result — is unchanged).
    """
    # undirected: materialize both directions once. r14 (guide §1.2
    # "don't compute things twice"): both orientations are emitted
    # from ONE pass via a 2-struct explode — the old unionByName put
    # the whole upstream EDGE-PRODUCING plan into the tree twice, so
    # callers whose edge builds are expensive (the blocked Jaccard
    # self-join of near_dup_quality_keepers, the LSH-verify pipeline
    # of lsh_quality_keepers) executed it twice before this
    # checkpoint. Same trick graph.label_propagation already uses.
    und = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col(src_col).alias("u"), F.col(dst_col).alias("v")
                    ),
                    F.struct(
                        F.col(dst_col).alias("u"), F.col(src_col).alias("v")
                    ),
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
        .distinct()
    )
    # r14 optimization round (guide §2.4 "two operations keyed the
    # same way can share one exchange"): every round joins und on
    # ``v``, but the distinct leaves it hash-partitioned on (u, v) —
    # so EVERY round re-shuffled the whole edge table. One re-key to
    # ``v`` before the checkpoint (DataFrame.localCheckpoint preserves
    # the output partitioning in the LogicalRDD) lets each round's
    # join reuse the layout and shuffle only the node-sized label
    # table.
    und = und.repartition(F.col("v")).localCheckpoint(eager=True)

    labels = nodes.select(
        F.col(node_col).alias("u"), F.col(node_col).alias("label")
    ).localCheckpoint(eager=True)

    for it in range(max_iterations):
        neighbor_min = (
            und.join(labels, und["v"] == labels["u"], "inner")
            .select(und["u"].alias("u"), F.col("label"))
            .groupBy("u")
            .agg(F.min("label").alias("nbr_label"))
        )
        prop = labels.join(neighbor_min, "u", "left").select(
            "u",
            F.col("label").alias("__old"),
            F.least(
                F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
            ).alias("label"),
        )
        # r14 optimization round: POINTER JUMP through the PREVIOUS
        # round's (checkpointed) label table — label(v) <- min(prop(v),
        # labels_prev(prop(v))). prop(v) is always a node id reachable
        # from v, and labels_prev of a reachable node is itself a
        # reachable node id, so the invariant (label = id of some
        # reachable node, monotonically decreasing) is untouched and
        # the fixpoint is the same component-min. What changes is the
        # ROUND COUNT: the reach composes with last round's reach, so
        # it grows ~2^k instead of k (measured on the sf0.1 jaccard
        # edge graph: 9 rounds -> 5 and 9.86 s -> 5.1 s end-to-end on
        # near_dup_quality_keepers). The extra join is labels-sized
        # (node count), orders cheaper than the und edge join, and
        # joining the CHECKPOINTED previous table (not prop to itself)
        # keeps the expensive edge join executing exactly once per
        # round. ``jump_from`` keeps the first rounds PLAIN: on
        # small-diameter graphs (the LSH near-dup graph converges in 2
        # rounds — measured) the jump join is pure overhead (A/B
        # +0.4 s on lsh_quality_keepers when jumping from round 1), so
        # it arms only once the graph has proven itself deeper than
        # the trivial case.
        if it + 1 >= jump_from:
            jmp = labels.select(
                F.col("u").alias("__j_u"), F.col("label").alias("__j_label")
            )
            prop = prop.join(
                jmp, prop["label"] == jmp["__j_u"], "left"
            ).select(
                "u",
                "__old",
                F.least(
                    F.col("label"),
                    F.coalesce(F.col("__j_label"), F.col("label")),
                ).alias("label"),
            )
        # convergence metric rides the checkpoint's own job (r15):
        # Observation aggregates task-side during the materialization,
        # so reading it costs nothing — no second count job per round.
        obs = Observation(f"cc_changed_{it}")
        new_labels = (
            prop.select(
                "u",
                "label",
                (F.col("label") < F.col("__old")).alias("__changed"),
            )
            .observe(
                obs,
                F.sum(F.col("__changed").cast("long")).alias("n_changed"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new_labels.drop("__changed")
        if int(obs.get["n_changed"] or 0) == 0:
            break

    return labels.select(F.col("u").alias(node_col), F.col("label").alias("cluster_id"))
