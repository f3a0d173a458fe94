"""SemDeDup — semantic deduplication via embedding clusters.

Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
through semantic deduplication" (public): exact/MinHash dedup misses
SEMANTIC duplicates (paraphrases, re-renders, boilerplate variants);
SemDeDup k-means-clusters the embedding space, computes pairwise
cosine only WITHIN each cluster, and prunes one side of every pair
above a similarity threshold — keeping, per the paper, the example
FARTHEST from its cluster centroid (maximizing retained diversity).

Composition here is entirely existing machinery:

- cluster assignment is :func:`kmeans.kmeans_assign` (deterministic
  seeds, fixed-point Lloyd — the catalog oracle replays it in SQL);
- within-cluster pairwise cosine uses the double-fold dot idiom of
  similarity.py (F.aggregate == DuckDB list_reduce, bit-identical
  fold shape);
- the prune rule is a single EXISTS-style semi-join, no iteration:
  v is REMOVED iff some u in v's cluster has cos(u, v) >= threshold
  and u is strictly farther from the centroid (ties by smaller
  vec_id). Greedy pairwise domination — every non-maximal member of
  a near-dup pair drops, the farthest-from-centroid survivor stays,
  which is the paper's keeper choice made deterministic by the
  integer dist_fp that kmeans_assign already emits.

Scale: the whole point of the clustering stage is that pair work is
quadratic only within a cluster; the paper runs K proportional to
corpus size (they use 50k clusters for LAION) so expected cluster
size — and thus per-cluster pair cost — stays constant as the corpus
grows. The join is cluster-key-partitioned (one shuffle on the
cluster id); nothing driver-side exceeds the K x D centroid contract
inherited from kmeans_assign.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.kmeans import kmeans_assign
from stripe_data_pipeline_spark.operators.similarity import _as_double


def semdedup_flags(
    emb: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.3,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """(vec_id, cluster, kept) for every vector: kept = False iff a
    same-cluster vector above ``threshold`` cosine dominates it
    (farther from the centroid, ties to the smaller vec_id).

    ``threshold`` compares plain double cosines — both engines
    evaluate the identical fold expression, so the comparison is
    bit-deterministic (the cosine_near_dup_pairs contract).

    Pass ``centroids`` (from :func:`kmeans.kmeans_train`, cached per
    corpus) to skip in-flight Lloyd training — the build-artifact
    shape; ``k``/``iters`` then only describe how they were trained.
    """
    if centroids is None:
        assigned = kmeans_assign(emb, k=k, iters=iters)
    else:
        from stripe_data_pipeline_spark.operators.kmeans import (
            assign_clusters,
        )

        assigned = assign_clusters(emb, centroids)
    assigned = assigned.select("vec_id", "cluster", "dist_fp")
    e = _as_double(F.col("embedding"))
    base = emb.select("vec_id", e.alias("e")).join(assigned, "vec_id")

    # r14 optimization (guide §4.2 "hand whole batches to vectorized
    # native code"): the within-cluster domination used to be a JVM
    # self-join — base shuffled on the cluster key TWICE, every
    # candidate pair evaluating an INTERPRETED 64-term F.aggregate
    # fold (higher-order functions don't enter whole-stage codegen),
    # then a distinct + left join back. It is now ONE shuffle
    # (groupBy cluster) into an Arrow applyInPandas that reproduces
    # the exact IEEE sequence vectorized over the pair matrix:
    # the left-fold dot ((0 + a1*b1) + a2*b2) + ... is accumulated
    # DIMENSION BY DIMENSION (acc = acc + outer(x_i, x_i)), so every
    # pair's value is the same double sequence the fold produced;
    # nrm = sqrt(diag) is the same _norm(e) = sqrt(fold(e,e)); the
    # cosine is dot / (na * nb) with the identical operation order.
    # Bit-identical output pinned against the oracle replay and in
    # tests/test_round9_ops.py. Scale shape unchanged: pair work
    # stays confined to a cluster, and the paper's K ~ corpus-size
    # contract bounds the per-group matrix.
    thr = float(threshold)
    id_field = emb.schema["vec_id"].dataType.simpleString()

    def _flags(pdf):
        import numpy as np
        import pandas as pd

        x = np.stack(
            [np.asarray(v, dtype=np.float64) for v in pdf["e"]]
        )
        ids = pdf["vec_id"].to_numpy()
        dist = pdf["dist_fp"].to_numpy()
        n, d = x.shape
        acc = np.zeros((n, n), dtype=np.float64)
        for i in range(d):
            acc = acc + np.multiply.outer(x[:, i], x[:, i])
        nrm = np.sqrt(np.diagonal(acc))
        cos = acc / np.multiply.outer(nrm, nrm)
        dominates = (dist[:, None] > dist[None, :]) | (
            (dist[:, None] == dist[None, :]) & (ids[:, None] < ids[None, :])
        )
        dominated = np.any(dominates & (cos >= thr), axis=0)
        return pd.DataFrame(
            {
                "vec_id": ids,
                "cluster": pdf["cluster"],
                "kept": ~dominated,
            }
        )

    return base.groupBy("cluster").applyInPandas(
        _flags, schema=f"vec_id {id_field}, cluster int, kept boolean"
    )
