"""Distributed k-means vs a pure-numpy reference with identical
fixed-point arithmetic: per-vector assignments (not just the catalog
check's aggregates) must match exactly, Lloyd iterations must not
increase the exact integer inertia, and seeding must fail loudly when
the seed ids are absent."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.io import read_table
from stripe_data_pipeline_spark.operators.kmeans import (
    kmeans_assign,
    update_centroids,
    assign_clusters,
)

K, ITERS = 8, 2


def reference_kmeans(vecs: dict[int, np.ndarray], k: int, iters: int):
    """Numpy replay of the engine's fixed-point Lloyd iterations."""
    cents = [vecs[i].astype(np.float64).copy() for i in range(k)]
    assign: dict[int, tuple[int, int]] = {}
    for it in range(iters):
        assign = {}
        for vid, v in vecs.items():
            dists = []
            for ki, c in enumerate(cents):
                d = v.astype(np.float64) - c
                terms = np.floor(d * d * 1e12 + 0.5).astype(np.int64)
                dists.append((int(terms.sum()), ki))
            assign[vid] = min(dists)
        if it < iters - 1:
            new = []
            for ki in range(k):
                members = [
                    vecs[vid]
                    for vid, (_, kk) in assign.items()
                    if kk == ki
                ]
                if not members:
                    new.append(cents[ki])
                    continue
                mat = np.stack(members).astype(np.float64)
                s = np.floor(mat * 1e9 + 0.5).astype(np.int64).sum(axis=0)
                new.append((s.astype(np.float64) / len(members)) / 1e9)
            cents = new
    return assign


def test_assignments_match_numpy_reference(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    vecs = {
        int(r["vec_id"]): np.array(r["embedding"], np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    want = reference_kmeans(vecs, K, ITERS)
    got = {
        int(r["vec_id"]): (int(r["dist_fp"]), int(r["cluster"]))
        for r in kmeans_assign(emb, k=K, iters=ITERS).collect()
    }
    assert got == want


def test_lloyd_iteration_never_increases_exact_inertia(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    seeds = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < K).collect()
    }
    cents = [seeds[i] for i in range(K)]
    a1 = assign_clusters(emb, cents)
    i1 = a1.agg(F.sum("dist_fp")).first()[0]
    cents2 = update_centroids(a1, cents)
    i2 = assign_clusters(emb, cents2).agg(F.sum("dist_fp")).first()[0]
    assert i2 <= i1  # Lloyd monotonicity (exact integers, no float fuzz)


def test_seeding_requires_seed_ids(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") >= 4
    )
    with pytest.raises(ValueError, match="vec_id 0..7"):
        kmeans_assign(emb, k=K, iters=1)
