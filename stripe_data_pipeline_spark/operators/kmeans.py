"""Distributed k-means (Lloyd's algorithm) over the embeddings table —
the clustering step a training-data pipeline uses for diversity
sampling, semantic sharding and IVF index building (Lloyd 1982,
public; the reference has no clustering, this is north-star surface).

Scale shape: each Lloyd iteration is (1) a map-side assignment — K
fixed-point distance expressions evaluated per row inside whole-stage
codegen, argmin via ``array_min`` over (dist, k) structs, NO shuffle —
and (2) a centroid update: one partial-combined groupBy on
(cluster, pos) whose output is K x D rows, collected to the driver
(bounded: 8 x 64 here; a 100k x 4096 config would move the update to
a second groupBy + broadcast join rather than a collect, same plan
shape). The corpus is scanned once per iteration and never shuffled.

Cross-engine exactness (the oracle story): floating sums are
order-dependent, so every aggregate is computed in FIXED POINT —
distances as ``SUM(floor((x-c)^2 * 1e12 + 0.5))`` over per-dimension
long terms, centroid means as ``(SUM(floor(x * 1e9 + 0.5)) / n) /
1e9`` — integer sums are permutation-invariant, so Spark and DuckDB
agree bit-for-bit (the label_centroids_applyinpandas trick, applied
to the whole iteration). Argmin ties break on the lowest cluster id.
Empty clusters keep their previous centroid (deterministic, mirrored
in the oracle's COALESCE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DIST_SCALE = 1e12
_MEAN_SCALE = 1e9


def _dist_fp(emb_col, centroid: list[float]):
    """Fixed-point squared-L2 distance: per-dimension floor to long,
    then an order-invariant long sum (one codegen'd expression)."""
    arr = F.array(*[F.lit(float(c)) for c in centroid])
    terms = F.zip_with(
        emb_col,
        arr,
        lambda a, b: F.floor(
            (a - b) * (a - b) * F.lit(_DIST_SCALE) + F.lit(0.5)
        ).cast("long"),
    )
    return F.aggregate(
        terms, F.lit(0).cast("long"), lambda acc, x: acc + x
    )


def assign_clusters(
    emb: DataFrame, centroids: list[list[float]]
) -> DataFrame:
    """Map-side assignment: argmin over K fixed-point distances,
    ties to the lowest cluster id (struct ordering of (dist, k))."""
    cand = F.array(
        *[
            F.struct(
                _dist_fp(F.col("_e"), c).alias("d"),
                F.lit(k).alias("k"),
            )
            for k, c in enumerate(centroids)
        ]
    )
    return (
        emb.withColumn("_e", F.col("embedding").cast("array<double>"))
        .withColumn("_best", F.array_min(cand))
        .select(
            "vec_id",
            "label",
            "embedding",
            F.col("_best.k").alias("cluster"),
            F.col("_best.d").alias("dist_fp"),
        )
    )


def update_centroids(
    assigned: DataFrame, prev: list[list[float]]
) -> list[list[float]]:
    """Fixed-point centroid means via one (cluster, pos) groupBy;
    the K x D result is driver-bounded by contract. Empty clusters
    carry the previous centroid forward."""
    ex = assigned.select(
        "cluster",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "v"
        ),
    )
    rows = (
        ex.groupBy("cluster", "pos")
        .agg(
            F.sum(
                F.floor(F.col("v") * F.lit(_MEAN_SCALE) + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    cents = [list(c) for c in prev]
    for r in rows:
        cents[r["cluster"]][r["pos"]] = (
            float(r["s"]) / float(r["n"])
        ) / _MEAN_SCALE
    return cents


def kmeans_assign(
    emb: DataFrame, k: int = 8, iters: int = 2
) -> DataFrame:
    """Run ``iters`` Lloyd iterations from deterministic seeds (the
    embeddings of vec_id 0..k-1, in vec_id order) and return the final
    assignment (vec_id, label, cluster, dist_fp). Pure function of the
    input table — reproducible on any engine that follows the same
    fixed-point arithmetic (the catalog oracle replays it in SQL)."""
    return assign_clusters(emb, kmeans_train(emb, k, iters)).drop(
        "embedding"
    )


def kmeans_train(
    emb: DataFrame, k: int = 8, iters: int = 2
) -> list[list[float]]:
    """The trained centroid list after ``iters`` Lloyd iterations
    (i.e. iters-1 mean updates — the final iteration is the
    assignment pass). K x D driver state by contract. Centroids are
    a per-corpus BUILD ARTIFACT like the IVF index / PQ codebooks /
    BPE merges: train once, reuse across every consumer (assignment,
    SemDeDup, profiling) — the catalog caches them per sf_dir."""
    seeds = (
        emb.filter(F.col("vec_id") < k)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .collect()
    )
    cents: list[list[float] | None] = [None] * k
    for r in seeds:
        cents[r["vec_id"]] = [float(x) for x in r["e"]]
    if any(c is None for c in cents):
        raise ValueError(f"need vec_id 0..{k - 1} present for seeding")
    for _ in range(iters - 1):
        cents = update_centroids(assign_clusters(emb, cents), cents)
    return cents
