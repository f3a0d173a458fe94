"""Similarity search over embedding columns (north-star).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  O(N·d) per query with no shuffle (TakeOrderedAndProject keeps only
  k rows per partition); right answer at any scale, linear cost.
- ``ivf_topk``: inverted-file ANN — partition the corpus by a cluster
  id (here the ``label`` column stands in for a trained coarse
  quantizer), rank centroids against the query, probe only the best
  ``nprobe`` partitions. At 100 TB this is the scale path: the probe
  reads ``nprobe/K`` of the data, and with the corpus bucketed/
  partitioned by cluster id the scan prunes to those files only.

Determinism: dot products fold left-to-right via ``F.aggregate``
(matching DuckDB ``list_reduce``); centroid components aggregate
scaled integers so grouped sums are order-independent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1e9  # centroid fixed-point scale
PROD_SCALE = 1e12  # centroid-dot fixed-point scale


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product: ((0 + a1*b1) + a2*b2) + ... — the same
    association order as the oracle's list_reduce."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def query_vector(df: DataFrame, vec_id: int) -> list[float]:
    """Resolve a query vector driver-side (tiny, one row)."""
    row = df.filter(F.col("vec_id") == vec_id).select("embedding").first()
    return [float(x) for x in row[0]]


def _lit_vec(vec: list[float]) -> Column:
    return F.array(*[F.lit(float(v)).cast("double") for v in vec])


def cosine_topk(
    df: DataFrame, vec: list[float], k: int = 10, exclude_id: int | None = None
) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    Repartitioned first: the O(N·d) scoring must spread across cores
    even when the corpus scans as one small file; TakeOrdered then
    keeps only k rows per partition.
    """
    df = df.repartition(df.sparkSession.sparkContext.defaultParallelism)
    q = _lit_vec(vec)
    emb = _as_double(F.col("embedding"))
    cos = _dot(emb, q) / (_norm(emb) * _norm(q))
    out = df.select(F.col("vec_id"), cos.alias("cosine_sim"))
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return out.orderBy(F.desc("cosine_sim"), "vec_id").limit(k)


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.3,
    block_col: str = "label",
    max_block: int = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, blocked by ``block_col``
    (the coarse cluster id — pairs across clusters can't be near-dups
    by construction of the quantizer).

    Per-block pair work is quadratic, so blocks larger than
    ``max_block`` are dropped entirely — the same hot-block guard as
    ``dedup.jaccard_candidate_pairs``'s ``max_block`` and LSH's
    ``max_bucket``. One hot cluster label at corpus scale would
    otherwise be an uncapped O(B²) self-join; when a corpus overflows
    the cap, re-quantize with more centroids (finer blocks) or band on
    quantized embedding prefixes — don't raise the cap.

    Norms are precomputed per row so the pair stage evaluates exactly
    one dot product; the repartition barrier before the threshold
    filter keeps Catalyst from pushing the fold into the join
    condition (same lesson as dedup.jaccard_candidate_pairs).
    """
    emb = _as_double(F.col("embedding"))
    base = df.select(
        "vec_id", F.col(block_col).alias("blk"), emb.alias("e"), _norm(emb).alias("nrm")
    )
    block_sizes = base.groupBy("blk").agg(F.count(F.lit(1)).alias("block_n"))
    base = base.join(
        block_sizes.filter(F.col("block_n") <= max_block), ["blk"], "inner"
    ).drop("block_n")
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(parallelism).alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.blk") == F.col("b.blk")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    )
    stats = pairs.select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        _dot(F.col("a.e"), F.col("b.e")).alias("dot"),
        (F.col("a.nrm") * F.col("b.nrm")).alias("nn"),
    ).repartition(parallelism)
    return (
        stats.withColumn("cosine_sim", F.col("dot") / F.col("nn"))
        .filter(F.col("cosine_sim") >= threshold)
        .select("vec_a", "vec_b", "cosine_sim")
    )


def centroids(df: DataFrame) -> DataFrame:
    """Per-label centroids via order-independent fixed-point sums.

    posexplode -> groupBy(label, pos) -> scaled-integer mean. Output:
    (label, pos, c) with c the centroid component as double.
    """
    exploded = df.repartition(df.sparkSession.sparkContext.defaultParallelism).select(
        "label", F.posexplode(_as_double(F.col("embedding"))).alias("pos", "v")
    )
    return exploded.groupBy("label", "pos").agg(
        (
            (
                F.sum(F.floor(F.col("v") * F.lit(SCALE) + F.lit(0.5)).cast("bigint"))
                .cast("double")
                / F.count(F.lit(1)).cast("double")
            )
            / F.lit(SCALE)
        ).alias("c")
    )


def build_ivf_index(df: DataFrame, index_path: str) -> None:
    """IVF build step: train the coarse quantizer ONCE and persist the
    centroid table. At 100 TB the quantizer must be a precomputed
    artifact — recomputing centroids from a full-corpus posexplode on
    every query would scan everything the index exists to avoid. The
    centroid table is K×d rows (tiny, broadcastable); the big win is
    corpus-side: with the corpus bucketed/partitioned by label, a probe
    reads only ``nprobe/K`` of the data files."""
    centroids(df).write.mode("overwrite").parquet(index_path)


def ivf_topk_from_index(
    df: DataFrame,
    index_path: str,
    vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF probe step against a persisted centroid table (see
    :func:`build_ivf_index`): rank stored centroids vs the query,
    brute-force only the top ``nprobe`` labels."""
    cents = df.sparkSession.read.parquet(index_path)
    labels = _probe_labels(cents, vec, nprobe)
    return cosine_topk(df.filter(F.col("label").isin(labels)), vec, k, exclude_id)


def ivf_topk(
    df: DataFrame,
    vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    exclude_id: int | None = None,
) -> DataFrame:
    """IVF ANN with an in-flight quantizer: rank label-centroids by
    cosine to the query (via order-independent fixed-point dot), probe
    the top ``nprobe`` labels, brute-force within them.

    Trains the quantizer inline — fine for one-shot/ad-hoc use; for
    repeated queries use :func:`build_ivf_index` +
    :func:`ivf_topk_from_index` so the corpus is scanned only by the
    probe."""
    labels = _probe_labels(centroids(df), vec, nprobe)
    return cosine_topk(df.filter(F.col("label").isin(labels)), vec, k, exclude_id)


def _probe_labels(cents: DataFrame, vec: list[float], nprobe: int) -> list:
    """Rank centroids by cosine against the query; return the top
    ``nprobe`` labels (tiny driver-side list — K rows in, nprobe out)."""
    qcomp = [(i, float(v)) for i, v in enumerate(vec)]  # 0-based pos
    # centroid · query and ||centroid|| via scaled-int sums (order-free)
    q_map = F.create_map(
        *[x for i, v in qcomp for x in (F.lit(i), F.lit(v).cast("double"))]
    )
    scored = cents.withColumn("qv", q_map[F.col("pos")]).groupBy("label").agg(
        (
            F.sum(
                F.floor(
                    F.col("c") * F.col("qv") * F.lit(PROD_SCALE) + F.lit(0.5)
                ).cast("bigint")
            ).cast("double")
            / F.lit(PROD_SCALE)
        ).alias("dot_cq"),
        (
            F.sum(
                F.floor(
                    F.col("c") * F.col("c") * F.lit(PROD_SCALE) + F.lit(0.5)
                ).cast("bigint")
            ).cast("double")
            / F.lit(PROD_SCALE)
        ).alias("sq_c"),
    )
    scored = scored.withColumn(
        "centroid_score", F.col("dot_cq") / F.sqrt(F.col("sq_c"))
    )
    return [
        r["label"]
        for r in scored.orderBy(F.desc("centroid_score"), "label")
        .limit(nprobe)
        .collect()
    ]
