"""Product quantization (PQ) — the codebook ANN compression missing
between int8 scalar quantization and IVF routing (Jégou, Douze &
Schmid 2011, "Product Quantization for Nearest Neighbor Search" —
public; the core of FAISS's IVFPQ indexes).

The embedding space is split into ``m`` orthogonal SUBSPACES of
``d/m`` dims; each subspace gets its own ``ks``-centroid codebook
(k-means per subspace), and a vector is stored as ``m`` small code
ids — 8 bytes for a 64-dim float vector here, a 32x compression.
Search uses ASYMMETRIC DISTANCE COMPUTATION (ADC): the query is NOT
quantized — per subspace, its distance to each of the ``ks``
centroids is precomputed into an m x ks lookup table, and a stored
vector's approximate distance is the sum of m table lookups on its
codes. No vector arithmetic at scan time at all.

Scale shape, mapped to Spark:
- TRAINING is m independent k-means runs, fused into ONE corpus scan
  per Lloyd step: all m x ks fixed-point sub-distance expressions
  evaluate per row inside the same projection (argmin per subspace via
  array_min over (dist, k) structs — the operators/kmeans.py pattern),
  and the centroid update is one (subspace, code, pos) groupBy whose
  output is m*ks*(d/m) = d*ks rows, driver-bounded by contract.
- ENCODING is the same map-side argmin — codes are an m-length int
  array column, no shuffle.
- ADC SEARCH bakes the m x ks lookup table into the plan as literals
  (computed driver-side from the query vector and the codebooks, a
  few hundred doubles) and folds codes through it with one
  F.aggregate — a narrow projection feeding TakeOrderedAndProject.

Cross-engine exactness: identical fixed-point arithmetic to
operators/kmeans.py — distances are order-invariant long sums of
``floor((x-c)^2 * 1e12 + 0.5)`` per dimension, centroid means are
``(sum(floor(x*1e9+0.5))/n)/1e9`` — so DuckDB replays training,
encoding AND the ADC scan bit-for-bit. The oracle avoids unrolling
the m subspaces by joining on ``sub = pos // (d/m)`` as a relation
dimension (catalog/similarity_queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.kmeans import (
    _DIST_SCALE,
    _MEAN_SCALE,
    _dist_fp,
)


def _assign_codes(
    emb: DataFrame, codebooks: list[list[list[float]]]
) -> DataFrame:
    """One scan: per subspace, argmin over ks fixed-point distances
    (ties to the lowest code id). Returns (vec_id, embedding, codes
    array<int>, dists_fp array<long>)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    e = F.col("embedding").cast("array<double>")
    bests = []
    for j, cb in enumerate(codebooks):
        sub = F.slice(e, j * dsub + 1, dsub)
        cand = F.array(
            *[
                F.struct(_dist_fp(sub, c).alias("d"), F.lit(k).alias("k"))
                for k, c in enumerate(cb)
            ]
        )
        bests.append(F.array_min(cand).alias(f"_b{j}"))
    tmp = emb.select("vec_id", "embedding", *bests)
    return tmp.select(
        "vec_id",
        "embedding",
        F.array(*[F.col(f"_b{j}.k") for j in range(m)]).alias("codes"),
        F.array(*[F.col(f"_b{j}.d") for j in range(m)]).alias("dists_fp"),
    )


def _update_codebooks(
    assigned: DataFrame, prev: list[list[list[float]]]
) -> list[list[list[float]]]:
    """Fixed-point centroid means per (subspace, code, position-in-
    subspace) via one groupBy; d*ks rows collected (bounded). Empty
    codes keep their previous centroid."""
    m = len(prev)
    dsub = len(prev[0][0])
    ex = assigned.select(
        "codes",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "v"
        ),
    ).select(
        (F.col("pos") / dsub).cast("int").alias("sub"),
        F.pmod(F.col("pos"), F.lit(dsub)).cast("int").alias("spos"),
        F.element_at(
            F.col("codes"), (F.col("pos") / dsub).cast("int") + 1
        ).alias("code"),
        "v",
    )
    rows = (
        ex.groupBy("sub", "code", "spos")
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
    out = [[list(c) for c in cb] for cb in prev]
    for r in rows:
        out[r["sub"]][r["code"]][r["spos"]] = (
            float(r["s"]) / float(r["n"])
        ) / _MEAN_SCALE
    return out


def train_pq(
    emb: DataFrame, m: int = 8, ks: int = 8, iters: int = 2
) -> list[list[list[float]]]:
    """Train the m per-subspace codebooks from deterministic seeds
    (subspace j of vec_id 0..ks-1). ``iters`` COUNTS THE SEEDING PASS
    (ADVICE r7): the loop runs ``n_updates = iters - 1`` fused Lloyd
    updates, so ``iters=2`` (the catalog default, what every oracle
    replays as seed -> one update) performs exactly one update and
    ``iters=1`` returns the raw seeds. Pure function of the table —
    the oracle replays it."""
    n_updates = iters - 1  # the seeding pass is iteration 1
    seeds = (
        emb.filter(F.col("vec_id") < ks)
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
        .collect()
    )
    if len(seeds) < ks:
        raise ValueError(f"need vec_id 0..{ks - 1} present for seeding")
    d = len(seeds[0]["e"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    by_id = {r["vec_id"]: [float(x) for x in r["e"]] for r in seeds}
    books = [
        [by_id[k][j * dsub : (j + 1) * dsub] for k in range(ks)]
        for j in range(m)
    ]
    for _ in range(n_updates):
        assigned = _assign_codes(emb, books)
        books = _update_codebooks(assigned, books)
    return books


def pq_encode(emb: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """(vec_id, codes array<int>): the stored PQ representation."""
    return _assign_codes(emb, books).select("vec_id", "codes")


def adc_table(
    query_vec: list[float], books: list[list[list[float]]]
) -> list[list[int]]:
    """The m x ks ADC lookup table: fixed-point squared-L2 distance
    from the UNQUANTIZED query's subvector j to centroid (j, k) —
    same per-dimension floor-and-sum arithmetic as the plan
    expressions, so Python, Spark and DuckDB agree bit-for-bit."""
    m = len(books)
    dsub = len(books[0][0])
    table: list[list[int]] = []
    for j in range(m):
        q = query_vec[j * dsub : (j + 1) * dsub]
        row = []
        for c in books[j]:
            import math

            row.append(
                sum(
                    int(
                        math.floor(
                            (q[i] - c[i]) * (q[i] - c[i]) * _DIST_SCALE + 0.5
                        )
                    )
                    for i in range(dsub)
                )
            )
        table.append(row)
    return table


def pq_topk(
    emb: DataFrame,
    books: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    exclude_id: int | None = None,
) -> DataFrame:
    """ADC top-k: codes fold through the literal m x ks lookup table
    (one F.aggregate over the subspace indices — no vector arithmetic,
    no join, no shuffle), then TakeOrderedAndProject keeps k rows per
    partition. Returns (vec_id, adc_dist_fp)."""
    m = len(books)
    table = adc_table(query_vec, books)
    tbl = F.array(
        *[
            F.array(*[F.lit(int(v)).cast("long") for v in row])
            for row in table
        ]
    )
    codes = pq_encode(emb, books)
    if exclude_id is not None:
        codes = codes.filter(F.col("vec_id") != exclude_id)
    scored = codes.select(
        "vec_id",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.element_at(
                F.element_at(tbl, j + 1),
                F.element_at(F.col("codes"), j + 1) + 1,
            ),
        ).alias("adc_dist_fp"),
    )
    return scored.orderBy(F.asc("adc_dist_fp"), F.asc("vec_id")).limit(k)
