"""Similarity-search queries over the embeddings table (north-star).

The query vector is embeddings[vec_id=0]; Spark resolves it
driver-side into literal doubles, the oracle reads it via subquery —
both sides then run the identical left-fold dot-product tree
(F.aggregate == list_reduce), so cosines are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.catalog.registry import QUERIES, register
from stripe_data_pipeline_spark.io import read_table
from stripe_data_pipeline_spark.operators import similarity as S

_QID = 0

# dot(e, q) with the same fold shape as F.aggregate(zip_with(...)):
# ((0 + p1) + p2) + ... — list_reduce starts at p1, and 0.0 + p1 == p1.
_DOT = """list_reduce(
    list_transform(generate_series(1, len({a})), i ->
        CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)),
    (acc, v) -> acc + v)"""


def _dot_sql(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


_COSINE_SCORED = f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QID}),
scored AS (
    SELECT e.vec_id,
           {_dot_sql('e.embedding', 'q.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')})) AS cosine_sim
    FROM embeddings e, q
    WHERE e.vec_id <> {_QID}
)
"""


@register(
    "cosine_topk_bruteforce",
    oracle=_COSINE_SCORED
    + """
SELECT vec_id, cosine_sim
FROM scored
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
""",
    doc="Brute-force exact cosine top-k (the ANN correctness baseline): "
    "left-fold dot product via F.aggregate/zip_with, "
    "TakeOrderedAndProject top-k — no shuffle of the corpus.",
)
def q_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.query_vector(emb, _QID)
    return S.cosine_topk(emb, vec, k=10, exclude_id=_QID)


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
WITH raw_base AS (
    SELECT vec_id, label,
           embedding AS e,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM embeddings
),
blocks AS (
    SELECT label FROM raw_base GROUP BY label HAVING COUNT(*) <= 1000
),
base AS (
    SELECT raw_base.* FROM raw_base JOIN blocks USING (label)
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {_dot_sql('a.e', 'b.e')} / (a.nrm * b.nrm) AS cosine_sim
FROM base a
JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_dot_sql('a.e', 'b.e')} / (a.nrm * b.nrm) >= 3e-1
""",
    doc="Embedding-cosine near-dup pairs blocked by cluster id "
    "(north-star dedup family): per-row norms precomputed, one dot "
    "product per candidate pair; labels over the max_block cap are "
    "dropped (hot-block guard, mirrored in the oracle's HAVING).",
)
def q_embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return S.cosine_near_dup_pairs(emb, threshold=0.3)


@register(
    "hard_negatives_inbatch",
    oracle=f"""
WITH base AS (
    SELECT vec_id, label, embedding AS e,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm,
           vec_id // 50 AS batch
    FROM embeddings
),
pairs AS (
    SELECT a.vec_id, n.vec_id AS nid,
           {_dot_sql('a.e', 'n.e')} / (a.nrm * n.nrm) AS cos
    FROM base a JOIN base n
      ON a.batch = n.batch AND a.label <> n.label
)
SELECT vec_id, nid AS hard_negative_id, cos AS cosine_sim
FROM (
    SELECT vec_id, nid, cos,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, nid ASC) AS rn
    FROM pairs
) WHERE rn = 1
""",
    doc="In-batch hard-negative mining for contrastive training (the "
    "DPR/dual-encoder prep step): per anchor, the most-similar "
    "different-label vector within its deterministic id-div-50 "
    "batch, ties to the smallest id. Pair work is batch_size² per "
    "batch — linear in the corpus with the trainer's own batch-size "
    "constant, never the O(N²) corpus argmax. The argmax is one "
    "max(struct(cos, -id)) partial-combined aggregate (no per-"
    "anchor sort); both engines fold the dot product left-to-right "
    "so the doubles are bit-identical "
    "(operators/similarity.py::hard_negatives_inbatch).",
)
def q_hard_negatives_inbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return S.hard_negatives_inbatch(emb, batch_size=50)


@register(
    "label_centroids_applyinpandas",
    oracle="""
SELECT label, g.i - 1 AS pos,
       (CAST(SUM(CAST(FLOOR(CAST(embedding[g.i] AS DOUBLE) * 1e9 + 5e-1) AS BIGINT)) AS DOUBLE)
        / CAST(COUNT(*) AS DOUBLE)) / 1e9 AS centroid
FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
GROUP BY label, g.i - 1
""",
    doc="applyInPandas grouped operator (SURVEY.md §2.11): per-label "
    "embedding centroids computed in numpy — held to exact oracle "
    "parity via fixed-point integer sums (order-independent on both "
    "engines, so even the Python path is bit-checked).",
)
def q_label_centroids_applyinpandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    def centroid(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
        scaled = np.floor(mat * 1e9 + 0.5).astype(np.int64)
        cent = (scaled.sum(axis=0).astype(np.float64) / float(len(mat))) / 1e9
        return pd.DataFrame(
            {
                "label": pdf["label"].iloc[0],
                "pos": np.arange(mat.shape[1], dtype=np.int64),
                "centroid": cent,
            }
        )

    emb = read_table(spark, sf_dir, "embeddings")
    return emb.groupBy("label").applyInPandas(
        centroid, schema="label int, pos long, centroid double"
    )


_IVF_ORACLE = f"""
WITH exploded AS (
    SELECT label, g.i - 1 AS pos, CAST(embedding[g.i] AS DOUBLE) AS v
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
),
cents AS (
    SELECT label, pos,
           (CAST(SUM(CAST(FLOOR(v * 1e9 + 5e-1) AS BIGINT)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) / 1e9 AS c
    FROM exploded GROUP BY label, pos
),
q AS (
    SELECT g.i - 1 AS pos, CAST(qv.embedding[g.i] AS DOUBLE) AS qval
    FROM (SELECT embedding FROM embeddings WHERE vec_id = {_QID}) qv,
         UNNEST(generate_series(1, len(qv.embedding))) AS g(i)
),
scored_labels AS (
    SELECT c.label,
           CAST(SUM(CAST(FLOOR(c.c * q.qval * 1e12 + 5e-1) AS BIGINT)) AS DOUBLE)
               / 1e12 AS dot_cq,
           CAST(SUM(CAST(FLOOR(c.c * c.c * 1e12 + 5e-1) AS BIGINT)) AS DOUBLE)
               / 1e12 AS sq_c
    FROM cents c JOIN q ON c.pos = q.pos
    GROUP BY c.label
),
probe AS (
    SELECT label FROM scored_labels
    ORDER BY dot_cq / sqrt(sq_c) DESC, label
    LIMIT 2
),
qq AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QID}),
scored AS (
    SELECT e.vec_id,
           {_dot_sql('e.embedding', 'qq.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('qq.qv', 'qq.qv')})) AS cosine_sim
    FROM embeddings e, qq
    WHERE e.vec_id <> {_QID} AND e.label IN (SELECT label FROM probe)
)
SELECT vec_id, cosine_sim
FROM scored
ORDER BY cosine_sim DESC, vec_id
LIMIT 10
"""


@register(
    "ivf_topk",
    oracle=_IVF_ORACLE,
    doc="IVF approximate nearest neighbors: label column as coarse "
    "quantizer, fixed-point (order-independent) centroid means, probe "
    "top-2 centroids, brute-force within probed partitions. The 100 TB "
    "scale path — probes read nprobe/K of the corpus, and partitioning "
    "by cluster id turns that into file-level pruning.",
)
def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.query_vector(emb, _QID)
    return S.ivf_topk(emb, vec, k=10, nprobe=2, exclude_id=_QID)


# Session-scoped IVF index cache: sf_dir -> persisted centroid table.
# Keyed by sf_dir PATH only — stale if the embeddings under an sf_dir
# change mid-process (fine for the immutable driver test data). Dirs
# are removed at interpreter exit via atexit.
_IVF_INDEX_CACHE: dict[str, str] = {}


def _cleanup_ivf_cache() -> None:
    import shutil

    for p in _IVF_INDEX_CACHE.values():
        shutil.rmtree(p, ignore_errors=True)


@register(
    "ivf_topk_persisted",
    oracle=_IVF_ORACLE,
    doc="IVF probe against a PERSISTED quantizer (build_ivf_index + "
    "ivf_topk_from_index): centroids are trained once and written as a "
    "table; each query reads the K×d centroid artifact and only "
    "nprobe/K of the corpus — the production shape, where the "
    "quantizer is a precomputed artifact, not a per-query aggregation. "
    "Same oracle as ivf_topk: the persisted index must not change "
    "results.",
)
def q_ivf_topk_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import tempfile

    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.query_vector(emb, _QID)
    index_path = _IVF_INDEX_CACHE.get(sf_dir)
    if index_path is None:
        if not _IVF_INDEX_CACHE:
            atexit.register(_cleanup_ivf_cache)
        index_path = tempfile.mkdtemp(prefix="ivf_index_")
        S.build_ivf_index(emb, index_path)
        _IVF_INDEX_CACHE[sf_dir] = index_path
    return S.ivf_topk_from_index(
        emb, index_path, vec, k=10, nprobe=2, exclude_id=_QID
    )


def _srp_oracle(
    bands: int = 24,
    band_bits: int = 4,
    d: int = 64,
    max_bucket: int = 200,
    threshold: str = "3e-1",
) -> str:
    """DuckDB SQL replaying srp_lsh_near_dups BIT-FOR-BIT: the
    hyperplanes enter both engines from the same ``%.8g`` decimal
    strings (srp_plane_strs), dots fold in the same order, so sign
    bits, band keys, the hot-bucket cap, candidate pairs and the
    exact-cosine verify all reproduce. ``d`` is pinned to the testdata
    embedding dim (64 at every sf)."""
    planes = ",".join(
        "[" + ",".join(row) + "]"
        for row in S.srp_plane_strs(bands, band_bits, d)
    )
    n_planes = bands * band_bits
    return f"""
WITH base AS (
    SELECT vec_id, embedding AS e,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM embeddings
),
planes AS (
    SELECT t.j, ([{planes}])[t.j + 1] AS p
    FROM UNNEST(range(0, {n_planes})) AS t(j)
),
bits AS (
    SELECT b.vec_id, pl.j,
           CASE WHEN list_reduce(
                    list_transform(generate_series(1, len(b.e)), i ->
                        CAST(b.e[i] AS DOUBLE) * pl.p[i]),
                    (acc, v) -> acc + v) >= 0 THEN 1 ELSE 0 END AS bit
    FROM base b, planes pl
),
keys AS (
    SELECT vec_id, j // {band_bits} AS band,
           CAST(SUM(bit * (1 << (j % {band_bits}))) AS BIGINT) AS band_key
    FROM bits GROUP BY vec_id, j // {band_bits}
),
kept AS (
    SELECT band, band_key FROM keys
    GROUP BY band, band_key HAVING COUNT(*) <= {max_bucket}
),
bk AS (SELECT k.* FROM keys k JOIN kept USING (band, band_key)),
cand AS (
    SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM bk a
    JOIN bk b ON a.band = b.band AND a.band_key = b.band_key
             AND a.vec_id < b.vec_id
)
SELECT c.vec_a, c.vec_b,
       {_dot_sql('a.e', 'b.e')} / (a.nrm * b.nrm) AS cosine_sim
FROM cand c
JOIN base a ON a.vec_id = c.vec_a
JOIN base b ON b.vec_id = c.vec_b
WHERE {_dot_sql('a.e', 'b.e')} / (a.nrm * b.nrm) >= {threshold}
"""


@register(
    "embedding_lsh_near_dups",
    oracle=_srp_oracle(),
    doc="Hyperplane (signed-random-projection) LSH near-dup over "
    "embeddings — the label-free corpus-scale path the capped "
    "cosine_near_dup_pairs overflow route points at: band-key shuffle "
    "for candidates (quadratic only inside ≤200-row buckets, hot "
    "buckets dropped), exact cosine verify per distinct pair "
    "(precision 1 by construction). Exactly oracled (was rows-only; "
    "VERDICT r4 #2): the hyperplanes reach both engines as the same "
    "%.8g decimal literals, so signatures, buckets and verified pairs "
    "reproduce bit-for-bit in DuckDB. Recall/precision/subset-of-"
    "truth additionally pytest-gated against the exact all-pairs "
    "operator (tests/test_operators.py).",
)
def q_embedding_lsh_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    return S.srp_lsh_near_dups(emb, threshold=0.3).orderBy("vec_a", "vec_b")


@register(
    "quantized_topk",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QID}),
m AS (
    SELECT vec_id, embedding,
           list_max(list_transform(embedding,
                                   x -> abs(CAST(x AS DOUBLE)))) AS maxabs
    FROM embeddings
),
codes AS (
    SELECT vec_id,
           list_transform(embedding, x ->
               CASE WHEN maxabs = 0 THEN 0
                    ELSE CAST(FLOOR((CAST(x AS DOUBLE) * 1.27e2) / maxabs
                                    + 5e-1) AS INTEGER) END) AS c
    FROM m
),
approx AS (
    SELECT codes.vec_id,
           CASE WHEN sqrt({_dot_sql('codes.c', 'codes.c')}) = 0 THEN -2e0
                ELSE {_dot_sql('codes.c', 'q.qv')}
                     / (sqrt({_dot_sql('codes.c', 'codes.c')})
                        * sqrt({_dot_sql('q.qv', 'q.qv')})) END AS approx_sim
    FROM codes, q
    WHERE codes.vec_id <> {_QID}
),
cand AS (
    SELECT vec_id, approx_sim FROM approx
    ORDER BY approx_sim DESC, vec_id
    LIMIT 40
)
SELECT e.vec_id, cand.approx_sim,
       CASE WHEN sqrt({_dot_sql('e.embedding', 'e.embedding')}) = 0 THEN -2e0
            ELSE {_dot_sql('e.embedding', 'q.qv')}
                 / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
                    * sqrt({_dot_sql('q.qv', 'q.qv')})) END AS cosine_sim
FROM embeddings e JOIN cand ON e.vec_id = cand.vec_id, q
ORDER BY cosine_sim DESC, e.vec_id
LIMIT 10
""",
    doc="Asymmetric-distance top-k over symmetric int8 codes with "
    "exact refine: the candidate scan reads only the 4x-compressed "
    "integer codes (per-vector scale cancels in cosine, so no "
    "dequantization), TakeOrdered keeps refine*k=40 candidates, and "
    "the exact rescore touches full-precision vectors for those rows "
    "only (broadcast id set). Both stages bit-checked by the oracle.",
)
def q_quantized_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.query_vector(emb, _QID)
    return S.quantized_topk(emb, vec, k=10, refine=4, exclude_id=_QID)


@register(
    "semantic_dedup_keepers",
    oracle=f"""
WITH RECURSIVE raw_base AS (
    SELECT vec_id, label,
           embedding AS e,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM embeddings
),
blocks AS (
    SELECT label FROM raw_base GROUP BY label HAVING COUNT(*) <= 1000
),
base AS (
    SELECT raw_base.* FROM raw_base JOIN blocks USING (label)
),
edges AS (
    SELECT a.vec_id AS u, b.vec_id AS v
    FROM base a
    JOIN base b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_dot_sql('a.e', 'b.e')} / (a.nrm * b.nrm) >= 3e-1
),
und AS (
    SELECT u, v FROM edges UNION SELECT v, u FROM edges
),
reach(src, dst) AS (
    SELECT vec_id, vec_id FROM embeddings
    UNION
    SELECT r.src, e.v FROM reach r JOIN und e ON r.dst = e.u
)
SELECT src AS vec_id, MIN(dst) AS cluster_id,
       src = MIN(dst) AS is_keeper
FROM reach
GROUP BY src
""",
    doc="SemDeDup-style semantic dedup decision: embedding-cosine "
    "near-dup edges (capped label blocks) -> connected components "
    "(iterative min-label propagation) -> keep exactly the min-id "
    "vector per semantic cluster. The operator that turns pairwise "
    "embedding similarity into keep/drop decisions; oracle is a "
    "DuckDB recursive-CTE transitive closure over the same edges.",
)
def q_semantic_dedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.cluster import connected_components

    emb = read_table(spark, sf_dir, "embeddings")
    edges = S.cosine_near_dup_pairs(emb, threshold=0.3)
    cc = connected_components(
        emb.select("vec_id"), edges,
        node_col="vec_id", src_col="vec_a", dst_col="vec_b",
    )
    return cc.withColumn("is_keeper", F.col("vec_id") == F.col("cluster_id"))


@register(
    "semantic_split_leakage",
    oracle=f"""
WITH raw_base AS (
    SELECT vec_id, label,
           embedding AS e,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm,
           CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                AS BIGINT) % 100 AS b
    FROM embeddings
),
blocks AS (
    SELECT label FROM raw_base GROUP BY label HAVING COUNT(*) <= 1000
),
base AS (
    SELECT raw_base.* FROM raw_base JOIN blocks USING (label)
)
SELECT a.vec_id AS train_vec, b.vec_id AS heldout_vec,
       {_dot_sql('a.e', 'b.e')} / (a.nrm * b.nrm) AS cosine_sim
FROM base a
JOIN base b ON a.label = b.label AND a.vec_id <> b.vec_id
WHERE a.b < 80 AND b.b >= 80
  AND {_dot_sql('a.e', 'b.e')} / (a.nrm * b.nrm) >= 3e-1
""",
    doc="Semantic split-leakage audit: near-duplicate embedding pairs "
    "that CROSS the train/heldout hash split — the embedding-space "
    "analogue of heldout_contamination (an eval example semantically "
    "duplicated in train inflates benchmarks even when no n-gram "
    "matches). Composes the capped label-blocked cosine pairs with "
    "the deterministic md5 split; both directions asymmetric "
    "(train->heldout), linear outside the capped blocks.",
)
def q_semantic_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.sampling import hash_bucket

    emb = read_table(spark, sf_dir, "embeddings")
    pairs = S.cosine_near_dup_pairs(emb, threshold=0.3)
    buckets = emb.select(
        "vec_id", hash_bucket(F.col("vec_id"), 100).alias("__b")
    )
    train = buckets.filter(F.col("__b") < 80).select(
        F.col("vec_id").alias("__train_id")
    )
    heldout = buckets.filter(F.col("__b") >= 80).select(
        F.col("vec_id").alias("__held_id")
    )
    # pairs are emitted once with vec_a < vec_b; leakage is directional
    # (train side, heldout side), so check both orientations
    ab = (
        pairs.join(train, pairs.vec_a == train.__train_id)
        .join(heldout, pairs.vec_b == heldout.__held_id)
        .select(
            F.col("vec_a").alias("train_vec"),
            F.col("vec_b").alias("heldout_vec"),
            "cosine_sim",
        )
    )
    ba = (
        pairs.join(train, pairs.vec_b == train.__train_id)
        .join(heldout, pairs.vec_a == heldout.__held_id)
        .select(
            F.col("vec_b").alias("train_vec"),
            F.col("vec_a").alias("heldout_vec"),
            "cosine_sim",
        )
    )
    return ab.unionByName(ba)


_BATCH_QIDS = 8  # queries = vec_id < 8 (one per label-ish; small batch)

_BATCH_IVF_ORACLE = f"""
WITH exploded AS (
    SELECT label, g.i - 1 AS pos, CAST(embedding[g.i] AS DOUBLE) AS v
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
),
cents AS (
    SELECT label, pos,
           (CAST(SUM(CAST(FLOOR(v * 1e9 + 5e-1) AS BIGINT)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) / 1e9 AS c
    FROM exploded GROUP BY label, pos
),
q AS (
    SELECT vec_id AS query_id, g.i - 1 AS pos,
           CAST(embedding[g.i] AS DOUBLE) AS qval
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
    WHERE vec_id < {_BATCH_QIDS}
),
scored AS (
    SELECT q.query_id, c.label,
           CAST(SUM(CAST(FLOOR(c.c * q.qval * 1e12 + 5e-1) AS BIGINT)) AS DOUBLE)
               / 1e12 AS dot_cq,
           CAST(SUM(CAST(FLOOR(c.c * c.c * 1e12 + 5e-1) AS BIGINT)) AS DOUBLE)
               / 1e12 AS sq_c
    FROM cents c JOIN q USING (pos)
    GROUP BY q.query_id, c.label
),
probed AS (
    SELECT query_id, label FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id
            ORDER BY dot_cq / sqrt(sq_c) DESC, label
        ) AS rn FROM scored
    ) WHERE rn <= 2
),
qq AS (
    SELECT vec_id AS query_id, embedding AS qv FROM embeddings
    WHERE vec_id < {_BATCH_QIDS}
),
pairs AS (
    SELECT p.query_id, e.vec_id,
           {_dot_sql('e.embedding', 'qq.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('qq.qv', 'qq.qv')})) AS cosine_sim
    FROM probed p
    JOIN embeddings e ON e.label = p.label
    JOIN qq ON qq.query_id = p.query_id
    WHERE e.vec_id <> p.query_id
)
SELECT query_id, vec_id, cosine_sim FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cosine_sim DESC, vec_id
    ) AS rn FROM pairs
) WHERE rn <= 10
"""


@register(
    "batch_ivf_topk",
    oracle=_BATCH_IVF_ORACLE,
    doc="BATCHED IVF ANN — the production retrieval shape: 8 query "
    "vectors answered in ONE distributed plan with zero per-query "
    "driver round trips (probe selection is a window over per-(query,"
    "label) fixed-point centroid scores; candidates are the probe set "
    "equi-joined to the corpus on label, each query touching "
    "~nprobe/K of the data; exact cosine + per-query row_number "
    "top-k). Same fixed-point determinism as ivf_topk, so the whole "
    "multi-query pipeline bit-matches the oracle.",
)
def q_batch_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _BATCH_QIDS)
    return S.batch_ivf_topk(emb, queries, k=10, nprobe=2)


# Shared Lloyd replay (k=8, iters=2, vec_id<8 seeds): the exact
# fixed-point recurrence kmeans_assign runs, unrolled as CTEs ending
# at a2 = (vec_id, k, dist) — reused verbatim by every oracle that
# consumes kmeans clusters (kmeans_cluster_profile, semdedup_keepers).
_KMEANS_REPLAY = """
WITH ex AS (
    SELECT vec_id, label, g.i - 1 AS pos, CAST(embedding[g.i] AS DOUBLE) AS v
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
),
c0 AS (
    SELECT CAST(vec_id AS INT) AS k, pos, v AS c FROM ex WHERE vec_id < 8
),
d1 AS (
    SELECT e.vec_id, c.k,
           SUM(CAST(FLOOR((e.v - c.c) * (e.v - c.c) * 1e12 + 5e-1)
                    AS BIGINT)) AS dist
    FROM ex e JOIN c0 c ON e.pos = c.pos
    GROUP BY e.vec_id, c.k
),
a1 AS (
    SELECT vec_id, k FROM (
        SELECT vec_id, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
        FROM d1
    ) WHERE rn = 1
),
c1u AS (
    SELECT a.k, e.pos,
           (CAST(SUM(CAST(FLOOR(e.v * 1e9 + 5e-1) AS BIGINT)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) / 1e9 AS c
    FROM a1 a JOIN ex e ON e.vec_id = a.vec_id
    GROUP BY a.k, e.pos
),
c1 AS (
    SELECT c0.k, c0.pos, COALESCE(c1u.c, c0.c) AS c
    FROM c0 LEFT JOIN c1u ON c0.k = c1u.k AND c0.pos = c1u.pos
),
d2 AS (
    SELECT e.vec_id, c.k,
           SUM(CAST(FLOOR((e.v - c.c) * (e.v - c.c) * 1e12 + 5e-1)
                    AS BIGINT)) AS dist
    FROM ex e JOIN c1 c ON e.pos = c.pos
    GROUP BY e.vec_id, c.k
),
a2 AS (
    SELECT vec_id, k, dist FROM (
        SELECT vec_id, k, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, k) AS rn
        FROM d2
    ) WHERE rn = 1
)
"""


# Trained kmeans centroids are a build artifact (like the IVF index,
# PQ codebooks and BPE merges): train once per corpus dir, reuse
# across every consumer (cluster profile, SemDeDup).
_KMEANS_CENT_CACHE: dict[str, list] = {}


def _kmeans_cents(spark: SparkSession, sf_dir: str) -> list:
    from stripe_data_pipeline_spark.operators.kmeans import kmeans_train

    cents = _KMEANS_CENT_CACHE.get(sf_dir)
    if cents is None:
        cents = kmeans_train(
            read_table(spark, sf_dir, "embeddings"), k=8, iters=2
        )
        _KMEANS_CENT_CACHE[sf_dir] = cents
    return cents


@register(
    "kmeans_cluster_profile",
    oracle=_KMEANS_REPLAY
    + """
SELECT a2.k AS cluster,
       COUNT(*) AS n_vecs,
       CAST(SUM(a2.dist) AS BIGINT) AS inertia_fp,
       COUNT(DISTINCT e.label) AS n_labels
FROM a2 JOIN (SELECT DISTINCT vec_id, label FROM embeddings) e
     USING (vec_id)
GROUP BY a2.k
""",
    doc="Distributed k-means (Lloyd's algorithm, 2 iterations, "
    "deterministic vec_id<8 seeds) — the clustering operator a "
    "training-data pipeline uses for diversity sampling and IVF index "
    "building. Each iteration is a map-side argmin over K codegen'd "
    "FIXED-POINT distance expressions (no shuffle) plus one "
    "(cluster,pos) groupBy whose K x D output is driver-bounded; the "
    "corpus is scanned once per iteration and never shuffled. Every "
    "aggregate is an order-invariant integer sum (floor(x*scale+0.5) "
    "terms), so the oracle REPLAYS both whole iterations in SQL — "
    "assignment argmins, fixed-point centroid means, empty-cluster "
    "carryover — and per-cluster sizes, exact integer inertia and "
    "label spreads must match bit-for-bit (operators/kmeans.py).",
)
def q_kmeans_cluster_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.kmeans import assign_clusters

    emb = read_table(spark, sf_dir, "embeddings")
    return (
        assign_clusters(emb, _kmeans_cents(spark, sf_dir))
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("dist_fp").cast("long").alias("inertia_fp"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (r7): codebook compression + ADC search
# ---------------------------------------------------------------------------

# Trained codebooks are a build artifact (like the IVF index and the
# BPE merges): train once per corpus dir, reuse across the PQ queries.
_PQ_BOOKS_CACHE: dict[str, list] = {}


def _pq_books(spark: SparkSession, sf_dir: str) -> list:
    from stripe_data_pipeline_spark.operators.pq import train_pq

    books = _PQ_BOOKS_CACHE.get(sf_dir)
    if books is None:
        emb = read_table(spark, sf_dir, "embeddings")
        books = train_pq(emb, m=8, ks=8, iters=2)
        _PQ_BOOKS_CACHE[sf_dir] = books
    return books


# Shared training replay: m=8 subspaces of 8 dims over the 64-dim
# embeddings, ks=8 codes per subspace, seeds = vec_id 0..7, one
# fixed-point Lloyd update — the kmeans_cluster_profile oracle's
# arithmetic with ``sub = pos // 8`` joined as a RELATION DIMENSION,
# so the m subspaces never unroll into m copies of the SQL.
_PQ_TRAIN_SQL = """
WITH ex AS (
    SELECT vec_id, g.i - 1 AS pos, CAST(embedding[g.i] AS DOUBLE) AS v
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
),
sx AS (
    SELECT vec_id, pos // 8 AS sub, pos % 8 AS spos, v FROM ex
),
c0 AS (
    SELECT CAST(vec_id AS INT) AS k, sub, spos, v AS c
    FROM sx WHERE vec_id < 8
),
d1 AS (
    SELECT e.vec_id, e.sub, c.k,
           SUM(CAST(FLOOR((e.v - c.c) * (e.v - c.c) * 1e12 + 5e-1)
                    AS BIGINT)) AS dist
    FROM sx e JOIN c0 c ON e.sub = c.sub AND e.spos = c.spos
    GROUP BY e.vec_id, e.sub, c.k
),
a1 AS (
    SELECT vec_id, sub, k FROM (
        SELECT vec_id, sub, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, k) AS rn
        FROM d1
    ) WHERE rn = 1
),
c1u AS (
    SELECT a.sub, a.k, e.spos,
           (CAST(SUM(CAST(FLOOR(e.v * 1e9 + 5e-1) AS BIGINT)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) / 1e9 AS c
    FROM a1 a JOIN sx e ON e.vec_id = a.vec_id AND e.sub = a.sub
    GROUP BY a.sub, a.k, e.spos
),
c1 AS (
    SELECT c0.sub, c0.k, c0.spos, COALESCE(c1u.c, c0.c) AS c
    FROM c0 LEFT JOIN c1u
      ON c0.sub = c1u.sub AND c0.k = c1u.k AND c0.spos = c1u.spos
),
d2 AS (
    SELECT e.vec_id, e.sub, c.k,
           SUM(CAST(FLOOR((e.v - c.c) * (e.v - c.c) * 1e12 + 5e-1)
                    AS BIGINT)) AS dist
    FROM sx e JOIN c1 c ON e.sub = c.sub AND e.spos = c.spos
    GROUP BY e.vec_id, e.sub, c.k
),
a2 AS (
    SELECT vec_id, sub, k, dist FROM (
        SELECT vec_id, sub, k, dist,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, k) AS rn
        FROM d2
    ) WHERE rn = 1
)
"""


@register(
    "pq_codes_profile",
    oracle=_PQ_TRAIN_SQL
    + """
SELECT CAST(a2.sub AS INT) AS sub, CAST(a2.k AS INT) AS code,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(a2.dist) AS BIGINT) AS qerr_fp
FROM a2 GROUP BY a2.sub, a2.k
""",
    doc="PRODUCT QUANTIZATION training + encode (Jegou et al. 2011, "
    "the FAISS IVFPQ core — operators/pq.py): 64-dim embeddings "
    "split into 8 subspaces of 8 dims, each with an 8-centroid "
    "codebook (per-subspace k-means, deterministic vec_id<8 seeds, "
    "one fixed-point Lloyd update), vectors stored as 8 code ids — "
    "32x compression. Training fuses all m=8 k-means runs into ONE "
    "scan per Lloyd step (64 codegen'd sub-distance argmins per "
    "row); the centroid update is one (sub, code, spos) groupBy "
    "with a d*ks-row bounded collect. This check profiles the "
    "encoded corpus per (subspace, code): member counts + exact "
    "integer quantization error, bit-matched to the oracle's "
    "relation-dimension replay of the whole train+encode.",
)
def q_pq_codes_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.pq import _assign_codes

    emb = read_table(spark, sf_dir, "embeddings")
    enc = _assign_codes(emb, _pq_books(spark, sf_dir))
    z = enc.select(
        F.posexplode(F.arrays_zip("codes", "dists_fp")).alias("sub", "z")
    )
    return z.groupBy(
        F.col("sub").cast("int").alias("sub"),
        F.col("z.codes").cast("int").alias("code"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
        F.sum("z.dists_fp").cast("bigint").alias("qerr_fp"),
    )


@register(
    "pq_adc_topk",
    oracle=_PQ_TRAIN_SQL
    + """,
qsub AS (
    SELECT sub, spos, v FROM sx WHERE vec_id = 0
),
adc AS (
    SELECT c.sub, c.k,
           SUM(CAST(FLOOR((q.v - c.c) * (q.v - c.c) * 1e12 + 5e-1)
                    AS BIGINT)) AS d
    FROM c1 c JOIN qsub q ON c.sub = q.sub AND c.spos = q.spos
    GROUP BY c.sub, c.k
)
SELECT a2.vec_id, CAST(SUM(adc.d) AS BIGINT) AS adc_dist_fp
FROM a2 JOIN adc ON a2.sub = adc.sub AND a2.k = adc.k
WHERE a2.vec_id <> 0
GROUP BY a2.vec_id
ORDER BY adc_dist_fp, vec_id
LIMIT 10
""",
    doc="PQ ASYMMETRIC DISTANCE top-k (the search half of product "
    "quantization): the query stays UNQUANTIZED — its fixed-point "
    "distance to every (subspace, code) centroid is precomputed "
    "into an 8x8 lookup table baked into the plan as literals, and "
    "each stored vector's approximate distance is m table lookups "
    "folded over its code array with one F.aggregate. No vector "
    "arithmetic, no join, no shuffle at scan time; "
    "TakeOrderedAndProject keeps k rows per partition. Ties break "
    "on vec_id; the oracle recomputes the table from its replayed "
    "codebooks and must produce the identical top-10 — any drift "
    "in training, encoding or the ADC fold breaks parity.",
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.pq import pq_topk

    emb = read_table(spark, sf_dir, "embeddings")
    books = _pq_books(spark, sf_dir)
    qv = S.query_vector(emb, _QID)
    return pq_topk(emb, books, qv, k=10, exclude_id=_QID)


@register(
    "ivfpq_topk",
    oracle=_PQ_TRAIN_SQL
    + f""",
lex AS (
    SELECT label, g.i - 1 AS pos, CAST(embedding[g.i] AS DOUBLE) AS v
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
),
lcents AS (
    SELECT label, pos,
           (CAST(SUM(CAST(FLOOR(v * 1e9 + 5e-1) AS BIGINT)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) / 1e9 AS c
    FROM lex GROUP BY label, pos
),
lq AS (
    SELECT g.i - 1 AS pos, CAST(qv.embedding[g.i] AS DOUBLE) AS qval
    FROM (SELECT embedding FROM embeddings WHERE vec_id = {_QID}) qv,
         UNNEST(generate_series(1, len(qv.embedding))) AS g(i)
),
lscored AS (
    SELECT c.label,
           CAST(SUM(CAST(FLOOR(c.c * q.qval * 1e12 + 5e-1) AS BIGINT))
                AS DOUBLE) / 1e12 AS dot_cq,
           CAST(SUM(CAST(FLOOR(c.c * c.c * 1e12 + 5e-1) AS BIGINT))
                AS DOUBLE) / 1e12 AS sq_c
    FROM lcents c JOIN lq q ON c.pos = q.pos
    GROUP BY c.label
),
probe AS (
    SELECT label FROM lscored
    ORDER BY dot_cq / sqrt(sq_c) DESC, label
    LIMIT 2
),
qsub AS (
    SELECT sub, spos, v FROM sx WHERE vec_id = {_QID}
),
adc AS (
    SELECT c.sub, c.k,
           SUM(CAST(FLOOR((q.v - c.c) * (q.v - c.c) * 1e12 + 5e-1)
                    AS BIGINT)) AS d
    FROM c1 c JOIN qsub q ON c.sub = q.sub AND c.spos = q.spos
    GROUP BY c.sub, c.k
),
cand AS (
    SELECT vec_id FROM embeddings
    WHERE label IN (SELECT label FROM probe) AND vec_id <> {_QID}
)
SELECT a2.vec_id, CAST(SUM(adc.d) AS BIGINT) AS adc_dist_fp
FROM a2
JOIN cand USING (vec_id)
JOIN adc ON a2.sub = adc.sub AND a2.k = adc.k
GROUP BY a2.vec_id
ORDER BY adc_dist_fp, vec_id
LIMIT 10
""",
    doc="IVFPQ — the canonical FAISS index shape, composing the two "
    "ANN pieces this catalog already proves separately: the IVF "
    "coarse quantizer routes the query to its top-2 label lists "
    "(fixed-point centroid cosine probe, the ivf_topk machinery), "
    "and ONLY those candidates are ranked by PQ asymmetric distance "
    "(codes folded through the literal m x ks lookup table). At "
    "scale the probed lists are file-pruned partitions and the "
    "codes column is 32x smaller than the vectors, so the scan "
    "touches nprobe/K of the corpus in compressed form — the "
    "standard billion-vector recipe. Oracle replays coarse probe + "
    "codebook training + encoding + ADC end-to-end, bit-exact.",
)
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.pq import pq_topk
    from stripe_data_pipeline_spark.operators.similarity import (
        _probe_labels,
        centroids,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    books = _pq_books(spark, sf_dir)
    vec = S.query_vector(emb, _QID)
    labels = _probe_labels(centroids(emb), vec, nprobe=2)
    cands = emb.filter(F.col("label").isin(labels))
    return pq_topk(cands, books, vec, k=10, exclude_id=_QID)


# Persisted PQ/IVFPQ artifact (r8, VERDICT r7 #2): one root per corpus
# dir holding the PQ codebooks + encoded codes (label-partitioned) and
# the coarse IVF centroid table — built once, queried many times, the
# same artifact-reuse contract as _IVF_INDEX_CACHE and the BPE merges.
_PQ_INDEX_CACHE: dict[str, str] = {}


def _cleanup_pq_index_cache() -> None:
    import shutil

    for p in _PQ_INDEX_CACHE.values():
        shutil.rmtree(p, ignore_errors=True)


def _pq_index_root(spark: SparkSession, sf_dir: str) -> str:
    import atexit
    import os
    import tempfile

    from stripe_data_pipeline_spark.operators.pq import build_pq_index

    root = _PQ_INDEX_CACHE.get(sf_dir)
    if root is not None:
        return root
    if not _PQ_INDEX_CACHE:
        atexit.register(_cleanup_pq_index_cache)
    root = tempfile.mkdtemp(prefix="pq_index_")
    emb = read_table(spark, sf_dir, "embeddings")
    build_pq_index(emb, os.path.join(root, "pq"), m=8, ks=8, iters=2)
    S.build_ivf_index(emb, os.path.join(root, "ivf"))
    _PQ_INDEX_CACHE[sf_dir] = root
    return root


@register(
    "pq_adc_topk_persisted",
    oracle=QUERIES["pq_adc_topk"].oracle,
    doc="PQ ADC top-k against the PERSISTED index (build_pq_index + "
    "pq_topk_from_index): training and encoding happened once at "
    "build time, so the query plan is a scan of the 32x-compressed "
    "codes column + the literal ADC-table fold + "
    "TakeOrderedAndProject — no training, no vector arithmetic, no "
    "Python, no shuffle (the production search shape; the r7 "
    "in-flight variant re-ran Lloyd + encode per query). Same "
    "oracle as pq_adc_topk: persistence must not change results.",
)
def q_pq_adc_topk_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from stripe_data_pipeline_spark.operators.pq import pq_topk_from_index

    root = _pq_index_root(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings")
    qv = S.query_vector(emb, _QID)
    return pq_topk_from_index(
        spark, os.path.join(root, "pq"), qv, k=10, exclude_id=_QID
    )


@register(
    "ivfpq_topk_persisted",
    oracle=QUERIES["ivfpq_topk"].oracle,
    doc="IVFPQ against the PERSISTED artifact — the full FAISS "
    "billion-vector serving shape: the coarse probe reads the K×d "
    "centroid table (ivf_topk_persisted's artifact), and the ADC "
    "scan reads ONLY the probed labels' directories of the "
    "label-PARTITIONED codes table (partition pruning at file "
    "level, nprobe/K of a 32x-compressed corpus). Nothing is "
    "trained or encoded at query time. Same oracle as ivfpq_topk: "
    "the persisted composition must reproduce it bit-for-bit.",
)
def q_ivfpq_topk_persisted(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from stripe_data_pipeline_spark.operators.pq import pq_topk_from_index
    from stripe_data_pipeline_spark.operators.similarity import _probe_labels

    root = _pq_index_root(spark, sf_dir)
    emb = read_table(spark, sf_dir, "embeddings")
    qv = S.query_vector(emb, _QID)
    cents = spark.read.parquet(os.path.join(root, "ivf"))
    labels = _probe_labels(cents, qv, nprobe=2)
    return pq_topk_from_index(
        spark, os.path.join(root, "pq"), qv, k=10, exclude_id=_QID,
        probe_labels=labels,
    )


@register(
    "hamming_topk_signbit",
    oracle=f"""
WITH sig AS (
    SELECT vec_id,
           CAST(list_sum(list_transform(range(1, 33), i ->
               CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
                    THEN (1::BIGINT << (i - 1)) ELSE 0 END))
                AS BIGINT) AS lo,
           CAST(list_sum(list_transform(range(33, 65), i ->
               CASE WHEN CAST(embedding[i] AS DOUBLE) > 0
                    THEN (1::BIGINT << (i - 33)) ELSE 0 END))
                AS BIGINT) AS hi
    FROM embeddings
),
q AS (
    SELECT lo AS qlo, hi AS qhi FROM sig WHERE vec_id = {_QID}
)
SELECT s.vec_id,
       CAST(bit_count(xor(s.lo, q.qlo)) + bit_count(xor(s.hi, q.qhi))
            AS BIGINT) AS hamming_dist
FROM sig s, q
WHERE s.vec_id <> {_QID}
ORDER BY hamming_dist, s.vec_id
LIMIT 10
""",
    doc="SIGN-BIT binary quantization ANN (Charikar 2002 reduced to "
    "the coordinate basis — the 'binary embeddings' first-pass "
    "retrieval trick): vectors compress to their 64 coordinate sign "
    "bits packed as two 32-bit longs (two halves so the shifts "
    "never overflow on any engine), candidates rank by Hamming "
    "distance = bit_count(xor(lo)) + bit_count(xor(hi)) — zero "
    "floating point at scan time, a 16-byte persistable column, "
    "narrow scan into TakeOrderedAndProject. Complements the SRP-"
    "LSH (random hyperplanes) and PQ (trained codebooks) families "
    "with the cheapest quantizer of all; ties break on vec_id, "
    "bit-exact against the oracle's identical packing.",
)
def q_hamming_topk_signbit(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.query_vector(emb, _QID)
    return S.hamming_topk(emb, vec, k=10, exclude_id=_QID)


@register(
    "ivfpq_residual_topk",
    oracle=f"""
WITH ex AS (
    SELECT vec_id, label, g.i - 1 AS pos,
           CAST(embedding[g.i] AS DOUBLE) AS v
    FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS g(i)
),
lcents AS (
    SELECT label, pos,
           (CAST(SUM(CAST(FLOOR(v * 1e9 + 5e-1) AS BIGINT)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) / 1e9 AS c
    FROM ex GROUP BY label, pos
),
lq AS (
    SELECT pos, v AS qval FROM ex WHERE vec_id = {_QID}
),
lscored AS (
    SELECT c.label,
           CAST(SUM(CAST(FLOOR(c.c * q.qval * 1e12 + 5e-1) AS BIGINT))
                AS DOUBLE) / 1e12 AS dot_cq,
           CAST(SUM(CAST(FLOOR(c.c * c.c * 1e12 + 5e-1) AS BIGINT))
                AS DOUBLE) / 1e12 AS sq_c
    FROM lcents c JOIN lq q ON c.pos = q.pos
    GROUP BY c.label
),
probe AS (
    SELECT label FROM lscored
    ORDER BY dot_cq / sqrt(sq_c) DESC, label
    LIMIT 2
),
rex AS (
    SELECT x.vec_id, x.label, x.pos, x.v - c.c AS v
    FROM ex x JOIN lcents c ON c.label = x.label AND c.pos = x.pos
),
rsx AS (
    SELECT vec_id, label, pos // 8 AS sub, pos % 8 AS spos, v FROM rex
),
c0 AS (
    SELECT CAST(vec_id AS INT) AS k, sub, spos, v AS c
    FROM rsx WHERE vec_id < 8
),
d1 AS (
    SELECT e.vec_id, e.sub, c.k,
           SUM(CAST(FLOOR((e.v - c.c) * (e.v - c.c) * 1e12 + 5e-1)
                    AS BIGINT)) AS dist
    FROM rsx e JOIN c0 c ON e.sub = c.sub AND e.spos = c.spos
    GROUP BY e.vec_id, e.sub, c.k
),
a1 AS (
    SELECT vec_id, sub, k FROM (
        SELECT vec_id, sub, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, k) AS rn
        FROM d1
    ) WHERE rn = 1
),
c1u AS (
    SELECT a.sub, a.k, e.spos,
           (CAST(SUM(CAST(FLOOR(e.v * 1e9 + 5e-1) AS BIGINT)) AS DOUBLE)
            / CAST(COUNT(*) AS DOUBLE)) / 1e9 AS c
    FROM a1 a JOIN rsx e ON e.vec_id = a.vec_id AND e.sub = a.sub
    GROUP BY a.sub, a.k, e.spos
),
c1 AS (
    SELECT c0.sub, c0.k, c0.spos, COALESCE(c1u.c, c0.c) AS c
    FROM c0 LEFT JOIN c1u
      ON c0.sub = c1u.sub AND c0.k = c1u.k AND c0.spos = c1u.spos
),
d2 AS (
    SELECT e.vec_id, e.sub, c.k,
           SUM(CAST(FLOOR((e.v - c.c) * (e.v - c.c) * 1e12 + 5e-1)
                    AS BIGINT)) AS dist
    FROM rsx e JOIN c1 c ON e.sub = c.sub AND e.spos = c.spos
    GROUP BY e.vec_id, e.sub, c.k
),
a2 AS (
    SELECT vec_id, sub, k FROM (
        SELECT vec_id, sub, k,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, k) AS rn
        FROM d2
    ) WHERE rn = 1
),
qres AS (
    SELECT pr.label, lc.pos // 8 AS sub, lc.pos % 8 AS spos,
           q.qval - lc.c AS v
    FROM probe pr
    JOIN lcents lc ON lc.label = pr.label
    JOIN lq q ON q.pos = lc.pos
),
adc AS (
    SELECT r.label, c.sub, c.k,
           SUM(CAST(FLOOR((r.v - c.c) * (r.v - c.c) * 1e12 + 5e-1)
                    AS BIGINT)) AS d
    FROM c1 c JOIN qres r ON r.sub = c.sub AND r.spos = c.spos
    GROUP BY r.label, c.sub, c.k
),
el AS (SELECT vec_id, label FROM embeddings)
SELECT a2.vec_id, CAST(SUM(adc.d) AS BIGINT) AS adc_dist_fp
FROM a2
JOIN el ON el.vec_id = a2.vec_id
JOIN adc ON adc.label = el.label AND adc.sub = a2.sub AND adc.k = a2.k
WHERE el.label IN (SELECT label FROM probe) AND a2.vec_id <> {_QID}
GROUP BY a2.vec_id
ORDER BY adc_dist_fp, a2.vec_id
LIMIT 10
""",
    doc="IVFPQ with RESIDUAL encoding — the actual FAISS IndexIVFPQ "
    "recipe (Jegou et al. 2011 Sec V; ivfpq_topk is the "
    "no-residual simplification): vectors PQ-encode as "
    "r = x - c(label) against their coarse centroid (centering "
    "every list at the origin is why ONE shared codebook set "
    "serves all lists), and at query time each probed list gets "
    "its OWN query residual and ADC table — candidates from "
    "different lists score against different tables in the shared "
    "fixed-point space, merged into one global top-k. The residual "
    "is a map-literal zip_with projection (K x d bounded collect, "
    "no join); per-probe scoring is a label-pruned codes scan + "
    "literal ADC fold unioned into TakeOrderedAndProject. The "
    "oracle replays coarse quantizer, residuals, the full "
    "fused-Lloyd training, encoding, per-list tables and the "
    "merge, bit-for-bit.",
)
def q_ivfpq_residual_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.pq import ivfpq_residual_topk

    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.query_vector(emb, _QID)
    return ivfpq_residual_topk(emb, vec, k=10, nprobe=2, exclude_id=_QID)


# ---------------------------------------------------------------------------
# SemDeDup (r9): semantic dedup via kmeans clusters + within-cluster cosine
# ---------------------------------------------------------------------------

_SEMDEDUP_TAU = "0.3"  # shared literal: Spark F.lit and the SQL parse
# the same decimal to the same double, so the >= comparison of the
# identically-folded cosines is bit-deterministic on both engines.


@register(
    "semdedup_keepers",
    oracle=_KMEANS_REPLAY
    + f""",
nm AS (
    SELECT vec_id, embedding,
           sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
    FROM embeddings
),
dom AS (
    SELECT DISTINCT y.vec_id
    FROM a2 x
    JOIN a2 y ON x.k = y.k AND x.vec_id <> y.vec_id
        AND (x.dist > y.dist
             OR (x.dist = y.dist AND x.vec_id < y.vec_id))
    JOIN nm ex ON ex.vec_id = x.vec_id
    JOIN nm ey ON ey.vec_id = y.vec_id
    WHERE {_dot_sql('ex.embedding', 'ey.embedding')}
          / (ex.nrm * ey.nrm) >= {_SEMDEDUP_TAU}
)
SELECT a2.vec_id, a2.k AS cluster, (dom.vec_id IS NULL) AS kept
FROM a2 LEFT JOIN dom USING (vec_id)
""",
    doc="SemDeDup (Abbas et al. 2023): semantic near-duplicate "
    "pruning — kmeans-cluster the embedding space (the shared "
    "2-iteration fixed-point Lloyd replay), compute pairwise cosine "
    "ONLY within each cluster, and drop the centroid-nearer side of "
    "every pair above the threshold, keeping the farthest-from-"
    "centroid survivor (the paper's diversity-preserving keeper, "
    "made deterministic by the integer dist_fp tie-broken on "
    "vec_id). The clustering stage is what makes this 100 TB-able: "
    "pair work is quadratic only within a cluster and the paper "
    "scales K with the corpus so expected cluster size stays "
    "constant. One cluster-key shuffle; cosines are the shared "
    "double-fold idiom so the SQL replay matches bit-for-bit "
    "(operators/semdedup.py).",
)
def q_semdedup_keepers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.semdedup import (
        semdedup_flags,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    return semdedup_flags(
        emb,
        k=8,
        iters=2,
        threshold=0.3,
        centroids=_kmeans_cents(spark, sf_dir),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (r9): hybrid lexical + semantic retrieval
# ---------------------------------------------------------------------------

_RRF_K = 60  # the constant from Cormack et al. 2009
_RRF_L = 100  # candidate-list depth fused from each signal
_RRF_SCALE = 10**12


@register(
    "rrf_hybrid_topk",
    oracle=f"""
WITH words AS (
    SELECT d.doc_id, w.term
    FROM documents d, LATERAL UNNEST(string_split(d.text, ' ')) AS w(term)
    WHERE w.term <> ''
),
tf AS (
    SELECT doc_id, term, COUNT(*) AS tf FROM words GROUP BY doc_id, term
),
dl AS (
    SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id
),
dfreq AS (
    SELECT term, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY term
),
stats AS (
    SELECT COUNT(*) AS n, SUM(dl) AS sum_dl FROM dl
),
qterms AS (
    SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 5
),
scored AS (
    SELECT tf.doc_id,
           CAST(FLOOR(
               ln((CAST(s.n AS DOUBLE) - CAST(q.df AS DOUBLE) + 0.5)
                  / (CAST(q.df AS DOUBLE) + 0.5) + 1.0)
               * ((CAST(tf.tf AS DOUBLE) * 2.2)
                  / (CAST(tf.tf AS DOUBLE)
                     + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                        / (CAST(s.sum_dl AS DOUBLE) / CAST(s.n AS DOUBLE))))))
               * 1e9 + 5e-1) AS BIGINT) AS term_fp
    FROM tf
    JOIN qterms q USING (term)
    JOIN dl USING (doc_id), stats s
),
lex AS (
    SELECT doc_id, ROW_NUMBER() OVER (
        ORDER BY SUM(term_fp) DESC, doc_id) AS r_lex
    FROM scored GROUP BY doc_id
    QUALIFY r_lex <= {_RRF_L}
),
q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QID}),
sem AS (
    SELECT vec_id AS doc_id, ROW_NUMBER() OVER (
        ORDER BY {_dot_sql('e.embedding', 'q.qv')}
                 / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
                    * sqrt({_dot_sql('q.qv', 'q.qv')})) DESC,
                 vec_id) AS r_sem
    FROM embeddings e, q
    WHERE e.vec_id <> {_QID}
    QUALIFY r_sem <= {_RRF_L}
),
fused AS (
    SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id,
           CAST(COALESCE({_RRF_SCALE} // ({_RRF_K} + l.r_lex), 0)
                + COALESCE({_RRF_SCALE} // ({_RRF_K} + s.r_sem), 0)
                AS BIGINT) AS rrf_fp,
           l.r_lex, s.r_sem
    FROM lex l FULL OUTER JOIN sem s USING (doc_id)
)
SELECT doc_id, rrf_fp,
       CAST(r_lex AS BIGINT) AS r_lex, CAST(r_sem AS BIGINT) AS r_sem
FROM fused
ORDER BY rrf_fp DESC, doc_id
LIMIT 10
""",
    doc="Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — "
    "the standard hybrid-retrieval merge: fuse the BM25 lexical "
    "top-100 (corpus-HDF query, the bm25_top_docs scorer) with the "
    "semantic cosine top-100 (query = embeddings[vec_id=0]; vec_id "
    "is 1:1 with doc_id in this corpus) by summing 1e12 div "
    "(60 + rank) per list — ALL-INTEGER, so fusion is engine-exact "
    "even though the underlying scores never mix. Docs missing from "
    "one list contribute 0 from it (fusion over the candidate "
    "union). Both candidate lists are bounded top-L window results; "
    "the fuse itself is a full outer join of two 100-row relations "
    "— at 100 TB the expensive parts are the two retrieval stages, "
    "each already scale-shaped (BM25's bounded top-k, ANN for the "
    "semantic side via ivf_topk_persisted).",
)
def q_rrf_hybrid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.similarity import rrf_fuse
    from stripe_data_pipeline_spark.operators.text import bm25_top_docs

    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    lex = bm25_top_docs(docs, n_query_terms=5, k=_RRF_L).select(
        "doc_id", "score_fp"
    )
    vec = S.query_vector(emb, _QID)
    sem = S.cosine_topk(emb, vec, k=_RRF_L, exclude_id=_QID).select(
        F.col("vec_id").alias("doc_id"), "cosine_sim"
    )
    return rrf_fuse(
        lex,
        sem,
        order_a=(F.desc("score_fp"), F.asc("doc_id")),
        order_b=(F.desc("cosine_sim"), F.asc("doc_id")),
        id_col="doc_id",
        k=10,
        rrf_k=_RRF_K,
        scale=_RRF_SCALE,
    )


# ---------------------------------------------------------------------------
# ANN recall eval (r9): IVF top-k vs exact brute force, in one plan
# ---------------------------------------------------------------------------


@register(
    "ann_recall_check",
    oracle=f"""
WITH brute AS (
    SELECT vec_id FROM (
        {_COSINE_SCORED}
        SELECT vec_id FROM scored
        ORDER BY cosine_sim DESC, vec_id LIMIT 10
    )
),
approx AS (
    SELECT vec_id FROM ({_IVF_ORACLE})
)
SELECT CAST(10 AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS n_overlap,
       CAST(COUNT(*) * 10000 // 10 AS BIGINT) AS recall_bp
FROM brute JOIN approx USING (vec_id)
""",
    doc="ANN RECALL self-eval — the metric every approximate index "
    "ships with: the IVF nprobe=2 top-10 intersected with the exact "
    "brute-force top-10 for the same query, recall in basis points. "
    "Both retrievals and the intersection run in ONE distributed "
    "plan (two bounded top-k stages joined on vec_id); at 100 TB "
    "this is the recurring index-quality probe run on a sampled "
    "query set after every index rebuild — and because both paths "
    "are deterministic fixed shapes here, even the eval is "
    "bit-exact.",
)
def q_ann_recall_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    vec = S.query_vector(emb, _QID)
    brute = S.cosine_topk(emb, vec, k=10, exclude_id=_QID).select("vec_id")
    approx = S.ivf_topk(emb, vec, k=10, nprobe=2, exclude_id=_QID).select(
        "vec_id"
    )
    return brute.join(approx, "vec_id").agg(
        F.lit(10).cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_overlap"),
        F.expr("count(1) * 10000 div 10").cast("bigint").alias("recall_bp"),
    )


@register(
    "preference_pair_prep",
    oracle=_KMEANS_REPLAY
    + """
, q AS (
    SELECT doc_id,
           CAST(FLOOR((least(CAST(length(text) AS DOUBLE) / 5e2, 1e0) * 5e-1
                 + CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) * 3e-1
                 + least(CAST(len(list_filter(string_split(text, ' '),
                            t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))
                            AS DOUBLE)
                         / CAST(len(string_split(text, ' ')) AS DOUBLE)
                         * 5e0, 1e0) * 2e-1) * 1e6 + 5e-1) AS BIGINT) AS q_bp
    FROM documents
), j AS (
    SELECT a2.k AS cluster, q.doc_id, q.q_bp
    FROM a2 JOIN q ON q.doc_id = a2.vec_id
), w AS (
    SELECT cluster, doc_id, q_bp,
           ROW_NUMBER() OVER (PARTITION BY cluster
                              ORDER BY q_bp DESC, doc_id ASC) AS rn_hi,
           ROW_NUMBER() OVER (PARTITION BY cluster
                              ORDER BY q_bp ASC, doc_id DESC) AS rn_lo,
           COUNT(*) OVER (PARTITION BY cluster) AS n_in
    FROM j
)
SELECT h.cluster,
       h.doc_id AS chosen_id, l.doc_id AS rejected_id,
       h.q_bp AS chosen_q_bp, l.q_bp AS rejected_q_bp,
       CAST(h.q_bp - l.q_bp AS BIGINT) AS margin_bp,
       CAST(h.n_in AS BIGINT) AS n_in_cluster
FROM (SELECT * FROM w WHERE rn_hi = 1) h
JOIN (SELECT * FROM w WHERE rn_lo = 1) l ON l.cluster = h.cluster
WHERE h.n_in >= 2
ORDER BY h.cluster
""",
    doc="PREFERENCE-PAIR construction (the DPO/RLHF data-prep shape): "
    "within each semantic cluster — the shared cached kmeans "
    "partitioning — pair the highest-quality document (chosen) with "
    "the lowest-quality one (rejected), quality being the composite "
    "fixed-point score in integer millionths so the argmax/argmin "
    "rank identically cross-engine. Opposed tiebreaks ((q DESC, id "
    "ASC) vs (q ASC, id DESC)) guarantee chosen != rejected whenever "
    "a cluster has >= 2 members. Cost: the map-side cluster "
    "assignment + two row_number passes over ONE (cluster) "
    "partition sort; pairing is per-cluster argmax/argmin, never "
    "all-pairs — at 100 TB the quality join shuffles on doc_id and "
    "the window on cluster, both linear.",
)
def q_preference_pair_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.kmeans import assign_clusters
    from stripe_data_pipeline_spark.operators.text import with_quality_score

    emb = read_table(spark, sf_dir, "embeddings")
    assigned = assign_clusters(emb, _kmeans_cents(spark, sf_dir)).select(
        "vec_id", "cluster"
    )
    docs = with_quality_score(read_table(spark, sf_dir, "documents"))
    q = docs.select(
        "doc_id",
        F.floor(F.col("quality_score") * F.lit(1e6) + F.lit(0.5))
        .cast("bigint")
        .alias("q_bp"),
    )
    j = assigned.join(q, assigned["vec_id"] == q["doc_id"]).select(
        "cluster", "doc_id", "q_bp"
    )
    # r14 optimization round: the per-cluster argmax/argmin used to be
    # TWO rank windows + a count window + a hi/lo self-join — an
    # exchange, two full partition sorts and a join for what is a
    # partial-aggregable reduction (the near_dup_quality_keepers
    # pattern this catalog already documents as the right shape).
    # chosen = max(struct(q_bp, -doc_id)) replays (q DESC, id ASC);
    # rejected = min(struct(q_bp, -doc_id)) replays (q ASC, id DESC);
    # identical rows, one map-side-combined shuffle, no sort, no join.
    agg = j.groupBy("cluster").agg(
        F.max(
            F.struct(F.col("q_bp"), (-F.col("doc_id")).alias("neg_id"))
        ).alias("hi"),
        F.min(
            F.struct(F.col("q_bp"), (-F.col("doc_id")).alias("neg_id"))
        ).alias("lo"),
        F.count(F.lit(1)).alias("n_in"),
    )
    return (
        agg.filter(F.col("n_in") >= 2)
        .select(
            "cluster",
            (-F.col("hi.neg_id")).cast("bigint").alias("chosen_id"),
            (-F.col("lo.neg_id")).cast("bigint").alias("rejected_id"),
            F.col("hi.q_bp").alias("chosen_q_bp"),
            F.col("lo.q_bp").alias("rejected_q_bp"),
            (F.col("hi.q_bp") - F.col("lo.q_bp"))
            .cast("bigint")
            .alias("margin_bp"),
            F.col("n_in").cast("bigint").alias("n_in_cluster"),
        )
        .orderBy("cluster")
    )


# --------------------------------------------------------------------
# Late interaction (round 9): multi-vector retrieval — each label's
# member vectors act as its "token embeddings" and the query is a
# fixed 8-vector set, so MaxSim exercises the ColBERT scoring shape
# on the existing embeddings table.
# --------------------------------------------------------------------

_MAXSIM_QIDS = tuple(range(8))


@register(
    "maxsim_late_interaction_topk",
    oracle=f"""
WITH qs AS (
    SELECT vec_id AS qid, embedding AS qv FROM embeddings
    WHERE vec_id IN {_MAXSIM_QIDS}
),
persim AS (
    SELECT c.label, q.qid,
           MAX(CAST(FLOOR({_dot_sql('c.embedding', 'q.qv')}
               / (sqrt({_dot_sql('c.embedding', 'c.embedding')})
                  * sqrt({_dot_sql('q.qv', 'q.qv')}))
               * 1e9 + 5e-1) AS BIGINT)) AS best
    FROM embeddings c, qs q
    WHERE c.vec_id NOT IN {_MAXSIM_QIDS}
    GROUP BY c.label, q.qid
)
SELECT label, CAST(SUM(best) AS BIGINT) AS maxsim_fp
FROM persim GROUP BY label
ORDER BY maxsim_fp DESC, label
LIMIT 10
""",
    doc="ColBERT-style MaxSim late interaction (Khattab & Zaharia "
    "2020): score(label) = sum over the 8 query vectors of the max "
    "member cosine — multi-vector retrieval where relevance is "
    "carried by individual members, not the pooled embedding. Query "
    "vectors are plan literals, so scoring is 8 narrow JVM folds on "
    "ONE corpus scan + one groupBy(label) shuffle (map-side partial "
    "maxes); cosines are floored to 1e-9 fixed point BEFORE max/sum "
    "so every aggregate is an order-invariant integer and the "
    "oracle's MAX/SUM replay bit-exactly "
    "(operators/similarity.py::maxsim_topk).",
)
def q_maxsim_late_interaction_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    qvecs = [S.query_vector(emb, qid) for qid in _MAXSIM_QIDS]
    return S.maxsim_topk(
        emb, qvecs, k=10, exclude_ids=list(_MAXSIM_QIDS)
    )


@register(
    "matryoshka_topk_check",
    oracle=f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {_QID}),
scored AS (
    SELECT e.vec_id,
           {_dot_sql('(e.embedding[1:16])', '(q.qv[1:16])')}
           / (sqrt({_dot_sql('(e.embedding[1:16])', '(e.embedding[1:16])')})
              * sqrt({_dot_sql('(q.qv[1:16])', '(q.qv[1:16])')}))
               AS cos_16,
           {_dot_sql('e.embedding', 'q.qv')}
           / (sqrt({_dot_sql('e.embedding', 'e.embedding')})
              * sqrt({_dot_sql('q.qv', 'q.qv')})) AS cos_full
    FROM embeddings e, q
    WHERE e.vec_id <> {_QID}
),
top_t AS (
    SELECT vec_id, cos_16, cos_full FROM scored
    ORDER BY cos_16 DESC, vec_id LIMIT 10
),
top_f AS (
    SELECT vec_id FROM scored ORDER BY cos_full DESC, vec_id LIMIT 10
),
hits AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n
    FROM top_t JOIN top_f USING (vec_id)
)
SELECT t.vec_id, t.cos_16, t.cos_full, hits.n AS recall_hits_at_10
FROM top_t t CROSS JOIN hits
""",
    doc="Matryoshka-truncation retrieval (Kusupati et al. 2022 — MRL, "
    "the modern serve-cheap/rerank-rich trick, r11): score the corpus "
    "with only the FIRST 16 of 64 dims (a 4x cheaper fold; MRL-"
    "trained embeddings front-load information exactly for this), "
    "take the truncated top-10, carry each candidate's full-dim "
    "cosine, and report recall@10 against the exact full-dim top-10 "
    "as a corpus-level column. Everything is exact scalar arithmetic "
    "— both cosines use the shared left-fold tree over slices, so "
    "the oracle replays scores AND the recall count bit-for-bit (no "
    "tolerance flags, unlike the ANN recall evaluator "
    "ann_recall_check which judges a lossy index).",
)
def q_matryoshka_topk_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.partitioning import spread_scan
    from stripe_data_pipeline_spark.operators.similarity import (
        _as_double,
        _dot,
        _lit_vec,
        _norm,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    qv = S.query_vector(emb, _QID)
    q16, qf = _lit_vec(qv[:16]), _lit_vec(qv)
    e = _as_double(F.col("embedding"))
    e16 = F.slice(e, 1, 16)
    scored = spread_scan(emb).filter(F.col("vec_id") != _QID).select(
        "vec_id",
        (_dot(e16, q16) / (_norm(e16) * _norm(q16))).alias("cos_16"),
        (_dot(e, qf) / (_norm(e) * _norm(qf))).alias("cos_full"),
    )
    top_t = scored.orderBy(F.desc("cos_16"), "vec_id").limit(10)
    top_f = scored.orderBy(F.desc("cos_full"), "vec_id").limit(10)
    hits = top_t.join(top_f.select("vec_id"), "vec_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("recall_hits_at_10")
    )
    return top_t.crossJoin(F.broadcast(hits)).select(
        "vec_id", "cos_16", "cos_full", "recall_hits_at_10"
    )
