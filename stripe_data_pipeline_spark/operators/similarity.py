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
    from stripe_data_pipeline_spark.operators.partitioning import spread_scan

    df = spread_scan(df)
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
    quantized embedding prefixes — don't raise the cap. Raising it is
    also a MEMORY cliff, not just a compute one (ADVICE r14): the
    Arrow pair stage below materializes an n×n float64 matrix plus d
    outer-product temporaries per block (~8 MB at the default 1000;
    quadratic beyond), where the old JVM join streamed pairs.

    r14 optimization (guide §4.2, the semdedup treatment): the
    per-block pair stage used to be a JVM self-join — base shuffled
    twice, every candidate pair evaluating an INTERPRETED 2d-term
    F.aggregate fold (HOFs don't enter whole-stage codegen), plus a
    scalar-barrier repartition. It is now ONE shuffle (groupBy blk)
    into an Arrow applyInPandas that reproduces the exact IEEE
    sequence vectorized over the pair matrix: the left-fold dot
    ((0 + a1*b1) + a2*b2) + ... is accumulated DIMENSION BY DIMENSION
    (acc = acc + outer(x_i, x_i)), nrm = sqrt(diag) is the same
    _norm fold, and the cosine divides by the na*nb product in the
    same order — so every emitted value is bit-identical to the fold
    the DuckDB oracles replay. Scale shape unchanged: pair work stays
    confined to <= max_block rows per group.
    """
    emb = _as_double(F.col("embedding"))
    base = df.select(
        "vec_id", F.col(block_col).alias("blk"), emb.alias("e")
    )
    block_sizes = base.groupBy("blk").agg(F.count(F.lit(1)).alias("block_n"))
    base = base.join(
        block_sizes.filter(F.col("block_n") <= max_block), ["blk"], "inner"
    ).drop("block_n")
    thr = float(threshold)
    id_field = df.schema["vec_id"].dataType.simpleString()

    def _pairs(pdf):
        import numpy as np
        import pandas as pd

        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {"vec_a": [], "vec_b": [], "cosine_sim": []}
            )
        x = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["e"]])
        ids = pdf["vec_id"].to_numpy()
        acc = np.zeros((n, n), dtype=np.float64)
        for i in range(x.shape[1]):
            acc = acc + np.multiply.outer(x[:, i], x[:, i])
        nrm = np.sqrt(np.diagonal(acc))
        cos = acc / np.multiply.outer(nrm, nrm)
        lower = ids[:, None] < ids[None, :]
        # Spark orders NaN GREATER than any value, so a zero-norm
        # pair's NaN cosine passes `>= threshold` there; replicate.
        ai, bi = np.nonzero(lower & ((cos >= thr) | np.isnan(cos)))
        return pd.DataFrame(
            {
                "vec_a": ids[ai],
                "vec_b": ids[bi],
                "cosine_sim": cos[ai, bi],
            }
        )

    return base.groupBy("blk").applyInPandas(
        _pairs,
        schema=f"vec_a {id_field}, vec_b {id_field}, cosine_sim double",
    )


def hard_negatives_inbatch(
    df: DataFrame,
    batch_size: int = 50,
    id_col: str = "vec_id",
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """IN-BATCH hard-negative mining — the contrastive-training prep
    step (the in-batch-negatives economics of dual-encoder training,
    e.g. DPR, Karpukhin et al. 2020): for every anchor, the
    most-cosine-similar vector with a DIFFERENT label inside the
    anchor's deterministic batch (id div batch_size), ties broken by
    the smallest negative id.

    Corpus-wide argmax negatives are an O(N²) all-pairs scan; batching
    bounds pair work at batch_size² per batch — linear in the corpus
    with a constant the trainer already chose (its batch size). The
    argmax is ONE max(struct(cos, -id)) partial-combined aggregate
    (no per-anchor sort); anchors whose whole batch shares their
    label have no negative and drop out, mirroring the trainer's
    in-batch loss. Returns (id_col, hard_negative_id, cosine_sim)."""
    emb = _as_double(F.col(vec_col))
    base = df.select(
        F.col(id_col).alias("vid"),
        F.col(label_col).alias("lbl"),
        emb.alias("e"),
        _norm(emb).alias("nrm"),
    ).withColumn("batch", F.expr(f"vid div {int(batch_size)}"))
    a, n = base.alias("a"), base.alias("n")
    pairs = a.join(
        n,
        (F.col("a.batch") == F.col("n.batch"))
        & (F.col("a.lbl") != F.col("n.lbl")),
    ).select(
        F.col("a.vid").alias(id_col),
        F.col("n.vid").alias("nid"),
        (
            _dot(F.col("a.e"), F.col("n.e"))
            / (F.col("a.nrm") * F.col("n.nrm"))
        ).alias("cos"),
    )
    return (
        pairs.groupBy(id_col)
        .agg(
            F.max(
                F.struct(F.col("cos"), (-F.col("nid")).alias("neg"))
            ).alias("m")
        )
        .select(
            id_col,
            (-F.col("m.neg")).cast("long").alias("hard_negative_id"),
            F.col("m.cos").alias("cosine_sim"),
        )
    )


def srp_plane_strs(
    bands: int, band_bits: int, d: int, seed: int = 42
) -> list[list[str]]:
    """The SRP hyperplanes as ``%.8g`` decimal strings — the SINGLE
    source of truth for both the Spark plan (``srp_band_keys`` renders
    them as ``<v>D`` literals) and the DuckDB oracle (same strings as
    plain literals). Both engines parse the same decimal to the same
    nearest double, so the sign bits — and therefore every band key,
    bucket and candidate pair — are bit-identical across engines."""
    import numpy as np

    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((bands * band_bits, d))
    return [[f"{float(v):.8g}" for v in row] for row in planes]


def srp_band_keys(
    df: DataFrame, bands: int = 24, band_bits: int = 4, seed: int = 42
) -> DataFrame:
    """Signed-random-projection (hyperplane) LSH banding — the
    corpus-scale path for embedding near-dup when no quality cluster
    label exists (the overflow route :func:`cosine_near_dup_pairs`'s
    ``max_block`` cap points at).

    Each of ``bands*band_bits`` fixed pseudo-random hyperplanes
    contributes one sign bit (P[bit_a == bit_b] = 1 - angle/pi, the
    SimHash property for vectors); ``band_bits`` bits pack into one
    integer band key. Two vectors collide in a band iff all its bits
    agree, so collision probability rises sharply with cosine — the
    same band/bucket geometry as MinHash LSH (dedup.minhash_lsh).

    Hyperplanes are generated driver-side from a seeded RNG and enter
    the plan as LITERAL arrays (K×d doubles — a few KiB) rendered as a
    SINGLE SQL expression string: one py4j call, not K×d Column-object
    round trips (which dominate wall time), and scoring stays pure JVM
    arithmetic — no Python in the hot path, no Python-RDD scan.
    Output: (vec_id, e, nrm, band, band_key), exploded one row per
    band.
    """
    d = len(df.select("embedding").first()[0])
    planes_sql = (
        "array("
        + ",".join(
            "array(" + ",".join(s + "D" for s in row) + ")"
            for row in srp_plane_strs(bands, band_bits, d, seed)
        )
        + ")"
    )
    emb = _as_double(F.col("embedding"))
    base = df.select("vec_id", emb.alias("e"), _norm(emb).alias("nrm"))
    bits_sql = (
        f"transform({planes_sql}, p -> "
        "aggregate(zip_with(e, p, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"
        " >= 0.0D)"
    )
    keys_sql = (
        f"transform(sequence(0, {bands - 1}), b -> struct(b AS band, "
        f"aggregate(sequence(0, {band_bits - 1}), 0, "
        f"(acc, i) -> acc + IF(__bits[b * {band_bits} + i], shiftleft(1, i), 0)"
        ") AS band_key))"
    )
    return (
        base.withColumn("__bits", F.expr(bits_sql))
        .select("vec_id", "e", "nrm", F.explode(F.expr(keys_sql)).alias("bk"))
        .select(
            "vec_id",
            "e",
            "nrm",
            F.col("bk.band").alias("band"),
            F.col("bk.band_key").alias("band_key"),
        )
    )


def srp_lsh_near_dups(
    df: DataFrame,
    threshold: float = 0.3,
    bands: int = 24,
    band_bits: int = 4,
    max_bucket: int = 200,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup via hyperplane LSH + exact cosine verify.

    candidates: self-join within (band, band_key) buckets — near-linear
    (one shuffle on the band key, quadratic only inside ≤``max_bucket``
    buckets, hot buckets dropped like dedup.minhash_lsh's cap); verify:
    exactly one dot product per distinct candidate pair. Identical
    vectors always share all signatures, so exact-dup recall is 1;
    near-dup recall is tuned by (bands, band_bits): a bit agrees with
    probability 1 - angle/pi, a band collides when all its bits agree,
    and a pair is a candidate if ANY band collides. The 24x4 default
    gives ~0.96 recall at cosine 0.3 (test-gated at 0.85 on the real
    table); for a tighter threshold (true near-dup, cosine >= 0.8)
    fewer/wider bands suffice and candidate volume drops sharply.
    Every emitted pair is exact-verified ``cosine >= threshold``
    (precision 1).
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    keyed = srp_band_keys(df, bands, band_bits, seed).repartition(
        parallelism, "band", "band_key"
    )
    # drop hot buckets before the quadratic stage
    sizes = keyed.groupBy("band", "band_key").agg(F.count(F.lit(1)).alias("n"))
    keyed = keyed.join(
        sizes.filter(F.col("n") <= max_bucket), ["band", "band_key"]
    ).drop("n")
    keyed = keyed.localCheckpoint(eager=False)
    slim = keyed.select("band", "band_key", "vec_id")
    cand = (
        slim.alias("a")
        .join(slim.alias("b"), ["band", "band_key"])
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .distinct()
    )
    vecs = keyed.select("vec_id", "e", "nrm").dropDuplicates(["vec_id"])
    pairs = (
        cand.join(
            vecs.select(
                F.col("vec_id").alias("vec_a"),
                F.col("e").alias("ea"),
                F.col("nrm").alias("na"),
            ),
            ["vec_a"],
        )
        .join(
            vecs.select(
                F.col("vec_id").alias("vec_b"),
                F.col("e").alias("eb"),
                F.col("nrm").alias("nb"),
            ),
            ["vec_b"],
        )
        .repartition(parallelism)
    )
    return (
        pairs.withColumn(
            "cosine_sim", _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
        )
        .filter(F.col("cosine_sim") >= threshold)
        .select("vec_a", "vec_b", "cosine_sim")
    )


def centroids(df: DataFrame) -> DataFrame:
    """Per-label centroids via order-independent fixed-point sums.

    posexplode -> groupBy(label, pos) -> scaled-integer mean. Output:
    (label, pos, c) with c the centroid component as double.
    """
    from stripe_data_pipeline_spark.operators.partitioning import spread_scan

    exploded = spread_scan(df).select(
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


def batch_ivf_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF ANN for a BATCH of query vectors in one distributed plan —
    the production retrieval shape (embedding dedup, semantic search,
    hard-negative mining all answer thousands of queries per pass),
    with NO per-query driver round trip: where the single-query path
    collects nprobe labels driver-side, here probe selection is a
    row_number window over (query, label) centroid scores.

    Stages (all equi-joins, no cartesian surface):
    1. centroid scores per (query_id, label): posexplode the query
       vectors, equi-join centroids on pos, fixed-point sums — the
       exact arithmetic of :func:`_probe_labels`, vectorized over
       queries;
    2. probe set = top-``nprobe`` labels per query (window);
    3. candidates = probe set equi-joined to the corpus on label —
       each query scans ~nprobe/K of the corpus, and with the corpus
       bucketed by label this is co-located;
    4. exact cosine per (query, candidate), row_number <= k.

    Output: (query_id, vec_id, cosine_sim), self-pairs excluded.
    """
    from pyspark.sql import Window

    cents = centroids(df)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.posexplode(_as_double(F.col("embedding"))).alias("pos", "qval"),
    )
    scored = (
        q.join(cents, "pos")
        .groupBy("query_id", "label")
        .agg(
            (
                F.sum(
                    F.floor(
                        F.col("c") * F.col("qval") * F.lit(PROD_SCALE) + F.lit(0.5)
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
        .withColumn("centroid_score", F.col("dot_cq") / F.sqrt(F.col("sq_c")))
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.desc("centroid_score"), F.asc("label")
    )
    probed = (
        scored.withColumn("__rn", F.row_number().over(wprobe))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", "label")
    )
    qemb = _as_double(F.col("embedding"))
    qvecs = queries.select(
        F.col("vec_id").alias("query_id"),
        qemb.alias("qe"),
        _norm(qemb).alias("qn"),
    )
    cemb = _as_double(F.col("embedding"))
    corpus = df.select(
        "vec_id", "label", cemb.alias("e"), _norm(cemb).alias("nrm")
    )
    # query side is small by assumption (a batch); broadcast it onto
    # the label-partitioned corpus scan
    cand = corpus.join(F.broadcast(probed.join(qvecs, "query_id")), "label")
    pairs = cand.filter(F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        "vec_id",
        (_dot(F.col("e"), F.col("qe")) / (F.col("nrm") * F.col("qn"))).alias(
            "cosine_sim"
        ),
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("vec_id"))
    return (
        pairs.withColumn("__rn", F.row_number().over(wk))
        .filter(F.col("__rn") <= k)
        .select("query_id", "vec_id", "cosine_sim")
    )


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


def int8_code_table(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(id, codes) in symmetric int8 form — the 4x-compressed array
    the same arithmetic as :func:`operators.corpus.quantize_embeddings`
    produces (code = floor(x*127/max|x| + 0.5), zero vectors -> all-0).
    In production this is a persisted artifact next to the IVF
    centroids; here it is derived in-flight for the oracle-checked
    demo (same ad-hoc-vs-persisted split as ivf_topk)."""
    emb = _as_double(F.col(vec_col))
    d = df.select(
        F.col(id_col),
        emb.alias("__e"),
        F.array_max(F.transform(emb, lambda x: F.abs(x))).alias("__m"),
    )
    codes = F.transform(
        F.col("__e"),
        lambda x: F.when(F.col("__m") == 0.0, F.lit(0)).otherwise(
            F.floor((x * 127.0) / F.col("__m") + 0.5).cast("int")
        ),
    )
    return d.select(id_col, codes.alias("codes"))


def quantized_topk(
    df: DataFrame,
    vec: list[float],
    k: int = 10,
    refine: int = 4,
    exclude_id: int | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k over int8 codes + exact refine — how a
    quantized ANN index actually answers queries at 100 TB.

    Candidate stage touches ONLY the compressed codes: under symmetric
    quantization x ~ code*scale the per-vector scale cancels in
    cosine, so approx_sim = dot(code, q) / (||code||*||q||) needs no
    dequantization — integer-array scan, TakeOrdered keeps refine*k
    rows, no shuffle. Refine stage broadcasts the tiny candidate id
    set back onto the full-precision table and rescores exactly; the
    expensive float vectors are read for refine*k rows only (with the
    corpus sorted by id, file-level pruning). Every arithmetic step is
    a fixed IEEE tree, so both stages are bit-checkable against the
    oracle.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(parallelism)
    q = _lit_vec(vec)
    nq = _norm(q)
    codes = int8_code_table(df)
    cd = _as_double(F.col("codes"))
    ncode = _norm(cd)
    approx = F.when(ncode == 0.0, F.lit(-2.0)).otherwise(
        _dot(cd, q) / (ncode * nq)
    )
    cand = codes.select(F.col("vec_id"), approx.alias("approx_sim"))
    if exclude_id is not None:
        cand = cand.filter(F.col("vec_id") != exclude_id)
    cand = cand.orderBy(F.desc("approx_sim"), "vec_id").limit(refine * k)
    emb = _as_double(F.col("embedding"))
    nemb = _norm(emb)
    exact_sim = F.when(nemb == 0.0, F.lit(-2.0)).otherwise(
        _dot(emb, q) / (nemb * nq)
    )
    exact = df.join(F.broadcast(cand), "vec_id").select(
        F.col("vec_id"),
        F.col("approx_sim"),
        exact_sim.alias("cosine_sim"),
    )
    return exact.orderBy(F.desc("cosine_sim"), "vec_id").limit(k)


def signbit_halves(e) -> tuple:
    """The 64-dim sign-bit signature as TWO 32-bit halves packed into
    longs (lo = dims 0-31, hi = dims 32-63). Two halves rather than
    one 64-bit word so the packing is expressible with non-overflowing
    left shifts on any engine (DuckDB rejects 1 << 63); Hamming
    distance is then bit_count(xor(lo)) + bit_count(xor(hi)). Bits
    are DISJOINT so the fold is a plain sum. ``e`` is an
    array<double> Column; bit i set iff e[i] > 0 (ties at 0.0 clear)."""
    halves = []
    for lo in (0, 32):
        terms = None
        for i in range(32):
            t = (
                F.when(
                    F.element_at(e, lo + i + 1) > 0,
                    F.lit(1 << i).cast("long"),
                )
                .otherwise(F.lit(0).cast("long"))
            )
            terms = t if terms is None else terms + t
        halves.append(terms)
    return halves[0], halves[1]


def hamming_topk(
    df: DataFrame, vec: list[float], k: int = 10, exclude_id: int | None = None
) -> DataFrame:
    """Sign-bit binary-quantization ANN (Charikar 2002 SRP reduced to
    the identity hyperplane basis; the 'binary embeddings' trick
    production vector stores ship for 32x-compressed first-pass
    retrieval): each vector compresses to its 64 coordinate sign
    bits, and candidates rank by HAMMING distance to the query's
    signature — bit_count(xor) on two packed longs, no floating
    point at scan time at all. Returns (vec_id, hamming_dist) top-k,
    ties to the lowest vec_id.

    Narrow scan -> TakeOrderedAndProject; at rest the two signature
    longs are a persistable 16-byte column (the same artifact shape
    as the PQ codes table) and the scan never touches the raw
    vectors once signatures are materialized."""
    q_lo = sum((1 << i) for i in range(32) if float(vec[i]) > 0)
    q_hi = sum((1 << i) for i in range(32) if float(vec[32 + i]) > 0)
    e = _as_double(F.col("embedding"))
    lo, hi = signbit_halves(e)
    out = df.select(
        "vec_id",
        (
            F.bit_count(lo.bitwiseXOR(F.lit(q_lo).cast("long")))
            + F.bit_count(hi.bitwiseXOR(F.lit(q_hi).cast("long")))
        )
        .cast("bigint")
        .alias("hamming_dist"),
    )
    if exclude_id is not None:
        out = out.filter(F.col("vec_id") != exclude_id)
    return out.orderBy(F.asc("hamming_dist"), F.asc("vec_id")).limit(k)


def rrf_fuse(
    a: DataFrame,
    b: DataFrame,
    order_a: tuple,
    order_b: tuple,
    id_col: str = "doc_id",
    k: int = 10,
    rrf_k: int = 60,
    scale: int = 10**12,
    name_a: str = "r_lex",
    name_b: str = "r_sem",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) of
    two BOUNDED candidate lists: rank each list by its own ordering,
    then score every id in the union by

        rrf_fp = sum over lists containing it of  scale div (rrf_k + rank)

    ALL-INTEGER — the lists' native scores never mix, which is the
    whole point of RRF (no cross-signal calibration), and integer
    division makes the fusion engine-exact. Ids absent from one list
    contribute 0 from it.

    ``a`` and ``b`` must already be bounded top-L lists (the L-row
    global sort is the retrieval stage's job — BM25's bounded top-k
    window, ANN's TakeOrdered — so the window here ranks L rows, not
    the corpus). Returns the fused top-``k``:
    (id_col, rrf_fp, name_a, name_b).
    """
    from pyspark.sql import Window

    wa = Window.orderBy(*order_a)
    wb = Window.orderBy(*order_b)
    ra = a.select(
        id_col, F.row_number().over(wa).cast("long").alias(name_a)
    )
    rb = b.select(
        id_col, F.row_number().over(wb).cast("long").alias(name_b)
    )
    fused = ra.join(rb, id_col, "full_outer").select(
        id_col,
        (
            F.coalesce(
                F.expr(f"{scale} div ({rrf_k} + {name_a})"), F.lit(0)
            )
            + F.coalesce(
                F.expr(f"{scale} div ({rrf_k} + {name_b})"), F.lit(0)
            )
        )
        .cast("long")
        .alias("rrf_fp"),
        name_a,
        name_b,
    )
    return fused.orderBy(F.desc("rrf_fp"), id_col).limit(k)


def maxsim_topk(
    df: DataFrame,
    query_vecs: list[list[float]],
    k: int = 10,
    exclude_ids: list[int] | None = None,
    group_col: str = "label",
) -> DataFrame:
    """ColBERT-style LATE INTERACTION scoring (Khattab & Zaharia 2020,
    public): treat each ``group_col`` group as a multi-vector document
    and score it against a multi-vector query by

        MaxSim(Q, D) = sum_{q in Q} max_{m in D} cos(q, m)

    — the retrieval shape that beats single-vector similarity when
    relevance is carried by individual tokens/passages rather than
    the pooled embedding.

    Execution: the query vectors are closed over by one Arrow
    mapInPandas pass (bounded: |Q| x d doubles) that computes every
    per-row cosine vectorized — no join, one corpus scan; each cosine
    is floored to 1e-9 fixed point BEFORE aggregation so the per-group
    max and the cross-query sum are order-invariant integers (the
    BM25 contract); ONE groupBy(group) shuffle computes all |Q| maxes
    map-side-partially, and the final score is a fixed |Q|-term
    addition tree. The numpy arithmetic replays the JVM fold's IEEE
    sequence exactly (see the inline note), so results are
    bit-identical to the previous expression path. Returns the
    top-``k`` (group, maxsim_fp)."""
    from stripe_data_pipeline_spark.operators.partitioning import (
        spread_scan,
    )

    df = spread_scan(df)
    if exclude_ids:
        df = df.filter(~F.col("vec_id").isin(*exclude_ids))
    # r14 (guide §4.2): the |Q| per-row cosines used to be |Q|
    # INTERPRETED F.aggregate folds per row, each re-deriving
    # _norm(emb) (HOFs don't enter whole-stage codegen and interpreted
    # expressions get no common-subexpression elimination) — ~|Q| * 2d
    # interpreted ops per row. One Arrow mapInPandas pass now computes
    # every cosine vectorized with the IDENTICAL IEEE sequence: the
    # left-fold dot ((0 + a1*b1) + a2*b2) + ... is accumulated
    # dimension-by-dimension (acc = acc + x[:,i]*q_i), the norm
    # sqrt(fold(e,e)) is computed ONCE per row and reused across all
    # |Q| queries, the query-side norm is the same sequential Python
    # fold Catalyst constant-folded, and the fixed-point term is the
    # same floor(cos * 1e9 + 0.5) — so every c_j is bit-identical to
    # the expression path (oracle replays unchanged).
    import math

    nqv = [[float(v) for v in qv] for qv in query_vecs]
    qnorms = []
    for qv in nqv:
        acc = 0.0
        for v in qv:
            acc += v * v
        qnorms.append(math.sqrt(acc))
    nq = len(nqv)
    g_field = df.schema[group_col].dataType.simpleString()
    out_schema = ", ".join(
        ["g " + g_field] + [f"c{j} long" for j in range(nq)]
    )

    def _score(batches):
        import numpy as np
        import pandas as pd

        q = np.asarray(nqv, dtype=np.float64)
        qn = np.asarray(qnorms, dtype=np.float64)
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(
                [np.asarray(e, dtype=np.float64) for e in pdf["embedding"]]
            )
            n, d = x.shape
            nrm2 = np.zeros(n, dtype=np.float64)
            for i in range(d):
                nrm2 = nrm2 + x[:, i] * x[:, i]
            nrm = np.sqrt(nrm2)
            out = {"g": pdf[group_col]}
            for j in range(nq):
                dot = np.zeros(n, dtype=np.float64)
                for i in range(d):
                    dot = dot + x[:, i] * q[j, i]
                cos = dot / (nrm * qn[j])
                out[f"c{j}"] = np.floor(cos * 1e9 + 0.5).astype(np.int64)
            yield pd.DataFrame(out)

    scored = df.select(group_col, "embedding").mapInPandas(
        _score, schema=out_schema
    )
    per = scored.groupBy("g").agg(
        *[F.max(f"c{j}").alias(f"m{j}") for j in range(len(query_vecs))]
    )
    score = F.col("m0")
    for j in range(1, len(query_vecs)):
        score = score + F.col(f"m{j}")
    return (
        per.select(
            F.col("g").alias(group_col),
            score.cast("bigint").alias("maxsim_fp"),
        )
        .orderBy(F.desc("maxsim_fp"), group_col)
        .limit(k)
    )
