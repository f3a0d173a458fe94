"""Deterministic sampling / split queries over the documents table
(north-star: training-data pipelines).

Every query here is fully oracled: the hash primitive is md5 (byte-
identical across engines), so Spark and DuckDB independently compute
the same buckets, splits, samples and per-stratum picks — proving the
selection is engine- and layout-independent, which is the whole point
of deterministic sampling at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.catalog.registry import register
from stripe_data_pipeline_spark.io import read_table
from stripe_data_pipeline_spark.operators import sampling as SA

# DuckDB rendering of operators.sampling.hash_bucket (md5 hex -> int).
_BUCKET = "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"


@register(
    "dataset_split_assign",
    oracle=f"""
SELECT doc_id,
       CASE WHEN {_BUCKET} < 80 THEN 'train'
            WHEN {_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    doc="Deterministic train/val/test assignment by md5 hash-range of "
    "doc_id (80/10/10). Stable under corpus growth (a key's split "
    "never changes when other rows appear) and engine-independent — "
    "the oracle recomputes the same assignment from scratch in DuckDB. "
    "Pure projection: fuses into the scan, no shuffle at any scale.",
)
def q_dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return SA.assign_split(docs, "doc_id").select("doc_id", "split")


@register(
    "dataset_split_counts",
    oracle=f"""
SELECT CASE WHEN {_BUCKET} < 80 THEN 'train'
            WHEN {_BUCKET} < 90 THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
""",
    doc="Split-size audit: doc and char counts per train/val/test "
    "split — the sanity report a data pipeline emits before training.",
)
def q_dataset_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return (
        SA.assign_split(docs, "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@register(
    "deterministic_sample_docs",
    oracle=f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_BUCKET} < 10
""",
    doc="Deterministic ~10% sample by key hash: a reproducible "
    "TABLESAMPLE that selects the same rows on any engine, any run, "
    "any partition layout. Map-side filter — pushes to the scan.",
)
def q_deterministic_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return SA.deterministic_sample(docs, "doc_id", rate_pct=10).select(
        "doc_id", "lang", "source"
    )


@register(
    "per_group_sample_docs",
    oracle="""
SELECT lang, doc_id
FROM (
    SELECT lang, doc_id,
           row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS rn
    FROM documents
)
WHERE rn <= 5
""",
    doc="k-per-stratum deterministic sample (5 docs per language) by "
    "md5-of-key order — reservoir-sampling semantics without state or "
    "randomness; one bounded window over the stratum key.",
)
def q_per_group_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return SA.per_group_sample(docs, "lang", "doc_id", k=5).select("lang", "doc_id")


@register(
    "lang_rebalanced_sample",
    oracle="""
WITH c AS (
    SELECT lang, COUNT(*) AS cnt FROM documents GROUP BY 1
), m AS (
    SELECT MIN(cnt) AS mn FROM c
), r AS (
    SELECT lang,
           CAST(FLOOR(sqrt(CAST(mn AS DOUBLE) / CAST(cnt AS DOUBLE)) * 1e4)
                AS BIGINT) AS rate_bp
    FROM c, m
)
SELECT d.doc_id, d.lang, r.rate_bp
FROM documents d JOIN r USING (lang)
WHERE CAST(('0x' || substr(md5('rebal' || CAST(d.doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) % 10000 < r.rate_bp
""",
    doc="Temperature-style language rebalancing: each language keeps "
    "sqrt(min_count/count) of its docs (smallest keeps 100%), rows "
    "chosen by salted md5 bucket. Rates broadcast back onto the scan; "
    "the corpus itself is never shuffled. sqrt/divide are exactly-"
    "rounded IEEE ops, so selection is bit-identical cross-engine.",
)
def q_lang_rebalanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    return SA.rebalanced_sample(docs, "lang", "doc_id").select(
        "doc_id", "lang", "rate_bp"
    )


@register(
    "source_mix_plan",
    oracle="""
WITH per AS (
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(len(list_filter(string_split(text, ' '),
                                         x -> x <> '')) AS BIGINT))
                AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY source
), w AS (
    SELECT *,
           CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6 + 5e-1)
                AS BIGINT) AS weight_fp
    FROM per
), t AS (
    SELECT CAST(SUM(weight_fp) AS BIGINT) AS tot FROM w
)
SELECT source, n_docs, n_tokens, weight_fp,
       CAST(weight_fp * 1000000 // tot AS BIGINT) AS target_tokens,
       CAST((weight_fp * 1000000 // tot) * 10000 // n_tokens AS BIGINT)
           AS repeat_bp
FROM w, t
""",
    doc="Token-budget mixing plan under sqrt-temperature weighting: "
    "per-source token counts, fixed-point sqrt weights (bit-exact "
    "cross-engine), integer-division token allocations at a 1e6 "
    "budget, and the repeat factor in basis points (>10000 = "
    "upsample). One tiny-key agg + one single-row broadcast; the "
    "corpus is never shuffled.",
)
def q_source_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SA.source_mix_plan(
        read_table(spark, sf_dir, "documents"), token_budget=1_000_000
    )


@register(
    "vocab_overlap_hll_check",
    oracle=f"""
WITH toks AS (
    SELECT CASE WHEN {_BUCKET} < 80 THEN 'train'
                WHEN {_BUCKET} < 90 THEN 'val'
                ELSE 'test' END AS split,
           t.tok
    FROM documents, UNNEST(list_filter(string_split(text, ' '), x -> x <> '')) AS t(tok)
),
tr AS (SELECT DISTINCT tok FROM toks WHERE split = 'train'),
te AS (SELECT DISTINCT tok FROM toks WHERE split = 'test')
SELECT (SELECT COUNT(*) FROM tr) AS n_train_vocab,
       (SELECT COUNT(*) FROM te) AS n_test_vocab,
       (SELECT COUNT(*) FROM tr JOIN te USING (tok)) AS n_overlap_exact,
       TRUE AS hll_within_10pct
""",
    doc="Sketch-algebra overlap estimation (the 100 TB pre-filter "
    "decision tool): train/test vocabulary overlap via HLL "
    "inclusion-exclusion — est(A) + est(B) - est(union(A,B)) from "
    "three CONSTANT-SIZE sketches built in one corpus pass, no "
    "distinct-key shuffle and no join. The exact counts (which the "
    "oracle recomputes) ride along only to PIN the estimate: "
    "hll_within_10pct asserts the sketch answer lands within 10% of "
    "the exact overlap, so the driver bit-checks that the estimator "
    "actually works; production would ship the estimate alone and "
    "skip the exact joins entirely. Register maxima are commutative, "
    "so the flag is deterministic under any partitioning.",
)
def q_vocab_overlap_hll_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    tok = F.explode(
        F.filter(F.split(F.col("text"), " "), lambda t: t != "")
    ).alias("tok")
    toks = SA.assign_split(docs, "doc_id").select("split", tok)
    tr = toks.filter(F.col("split") == "train").agg(
        F.countDistinct("tok").alias("n_train_vocab"),
        F.hll_sketch_agg("tok").alias("sk_tr"),
    )
    te = toks.filter(F.col("split") == "test").agg(
        F.countDistinct("tok").alias("n_test_vocab"),
        F.hll_sketch_agg("tok").alias("sk_te"),
    )
    overlap = (
        toks.filter(F.col("split") == "train")
        .select("tok")
        .distinct()
        .join(
            toks.filter(F.col("split") == "test").select("tok").distinct(),
            "tok",
            "left_semi",
        )
        .agg(F.count(F.lit(1)).alias("n_overlap_exact"))
    )
    est = (
        F.hll_sketch_estimate("sk_tr")
        + F.hll_sketch_estimate("sk_te")
        - F.hll_sketch_estimate(F.expr("hll_union(sk_tr, sk_te)"))
    )
    return (
        tr.crossJoin(te)
        .crossJoin(overlap)  # three 1-row aggregates — broadcast literals
        .select(
            "n_train_vocab",
            "n_test_vocab",
            "n_overlap_exact",
            (
                F.abs(est - F.col("n_overlap_exact"))
                <= F.lit(0.10) * F.col("n_overlap_exact")
            ).alias("hll_within_10pct"),
        )
    )


def _unimax_stage(i: int) -> str:
    return f"""a{i} AS (
    SELECT r.lang, r.n_tokens, r.r,
           LEAST(r.n_tokens, s.remaining // s.left_) AS alloc
    FROM rk r, s{i - 1} s WHERE r.r = {i}
),
s{i} AS (
    SELECT s.remaining - COALESCE((SELECT alloc FROM a{i}), 0) AS remaining,
           s.left_ - (SELECT COUNT(*) FROM a{i}) AS left_
    FROM s{i - 1} s
)"""


_UNIMAX_STAGES = 6  # >= max distinct languages in any SF


@register(
    "unimax_lang_budgets",
    oracle="""
WITH per0 AS (
    SELECT lang,
           CAST(SUM(CAST(len(list_filter(string_split(text, ' '),
                                         x -> x <> '')) AS BIGINT))
                AS BIGINT) AS n_tokens
    FROM documents GROUP BY lang
),
per AS (
    SELECT * FROM per0 WHERE n_tokens > 0
),
rk AS (
    SELECT lang, n_tokens,
           ROW_NUMBER() OVER (ORDER BY n_tokens, lang) AS r
    FROM per
),
s0 AS (
    SELECT (CAST(SUM(n_tokens) AS BIGINT) * 3) // 4 AS remaining,
           CAST(COUNT(*) AS BIGINT) AS left_
    FROM per
),
"""
    + ",\n".join(_unimax_stage(i) for i in range(1, _UNIMAX_STAGES + 1))
    + f"""
SELECT lang, n_tokens, CAST(r AS BIGINT) AS rank,
       CAST(alloc AS BIGINT) AS alloc_tokens,
       CAST(alloc * 10000 // n_tokens AS BIGINT) AS epochs_bp
FROM ({" UNION ALL ".join(f"SELECT * FROM a{i}" for i in range(1, _UNIMAX_STAGES + 1))})
""",
    doc="UniMax language budgeting (Chung et al. 2023): waterfill a "
    "75%-of-corpus token budget across languages in ascending size "
    "with a 1-epoch cap — small languages take min(their corpus, "
    "fair share), surplus rolls to the large ones; the published "
    "fairness improvement over temperature sampling. All-integer "
    "floor arithmetic; the oracle unrolls the sequential waterfill "
    "one CTE per rank. Counting is a per-lang groupBy; the fill is "
    "driver-side over the BOUNDED language list "
    "(operators/sampling.py::unimax_budgets).",
)
def q_unimax_lang_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SA.unimax_budgets(
        read_table(spark, sf_dir, "documents"),
        budget_num=3,
        budget_den=4,
        epochs=1,
    )


@register(
    "weighted_sample_docs",
    oracle="""
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       CAST(FLOOR(ln((CAST(CAST(('0x' || substr(md5('wsamp:' || CAST(doc_id AS VARCHAR)), 1, 12))
                           AS BIGINT) AS DOUBLE) + 1.0) / 281474976710656.0)
                  / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS key_fp
FROM documents
WHERE n_chars > 0
ORDER BY key_fp DESC, doc_id
LIMIT 50
""",
    doc="Weighted sampling WITHOUT replacement (Efraimidis & Spirakis "
    "2006): every doc draws u in (0,1] from 48 md5 bits and keeps "
    "key ln(u)/weight; the 50 largest keys are the weighted sample "
    "— longer docs proportionally likelier, no replacement, ONE "
    "pass, no state. THE distributed weighted sampler (Spark's "
    "sampleBy is Bernoulli-only and engine-private); md5-derived u "
    "makes the 'randomness' reproducible on any engine, run, or "
    "partition layout. Map-side key + bounded TakeOrdered "
    "(operators/sampling.py::weighted_sample).",
)
def q_weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return SA.weighted_sample(
        read_table(spark, sf_dir, "documents"), "n_chars", k=50
    )
