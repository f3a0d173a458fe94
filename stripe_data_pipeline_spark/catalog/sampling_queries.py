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
