"""Seed-supervised Naive Bayes quality classifier (r14) — the
learned quality-filter step of the public CCNet / fastText /
DataComp-baselines pipelines: train a linear text classifier on a
POSITIVE seed corpus (the domain you want: wiki-like pages, curated
references) vs a NEGATIVE seed (random crawl), then score every
document and keep what classifies positive.

This is the supervised counterpart of the repo's existing
distribution-matching ops (DSIR importance weights, CCNet perplexity
buckets, Kneser-Ney/Stupid-Backoff LM scores): those weight documents
toward a target distribution; this one makes a seed-labeled DECISION
per document, the way fastText's supervised classifier is used as the
quality gate in the published CC filtering recipes. Multinomial NB
with Laplace smoothing IS a linear model over token counts (weights =
per-token log-likelihood ratios, bias = class prior), i.e. exactly
the shape fastText learns, with closed-form training that one Spark
aggregation computes — no SGD, no iteration, deterministic.

Exactness contract (the TF-IDF/BM25 precedent in this repo): each
token weight is a DOUBLE log-likelihood ratio rounded to 1e-9
fixed-point (``* 1e9``, ``ROUND``, cast bigint) at the VOCABULARY
level — one libm ``ln`` call site per distinct token on each engine —
and document scores are INTEGER sums of those fixed-point weights, so
bit-parity with the DuckDB oracle survives both libm ULP wobble and
double-summation order.

Scale shape at 100 TB: training is one token-explode + one
vocabulary groupBy (the corpus-vocab aggregate every tokenizer op
here already pays); the vocabulary table is bounded by vocab size,
not corpus size, so scoring is a BROADCAST join of weights onto the
token stream plus one per-doc integer-sum groupBy — scan speed, two
shuffles total (vocab agg, doc agg), nothing all-pairs, no driver
data. Unseen tokens take the smoothed zero-count weight
``ln((n_neg + V) / (n_pos + V))`` via the left join's COALESCE, so
out-of-vocabulary text degrades gracefully instead of erroring.

No reference-repo counterpart (the reference has no text ops at
all); method: standard multinomial NB (Manning/Raghavan/Schütze IIR
ch. 13) as used by the CCNet and DataComp filtering writeups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FP = 1_000_000_000  # 1e-9 fixed point, the repo's ln-score precision


def _tokens(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")


def train_nb_quality(
    seed: DataFrame,
    label_col: str = "is_pos",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, int, int]:
    """(vocab weights, fixed-point unseen weight, fixed-point prior)
    from a seed frame with a boolean ``label_col``. The weights frame
    is (tok, w_fp) with w_fp = round(1e9 * (ln((c_pos+1)/(n_pos+V)) -
    ln((c_neg+1)/(n_neg+V)))) — multinomial NB log-likelihood ratios,
    Laplace-smoothed, fixed-point at the vocab level."""
    toks = _tokens(seed, id_col, text_col).join(
        seed.select(id_col, label_col), id_col
    )
    pos = F.col(label_col).cast("long")
    counts = toks.groupBy("tok").agg(
        F.sum(pos).alias("c_pos"),
        F.sum(1 - pos).alias("c_neg"),
    )
    # bounded driver collect: 3 longs (vocab size + class token totals)
    tot = counts.agg(
        F.count(F.lit(1)).alias("v"),
        F.sum("c_pos").alias("n_pos"),
        F.sum("c_neg").alias("n_neg"),
    ).collect()[0]
    v, n_pos, n_neg = int(tot["v"]), int(tot["n_pos"]), int(tot["n_neg"])

    def _w(cp, cn):
        # FLOOR(x*1e9 + 0.5) is the repo's cross-engine fixed-point
        # idiom (tfidf/bm25 precedent) — identical halfway behavior on
        # both engines, unlike ROUND's dialect-specific ties
        return (
            F.floor(
                (
                    F.log((cp + F.lit(1.0)) / F.lit(float(n_pos + v)))
                    - F.log((cn + F.lit(1.0)) / F.lit(float(n_neg + v)))
                )
                * F.lit(float(_FP))
                + F.lit(0.5)
            ).cast("bigint")
        )

    weights = counts.select("tok", _w(F.col("c_pos"), F.col("c_neg")).alias("w_fp"))
    import math

    unseen_fp = int(
        math.floor(math.log((n_neg + v) / (n_pos + v)) * _FP + 0.5)
    )
    docs = seed.select(id_col, label_col).distinct()
    d = docs.agg(
        F.sum(pos).alias("d_pos"), F.sum(1 - pos).alias("d_neg")
    ).collect()[0]
    prior_fp = int(
        math.floor(
            (math.log(int(d["d_pos"])) - math.log(int(d["d_neg"]))) * _FP
            + 0.5
        )
    )
    return weights, unseen_fp, prior_fp


def score_nb_quality(
    docs: DataFrame,
    weights: DataFrame,
    unseen_fp: int,
    prior_fp: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_toks, score_fp, keep) for EVERY document — including
    token-less ones (empty/whitespace text), which score exactly the
    class prior via the left join back onto ``docs`` (r14 review: the
    explode used to silently drop them from the output, so a pipeline
    inner-joining docs to decisions lost them — neither kept nor
    rejected). score_fp = prior + Σ w_fp over token OCCURRENCES
    (multinomial — repeats count), an exact integer; keep =
    score_fp > 0 (the maximum-a-posteriori decision at equal loss)."""
    toks = _tokens(docs, id_col, text_col)
    scored = toks.join(F.broadcast(weights), "tok", "left").groupBy(
        id_col
    ).agg(
        F.count(F.lit(1)).alias("n_toks"),
        (
            F.sum(F.coalesce(F.col("w_fp"), F.lit(unseen_fp)))
            + F.lit(prior_fp)
        ).alias("score_fp"),
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_toks", F.lit(0)).cast("bigint").alias("n_toks"),
            F.coalesce("score_fp", F.lit(prior_fp))
            .cast("bigint")
            .alias("score_fp"),
        )
        .withColumn("keep", F.col("score_fp") > 0)
    )
