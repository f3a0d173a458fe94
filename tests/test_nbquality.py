"""Naive Bayes quality classifier pins (operators/nbquality.py, r14)
— what the driver-oracle query (nb_quality_scores) does not isolate:
the closed-form weights against hand-replayed math, multinomial
repeat counting, the smoothed unseen-token path, the prior, and the
decision boundary."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators import nbquality as NB

_FP = NB._FP


def _seed(spark):
    return spark.createDataFrame(
        [
            (1, "good good", True),
            (2, "fine good", True),
            (3, "bad spam", False),
        ],
        "doc_id long, text string, is_pos boolean",
    )


def _fp(x: float) -> int:
    return int(math.floor(x * _FP + 0.5))


def test_weights_match_hand_replayed_math(spark):
    weights, unseen_fp, prior_fp = NB.train_nb_quality(_seed(spark))
    w = {r.tok: r.w_fp for r in weights.collect()}
    # counts: good (3,0), fine (1,0), bad (0,1), spam (0,1)
    # v=4, n_pos=4, n_neg=2
    v, n_pos, n_neg = 4, 4, 2

    def expect(cp, cn):
        return _fp(
            math.log((cp + 1.0) / float(n_pos + v))
            - math.log((cn + 1.0) / float(n_neg + v))
        )

    assert w == {
        "good": expect(3, 0),
        "fine": expect(1, 0),
        "bad": expect(0, 1),
        "spam": expect(0, 1),
    }
    assert w["good"] > 0 > w["bad"]
    assert unseen_fp == _fp(math.log((n_neg + v) / (n_pos + v)))
    assert prior_fp == _fp(math.log(2) - math.log(1))


def test_scores_are_integer_sums_with_multinomial_repeats(spark):
    weights, unseen_fp, prior_fp = NB.train_nb_quality(_seed(spark))
    w = {r.tok: r.w_fp for r in weights.collect()}
    docs = spark.createDataFrame(
        [
            (10, "good good bad"),
            (11, "zzz-unseen zzz-unseen"),
            (12, "GOOD"),  # lowercased tokenization
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r
        for r in NB.score_nb_quality(
            docs, weights, unseen_fp, prior_fp
        ).collect()
    }
    assert got[10].score_fp == 2 * w["good"] + w["bad"] + prior_fp
    assert got[10].n_toks == 3
    assert got[11].score_fp == 2 * unseen_fp + prior_fp
    assert got[12].score_fp == w["good"] + prior_fp


def test_keep_is_strict_sign_of_score(spark):
    weights, unseen_fp, prior_fp = NB.train_nb_quality(_seed(spark))
    docs = spark.createDataFrame(
        [(20, "good fine good"), (21, "bad spam bad spam bad spam")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.keep
        for r in NB.score_nb_quality(
            docs, weights, unseen_fp, prior_fp
        ).collect()
    }
    assert got[20] is True and got[21] is False


def test_single_class_seed_refuses_loudly(spark):
    seed = spark.createDataFrame(
        [(1, "only positives here", True)],
        "doc_id long, text string, is_pos boolean",
    )
    with pytest.raises(Exception):
        NB.train_nb_quality(seed)


def test_empty_text_docs_score_the_prior(spark):
    """'for every document' means EVERY document: a token-less doc
    (empty/whitespace text) still gets a decision row — n_toks 0,
    score = the class prior — instead of silently vanishing from the
    output (the r14 review finding: a pipeline inner-joining docs to
    decisions would lose such docs, neither kept nor rejected)."""
    weights, unseen_fp, prior_fp = NB.train_nb_quality(_seed(spark))
    docs = spark.createDataFrame(
        [(30, ""), (31, "good"), (32, "   ")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r
        for r in NB.score_nb_quality(
            docs, weights, unseen_fp, prior_fp
        ).collect()
    }
    assert set(got) == {30, 31, 32}
    for empty_id in (30, 32):
        assert got[empty_id].n_toks == 0
        assert got[empty_id].score_fp == prior_fp
        assert got[empty_id].keep is (prior_fp > 0)
