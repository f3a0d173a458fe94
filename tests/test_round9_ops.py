"""Round-9 regression tests: the four ADVICE-r8 fixes.

- cms_estimate probes keys absent from the sketch -> estimate 0
  (left join + coalesce, not a silent drop / overestimate);
- unimax_budgets skips zero-token languages instead of dividing by
  zero, and the oracle's unrolled stage count covers every SF;
- pagerank_fixed_point raises a clear contract error on an empty
  edge list instead of ZeroDivisionError after a count() job;
- encode_documents_by_word drops empty encodes like encode_documents.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.io import read_table


def test_cms_estimate_returns_zero_for_unseen_keys(spark):
    from stripe_data_pipeline_spark.operators import sketch as SK

    toks = spark.createDataFrame(
        [("alpha",)] * 5 + [("beta",)] * 3, "token string"
    )
    cms = SK.cms_build(toks, "token")
    probes = spark.createDataFrame(
        [("alpha",), ("never-in-corpus-zzz",)], "token string"
    )
    got = {
        r["token"]: r["cms_est"]
        for r in SK.cms_estimate(cms, probes, "token").collect()
    }
    # the unseen key must be PRESENT with the true CMS answer 0
    # unless it collides with a stored key in all 4 rows (it does
    # not for this fixture), and the seen key stays an upper bound
    assert got["never-in-corpus-zzz"] == 0
    assert got["alpha"] >= 5


def test_unimax_skips_zero_token_languages(spark):
    from stripe_data_pipeline_spark.operators.sampling import (
        unimax_budgets,
    )

    df = spark.createDataFrame(
        [
            ("en", "a b c d"),
            ("en", "e f"),
            ("fr", "x y z"),
            ("empty", ""),
            ("empty", "   "),
        ],
        "lang string, text string",
    )
    rows = unimax_budgets(df).collect()
    langs = {r["lang"] for r in rows}
    assert "empty" not in langs  # no ZeroDivisionError, no row
    assert langs == {"en", "fr"}
    for r in rows:
        assert r["n_tokens"] > 0 and r["epochs_bp"] >= 0


def test_unimax_oracle_stage_count_covers_every_sf():
    """The oracle unrolls _UNIMAX_STAGES sequential waterfill CTEs;
    parity breaks silently if any SF grows more languages than that
    (ADVICE r8) — pin the data contract here."""
    import duckdb

    from stripe_data_pipeline_spark.catalog.sampling_queries import (
        _UNIMAX_STAGES,
    )

    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        n = duckdb.sql(
            "SELECT COUNT(DISTINCT lang) FROM "
            f"read_parquet('/root/testdata/{sf}/documents.parquet') "
            "WHERE len(list_filter(string_split(text, ' '), "
            "x -> x <> '')) > 0"
        ).fetchone()[0]
        assert n <= _UNIMAX_STAGES, (sf, n)


def test_pagerank_empty_edges_raises_value_error(spark):
    from stripe_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank_fixed_point(empty, iterations=1)


def test_encode_by_word_drops_empty_encodes(spark):
    """encode_documents drops docs whose encode is empty via its
    size>0 filter; the word-level path must do the same even when
    every word of a doc joins to an empty subword array."""
    from stripe_data_pipeline_spark.operators import bpe

    df = spark.createDataFrame(
        [(1, "aa bb"), (2, "cc")], "doc_id long, text string"
    )
    merges = [("a", "a</w>"), ("b", "b</w>"), ("c", "c</w>")]
    direct = {
        r["doc_id"]: r["subwords"]
        for r in bpe.encode_documents(df, merges).collect()
    }
    by_word = {
        r["doc_id"]: r["subwords"]
        for r in bpe.encode_documents_by_word(df, merges).collect()
    }
    assert direct == by_word
    # and on the shared testdata corpus the two plans stay identical
    # (pinned more broadly in test_bpe_encode.py)


def test_pagerank_checkpoints_edges_once(spark, sf_dir):
    """The r9 perf fix: the upstream edge plan must be materialized
    once, not re-run per power-iteration round. Cheap proxy: the
    returned plan must not contain the parquet scan of lineitem
    (everything upstream is behind localCheckpoint cuts)."""
    from stripe_data_pipeline_spark.catalog.relational_queries import (
        q_pagerank_customer_supplier,
    )

    out = q_pagerank_customer_supplier(spark, sf_dir)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "lineitem" not in plan
    assert out.count() > 0


def test_documents_have_no_zero_token_language(sf_dir):
    """unimax parity depends on no real SF shipping an all-empty
    language; if the generator ever does, the operator+oracle both
    skip it — this test documents the current contract."""
    import duckdb

    n = duckdb.sql(
        "SELECT COUNT(*) FROM (SELECT lang FROM "
        f"read_parquet('{sf_dir}/documents.parquet') GROUP BY lang "
        "HAVING SUM(len(list_filter(string_split(text, ' '), "
        "x -> x <> ''))) = 0)"
    ).fetchone()[0]
    assert n == 0


def test_semdedup_prunes_planted_duplicate(spark):
    from stripe_data_pipeline_spark.operators.semdedup import (
        semdedup_flags,
    )

    # 4 seed vectors (k=4) + a near-copy of vec 1: the copy pair must
    # lose exactly one side, everything else survives.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.0, 1.0, 0.0, 0.0], 1),
        (2, [0.0, 0.0, 1.0, 0.0], 2),
        (3, [0.0, 0.0, 0.0, 1.0], 3),
        (4, [0.01, 0.9999, 0.0, 0.0], 1),
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = {
        r["vec_id"]: (r["cluster"], r["kept"])
        for r in semdedup_flags(
            emb, k=4, iters=2, threshold=0.95
        ).collect()
    }
    assert len(out) == 5
    kept = {v for v, (_, k) in out.items() if k}
    # vec 1 and 4 share a cluster and cos ~0.9999 >= 0.95: exactly one
    # of them drops (the one nearer the centroid), others all stay.
    assert {0, 2, 3} <= kept
    assert len({1, 4} & kept) == 1


def test_rrf_fuse_matches_hand_computation(spark):
    from stripe_data_pipeline_spark.operators.similarity import rrf_fuse

    a = spark.createDataFrame(
        [(10, 900), (20, 800), (30, 700)], "doc_id long, s long"
    )
    b = spark.createDataFrame(
        [(20, 99), (40, 88)], "doc_id long, c long"
    )
    got = {
        r["doc_id"]: (r["rrf_fp"], r["r_lex"], r["r_sem"])
        for r in rrf_fuse(
            a,
            b,
            order_a=(F.desc("s"), F.asc("doc_id")),
            order_b=(F.desc("c"), F.asc("doc_id")),
            id_col="doc_id",
            k=10,
            rrf_k=60,
            scale=10**12,
        ).collect()
    }
    S = 10**12
    assert got[20] == (S // 62 + S // 61, 2, 1)  # in both lists
    assert got[10] == (S // 61, 1, None)
    assert got[40] == (S // 62, None, 2)
    assert got[30] == (S // 63, 3, None)
    # fused order: doc 20 dominates (two contributions)
    assert max(got, key=lambda d: got[d][0]) == 20


def test_hist_quantile_bounds_bracket_exact_percentiles(spark, sf_dir):
    import duckdb

    from stripe_data_pipeline_spark.operators import sketch as SK

    cents = read_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("c")
    )
    width = 1_000_000
    h = SK.hist_build(cents, "c", width)
    rows = SK.hist_quantile_bounds(h, [2500, 5000, 9900], width).collect()
    exact = {
        q: duckdb.sql(
            "SELECT CAST(FLOOR(o_totalprice*100.0+0.5) AS BIGINT) c "
            f"FROM read_parquet('{sf_dir}/orders.parquet') "
            f"ORDER BY c LIMIT 1 OFFSET (SELECT ((COUNT(*)*{q}+9999)//10000)-1 "
            f"FROM read_parquet('{sf_dir}/orders.parquet'))"
        ).fetchone()[0]
        for q in (2500, 5000, 9900)
    }
    for r in rows:
        v = exact[r["q_bp"]]
        assert r["lo"] <= v <= r["hi"], (r, v)  # bucket-width guarantee


def test_hist_merge_equals_single_build(spark, sf_dir):
    from stripe_data_pipeline_spark.operators import sketch as SK

    cents = read_table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 3).alias("shard"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("c"),
    )
    width = 1_000_000
    full = SK.hist_build(cents, "c", width)
    merged = SK.hist_merge(
        *[
            SK.hist_build(cents.filter(F.col("shard") == i), "c", width)
            for i in range(3)
        ]
    )
    a = {r["bucket"]: r["cnt"] for r in full.collect()}
    b = {r["bucket"]: r["cnt"] for r in merged.collect()}
    assert a == b


def test_winnowing_locality_guarantee(spark):
    """The paper's theorem: any shared substring of length >= k+w-1
    (= 11 for k=8, w=4) yields at least one shared fingerprint."""
    from stripe_data_pipeline_spark.operators.winnow import winnow_select

    shared = "QWERTYUIOPA"  # 11 chars, appears in both docs
    df = spark.createDataFrame(
        [
            (1, "aaaaaaaa" + shared + "bbbbbbbbbbbb"),
            (2, "cccccccccccc" + shared + "dddddddd"),
            (3, "eeeeeeeeeeeeeeeeeeeeeeeeeeeeeeee"),
        ],
        "doc_id long, text string",
    )
    sel = winnow_select(df, k=8, w=4).collect()
    by_doc: dict = {}
    for r in sel:
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    # density: winnowing keeps far fewer than all k-grams
    n1 = len([r for r in sel if r["doc_id"] == 1])
    assert n1 < (len("aaaaaaaa" + shared + "bbbbbbbbbbbb") - 7)


def test_winnowing_skips_docs_shorter_than_one_window(spark):
    from stripe_data_pipeline_spark.operators.winnow import winnow_select

    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "a" * 30)],  # L=3 (<w=4) vs L=23
        "doc_id long, text string",
    )
    docs = {r["doc_id"] for r in winnow_select(df, k=8, w=4).collect()}
    assert docs == {2}


def test_weighted_sample_favors_heavy_rows(spark):
    """E-S property check: with one row 1000x heavier than the rest,
    that row must (a) be selected into any reasonably-sized sample
    and (b) rank first with overwhelming probability under the
    deterministic hash draw."""
    from stripe_data_pipeline_spark.operators.sampling import (
        weighted_sample,
    )

    rows = [(i, 10) for i in range(100)] + [(1000, 100000)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = weighted_sample(df, "n_chars", k=10).collect()
    assert len(got) == 10
    ids = [r["doc_id"] for r in got]
    assert 1000 in ids
    # keys are ln(u)/w <= 0 and sorted descending
    keys = [r["key_fp"] for r in got]
    assert keys == sorted(keys, reverse=True)
    assert all(k <= 0 for k in keys)
    # zero/negative weights are excluded, not division-by-zero'd
    df2 = spark.createDataFrame(
        [(1, 0), (2, 5)], "doc_id long, n_chars long"
    )
    got2 = [r["doc_id"] for r in weighted_sample(df2, "n_chars", k=5).collect()]
    assert got2 == [2]


def test_pmi_ranks_exclusive_pair_first(spark):
    """A bigram whose two tokens appear ONLY together maximizes PMI;
    a bigram of two very common tokens scores far lower."""
    from stripe_data_pipeline_spark.operators.text import (
        pmi_collocations,
    )

    docs = [
        ("rare pair common common common filler", ),
        ("rare pair common filler common filler", ),
        ("common filler common filler common filler", ),
        ("rare pair filler common filler common", ),
        ("rare pair common common filler filler", ),
        ("rare pair filler filler common common", ),
    ]
    df = spark.createDataFrame(docs, "text string")
    got = pmi_collocations(df, min_count=5, k=5).collect()
    assert got, "no pairs above min_count"
    top = got[0]
    assert (top["w1"], top["w2"]) == ("rare", "pair")
    # and every returned pmi is a finite integer ordering
    vals = [r["pmi_fp"] for r in got]
    assert vals == sorted(vals, reverse=True)


def test_ann_recall_and_zipf_shapes(spark, sf_dir):
    from stripe_data_pipeline_spark.catalog.similarity_queries import (
        q_ann_recall_check,
    )
    from stripe_data_pipeline_spark.catalog.text_queries import (
        q_zipf_fit_tokens,
    )

    r = q_ann_recall_check(spark, sf_dir).collect()[0]
    assert r["k"] == 10 and 0 <= r["n_overlap"] <= 10
    assert r["recall_bp"] == r["n_overlap"] * 1000
    z = q_zipf_fit_tokens(spark, sf_dir).collect()[0]
    # n_points = min(100, vocab); the sf0.001 corpus has a ~31-token
    # vocabulary, so assert the bound rather than the cap
    assert 2 <= z["n_points"] <= 100
    assert z["slope_micro"] < 0  # frequency falls with rank


def test_incremental_join_mart_exercises_cross_terms(spark, sf_dir):
    """The IVM check is only meaningful if the out-of-order cut is
    real: the data must HAVE even line numbers (late arrivals for
    batch-1 orders) and low-orderkey orders, and the maintained mart
    must equal the one-shot join exactly."""
    from stripe_data_pipeline_spark.catalog.streaming_queries import (
        q_incremental_join_mart_check,
    )

    li = read_table(spark, sf_dir, "lineitem")
    assert li.filter(F.col("l_linenumber") % 2 == 0).count() > 0
    mart = q_incremental_join_mart_check(spark, sf_dir)
    o = read_table(spark, sf_dir, "orders")
    full = o.join(li, o["o_orderkey"] == li["l_orderkey"])
    assert mart.count() == full.count()
    # multiset equality per join key: duplicate line rows exist in
    # this synthetic data (same (orderkey, linenumber) twice), so the
    # check is per-key COUNTS matching the one-shot join, which also
    # proves the re-delivered second batch added nothing twice
    a = {
        (r["o_orderkey"], r["l_linenumber"]): r["count"]
        for r in mart.groupBy("o_orderkey", "l_linenumber").count().collect()
    }
    b = {
        (r["o_orderkey"], r["l_linenumber"]): r["count"]
        for r in full.groupBy("o_orderkey", "l_linenumber").count().collect()
    }
    assert a == b


def test_stupid_backoff_walks_every_branch(spark):
    """Hand-computed fixture exercising trigram hit, bigram backoff,
    unigram floor with seen word, and unigram floor with UNSEEN word.
    Train corpus: one doc 'a b c' -> c3={abc:1}, c2={ab:1, bc:1},
    c1={a,b,c:1}, N=3, V=3."""
    import math

    from stripe_data_pipeline_spark.operators.text import (
        stupid_backoff_scores,
    )

    df = spark.createDataFrame(
        [
            (0, "train", "a b c"),
            (1, "test", "a b c"),   # trigram hit: S=1
            (2, "test", "c b c"),   # bigram backoff: S=0.4*(1/1)
            (3, "test", "b c a"),   # unigram floor, seen 'a'
            (4, "test", "a b x"),   # unigram floor, UNSEEN 'x'
        ],
        "doc_id long, split string, text string",
    )
    got = {
        r["doc_id"]: (r["n_scored"], r["score_fp"])
        for r in stupid_backoff_scores(df).collect()
    }
    fp = lambda s: math.floor(math.log(s) * 1e9)  # noqa: E731
    assert got[1] == (1, fp(1.0))
    assert got[2] == (1, fp(0.4 * (1.0 / 1.0)))
    assert got[3] == (1, fp(0.4 * 0.4 * ((1.0 + 1.0) / (3.0 + 3.0))))
    assert got[4] == (1, fp(0.4 * 0.4 * ((0.0 + 1.0) / (3.0 + 3.0))))
    assert got[0] == (1, fp(1.0))  # train doc scores too
