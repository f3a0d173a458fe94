"""Round-8 second-batch operators pinned against independent Python
references: PageRank's integer recurrence, CMS's upper-bound
guarantee, dHash's planted near-dup pairs, the unigram Viterbi DP vs
brute-force segmentation enumeration, UniMax's waterfill invariants,
and the CCNet tertile balance property."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.io import read_table


def test_pagerank_matches_python_reference(spark):
    from stripe_data_pipeline_spark.operators.graph import (
        SCALE,
        pagerank_fixed_point,
    )

    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3), (4, 1), (1, 4)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank_fixed_point(df, iterations=5).collect()
    }

    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    outdeg = {u: sum(1 for s, _ in edges if s == u) for u in nodes}
    base = (15 * SCALE) // (100 * n)
    rank = {u: SCALE // n for u in nodes}
    for _ in range(5):
        contrib = {u: 0 for u in nodes}
        for s, d in edges:
            contrib[d] += rank[s] // outdeg[s]
        rank = {u: base + (85 * contrib[u]) // 100 for u in nodes}
    assert got == rank
    # mass is conserved up to floor-division loss (bounded drift)
    assert 0 < sum(rank.values()) <= SCALE


def test_cms_estimate_is_an_upper_bound_for_every_token(spark, sf_dir):
    from stripe_data_pipeline_spark.operators import sketch as SK

    toks = (
        read_table(spark, sf_dir, "documents")
        .select(
            F.explode(
                F.filter(F.split("text", " "), lambda t: t != "")
            ).alias("token")
        )
    )
    exact = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("exact_cnt")
    )
    cms = SK.cms_build(toks, "token")
    est = SK.cms_estimate(cms, exact.select("token"), "token")
    bad = (
        exact.join(est, "token")
        .filter(F.col("cms_est") < F.col("exact_cnt"))
        .count()
    )
    assert bad == 0  # CMS never underestimates


def test_dhash_finds_every_planted_pair(spark, sf_dir):
    from stripe_data_pipeline_spark.catalog.multimodal_queries import (
        q_media_dhash_near_dups,
    )

    pairs = q_media_dhash_near_dups(spark, sf_dir).collect()
    n_docs = read_table(spark, sf_dir, "documents").count()
    planted = {(2 * k, 2 * k + 1) for k in range(n_docs // 2)}
    found = {(r["doc_a"], r["doc_b"]) for r in pairs}
    assert planted <= found
    assert all(0 <= r["hamming"] <= 4 for r in pairs)


def test_unigram_viterbi_matches_bruteforce_enumeration(spark, sf_dir):
    """The DP must agree with explicitly enumerating EVERY
    segmentation of every distinct word (words are <= 8 chars, so
    2^7 splits max) under the same (cost, path) tie-break."""
    from stripe_data_pipeline_spark.operators.unigram import (
        SEP,
        train_unigram,
    )

    docs = read_table(spark, sf_dir, "documents")
    words, costs, segs = train_unigram(docs, iters=2)
    cost_map = {r["piece"]: int(r["cost_fp"]) for r in costs.collect()}

    def brute(word: str):
        best = None
        n = len(word)
        for mask in itertools.product([0, 1], repeat=max(n - 1, 0)):
            cuts = [0] + [i + 1 for i, b in enumerate(mask) if b] + [n]
            pieces = [word[cuts[i] : cuts[i + 1]] for i in range(len(cuts) - 1)]
            if any(p not in cost_map for p in pieces):
                continue
            cand = (
                sum(cost_map[p] for p in pieces),
                "".join(SEP + p for p in pieces),
            )
            if best is None or cand < best:
                best = cand
        return best

    for r in segs.collect():
        exp = brute(r["word"])
        assert exp is not None
        assert (int(r["cost_fp"]), SEP + SEP.join(r["pieces"])) == (
            exp[0],
            exp[1],
        ), r["word"]


def test_unimax_waterfill_invariants(spark, sf_dir):
    from stripe_data_pipeline_spark.operators.sampling import unimax_budgets

    docs = read_table(spark, sf_dir, "documents")
    rows = unimax_budgets(docs, budget_num=3, budget_den=4, epochs=1).collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = (total * 3) // 4
    allocs = [r["alloc_tokens"] for r in rows]
    assert sum(allocs) <= budget
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["n_tokens"]  # epochs=1 cap
    # the largest language absorbs surplus: its allocation is the max
    big = max(rows, key=lambda r: r["n_tokens"])
    assert big["alloc_tokens"] == max(allocs)


def test_ccnet_buckets_are_balanced_tertiles(spark, sf_dir):
    from stripe_data_pipeline_spark.operators.text import (
        ccnet_perplexity_buckets,
    )

    docs = read_table(spark, sf_dir, "documents")
    rows = ccnet_perplexity_buckets(docs).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        counts = {"head": 0, "middle": 0, "tail": 0}
        for r in rs:
            counts[r["bucket"]] += 1
        assert max(counts.values()) - min(counts.values()) <= 1, lang
        # head is the most-predictable third
        head_max = max(r["ppl_fp"] for r in rs if r["bucket"] == "head")
        tail_min = min(r["ppl_fp"] for r in rs if r["bucket"] == "tail")
        assert head_max <= tail_min
