"""Deterministic sampling / split operators: the properties that make
them usable at 100 TB — stability under corpus growth, partition-layout
independence, and exact reproducibility."""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.io import read_table
from stripe_data_pipeline_spark.operators import sampling as SA


def _splits(df):
    return {r["doc_id"]: r["split"] for r in df.select("doc_id", "split").collect()}


def test_split_assignment_stable_under_growth(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    full = _splits(SA.assign_split(docs, "doc_id"))
    # assigning on a half-corpus subset must give the same split per key
    subset = docs.filter(F.col("doc_id") % 2 == 0)
    sub = _splits(SA.assign_split(subset, "doc_id"))
    assert sub == {k: v for k, v in full.items() if k % 2 == 0}


def test_split_ratios_roughly_80_10_10(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    counts = {
        r["split"]: r["n"]
        for r in SA.assign_split(docs, "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert 0.7 <= counts["train"] / total <= 0.9


def test_deterministic_sample_reproducible_and_layout_independent(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    ids1 = {r["doc_id"] for r in SA.deterministic_sample(docs, "doc_id", 10).collect()}
    # same selection after an arbitrary repartition (layout independence)
    ids2 = {
        r["doc_id"]
        for r in SA.deterministic_sample(docs.repartition(7), "doc_id", 10).collect()
    }
    assert ids1 == ids2
    assert 0 < len(ids1) < docs.count()


def test_salt_changes_selection_but_stays_deterministic(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in SA.deterministic_sample(docs, "doc_id", 50, salt="a").collect()}
    b = {r["doc_id"] for r in SA.deterministic_sample(docs, "doc_id", 50, salt="b").collect()}
    assert a != b  # different salt, different (deterministic) subset
    a2 = {r["doc_id"] for r in SA.deterministic_sample(docs, "doc_id", 50, salt="a").collect()}
    assert a == a2


def test_per_group_sample_exact_k_and_layout_independent(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    out = SA.per_group_sample(docs, "lang", "doc_id", k=5)
    sizes = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    group_sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for lang, n in sizes.items():
        assert n == min(5, group_sizes[lang])
    picked1 = {(r["lang"], r["doc_id"]) for r in out.collect()}
    picked2 = {
        (r["lang"], r["doc_id"])
        for r in SA.per_group_sample(docs.repartition(7), "lang", "doc_id", k=5).collect()
    }
    assert picked1 == picked2


def test_rebalanced_sample_flattens_mix_and_keeps_rare_group(spark, sf_dir):
    from stripe_data_pipeline_spark.operators.sampling import rebalanced_sample

    docs = read_table(spark, sf_dir, "documents")
    before = {r["lang"]: r["cnt"] for r in
              docs.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    out = rebalanced_sample(docs, "lang", "doc_id")
    after = {r["lang"]: r["cnt"] for r in
             out.groupBy("lang").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    mn = min(before.values())
    import math

    for lang, cnt in before.items():
        rate = math.floor(math.sqrt(mn / cnt) * 10000) / 10000
        # kept count is binomial-ish around rate*cnt; the hash is
        # uniform so allow wide-but-bounding slack
        assert after.get(lang, 0) <= cnt
        assert abs(after.get(lang, 0) - rate * cnt) <= 0.5 * cnt * rate + 10
    # smallest group keeps 100% (rate_bp = 10000, every bucket passes)
    rare = min(before, key=before.get)
    assert after[rare] == before[rare]
    # ratio between any two groups is flattened toward sqrt
    big = max(before, key=before.get)
    assert after[big] / after[rare] < before[big] / before[rare]


def test_rebalanced_sample_layout_independent(spark, sf_dir):
    from stripe_data_pipeline_spark.operators.sampling import rebalanced_sample

    docs = read_table(spark, sf_dir, "documents")
    a = {r["doc_id"] for r in rebalanced_sample(docs, "lang", "doc_id").collect()}
    b = {
        r["doc_id"]
        for r in rebalanced_sample(docs.repartition(17), "lang", "doc_id").collect()
    }
    assert a == b and a


def test_source_mix_plan_allocates_budget_sanely(spark, sf_dir):
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.sampling import source_mix_plan

    docs = read_table(spark, sf_dir, "documents")
    rows = source_mix_plan(docs, token_budget=1_000_000).collect()
    assert rows
    # floor divisions never over-allocate the budget
    assert sum(r["target_tokens"] for r in rows) <= 1_000_000
    # sqrt flattening: allocation order follows token-count order, but
    # the share RATIO shrinks (bigger source -> smaller tokens-share
    # relative to its corpus share)
    by_tokens = sorted(rows, key=lambda r: r["n_tokens"])
    targets = [r["target_tokens"] for r in by_tokens]
    assert targets == sorted(targets)
    if len(by_tokens) >= 2:
        small, big = by_tokens[0], by_tokens[-1]
        if small["n_tokens"] < big["n_tokens"]:
            assert (
                small["target_tokens"] * big["n_tokens"]
                > big["target_tokens"] * small["n_tokens"]
            )
    # repeat_bp consistency: floor(target/ n_tokens) in bp
    for r in rows:
        assert r["repeat_bp"] == r["target_tokens"] * 10000 // r["n_tokens"]
