"""Property-based tests (hypothesis): invariants that must hold for
any input, not just fixtures.

The partitioning-invariance property is the load-bearing one: the
engine claims bit-exact determinism at any parallelism — which is
exactly what integer-cents aggregation buys (functions/money.py).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.functions.money import sum_usd_cents
from stripe_data_pipeline_spark.incremental import merge_upsert

amounts = st.lists(
    st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=amounts, parts=st.integers(min_value=1, max_value=7))
def test_money_sum_invariant_to_partitioning(spark, vals, parts):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    a = df.repartition(1).agg(sum_usd_cents(F.col("v")).alias("s")).first()["s"]
    b = df.repartition(parts).agg(sum_usd_cents(F.col("v")).alias("s")).first()["s"]
    assert a == b  # bit-exact, any parallelism


batches = st.lists(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9),
                  st.integers(min_value=0, max_value=100)),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(seq=batches)
def test_merge_replays_like_a_dict(spark, tmp_path_factory, seq):
    """merge_upsert applied batch-by-batch == dict.update replay."""
    target = str(tmp_path_factory.mktemp("merge") / "t")
    expected: dict[int, int] = {}
    for batch in seq:
        # last write per key wins within a batch, as MERGE requires
        # unique keys per source batch
        dedup = {k: v for k, v in batch}
        df = spark.createDataFrame(
            [(k, v) for k, v in dedup.items()], "id long, v long"
        )
        merge_upsert(spark, target, df, keys=["id"])
        expected.update(dedup)
    got = {
        r["id"]: r["v"] for r in spark.read.parquet(target).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    amount=st.floats(min_value=0.01, max_value=1e5, allow_nan=False),
    days=st.integers(min_value=0, max_value=400),
)
def test_revenue_conservation(spark, amount, days):
    """deferred + recognized == net amount on every day of any period."""
    import datetime as dt

    from stripe_data_pipeline_spark.models.exchange_rates import exchange_rates
    from stripe_data_pipeline_spark.models.revenue import (
        daily_revenue_facts,
        with_usd_amounts,
    )

    start = dt.date(2024, 1, 1)
    li = spark.createDataFrame(
        [(1, amount, 0.0, "usd", False, start, start + dt.timedelta(days=days), days)],
        "line_item_id long, amount double, tax_amount double, currency string, "
        "is_tax_inclusive boolean, period_start_date date, "
        "period_end_date_inferred date, service_period_days long",
    )
    facts = daily_revenue_facts(with_usd_amounts(li, exchange_rates(spark)))
    rows = facts.collect()
    assert len(rows) == days + 1  # closed interval
    for r in rows:
        assert (
            abs(
                r["deferred_revenue_usd"]
                + r["recognized_revenue_usd"]
                - r["amount_without_tax_usd"]
            )
            < 1e-6
        )


doc_texts = st.lists(
    st.text(
        alphabet=st.sampled_from("ab cd"),  # spaces included -> multi-token
        min_size=0,
        max_size=60,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=doc_texts, size=st.integers(2, 9), stride=st.integers(1, 9))
def test_chunking_reconstructs_every_document(spark, texts, size, stride):
    """For any corpus and any (size, stride<=size): stride-th tokens of
    the chunk sequence reconstruct the document exactly, chunk_ids are
    dense from 0, and every chunk has 1..size tokens."""
    from stripe_data_pipeline_spark.operators.corpus import chunk_documents

    if stride > size:
        stride = size
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = chunk_documents(df, size=size, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text in enumerate(texts):
        toks = [t for t in text.split(" ") if t]
        if not toks:
            assert doc_id not in by_doc
            continue
        got = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in got] == list(range(len(got)))
        # reconstruction: first `stride` tokens of each chunk, then the
        # final chunk's tail, concatenate to the original token stream
        rebuilt: list[str] = []
        for r in got[:-1]:
            rebuilt.extend(r["chunk_text"].split(" ")[:stride])
        rebuilt.extend(got[-1]["chunk_text"].split(" "))
        assert rebuilt == toks
        for r in got:
            n = len(r["chunk_text"].split(" "))
            assert 1 <= n <= size and r["chunk_tokens"] == n


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=doc_texts, budget=st.integers(1, 16), groups=st.integers(1, 4))
def test_packing_is_gapless_for_any_corpus(spark, texts, budget, groups):
    """For any corpus: within each pack group, offsets in md5 order
    form an exact gapless running sum, and every seq_offset < budget."""
    import hashlib

    from stripe_data_pipeline_spark.operators.corpus import pack_sequences

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = pack_sequences(df, budget=budget, n_groups=groups).collect()
    by_group: dict[int, list] = {}
    for r in rows:
        assert 0 <= r["seq_offset"] < budget
        by_group.setdefault(r["pack_group"], []).append(r)
    for grp in by_group.values():
        grp.sort(key=lambda r: (hashlib.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"]))
        cum = 0
        for r in grp:
            assert r["seq_id"] * budget + r["seq_offset"] == cum
            cum += r["n_tokens"]


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=st.lists(st.text(min_size=0, max_size=80), min_size=1, max_size=10))
def test_pii_scrub_is_idempotent(spark, texts):
    """scrub(scrub(x)) == scrub(x) for arbitrary text: the redaction
    markers themselves never re-match either pattern."""
    from stripe_data_pipeline_spark.operators.corpus import scrub_pii

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    once = scrub_pii(df).select(
        F.col("doc_id"), F.col("clean_text").alias("text")
    )
    twice = scrub_pii(once)
    for r in twice.collect():
        assert r["n_redacted_chars"] == 0


def test_duplicate_span_stats_invariants_random_corpora(spark):
    """Property: for randomized corpora with planted duplication,
    0 < dup_tokens <= n_tokens, fractions consistent, and the result
    is independent of input partitioning."""
    import random

    from stripe_data_pipeline_spark.operators.corpus import duplicate_span_stats

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    shared_block = " ".join(rng.choice(vocab) for _ in range(12))
    rows = []
    for doc_id in range(40):
        own = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30)))
        text = (own + " " + shared_block) if doc_id % 3 == 0 else own
        rows.append((doc_id, text.strip()))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in duplicate_span_stats(df, n=8).collect()}
    for r in out.values():
        assert 0 < r["dup_tokens"] <= r["n_tokens"]
        assert r["dup_fraction"] == r["dup_tokens"] / r["n_tokens"]
    # every doc carrying the planted 12-token block shares >= one 8-gram
    planted = {d for d, t in rows if shared_block in t and len(t.split()) >= 8}
    assert planted <= set(out)
    # partitioning independence
    out13 = {
        r["doc_id"]: (r["n_tokens"], r["dup_tokens"])
        for r in duplicate_span_stats(df.repartition(13), n=8).collect()
    }
    assert out13 == {k: (v["n_tokens"], v["dup_tokens"]) for k, v in out.items()}


bloom_corpus = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4),
    min_size=1,
    max_size=40,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(keys=bloom_corpus, block=bloom_corpus,
       fpp=st.sampled_from([0.01, 0.3, 0.5]))
def test_bloom_anti_join_equals_exact_for_any_input(spark, keys, block, fpp):
    """bloom_blocklist_anti_join == plain anti-join for ANY corpus,
    blocklist and false-positive rate — the refine must rescue every
    collision the prefilter produces."""
    from stripe_data_pipeline_spark.operators.bloom import (
        bloom_blocklist_anti_join,
    )

    df = spark.createDataFrame([(i, k) for i, k in enumerate(keys)],
                               "id long, key string")
    bl = spark.createDataFrame([(k,) for k in block], "key string")
    want = sorted((r["id"], r["key"])
                  for r in df.join(bl, "key", "left_anti").collect())
    got = sorted((r["id"], r["key"])
                 for r in bloom_blocklist_anti_join(df, bl, "key", fpp).collect())
    assert got == want


bpe_texts = st.lists(
    st.text(alphabet="abc ", min_size=1, max_size=24),
    min_size=1,
    max_size=5,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(texts=bpe_texts, n=st.integers(min_value=1, max_value=8))
def test_batched_bpe_equals_reference_for_any_corpus(spark, texts, n):
    """The batched trainer's conservative admission rule must preserve
    EXACT sequence equality with the pure-Python reference on any
    corpus — including degenerate ones (all spaces, single chars,
    heavy ties)."""
    from test_bpe import _df, reference_bpe
    from stripe_data_pipeline_spark.operators.bpe import train_bpe_batched

    want = reference_bpe(texts, n)
    got = train_bpe_batched(_df(spark, texts), n_merges=n)
    assert [(l, r) for l, r, _c in got] == want
