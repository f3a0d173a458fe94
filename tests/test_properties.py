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


# --- codec properties (round 5): hold for ANY input, not just fixtures ---

_pcm = st.lists(
    st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=400
)


@settings(max_examples=50, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=_pcm)
def test_g711_error_bound_and_idempotence_any_signal(vals):
    """G.711 companding invariants for arbitrary PCM: (1) expansion of
    a compressed code is a codec fixed point (compressing again is
    lossless), so a double encode->decode equals a single one; (2) the
    reconstruction error is bounded by the coarsest segment step; (3)
    sign is always preserved (zero may flip to +0)."""
    import numpy as np

    from stripe_data_pipeline_spark.operators import multimodal as M

    x = np.array(vals, dtype=np.int16)
    for enc, dec in ((M._ulaw_encode, M._ulaw_decode),
                     (M._alaw_encode, M._alaw_decode)):
        y = dec(enc(x))
        z = dec(enc(y))
        assert np.array_equal(y, z)  # fixed point after one round trip
        err = np.abs(y.astype(np.int64) - np.clip(x.astype(np.int64), -32767, 32767))
        assert err.max() <= 1024  # top-segment step bound
        sgn_x = np.sign(x.astype(np.int64))
        sgn_y = np.sign(y.astype(np.int64))
        assert np.all((sgn_x == sgn_y) | (y == 0) | (x == 0))


@settings(max_examples=25, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    bw=st.integers(min_value=1, max_value=4),
    bh=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_dc_exactness_any_even_block_grid(bw, bh, seed):
    """The DC-exactness contract behind media_jpeg_decode_check holds
    for ANY grid of constant-valued 8x8 blocks with even values — not
    just the fixture's generator polynomial: even v makes the
    quantized DC (v-128)/2 an exact integer under the Annex-K q=16
    step, so the lossy codec reproduces the image bit-for-bit."""
    import numpy as np

    from stripe_data_pipeline_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 128, (bh, bw)) * 2
    img = np.repeat(np.repeat(vals, 8, 0), 8, 1).astype(np.uint8)
    dec, w, h = M.decode_image(M.encode_jpeg(img, quality=50), fake=False)
    assert (w, h) == (bw * 8, bh * 8)
    assert np.array_equal(dec, np.repeat(img[..., None], 3, 2).astype(np.float32))


@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    q=st.integers(min_value=70, max_value=100),
    ri=st.integers(min_value=0, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_never_crashes_and_bounds_error_any_image(w, h, q, ri, seed):
    """Robustness over arbitrary dims/quality/restart settings: the
    encoder must emit a decodable stream for ANY uint8 image (including
    1-pixel and non-multiple-of-8 shapes), decoded dims must match, and
    every reconstructed sample stays in [0, 255] (random noise has no
    tight error bound — tolerance claims live in the smooth-content
    tests)."""
    import numpy as np

    from stripe_data_pipeline_spark.operators import multimodal as M

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    payload = M.encode_jpeg(img, quality=q, restart_interval=ri)
    dec, dw, dh = M.decode_image(payload, fake=False)
    assert (dw, dh) == (w, h)
    assert dec.shape == (h, w, 3)
    assert dec.min() >= 0 and dec.max() <= 255


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    mode=st.sampled_from(["random", "runs", "constant"]),
)
def test_rle8_roundtrip_any_index_image(w, h, seed, mode):
    """BI_RLE8 encode->decode is bit-exact for ANY index image — pure
    noise (absolute-mode heavy), run-heavy content (encoded-mode
    heavy), and constant images (single max-length runs), at every
    width parity (WORD padding) and 1-pixel edge shapes."""
    import numpy as np

    import stripe_data_pipeline_spark.operators.multimodal as M

    rng = np.random.RandomState(seed % 2**31)
    if mode == "random":
        idx = rng.randint(0, 256, (h, w)).astype(np.uint8)
    elif mode == "runs":
        idx = np.repeat(
            rng.randint(0, 256, (h, (w + 3) // 4)), 4, axis=1
        )[:, :w].astype(np.uint8)
    else:
        idx = np.full((h, w), rng.randint(0, 256), np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    dec, dw, dh = M.decode_image(M.encode_bmp_rle8(idx, pal), fake=False)
    assert (dw, dh) == (w, h)
    assert np.array_equal(dec, pal[idx].astype(np.float32))


@settings(max_examples=40, deadline=None)
@given(
    a=st.text(alphabet="abcde ", min_size=0, max_size=12),
    b=st.text(alphabet="abcde ", min_size=0, max_size=12),
)
def test_levenshtein_builtin_matches_textbook_dp(spark, a, b):
    """The edit-distance dedup operator leans on Spark's levenshtein
    (and the oracle on DuckDB's) being the textbook DP. Pin the JVM
    built-in against a reference implementation over arbitrary short
    strings so the oracle equivalence rests on verified ground, not
    folklore."""

    def ref(x: str, y: str) -> int:
        prev = list(range(len(y) + 1))
        for i, cx in enumerate(x, 1):
            cur = [i] + [0] * len(y)
            for j, cy in enumerate(y, 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (cx != cy),
                )
            prev = cur
        return prev[len(y)]

    got = (
        spark.createDataFrame([(a, b)], "a string, b string")
        .select(F.levenshtein("a", "b").alias("d"))
        .first()["d"]
    )
    assert got == ref(a, b)
