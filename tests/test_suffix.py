"""Distributed prefix-doubling suffix ranks vs a pure-Python suffix
sort: ranks must match EXACTLY (the inverse suffix array), including
cross-document suffixes that run through the \\x01 separators and
prefix-of-another-suffix orderings."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from stripe_data_pipeline_spark.operators.suffix import (
    SEP,
    corpus_positions,
    suffix_ranks,
)


def py_suffix_ranks(texts: list[str]) -> dict[int, int]:
    s = SEP.join(texts)
    order = sorted(range(len(s)), key=lambda i: s[i:])
    return {pos: rank + 1 for rank, pos in enumerate(order)}


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _spark_ranks(spark, texts) -> dict[int, int]:
    # parts=4: boundary-sampling jobs dominate on fixture corpora
    out = suffix_ranks(_df(spark, texts), parts=4).collect()
    return {r["pos"]: r["suffix_rank"] for r in out}


def test_corpus_positions_reconstruct_string(spark):
    texts = ["abc", "de", "f"]
    rows = corpus_positions(_df(spark, texts)).collect()
    s = SEP.join(texts)
    got = {r["pos"]: r["ch"] for r in rows}
    assert got == {i: s[i] for i in range(len(s))}


def test_suffix_ranks_known_banana(spark):
    # the textbook example: suffixes of "banana" rank a<ana<anana<...
    got = _spark_ranks(spark, ["banana"])
    assert got == py_suffix_ranks(["banana"])


def test_suffix_ranks_cross_doc_and_repeats(spark):
    texts = ["abab abab", "ab abab", "zzz"]
    assert _spark_ranks(spark, texts) == py_suffix_ranks(texts)


@settings(max_examples=6, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=14),
        min_size=1,
        max_size=3,
    )
)
def test_suffix_ranks_property(spark, texts):
    # tiny alphabet maximizes long repeats and prefix-chains; empty
    # docs exercise zero-length contributions between separators
    if all(len(t) == 0 for t in texts) and len(texts) == 1:
        return  # empty corpus: no positions to rank
    assert _spark_ranks(spark, texts) == py_suffix_ranks(texts)


def test_suffix_ranks_on_real_slice(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = docs.filter("doc_id < 8").orderBy("doc_id").collect()
    texts = [r["text"] for r in rows]
    got = {
        r["pos"]: r["suffix_rank"]
        for r in suffix_ranks(docs.filter("doc_id < 8")).collect()
    }
    assert got == py_suffix_ranks(texts)


def py_lcp_spans(texts: list[str], top_k: int = 20, cap: int = 256):
    s = SEP.join(texts)
    order = sorted(range(len(s)), key=lambda i: s[i:])
    out = []
    for a, b in zip(order, order[1:]):
        lcp = 0
        while (a + lcp < len(s) and b + lcp < len(s)
               and s[a + lcp] == s[b + lcp]):
            lcp += 1
        if lcp > 0:
            out.append((a, b, min(lcp, cap)))
    out.sort(key=lambda t: (-t[2], t[0], t[1]))
    return out[:top_k]


def test_longest_repeat_spans_known(spark):
    from stripe_data_pipeline_spark.operators.suffix import (
        longest_repeat_spans,
    )

    texts = ["the cat sat on the mat", "the cat sat on a hat", "zq"]
    got = [
        (r["pos_a"], r["pos_b"], r["lcp"])
        for r in longest_repeat_spans(_df(spark, texts), top_k=20).collect()
    ]
    want = py_lcp_spans(texts)
    assert got == want
    # sanity: the longest repeat is the shared "the cat sat on " prefix
    assert want[0][2] >= 15


def test_longest_repeat_spans_real_slice(spark, sf_dir):
    from stripe_data_pipeline_spark.operators.suffix import (
        longest_repeat_spans,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [
        r["text"]
        for r in docs.filter("doc_id < 8").orderBy("doc_id").collect()
    ]
    got = [
        (r["pos_a"], r["pos_b"], r["lcp"])
        for r in longest_repeat_spans(
            docs.filter("doc_id < 8"), top_k=10
        ).collect()
    ]
    assert got == py_lcp_spans(texts, top_k=10)


def py_sa_scrub(
    texts: list[str],
    min_len: int = 24,
    drop_threshold: float = 0.5,
    max_lcp: int = 256,
) -> dict[int, tuple[str, int, int, str]]:
    """Reference scrub: brute-force every adjacent-suffix LCP over
    the concatenated corpus, expand both occurrences into clipped
    per-doc char spans, union coverage, keep/trim/drop."""
    s = SEP.join(texts)
    order = sorted(range(len(s)), key=lambda i: s[i:])
    spans = []
    for a, b in zip(order, order[1:]):
        lcp = 0
        while a + lcp < len(s) and b + lcp < len(s) and s[a + lcp] == s[b + lcp]:
            lcp += 1
        if lcp >= min_len:
            spans += [(a, min(lcp, max_lcp)), (b, min(lcp, max_lcp))]
    offs = []
    off = 0
    for t in texts:
        offs.append(off)
        off += len(t) + 1
    covered: dict[int, set[int]] = {}
    for pos, ln in spans:
        for d, (o, t) in enumerate(zip(offs, texts)):
            if o <= pos < o + len(t):
                st = pos - o
                covered.setdefault(d, set()).update(
                    range(st, min(st + ln, len(t)))
                )
    out: dict[int, tuple[str, int, int, str]] = {}
    for d, t in enumerate(texts):
        cov = covered.get(d, set())
        if not cov:
            out[d] = (t, len(t), 0, "keep")
        elif len(cov) / len(t) <= drop_threshold:
            new = "".join(c for i, c in enumerate(t) if i not in cov)
            out[d] = (new, len(t), len(cov), "trim")
    return out


def test_sa_scrub_planted_repeats(spark):
    """Planted corpus: a 30-char sentence shared verbatim by docs 0/1
    (trim), doc 2 novel (keep), docs 3/4 identical (drop), plus a
    repeat crossing the clip boundary at a doc's end."""
    shared = "the quick brown fox jumps over"
    dup = "all work and no play makes jack a dull boy ok"
    texts = [
        shared + " x unique tail one two three four five",
        "prefix junk " + shared + " y another different ending here",
        "completely novel content with no long repeats anywhere",
        dup,
        dup,
    ]
    from stripe_data_pipeline_spark.operators.suffix import (
        suffix_scrub_documents,
    )

    got = {
        r["doc_id"]: (r["text"], r["n_chars"], r["dup_chars"], r["action"])
        for r in suffix_scrub_documents(
            _df(spark, texts), min_len=24, parts=4
        ).collect()
    }
    want = py_sa_scrub(texts)
    assert got == want
    assert got[0][3] == "trim" and got[1][3] == "trim"
    assert got[2] == (texts[2], len(texts[2]), 0, "keep")
    assert 3 not in got and 4 not in got  # identical docs drop
    assert shared not in got[0][0] and shared not in got[1][0]


def test_sa_scrub_threshold_one_keeps_empty_trims(spark):
    """drop_threshold >= 1.0: a fully-covered doc survives as an
    empty 'trim' row (the ADVICE r7 left-join rule, applied here)."""
    dup = "exactly the same text in both documents here"
    texts = [dup, dup, "short novel one"]
    from stripe_data_pipeline_spark.operators.suffix import (
        suffix_scrub_documents,
    )

    got = {
        r["doc_id"]: (r["text"], r["n_chars"], r["dup_chars"], r["action"])
        for r in suffix_scrub_documents(
            _df(spark, texts), min_len=24, drop_threshold=1.0, parts=4
        ).collect()
    }
    want = py_sa_scrub(texts, drop_threshold=1.0)
    assert got == want
    assert got[0] == ("", len(dup), len(dup), "trim")
    assert got[1] == ("", len(dup), len(dup), "trim")


def test_sa_scrub_property(spark):
    """Randomized mini-corpora over a tiny alphabet (maximizing long
    repeats): Spark == brute-force reference for every doc."""
    import random

    from stripe_data_pipeline_spark.operators.suffix import (
        suffix_scrub_documents,
    )

    rng = random.Random(8)
    for trial in range(3):
        words = ["ab", "ba", "aab", "bba"]
        texts = [
            "".join(rng.choice(words) for _ in range(rng.randint(5, 20)))
            for _ in range(4)
        ]
        got = {
            r["doc_id"]: (r["text"], r["n_chars"], r["dup_chars"], r["action"])
            for r in suffix_scrub_documents(
                _df(spark, texts), min_len=8, parts=4
            ).collect()
        }
        assert got == py_sa_scrub(texts, min_len=8), texts


def test_capped_walk_matches_uncapped_under_clamp(spark):
    """walk_cap: skipping levels above the clamp must leave every
    clamped lcp bit-identical (greedy decomposition over gaps <= cap
    represents up to 2*cap - 1), and values lcp < cap stay exact."""
    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.operators.suffix import (
        _adjacent_lcp_pairs,
    )

    rep = "abcdefgh" * 6  # 48-char repeat: exceeds cap 16, under 31
    texts = [rep + " tail one", "lead " + rep, "abab abab", "zq"]
    df = _df(spark, texts)
    cap = 16
    full = {
        (r["pos_a"], r["pos_b"]): r["lcp"]
        for r in _adjacent_lcp_pairs(df, parts=4).collect()
    }
    capped = {
        (r["pos_a"], r["pos_b"]): r["lcp"]
        for r in _adjacent_lcp_pairs(df, parts=4, walk_cap=cap).collect()
    }
    assert set(full) == set(capped)
    for k, v in full.items():
        assert min(v, cap) == min(capped[k], cap)  # clamped parity
        if v < cap:
            assert capped[k] == v  # below the cap: exact
        assert capped[k] == min(v, 2 * cap - 1)  # the precise contract
