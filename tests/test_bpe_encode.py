"""BPE ENCODE pass (round 7): the chained-replace() encoding over the
U+001E/U+001F-framed symbol stream must apply the learned merges with
EXACTLY the reference algorithm's greedy left-to-right non-overlapping
semantics (_merge_word), including the adversarial cases string
rewriting gets wrong without BOTH delimiters:

- self-pairs over odd/even runs ("aaa" -> [aa, a], "aaaa" -> [aa, aa]);
- prefix hazard: merge (c, a) must NOT fire on [c, ab] (the trailing
  SEP ends the match before "ab");
- suffix hazard: merge (a, c) must NOT fire on [ba, c] (the leading
  SOT anchors the match start — hypothesis caught exactly this
  against a single-delimiter design);
- merged symbols that equal concatenations of later merge operands.

Property-tested with hypothesis over a small alphabet (maximizing
collisions) against a pure-Python reference encode."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.bpe import (
    END,
    SEP,
    SOT,
    _merge_word,
    encode_documents,
    encode_documents_by_word,
    encode_documents_ids,
    subword_vocabulary,
    train_bpe_batched,
)
from tests.test_bpe import reference_bpe


def py_encode(texts: list[str], merges: list[tuple[str, str]]) -> dict[int, list[str]]:
    """Reference encode: per word, chars + END, then every merge in
    learned order via the textbook greedy scan. Docs with no eligible
    words are dropped (mirrors encode_documents)."""
    out: dict[int, list[str]] = {}
    for i, t in enumerate(texts):
        toks: list[str] = []
        for w in t.split(" "):
            if not w or SEP in w or SOT in w:
                continue
            s = list(w) + [END]
            for left, right in merges:
                s = _merge_word(s, left, right)
            toks.extend(s)
        if toks:
            out[i] = toks
    return out


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _spark_encode(spark, texts, merges) -> dict[int, list[str]]:
    rows = encode_documents(_df(spark, texts), merges).collect()
    return {r["doc_id"]: list(r["subwords"]) for r in rows}


def test_encode_adversarial_cases(spark):
    # self-pair runs: greedy non-overlapping, odd vs even
    texts = ["aaa aaaa aaaaa"]
    merges = [("a", "a")]
    assert _spark_encode(spark, texts, merges) == py_encode(texts, merges)
    got = _spark_encode(spark, texts, merges)[0]
    assert got == ["aa", "a", END, "aa", "aa", END, "aa", "aa", "a", END]

    # prefix hazard: (c,a) must not fire across [c, ab]
    texts = ["cab ca"]
    merges = [("a", "b"), ("c", "a")]
    # after (a,b): cab -> [c, ab, </w>]; (c,a) must only fire in "ca"
    got = _spark_encode(spark, texts, merges)
    assert got == py_encode(texts, merges)
    assert got[0] == ["c", "ab", END, "ca", END]

    # suffix hazard: after (b,a) the symbol "ba" ends with "a"; the
    # later merge (a, </w>) must not fire inside it (the hypothesis
    # counterexample against the single-delimiter design)
    texts = ["bba ba a"]
    merges = [("b", "a"), ("a", END)]
    got = _spark_encode(spark, texts, merges)
    assert got == py_encode(texts, merges)
    assert got[0] == ["b", "ba", END, "ba", END, "a</w>"]

    # merged symbol equal to a later operand pair's concatenation
    texts = ["abab abab ab"]
    merges = [("a", "b"), ("ab", "ab")]
    assert _spark_encode(spark, texts, merges) == py_encode(texts, merges)


def test_encode_with_trained_merges_matches_reference(spark):
    texts = [
        "low low low low low",
        "lower lower newest newest",
        "newest newest newest widest",
    ]
    merges = reference_bpe(texts, 10)
    assert _spark_encode(spark, texts, merges) == py_encode(texts, merges)


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=6),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=5,
    ),
    st.integers(min_value=0, max_value=8),
)
def test_encode_property(spark, texts, n_merges):
    """Train on the corpus itself (reference trainer), then encode —
    tiny 'abc' alphabet maximizes self-pairs, prefix collisions and
    re-merges. Spark's replace-chain must equal the textbook scan."""
    merges = reference_bpe(texts, n_merges)
    assert _spark_encode(spark, texts, merges) == py_encode(texts, merges)
    # the word-level path (distinct-word encode + join-back regroup,
    # VERDICT r7 #1) must be BIT-IDENTICAL to the per-occurrence
    # replace chain on the same adversarial corpora
    by_word = {
        r["doc_id"]: list(r["subwords"])
        for r in encode_documents_by_word(_df(spark, texts), merges).collect()
    }
    assert by_word == py_encode(texts, merges)


def test_encode_by_word_matches_per_occurrence(spark):
    """Word-level encode == per-occurrence encode, including repeated
    words (one distinct row fanning back to many occurrences), order
    across words, dropped empty docs, and the no-broadcast variant."""
    texts = [
        "low low lower low newest",
        "",  # dropped: no eligible words
        "widest newest low",
        "  spaced   out  ",  # empty tokens filtered, order kept
    ]
    merges = reference_bpe(texts, 10)
    expect = _spark_encode(spark, texts, merges)
    for bc in (True, False):
        got = {
            r["doc_id"]: list(r["subwords"])
            for r in encode_documents_by_word(
                _df(spark, texts), merges, broadcast_words=bc
            ).collect()
        }
        assert got == expect


def test_trained_pipeline_end_to_end(spark, sf_dir):
    """Train on real documents, encode, and check (a) subword streams
    concatenate back to the original words when merge boundaries are
    stripped, (b) token count conservation vs the reference encode."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    merges = [
        (left, right)
        for left, right, _c in train_bpe_batched(docs, n_merges=10)
    ]
    assert merges == reference_bpe(texts, 10)
    got = _spark_encode(spark, texts, merges)
    assert got == py_encode(texts, merges)
    # reconstruct: joining subwords and splitting on </w> yields words
    for i, toks in list(got.items())[:20]:
        rebuilt = "".join(toks).split(END)[:-1]
        want = [w for w in texts[i].split(" ") if w and SEP not in w]
        assert rebuilt == want


def test_subword_vocab_and_id_roundtrip(spark):
    texts = ["ab ab ab ba", "ab ba ba"]
    merges = reference_bpe(texts, 4)
    enc = encode_documents(_df(spark, texts), merges)
    vocab = subword_vocabulary(enc)
    vrows = sorted(vocab.collect(), key=lambda r: r["token_id"])
    # ids dense from 1, ordered by token ASC
    assert [r["token_id"] for r in vrows] == list(range(1, len(vrows) + 1))
    assert [r["token"] for r in vrows] == sorted(r["token"] for r in vrows)
    # occurrence counts match the flattened reference streams
    ref = py_encode(texts, merges)
    from collections import Counter

    want_counts = Counter(t for toks in ref.values() for t in toks)
    assert {r["token"]: r["n_occurrences"] for r in vrows} == dict(want_counts)
    # id sequences decode back to the token sequences
    ids = encode_documents_ids(enc, vocab).collect()
    id2tok = {r["token_id"]: r["token"] for r in vrows}
    for row in ids:
        assert [id2tok[i] for i in row["token_ids"]] == ref[row["doc_id"]]


def test_sep_containing_words_are_dropped_consistently(spark):
    """Words containing either delimiter (U+001E / U+001F) are
    excluded from the encode pass (the documented precondition); docs
    left with zero eligible words drop out entirely."""
    texts = [f"ok a{SEP}b ok", f"x{SEP} y{SOT}", "plain"]
    merges: list[tuple[str, str]] = []
    got = _spark_encode(spark, texts, merges)
    assert got == py_encode(texts, merges)
    assert set(got) == {0, 2}
    assert got[0] == ["o", "k", END, "o", "k", END]
