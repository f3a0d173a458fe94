"""WordPiece tokenizer invariants (operators/wordpiece.py).

- trainer: likelihood-score argmax on a hand-computable micro-corpus;
  driver fixpoint == distributed loop (the placement contract BPE
  pins in test_bpe.py);
- MaxMatch encode: longest-match-first behavior, ## round-trip law
  (concatenating pieces with ## stripped rebuilds the word), [UNK]
  for unknown characters and for words over MAX_WORD_LEN;
- document encode: word-level join-back equals per-word encode
  applied in document order.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators import wordpiece as W


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_trainer_picks_likelihood_not_frequency(spark):
    # "ab" occurs 4x -> pair (a, ##b) cnt=4, units a=4+3=7? no:
    # corpus: 4x "ab", 3x "a", 2x "cd".
    # pairs: (a,##b) cnt 4; (c,##d) cnt 2.
    # units: a=7, ##b=4, c=2, ##d=2.
    # score(a,##b) = 4e12 // 28 = 142_857_142_857
    # score(c,##d) = 2e12 // 4  = 500_000_000_000  <- wins despite
    # HALF the raw count (the WordPiece-vs-BPE distinction).
    docs = _docs(spark, ["ab ab ab ab a a a cd cd"])
    merges = W.train_wordpiece(docs, n_merges=1)
    assert merges == [("c", "##d", "cd", 500_000_000_000)]


def test_trainer_distributed_matches_driver(spark):
    docs = _docs(
        spark,
        ["ab ab ab ab a a a cd cd", "abcd abcd cd ab", "dcba dcba ab"],
    )
    driver = W.train_wordpiece(docs, n_merges=6)
    dist = W.train_wordpiece(docs, n_merges=6, driver_vocab_threshold=0)
    assert driver == dist
    assert len(driver) >= 3


def test_maxmatch_longest_first_and_roundtrip(spark):
    pieces = ["a", "ab", "abc", "##d", "##cd", "b", "c", "d", "##b", "##c"]
    words = spark.createDataFrame(
        [("abcd",), ("abd",), ("dcb",)], "word string"
    )
    out = {
        r["word"]: list(r["pieces"])
        for r in W.encode_words_wordpiece(words, pieces).collect()
    }
    # longest initial piece wins: abc + ##d, NOT ab + ##cd
    assert out["abcd"] == ["abc", "##d"]
    assert out["abd"] == ["ab", "##d"]
    assert out["dcb"] == ["d", "##c", "##b"]
    for w, ps in out.items():
        rebuilt = ps[0] + "".join(p[2:] for p in ps[1:])
        assert rebuilt == w


def test_maxmatch_unk_cases(spark):
    pieces = ["a", "##b"]
    words = spark.createDataFrame(
        [("ab",), ("ax",), ("xa",), ("a" * (W.MAX_WORD_LEN + 1),)],
        "word string",
    )
    out = {
        r["word"]: list(r["pieces"])
        for r in W.encode_words_wordpiece(words, pieces).collect()
    }
    assert out["ab"] == ["a", "##b"]
    assert out["ax"] == [W.UNK]  # dead mid-word
    assert out["xa"] == [W.UNK]  # dead at word start
    assert out["a" * (W.MAX_WORD_LEN + 1)] == [W.UNK]  # over the cap


def test_document_encode_matches_per_word(spark):
    docs = _docs(spark, ["ab cd ab", "cd cd", "zz ab"])
    merges = W.train_wordpiece(docs, n_merges=4)
    pieces = W.wordpiece_vocab(docs, merges)
    enc = {
        r["doc_id"]: list(r["pieces"])
        for r in W.encode_documents_wordpiece(docs, pieces).collect()
    }
    by_word = {
        r["word"]: list(r["pieces"])
        for r in W.encode_words_wordpiece(
            docs.select(
                F.explode(W.clean_words_wp("text")).alias("word")
            ).distinct(),
            pieces,
        ).collect()
    }
    for doc_id, text in [(0, "ab cd ab"), (1, "cd cd"), (2, "zz ab")]:
        expect = [p for w in text.split() for p in by_word[w]]
        assert enc[doc_id] == expect


def test_vocab_contains_alphabet_and_merges(spark):
    docs = _docs(spark, ["ab ab cd cd"])
    merges = W.train_wordpiece(docs, n_merges=2)
    pieces = W.wordpiece_vocab(docs, merges)
    for seed in ["a", "c", "##b", "##d"]:
        assert seed in pieces
    for _l, _r, merged, _fp in merges:
        assert merged in pieces
