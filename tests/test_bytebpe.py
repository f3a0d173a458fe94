"""Byte-level BPE (operators/bytebpe.py): merge learning against a
hand-computed reference on a planted corpus, driver/distributed loop
parity, pre-token conventions (first word plain, later words
Ġ-prefixed, merges never crossing pre-token boundaries), and the
decode losslessness law."""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators import bytebpe as BB


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pretokens_carry_leading_space_as_G(spark):
    df = _docs(spark, ["ab cd ab"])
    rows = sorted(
        (r["pos"], r["pretoken"]) for r in BB.pretokens(df).collect()
    )
    assert rows == [(0, "ab"), (1, "Ġcd"), (2, "Ġab")]


def test_learned_merges_match_hand_reference(spark):
    # corpus: "aa aa aa b" x 2 -> pretokens: aa x2, Ġaa x4, Ġb x2
    # pair counts over chars: (Ġ,a)=4, (a,a)=6, (Ġ,b)=2
    # merge 1: (a,a) cnt 6 -> 'aa'; then (Ġ,aa)=4 -> 'Ġaa'; then
    # (Ġ,b)=2 -> 'Ġb'; then nothing reaches count 2.
    df = _docs(spark, ["aa aa aa b", "aa aa aa b"])
    merges = BB.train_bytebpe(df, n_merges=10)
    assert merges == [("a", "a"), ("Ġ", "aa"), ("Ġ", "b")]


def test_driver_and_distributed_loops_agree(spark):
    df = _docs(spark, ["cat cab cat", "cab cat cab"])
    fast = BB.train_bytebpe(df, n_merges=6)
    slow = BB.train_bytebpe(df, n_merges=6, driver_vocab_threshold=0)
    assert fast == slow and len(fast) > 0


def test_merges_never_cross_pretoken_boundaries(spark):
    # 'ab ab' -> pretokens 'ab', 'Ġab': the pair (b, Ġ) never exists
    # because each pretoken is its own symbol sequence.
    df = _docs(spark, ["ab ab ab ab"])
    merges = BB.train_bytebpe(df, n_merges=10)
    assert ("b", "Ġ") not in merges
    enc = BB.encode_documents_bytelevel(df, merges).collect()
    subs = enc[0]["subwords"]
    # fully merged: first 'ab' plain, three 'Ġab' tokens
    assert subs == ["ab", "Ġab", "Ġab", "Ġab"]


def test_decode_roundtrip_is_lossless(spark):
    texts = ["the cat sat", "a", "zz zz yy zz", "q w e r t y"]
    df = _docs(spark, texts)
    merges = BB.train_bytebpe(df, n_merges=10)
    enc = BB.encode_documents_bytelevel(df, merges)
    dec = enc.select(
        "doc_id",
        BB.decode_subwords_bytelevel(F.col("subwords")).alias("decoded"),
    )
    got = {r["doc_id"]: r["decoded"] for r in dec.collect()}
    assert got == {i: t for i, t in enumerate(texts)}


def test_gs_containing_words_are_filtered_identically(spark):
    # a literal Ġ in the source would collide with the space mark;
    # such words are dropped on BOTH the train and encode paths
    df = _docs(spark, ["ok Ġbad ok"])
    merges = BB.train_bytebpe(df, n_merges=5)
    enc = BB.encode_documents_bytelevel(df, merges).collect()
    dec = BB.decode_subwords_bytelevel(F.lit(enc[0]["subwords"]))
    got = spark.range(1).select(dec.alias("d")).first()["d"]
    assert got == "ok ok"
