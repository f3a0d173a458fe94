"""Distributed BPE trainer vs a pure-Python reference implementation
(the Sennrich et al. 2016 algorithm, reimplemented from the public
paper): the learned merge sequences must match EXACTLY, including
deterministic tie-breaking, on planted corpora."""

from __future__ import annotations

from collections import Counter

from stripe_data_pipeline_spark.operators.bpe import (
    END,
    bpe_merge_table,
    train_bpe,
    train_bpe_batched,
)


def reference_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    vocab = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                vocab[w] += 1
    syms = {w: list(w) + [END] for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, n in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += n
        if not pairs:
            break
        # (count DESC, pair lexicographic ASC) — same tie-break as the engine
        (left, right), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < 2:
            break
        merges.append((left, right))
        for w in syms:
            s = syms[w]
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    res.append(left + right)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = res
    return merges


def _df(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_bpe_matches_reference_simple(spark):
    texts = ["low low low low low", "lower lower newest newest", "newest newest newest widest"]
    want = reference_bpe(texts, 12)
    got = train_bpe(_df(spark, texts), n_merges=12)
    assert got == want
    assert ("e", "s") in got or ("l", "o") in got  # sanity: real merges learned


def test_bpe_matches_reference_with_ties(spark):
    # 'ab' and 'cd' tie on count — lexicographic tie-break must agree
    texts = ["ab ab cd cd", "ab cd"]
    want = reference_bpe(texts, 6)
    got = train_bpe(_df(spark, texts), n_merges=6)
    assert got == want


def test_batched_bpe_matches_reference(spark):
    # the batched trainer must learn the IDENTICAL sequence the
    # 1-merge loop (and the pure-Python reference) learns — the
    # _select_batch admission rule is conservative-exact by design
    for texts in (
        ["low low low low low", "lower lower newest newest",
         "newest newest newest widest"],
        ["ab ab cd cd", "ab cd"],          # tie-break stress
        ["xy xy"],                          # early stop
        ["aa aa aa b b b b aa"],            # overlapping self-pair (a,a)
    ):
        want = reference_bpe(texts, 12)
        got = train_bpe_batched(_df(spark, texts), n_merges=12)
        assert [(l, r) for l, r, _c in got] == want, texts


def test_distributed_path_matches_driver_path(spark):
    """The hybrid trainers collapse to a driver loop for small vocabs;
    force the DISTRIBUTED loop (threshold=0) and pin that both paths —
    iterative and batched — learn the identical sequence the pure-
    Python reference does, so the Spark pair-count/rewrite plumbing
    stays exercised even though fixture corpora are tiny."""
    for texts in (
        ["low low low low low", "lower lower newest newest",
         "newest newest newest widest"],
        ["ab ab cd cd", "ab cd"],
        ["aa aa aa b b b b aa"],
    ):
        want = reference_bpe(texts, 12)
        df = _df(spark, texts)
        got_iter = train_bpe(df, n_merges=12, driver_vocab_threshold=0)
        got_batch = train_bpe_batched(
            df, n_merges=12, driver_vocab_threshold=0
        )
        assert got_iter == want, texts
        assert [(l, r) for l, r, _c in got_batch] == want, texts
        # and the default (driver) path agrees with the forced one
        assert train_bpe(df, n_merges=12) == got_iter, texts


def test_batched_bpe_matches_iterative_on_documents(spark, sf_dir):
    # real-corpus agreement (same check the driver query pins as a flag)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batched = train_bpe_batched(docs, n_merges=10)
    iterative = train_bpe(docs, n_merges=10)
    assert [(l, r) for l, r, _c in batched] == iterative
    assert len(batched) == 10


def test_bpe_early_stop_and_table_shape(spark):
    texts = ["xy xy"]  # only a couple of useful merges exist
    tbl = bpe_merge_table(_df(spark, texts), n_merges=10).collect()
    got = [(r["left"], r["right"]) for r in sorted(tbl, key=lambda r: r["rank"])]
    assert got == reference_bpe(texts, 10)
    assert all(r["merged"] == r["left"] + r["right"] for r in tbl)
    assert len(got) < 10  # stopped when no pair repeats
