"""Unigram-LM tokenizer — the SentencePiece family (Kudo 2018,
"Subword Regularization"; public), the second production tokenizer
shape next to BPE (operators/bpe.py). Google's T5/ALBERT/XLNet
vocabularies are trained exactly this way; a corpus engine that
claims tokenizer coverage needs both merge-based (BPE) and
likelihood-based (unigram) training.

This implementation is the deterministic VITERBI HARD-EM variant:

  1. word table: distinct whitespace words + corpus counts (Zipf
     makes this tiny relative to the corpus — the same leverage the
     word-level BPE encode uses).
  2. candidate vocab: every substring of length 1..max_piece_len of
     every distinct word, weighted by word count; keep ALL
     single-char pieces (coverage guarantee) + the top
     ``top_multi`` multi-char pieces by (count DESC, piece ASC) —
     a deterministic seed of the EM.
  3. piece costs: fixed-point -ln(count / total) (the BM25/LM
     ln-parity pattern: floor(x * 1e9 + 0.5) BEFORE any sum).
  4. EM rounds: E-step segments every distinct word by Viterbi
     (minimize (total cost, path-string) — the string tie-break
     makes the argmin unique and engine-replayable); M-step
     re-estimates costs from add-one-smoothed usage counts
     (usage + 1) / (total_usage + V), keeping every piece alive so
     the vocab is fixed across rounds (real SentencePiece prunes;
     fixing the vocab keeps the oracle a pure unrolled replay).

All segmentation arithmetic is integer; the only doubles are inside
the two ln() cost expressions, computed IN-ENGINE on both sides
(Spark F.log / DuckDB ln agree bit-for-bit on this machine — the
established lm/bm25 contract).

Scale shape: word/substring counting is two partial-combined
groupBys over the corpus; the E-step is an Arrow-batched DP over the
DISTINCT-WORD table only (never the corpus) with the vocab costs a
broadcast dict bounded by contract (alphabet + top_multi); the
M-step is one explode + groupBy over the word table. Documents are
then encoded by joining word -> pieces back onto the token stream —
the word-level-BPE join shape.

Viterbi tie-break correctness: paths are separator-joined piece
strings with SEP = chr(31) < every piece char, so two distinct
partial paths covering the same prefix can never be
prefix-comparable, which makes (cost, path) ordering stable under
suffix append — the DP's optimal-substructure requirement for the
lexicographic tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
FP = 1e9


def word_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, wcnt) over whitespace tokens."""
    return (
        df.select(
            F.explode(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wcnt"))
    )


def candidate_pieces(
    words: DataFrame, max_piece_len: int = 6, top_multi: int = 40
) -> DataFrame:
    """Seed vocab: (piece, cnt) — all chars + top multi-char pieces.

    Occurrence-weighted: a piece appearing k times inside a word
    contributes k * wcnt (overlaps counted, the standard substring
    statistic).
    """
    subs = (
        words.select(
            "wcnt",
            F.explode(
                F.flatten(
                    F.transform(
                        F.sequence(F.lit(1), F.length("word")),
                        lambda s: F.filter(
                            F.transform(
                                F.sequence(
                                    F.lit(1), F.lit(max_piece_len)
                                ),
                                lambda ln: F.when(
                                    s + ln - 1 <= F.length("word"),
                                    F.substring(
                                        F.col("word"), F.lit(0) + s, ln
                                    ),
                                ),
                            ),
                            lambda p: p.isNotNull(),
                        ),
                    )
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("wcnt").cast("bigint").alias("cnt"))
    )
    singles = subs.filter(F.length("piece") == 1)
    multi = (
        subs.filter(F.length("piece") >= 2)
        .orderBy(F.desc("cnt"), "piece")
        .limit(top_multi)
    )
    return singles.unionByName(multi)


def seed_costs(vocab: DataFrame) -> DataFrame:
    """(piece, cost_fp) = fp(-ln(cnt / total)) over the seed counts."""
    total = vocab.agg(F.sum("cnt").alias("tot"))
    return vocab.crossJoin(F.broadcast(total)).select(
        "piece",
        F.floor(
            -F.log(F.col("cnt").cast("double") / F.col("tot").cast("double"))
            * F.lit(FP)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cost_fp"),
    )


def _viterbi_word(word: str, costs: dict, max_piece_len: int):
    n = len(word)
    best: list = [None] * (n + 1)
    best[0] = (0, "")
    for j in range(1, n + 1):
        cand = None
        for i in range(max(0, j - max_piece_len), j):
            if best[i] is None:
                continue
            c = costs.get(word[i:j])
            if c is None:
                continue
            t = (best[i][0] + c, best[i][1] + SEP + word[i:j])
            if cand is None or t < cand:
                cand = t
        best[j] = cand
    return best[n]


def viterbi_segments(
    words: DataFrame, costs: DataFrame, max_piece_len: int = 6
) -> DataFrame:
    """(word, wcnt, pieces array<string>, cost_fp) — Arrow-batched DP
    over the distinct-word table; ``costs`` is collected (bounded by
    contract: alphabet + top_multi rows)."""
    from collections.abc import Iterator

    import pandas as pd

    cost_map = {r["piece"]: int(r["cost_fp"]) for r in costs.collect()}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"word": [], "wcnt": [], "pieces": [], "cost_fp": []}
            for word, wcnt in zip(pdf["word"], pdf["wcnt"]):
                res = _viterbi_word(str(word), cost_map, max_piece_len)
                out["word"].append(word)
                out["wcnt"].append(int(wcnt))
                out["pieces"].append(
                    [p for p in res[1].split(SEP) if p != ""]
                )
                out["cost_fp"].append(int(res[0]))
            yield pd.DataFrame(out)

    return words.mapInPandas(
        run,
        schema="word string, wcnt long, pieces array<string>, "
        "cost_fp long",
    )


def em_round(
    words: DataFrame,
    vocab: DataFrame,
    costs: DataFrame,
    max_piece_len: int = 6,
) -> DataFrame:
    """One hard-EM round: segment, count usage, re-estimate costs with
    add-one smoothing over the FIXED vocab."""
    segs = viterbi_segments(words, costs, max_piece_len)
    usage = (
        segs.select("wcnt", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wcnt").cast("bigint").alias("usage"))
    )
    totals = usage.agg(F.sum("usage").alias("tu")).crossJoin(
        vocab.agg(F.count(F.lit(1)).alias("v"))
    )
    return (
        vocab.select("piece")
        .join(usage, "piece", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "piece",
            F.coalesce(F.col("usage"), F.lit(0))
            .cast("bigint")
            .alias("usage"),
            F.floor(
                -F.log(
                    (F.coalesce(F.col("usage"), F.lit(0)) + 1).cast(
                        "double"
                    )
                    / (F.col("tu") + F.col("v")).cast("double")
                )
                * F.lit(FP)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("cost_fp"),
        )
    )


def train_unigram(
    df: DataFrame,
    iters: int = 2,
    max_piece_len: int = 6,
    top_multi: int = 40,
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Returns (words, vocab_costs, segments): the trained vocab with
    final usage/cost and every distinct word's final segmentation.
    ``iters`` counts M-step re-estimations (the docstring contract:
    iters=2 performs two cost re-estimates after the seed — the
    pq.py iters lesson, stated explicitly)."""
    words = word_counts(df, text_col=text_col)
    vocab = candidate_pieces(words, max_piece_len, top_multi)
    costs = seed_costs(vocab)
    for _ in range(iters):
        costs = em_round(words, vocab, costs, max_piece_len)
    segs = viterbi_segments(
        words, costs.select("piece", "cost_fp"), max_piece_len
    )
    return words, costs, segs
