"""Distributed BPE (byte-pair-encoding) merge training — the
tokenizer-building step of an LLM data pipeline, structured the way it
scales to a 100 TB corpus.

The classic algorithm (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units" — public) iterates
"count adjacent symbol pairs, merge the most frequent" — but it
operates on the WORD-FREQUENCY TABLE, not the raw text. That is the
whole scale insight here:

- The corpus is touched exactly ONCE: one groupBy(word) shuffle
  produces (word, count) — vocabulary-sized (millions of rows at 100
  TB, vs billions of documents), cached for the duration of training.
- Each of the n_merges iterations then runs over that small table:
  pair counting is a weighted explode + partial-combined agg whose key
  space is the symbol-pair alphabet, and the argmax is ONE collected
  row. Applying the winning merge rewrites the symbol arrays in an
  Arrow-batched mapInPandas pass (a sequential adjacent-pair scan per
  word — not expressible with Spark's array builtins).
- Determinism: ties broken by (count DESC, pair lexicographic ASC), so
  the learned merge list is a pure function of the corpus.

Not oracle-expressible (iterative fixpoint; DuckDB has no loop), so
the catalog query is rows-only; exactness is pytest-pinned against a
pure-Python reference implementation on planted corpora
(tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, per the original algorithm


def word_symbol_table(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: (word, n) weighted vocabulary with each word
    pre-split into its initial character symbols + END."""
    words = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
        ).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    # The vocab relation is tiny next to the corpus; coalesce so the
    # n_merges iterations pay per-task overhead on 8 partitions, not on
    # the session's corpus-sized shuffle partitioning (a vanilla
    # driver session may default to 200).
    return vocab.coalesce(8).select(
        "word",
        "n",
        F.concat(F.split(F.col("word"), ""), F.array(F.lit(END))).alias("syms"),
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Weighted adjacent-pair counts over the symbol arrays: explode
    positions, pair (syms[i], syms[i+1]), sum the word counts. Key
    space = current pair alphabet (small); partial-combined agg."""
    pairs = vocab.select(
        "n",
        F.explode(
            F.zip_with(
                F.slice(F.col("syms"), 1, F.size("syms") - 1),
                F.slice(F.col("syms"), 2, F.size("syms") - 1),
                lambda a, b: F.struct(a.alias("l"), b.alias("r")),
            )
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("n").alias("cnt")
    )


def _apply_merge(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """Rewrite every symbol array, merging adjacent (left, right) into
    one symbol. Sequential adjacent scan per word -> Arrow-batched
    mapInPandas (greedy left-to-right, matching the reference
    algorithm's non-overlapping semantics)."""
    import pandas as pd

    merged = left + right

    def run(batches):
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                s = list(syms)
                res = []
                i = 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame(
                {"word": pdf["word"], "n": pdf["n"], "syms": out}
            )

    return vocab.mapInPandas(run, schema="word string, n long, syms array<string>")


def train_bpe(
    df: DataFrame, n_merges: int = 30, text_col: str = "text"
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right), ...] in
    learned order. Stops early when no pair occurs twice."""
    spark = df.sparkSession
    vocab = word_symbol_table(df, text_col).cache()
    # Materialize the one corpus shuffle FIRST, under the session's
    # (corpus-scaled) shuffle width; iterations never re-read the data.
    vocab.count()
    # The loop then runs ~2 jobs per merge over the TINY cached vocab;
    # a corpus-sized shuffle partitioning (vanilla sessions default to
    # 200) would pay thousands of empty-task launches for it. Pin a
    # small width for the loop only and restore the session's setting.
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    merges: list[tuple[str, str]] = []
    try:
        for _ in range(n_merges):
            top = (
                _pair_counts(vocab)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top or top[0]["cnt"] < 2:
                break
            left, right = top[0]["l"], top[0]["r"]
            merges.append((left, right))
            new_vocab = _apply_merge(vocab, left, right).cache()
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return merges


def bpe_merge_table(
    df: DataFrame, n_merges: int = 30, text_col: str = "text"
) -> DataFrame:
    """The learned merges as a relation: (rank, left, right, merged)."""
    spark = df.sparkSession
    merges = train_bpe(df, n_merges, text_col)
    rows = [(i, l, r, l + r) for i, (l, r) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string"
    )
