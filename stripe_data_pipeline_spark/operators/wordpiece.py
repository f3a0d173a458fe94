"""WordPiece tokenizer (Schuster & Nakajima 2012; Wu et al. 2016,
GNMT §4.1; the BERT tokenizer) — the third member of the production
tokenizer trio next to merge-based BPE (operators/bpe.py) and
likelihood-based unigram (operators/unigram.py). Reference parity
note: the reference pipeline has no tokenizer at all (dbt SQL over
BigQuery); this family is part of the LLM-training-data extension
surface.

Training is the BPE loop with a different selection rule: instead of
the most FREQUENT adjacent pair, WordPiece merges the pair that most
increases corpus likelihood under a unigram LM —

    score(l, r) = count(lr) / (count(l) * count(r))

where count(x) is the weighted occurrence count of symbol x in the
CURRENT segmentation. Cross-engine determinism: the score is floored
to integer fixed point BEFORE the argmax,

    score_fp = (cnt * 10**12) // (u_l * u_r)

(Python big ints on the driver path, DECIMAL(38,0) `div` on the
distributed path, HUGEINT `//` in the DuckDB oracles — all three are
exact integer floor division, so the (score_fp DESC, l ASC, r ASC)
argmax replays bit-for-bit). Merges stop when no pair occurs twice,
mirroring the BPE trainer's early stop.

Symbols carry BERT's ``##`` continuation marker in the string itself:
word "hash" seeds as [h, ##a, ##s, ##h]; merging (##a, ##s) yields
##as, merging (h, ##as) yields has — merged = left + right[2:]. The
right side of an adjacent pair always sits at position >= 2, so it is
always ##-prefixed and the strip is total. Words containing a literal
'#' are excluded from the pass (the marker-namespace guard, applied
identically in the oracles — a no-op on real text corpora, exactly
like the U+001E/F guard in bpe.clean_words).

Inference is greedy longest-match-first (MaxMatch) — BERT's
WordpieceTokenizer verbatim: at the word start match the longest
non-## piece, then repeatedly the longest ##-piece against the
remaining characters; any position with no match, or a word longer
than ``max_word_len`` characters, encodes to the single piece [UNK]
(BERT's ``max_input_chars_per_word`` behavior). The match loop is
UNROLLED to ``max_word_len`` pure-JVM steps (each step consumes >= 1
character) over the DISTINCT-word table only — the word-level encode
shape of VERDICT r7 #1 — and the vocabulary is a driver-side literal
bounded by alphabet + n_merges, so encoding is join-back + narrow
projection at any corpus size.

Scale shape: training touches the corpus exactly once (one
groupBy(word) shuffle); the merge loop runs over the vocabulary —
driver-side below ``driver_vocab_threshold`` (how production trainers
work), distributed (two tiny aggs + a top-1 collect per merge over
the cached word table) above it. Encoding is one broadcast hash join
+ one doc regroup, identical to bpe.encode_documents_by_word.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCORE_SCALE = 10**12
UNK = "[UNK]"
MAX_WORD_LEN = 16


def clean_words_wp(text_col: str = "text") -> Column:
    """Corpus tokens eligible for the WordPiece pass: non-empty, free
    of the literal '#' that would collide with the ## continuation
    marker, and free of the U+001E/F delimiters the oracles' framed
    replace() trick uses (see bpe.SOT/SEP). All three guards are
    no-ops on real text corpora and are applied IDENTICALLY in the
    DuckDB oracles so both engines see the same word multiset."""
    from stripe_data_pipeline_spark.operators.bpe import SEP, SOT

    return F.filter(
        F.split(F.col(text_col), " "),
        lambda t: (t != "")
        & (~t.contains("#"))
        & (~t.contains(SEP))
        & (~t.contains(SOT)),
    )


def word_symbol_table_wp(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: (word, n, syms) with syms = [c1, ##c2, ##c3,
    ...] — the BERT seeding (no end marker; continuation is carried by
    the ## prefix instead)."""
    words = df.select(F.explode(clean_words_wp(text_col)).alias("word"))
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("n"))
    chars = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
    return vocab.coalesce(8).select(
        "word",
        "n",
        F.concat(
            F.slice(chars, 1, 1),
            F.transform(
                F.slice(chars, 2, F.greatest(F.size(chars) - 1, F.lit(0))),
                lambda c: F.concat(F.lit("##"), c),
            ),
        ).alias("syms"),
    )


def _merge_word_wp(s: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping adjacent merge with the
    ##-strip concatenation (merged = left + right[2:])."""
    res: list[str] = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
            res.append(left + right[2:])
            i += 2
        else:
            res.append(s[i])
            i += 1
    return res


def _train_wp_driver(
    rows: list[tuple[int, list[str]]], n_merges: int
) -> list[tuple[str, str, str, int]]:
    """Driver fixpoint over the COLLECTED word table: exact Python-int
    score_fp = cnt * SCORE_SCALE // (u_l * u_r); argmax by
    (score_fp DESC, l ASC, r ASC) over pairs with cnt >= 2 — the exact
    contract the oracles' unrolled stages restate."""
    rows = [(n, list(s)) for n, s in rows]
    out: list[tuple[str, str, str, int]] = []
    while len(out) < n_merges:
        pair_cnt: dict[tuple[str, str], int] = {}
        unit_cnt: dict[str, int] = {}
        for n, s in rows:
            for sym in s:
                unit_cnt[sym] = unit_cnt.get(sym, 0) + n
            for i in range(len(s) - 1):
                p = (s[i], s[i + 1])
                pair_cnt[p] = pair_cnt.get(p, 0) + n
        best = None
        for (left, right), c in pair_cnt.items():
            if c < 2:
                continue
            fp = c * SCORE_SCALE // (unit_cnt[left] * unit_cnt[right])
            key = (-fp, left, right)
            if best is None or key < best[0]:
                best = (key, left, right, fp)
        if best is None:
            break
        _k, left, right, fp = best
        out.append((left, right, left + right[2:], fp))
        rows = [(n, _merge_word_wp(s, left, right)) for n, s in rows]
    return out


def _unit_counts(vocab: DataFrame) -> DataFrame:
    return (
        vocab.select("n", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("n").alias("u"))
    )


def _pair_counts_wp(vocab: DataFrame) -> DataFrame:
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


def _apply_merge_wp(vocab: DataFrame, left: str, right: str) -> DataFrame:
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = [
                _merge_word_wp(list(s), left, right) for s in pdf["syms"]
            ]
            yield pd.DataFrame(
                {"word": pdf["word"], "n": pdf["n"], "syms": out}
            )

    return vocab.mapInPandas(
        run, schema="word string, n long, syms array<string>"
    )


def train_wordpiece(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    driver_vocab_threshold: int = 65536,
) -> list[tuple[str, str, str, int]]:
    """Learn ``n_merges`` WordPiece merges; returns [(left, right,
    merged, score_fp), ...] in learned order.

    Hybrid execution, same placement contract as bpe.train_bpe: the
    corpus pass is always distributed; under the threshold the
    fixpoint loop runs driver-side on exact Python ints, past it each
    merge is one pair-count agg + one unit-count agg + a top-1 collect
    over the cached word table, with score_fp computed as
    DECIMAL(38,0) integral division (`div`) — exact floor, so both
    placements learn identical sequences (pinned in
    tests/test_wordpiece.py)."""
    spark = df.sparkSession
    vocab = word_symbol_table_wp(df, text_col).cache()
    n_words = vocab.count()
    if n_words <= driver_vocab_threshold:
        rows = [
            (r["n"], list(r["syms"]))
            for r in vocab.select("n", "syms").collect()
        ]
        vocab.unpersist()
        return _train_wp_driver(rows, n_merges)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    merges: list[tuple[str, str, str, int]] = []
    try:
        for _ in range(n_merges):
            units = _unit_counts(vocab)
            scored = (
                _pair_counts_wp(vocab)
                .filter(F.col("cnt") >= 2)
                .join(
                    units.select(
                        F.col("sym").alias("l"), F.col("u").alias("ul")
                    ),
                    "l",
                )
                .join(
                    units.select(
                        F.col("sym").alias("r"), F.col("u").alias("ur")
                    ),
                    "r",
                )
                .select(
                    "l",
                    "r",
                    F.expr(
                        f"CAST(cnt AS DECIMAL(38,0)) * {SCORE_SCALE} div "
                        "(CAST(ul AS DECIMAL(38,0)) * ur)"
                    ).alias("score_fp"),
                )
            )
            top = (
                scored.orderBy(F.desc("score_fp"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()
            )
            if not top:
                break
            left, right = top[0]["l"], top[0]["r"]
            merges.append(
                (left, right, left + right[2:], int(top[0]["score_fp"]))
            )
            new_vocab = _apply_merge_wp(vocab, left, right).cache()
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return merges


def wordpiece_vocab(
    df: DataFrame,
    merges: list[tuple[str, str, str, int]],
    text_col: str = "text",
) -> list[str]:
    """The full piece vocabulary: every seed symbol of the corpus
    (initial chars + ##-continuations — bounded by 2x alphabet) plus
    every merged piece ever created. Collected once; bounded by
    alphabet + n_merges by construction — a tokenizer BUILD ARTIFACT,
    like the BPE merge list."""
    seed = [
        r["sym"]
        for r in word_symbol_table_wp(df, text_col)
        .select(F.explode("syms").alias("sym"))
        .distinct()
        .collect()
    ]
    pieces = dict.fromkeys(seed)
    for _l, _r, merged, _fp in merges:
        pieces[merged] = None
    return sorted(pieces)


def _match_step(rest: Column, pieces: list[str], cont: bool) -> Column:
    """One MaxMatch step as a pure JVM when-chain: the longest piece
    (of the right continuation class) matching the head of ``rest``,
    ties broken piece-ASC — NULL when nothing matches. Pieces are plan
    literals, so the whole step stays inside codegen."""
    cands = sorted(
        (p for p in pieces if p.startswith("##") == cont),
        key=lambda p: (-(len(p) - 2 if cont else len(p)), p),
    )
    chain = None
    for p in cands:
        body = p[2:] if cont else p
        cond = rest.startswith(F.lit(body))
        chain = F.when(cond, F.lit(p)) if chain is None else chain.when(
            cond, F.lit(p)
        )
    if chain is None:
        return F.lit(None).cast("string")
    return chain.otherwise(F.lit(None).cast("string"))


def encode_words_wordpiece(
    words: DataFrame, pieces: list[str], word_col: str = "word"
) -> DataFrame:
    """MaxMatch over a DISTINCT-word relation: (word, pieces
    array<string>). Words longer than MAX_WORD_LEN or hitting an
    unmatchable position encode to [[UNK]] — BERT's
    WordpieceTokenizer semantics exactly.

    r14 (guide §4.2): the matcher used to be MAX_WORD_LEN unrolled
    when-chains, each a ~|vocab|-branch string-startswith cascade —
    16 x |pieces| branches evaluated per row, an expression tree big
    enough to defeat codegen. The relation this runs on is
    VOCABULARY-bounded (distinct words), not corpus-sized, so one
    Arrow mapInPandas doing greedy longest-match against two hash
    sets is strictly cheaper at every scale and produces the same
    pieces: pure string logic, no floats, and the same semantics —
    longest matching body of the right continuation class consumes
    the head (ties impossible: bodies are unique within a class), an
    unmatchable non-empty rest is [UNK] (the unrolled loop's `dead`
    flag), over-length words are [UNK] (the unrolled loop computed
    then discarded the pieces), and the empty word encodes to []
    (zero full steps). Pinned behaviorally in tests/test_wordpiece.py
    (longest-first, roundtrip, UNK cases) and end-to-end by the
    wordpiece_* oracles, which replay the 16-step MaxMatch in SQL."""
    starts = {p for p in pieces if not p.startswith("##")}
    conts = {p[2:] for p in pieces if p.startswith("##")}

    def _encode(word: str) -> list[str]:
        if len(word) > MAX_WORD_LEN:
            return [UNK]
        rest = word
        toks: list[str] = []
        cont = False
        while rest:
            body = None
            for ln in range(len(rest), 0, -1):
                cand = rest[:ln]
                if cand in (conts if cont else starts):
                    body = cand
                    break
            if body is None:
                return [UNK]
            toks.append("##" + body if cont else body)
            rest = rest[len(body) :]
            cont = True
        return toks

    def _run(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            ws = pdf[word_col]
            yield pd.DataFrame(
                {"word": ws, "pieces": [_encode(w) for w in ws]}
            )

    return words.select(F.col(word_col)).mapInPandas(
        _run, schema="word string, pieces array<string>"
    )


def encode_documents_wordpiece(
    df: DataFrame,
    pieces: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Word-level document encode: MaxMatch each DISTINCT word once,
    broadcast-join the occurrence stream back, one doc regroup —
    bpe.encode_documents_by_word's shape with the WordPiece matcher.
    Docs with zero eligible words drop (no occurrence rows)."""
    from stripe_data_pipeline_spark.operators.partitioning import spread_scan

    words = df.select(
        F.explode(clean_words_wp(text_col)).alias("word")
    ).distinct()
    enc = F.broadcast(encode_words_wordpiece(words, pieces))
    # r14 optimization round (guide §2.5): the occurrence stream's
    # split + explode + broadcast probe all evaluate BEFORE the doc
    # regroup's exchange, so a single-file local scan pinned them to
    # one core; spread first (a many-file corpus passes through).
    occ = spread_scan(df).select(
        F.col(id_col),
        F.posexplode(clean_words_wp(text_col)).alias("pos", "word"),
    )
    return (
        occ.join(enc, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "pieces"))),
                    lambda s: s["pieces"],
                )
            ).alias("pieces")
        )
    )
