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
- Hybrid loop placement (round 6, VERDICT r5 #7): when the word-
  frequency table is small enough to hold driver-side
  (``driver_vocab_threshold`` rows, default 64Ki) it is collected ONCE
  and the fixpoint loop runs in memory — zero Spark jobs per merge,
  which is how production BPE trainers work. Past the threshold the
  loop stays fully distributed. Either path learns the identical
  sequence (pinned both ways in tests/test_bpe.py).

Not oracle-expressible (iterative fixpoint; DuckDB has no loop), so
the catalog query is rows-only; exactness is pytest-pinned against a
pure-Python reference implementation on planted corpora
(tests/test_bpe.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

END = "</w>"  # end-of-word marker, per the original algorithm

# Symbol DELIMITERS for the string-encoded symbol stream used by the
# encode pass: every symbol is emitted as ``SOT + sym + SEP`` (U+001E
# start, U+001F end), so applying merge (l, r) is
# ``replace(s, SOT+l+SEP+SOT+r+SEP, SOT+l+r+SEP)``. BOTH boundaries
# are required for exactness:
# - the leading SOT stops a symbol that merely ENDS with ``l`` from
#   false-matching (symbols [ba, c] vs merge (a, c) — the hypothesis
#   test caught exactly this with a single-delimiter design);
# - the trailing SEP stops a symbol that merely STARTS with ``r``
#   (symbols [c, ab] vs merge (c, a));
# - and because the pattern consumes exactly two whole symbols, the
#   next potential match starts at the following symbol's own SOT, so
#   replace()'s left-to-right non-overlapping scan IS the reference
#   algorithm's greedy adjacent merge (_merge_word) on runs like
#   [a,a,a,a] -> [aa, aa]. Identical semantics in Spark (JVM
#   StringReplace) and DuckDB replace() — pinned by hypothesis in
#   tests/test_bpe_encode.py.
# Precondition: corpus tokens must contain neither U+001E nor U+001F;
# the filter in clean_words() drops any that do, identically on both
# engines.
SEP = "\x1f"
SOT = "\x1e"


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


def _apply_merges(vocab: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Rewrite every symbol array, applying ``merges`` in order — each
    merge a greedy left-to-right non-overlapping adjacent scan,
    matching the reference algorithm. One Arrow-batched mapInPandas
    pass regardless of how many merges are applied (the point of the
    batched trainer: k merges cost one vocab rewrite, not k)."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                s = list(syms)
                for left, right in merges:
                    s = _merge_word(s, left, right)
                out.append(s)
            yield pd.DataFrame(
                {"word": pdf["word"], "n": pdf["n"], "syms": out}
            )

    return vocab.mapInPandas(run, schema="word string, n long, syms array<string>")


def _merge_word(s: list[str], left: str, right: str) -> list[str]:
    """Greedy left-to-right non-overlapping adjacent merge of one
    word's symbol list — the reference algorithm's inner step, shared
    by the distributed rewrite and the driver fixpoint loop."""
    res: list[str] = []
    i = 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
            res.append(left + right)
            i += 2
        else:
            res.append(s[i])
            i += 1
    return res


def _driver_pair_counts(rows: list[tuple[int, list[str]]]) -> dict:
    counts: dict[tuple[str, str], int] = {}
    for n, s in rows:
        for i in range(len(s) - 1):
            p = (s[i], s[i + 1])
            counts[p] = counts.get(p, 0) + n
    return counts


def _train_bpe_driver(
    rows: list[tuple[int, list[str]]],
    n_merges: int,
    batched: bool,
    top_m: int = 64,
) -> list[tuple[str, str, int]]:
    """Driver-side fixpoint loop over a COLLECTED word-frequency table
    (bounded by ``driver_vocab_threshold`` — see train_bpe). Replicates
    the distributed trainers' semantics exactly: same exact pair
    counts, same (count DESC, pair ASC) total order, and for
    ``batched=True`` the same top-``top_m`` truncation +
    :func:`_select_batch` admission rule — so driver and distributed
    paths learn identical sequences (pinned in tests/test_bpe.py)."""
    rows = [(n, list(s)) for n, s in rows]
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        counts = _driver_pair_counts(rows)
        ordered = sorted(
            ((left, right, c) for (left, right), c in counts.items()),
            key=lambda t: (-t[2], t[0], t[1]),
        )
        top = ordered[:top_m] if batched else ordered[:1]
        if not top or top[0][2] < 2:
            break
        if batched:
            floor_cnt = top[-1][2] if len(top) == top_m else 0
            batch = _select_batch(top, floor_cnt)[: n_merges - len(merges)]
            if not batch:
                batch = [top[0]]
        else:
            batch = [top[0]]
        merges.extend(batch)
        for left, right, _c in batch:
            rows = [(n, _merge_word(s, left, right)) for n, s in rows]
    return merges


def train_bpe(
    df: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    driver_vocab_threshold: int = 65536,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right), ...] in
    learned order. Stops early when no pair occurs twice.

    Hybrid execution (round 6): the corpus pass — the only part that
    touches the data — is ALWAYS distributed (one groupBy(word)
    shuffle). When the resulting word-frequency table has at most
    ``driver_vocab_threshold`` rows it is collected ONCE and the
    fixpoint loop runs driver-side (this is how production BPE
    trainers work — the merge loop is in-memory over word counts);
    otherwise the loop stays fully distributed. The collect is bounded
    by contract: threshold rows of (count, short symbol array), a few
    MB at the default. Results are identical on either path (pinned by
    tests/test_bpe.py on both)."""
    spark = df.sparkSession
    vocab = word_symbol_table(df, text_col).cache()
    # Materialize the one corpus shuffle FIRST, under the session's
    # (corpus-scaled) shuffle width; iterations never re-read the data.
    n_words = vocab.count()
    if n_words <= driver_vocab_threshold:
        rows = [
            (r["n"], list(r["syms"]))
            for r in vocab.select("n", "syms").collect()
        ]
        vocab.unpersist()
        return [
            (left, right)
            for left, right, _c in _train_bpe_driver(
                rows, n_merges, batched=False
            )
        ]
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
            new_vocab = _apply_merges(vocab, [(left, right)]).cache()
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return merges


def _select_batch(
    top: list[tuple[str, str, int]], floor_cnt: int
) -> list[tuple[str, str, int]]:
    """Pick a prefix of the (count DESC, pair ASC)-sorted pair list
    that is PROVABLY safe to merge in one pass — i.e. sequential
    1-merge training learns exactly the same sequence.

    Rank 1 is always admitted: it is the global argmax verbatim.
    Admitting p_j (j >= 2) requires showing nothing can beat p_j at
    sequential step j after merges p_1..p_{j-1}. A pair q's count
    changes ONLY if q contains one of the touched symbols {l_i, r_i,
    l_i r_i}: destroyed occurrences contain l_i or r_i, created ones
    contain the merged symbol. Every post-merge occurrence of q maps
    injectively to a pre-merge occurrence of q or of one of <= 4
    boundary pairs (expand q's merged symbols back to their halves),
    each itself containing a touched symbol. Hence rules:

    - mutual disjointness: the candidate's {left, right, merged}
      must not intersect the admitted pairs' touched-symbol set —
      then one pass == sequential passes and p_j's own count is
      unchanged at its turn; first violation stops the batch (the
      list is sorted, nothing later can be proved either);
    - no other VISIBLE (top-m) pair may contain an admitted touched
      symbol: its count at step j is not provably below c_j. First
      such row stops the batch;
    - c_j > 5*floor_cnt: every UNSEEN pair is <= floor_cnt (the
      truncated list's last count, 0 when the list is complete), so a
      changed unseen pair is <= old + 4 boundary counts <= 5*floor
      < c_j strictly — it cannot beat or tie p_j;
    - untouched pairs keep their counts: visible ones rank behind
      p_j by (count, lex) order, unseen ones are <= floor < c_j.
    """
    selected: list[tuple[str, str, int]] = []
    used: set[str] = set()
    for i, (l, r, c) in enumerate(top):
        if c < 2:
            break
        syms = {l, r, l + r}
        if i > 0:
            if (
                (syms & used)
                or c <= 5 * floor_cnt
                or any(
                    (l2 in used or r2 in used)
                    for j2, (l2, r2, _c2) in enumerate(top)
                    if j2 != i and (l2, r2) not in {(s[0], s[1]) for s in selected}
                )
            ):
                break
        selected.append((l, r, c))
        used |= syms
    return selected


def train_bpe_batched(
    df: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    top_m: int = 64,
    driver_vocab_threshold: int = 65536,
) -> list[tuple[str, str, int]]:
    """Batched BPE trainer (VERDICT r4 #6): learns the IDENTICAL merge
    sequence as :func:`train_bpe` while collecting the top ``top_m``
    pairs per Spark pass and admitting a provably-safe prefix of them
    (see :func:`_select_batch`), cutting driver round-trips and vocab
    rewrites up to batch-size-fold. Falls back to a single exact merge
    whenever the safety rule admits nothing, so progress (and
    exactness) never depends on the heuristic. Returns
    ``[(left, right, count_at_merge_time), ...]`` in learned order.

    Same hybrid execution as :func:`train_bpe`: a word-frequency table
    of at most ``driver_vocab_threshold`` rows is collected once and
    the loop — including the SAME top-``top_m`` truncation and
    :func:`_select_batch` admission rule — runs driver-side, so the
    batching math stays exercised on either path.
    """
    spark = df.sparkSession
    vocab = word_symbol_table(df, text_col).cache()
    n_words = vocab.count()
    if n_words <= driver_vocab_threshold:
        rows = [
            (r["n"], list(r["syms"]))
            for r in vocab.select("n", "syms").collect()
        ]
        vocab.unpersist()
        return _train_bpe_driver(rows, n_merges, batched=True, top_m=top_m)
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    merges: list[tuple[str, str, int]] = []
    try:
        while len(merges) < n_merges:
            top = [
                (row["l"], row["r"], row["cnt"])
                for row in _pair_counts(vocab)
                .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
                .limit(top_m)
                .collect()
            ]
            if not top or top[0][2] < 2:
                break
            floor_cnt = top[-1][2] if len(top) == top_m else 0
            batch = _select_batch(top, floor_cnt)[: n_merges - len(merges)]
            if not batch:
                batch = [top[0]]
            merges.extend(batch)
            new_vocab = _apply_merges(vocab, [(l, r) for l, r, _ in batch]).cache()
            new_vocab.count()
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return merges


def train_bpe_both(
    df: DataFrame,
    n_merges: int = 30,
    text_col: str = "text",
    top_m: int = 64,
    driver_vocab_threshold: int = 65536,
) -> tuple[list[tuple[str, str, int]], list[tuple[str, str]]]:
    """Run the BATCHED and the ITERATIVE trainer over ONE shared
    corpus pass and return ``(batched, iterative)`` — the agreement
    check the bpe_merges_learned catalog query pins. Under the driver
    threshold the word-frequency table is collected once and both
    fixpoint loops (including the batched top-m truncation +
    _select_batch admission) run in memory; past it, each trainer runs
    its own distributed loop (two corpus passes — correctness
    identical, and at that scale the loop cost dominates anyway)."""
    vocab = word_symbol_table(df, text_col).cache()
    n_words = vocab.count()
    if n_words <= driver_vocab_threshold:
        rows = [
            (r["n"], list(r["syms"]))
            for r in vocab.select("n", "syms").collect()
        ]
        vocab.unpersist()
        batched = _train_bpe_driver(rows, n_merges, batched=True, top_m=top_m)
        iterative = [
            (left, right)
            for left, right, _c in _train_bpe_driver(
                rows, n_merges, batched=False
            )
        ]
        return batched, iterative
    vocab.unpersist()
    return (
        train_bpe_batched(
            df, n_merges, text_col, top_m,
            driver_vocab_threshold=driver_vocab_threshold,
        ),
        train_bpe(
            df, n_merges, text_col,
            driver_vocab_threshold=driver_vocab_threshold,
        ),
    )


def bpe_merge_table(
    df: DataFrame, n_merges: int = 30, text_col: str = "text"
) -> DataFrame:
    """The learned merges as a relation: (rank, left, right, merged).
    Uses the batched trainer (identical output to train_bpe by
    construction — see _select_batch — and pinned by tests/test_bpe.py
    on fixture corpora)."""
    spark = df.sparkSession
    merges = train_bpe_batched(df, n_merges, text_col)
    rows = [(i, l, r, l + r) for i, (l, r, _c) in enumerate(merges)]
    return spark.createDataFrame(
        rows, "rank int, left string, right string, merged string"
    )


# --------------------------------------------------------------------
# Encode pass (round 7, VERDICT r6 #1): apply the LEARNED merges to
# tokenize the corpus into subword sequences — the train -> encode ->
# pack loop a real training-data pipeline runs. The merge list is a
# driver-side literal of at most n_merges pairs (corpus-size-
# INDEPENDENT), so encoding is a pure narrow projection: chained JVM
# replace() calls inside whole-stage codegen, no shuffle, no Python,
# no join — the shape that scales to 100 TB trivially. DuckDB can
# replay the identical replace chain, so the whole pass (and the
# training that produced the merges, unrolled stage by stage) is
# exactly oracle-checkable — unlike the fixpoint trainer itself.
# --------------------------------------------------------------------


def clean_words(text_col: str = "text") -> Column:
    """Corpus tokens eligible for the encode pass: non-empty and free
    of the U+001E/U+001F delimiters (see SOT/SEP). The filter is a
    no-op on real corpora and is applied IDENTICALLY in the DuckDB
    oracles so both engines train and encode over the same word
    multiset."""
    return F.filter(
        F.split(F.col(text_col), " "),
        lambda t: (t != "") & (~t.contains(SEP)) & (~t.contains(SOT)),
    )


def encoded_word_expr(word: Column, merges: list[tuple[str, str]]) -> Column:
    """The delimiter-framed subword stream of one word after applying
    ``merges`` in learned order: start from ``␞c1␟␞c2␟...␞</w>␟`` and
    chain one replace() per merge. Pure JVM expression — the merge
    list is baked into the plan as literals."""
    s = F.concat(
        F.array_join(
            F.transform(
                F.split(word, ""),
                lambda c: F.concat(F.lit(SOT), c, F.lit(SEP)),
            ),
            "",
        ),
        F.lit(SOT + END + SEP),
    )
    for left, right in merges:
        s = F.replace(
            s,
            F.lit(SOT + left + SEP + SOT + right + SEP),
            F.lit(SOT + left + right + SEP),
        )
    return s


def encode_documents(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize every document with a trained merge list:
    (id, subwords array<string>) where subwords is the document's
    in-order BPE token stream (per-word greedy merge application,
    words in document order, each word terminated by </w>).

    One narrow projection — transform() encodes each word via the
    replace chain, the per-word streams concatenate, and one final
    split recovers the token array. No shuffle at any scale; docs
    with zero eligible words are dropped (deterministic, mirrored by
    the oracles' inner join against the vocab)."""
    enc = F.array_join(
        F.transform(
            clean_words(text_col), lambda w: encoded_word_expr(w, merges)
        ),
        "",
    )
    out = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.replace(enc, F.lit(SOT), F.lit("")), SEP),
            lambda t: t != "",
        ).alias("subwords"),
    )
    return out.filter(F.size("subwords") > 0)


def encode_words_table(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text"
) -> DataFrame:
    """The tokenizer run ONCE per distinct word: (word, subwords
    array<string>) over the corpus's DISTINCT word set. The replace
    chain is the expensive part of encoding, and under Zipf the
    distinct-word table is orders of magnitude smaller than the word-
    occurrence stream — this is the production tokenizer shape
    (VERDICT r7 #1): tokenize the vocabulary, not the corpus."""
    words = df.select(
        F.explode(clean_words(text_col)).alias("word")
    ).distinct()
    return words.select(
        "word",
        F.filter(
            F.split(
                F.replace(
                    encoded_word_expr(F.col("word"), merges),
                    F.lit(SOT),
                    F.lit(""),
                ),
                SEP,
            ),
            lambda t: t != "",
        ).alias("subwords"),
    )


def encode_documents_by_word(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_words: bool = True,
) -> DataFrame:
    """Word-level encode (VERDICT r7 #1) — identical output to
    :func:`encode_documents` (pinned by tests/test_bpe_encode.py) with
    the replace chain amortized over DISTINCT words instead of word
    occurrences:

    - :func:`encode_words_table` tokenizes each distinct word once
      (Zipf: the vocabulary is tiny relative to the corpus — this
      testdata has 31 distinct words over 270k occurrences; real
      corpora run ~1e6 words vs 1e11+ occurrences);
    - occurrences posexplode to (doc_id, pos, word) and join the word
      table — broadcast by default (a distinct-word table fits
      executor memory far past web-corpus vocabulary sizes; pass
      ``broadcast_words=False`` to let AQE pick a shuffle join when
      the vocabulary genuinely doesn't);
    - one groupBy(doc_id) regroup rebuilds the in-order subword
      stream (array_sort on pos structs -> flatten).

    Trade: the per-occurrence replace chain (10 merges x word length
    string scans per occurrence) becomes one token-stream shuffle.
    Measured at sf1 (10x data) the chained-replace projection was the
    steepest headline query (19.8 s, 9.1x ratio); this shape moves
    the per-occurrence cost to a plain hash join. Docs with zero
    eligible words drop (no occurrence rows), matching
    encode_documents' size filter."""
    from stripe_data_pipeline_spark.operators.partitioning import spread_scan

    words = encode_words_table(df, merges, text_col)
    if broadcast_words:
        words = F.broadcast(words)
    # r14 optimization round (guide §2.5): the occurrence stream's
    # split + explode + broadcast probe all evaluate BEFORE the doc
    # regroup's exchange, so a single-file local scan pinned them to
    # one core; spread first (a many-file corpus passes through).
    occ = spread_scan(df).select(
        F.col(id_col), F.posexplode(clean_words(text_col)).alias("pos", "word")
    )
    return (
        occ.join(words, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "subwords"))),
                    lambda s: s["subwords"],
                )
            ).alias("subwords")
        )
        # Match encode_documents' documented drop of empty encodes
        # (ADVICE r8): a doc whose every word encodes to [] would
        # otherwise survive here with subwords = [].
        .filter(F.size("subwords") > 0)
    )


def subword_vocabulary(
    enc: DataFrame, subwords_col: str = "subwords"
) -> DataFrame:
    """Token-id assignment over an encoded corpus: (token_id, token,
    n_occurrences), ids dense-ranked by token string ASC.

    The subword vocabulary is BOUNDED BY CONSTRUCTION: initial symbols
    are the corpus character set plus </w>, and each merge adds
    exactly one new symbol — so |vocab| <= |charset| + 1 + n_merges
    regardless of corpus size. The global row_number window therefore
    runs over a provably tiny relation (the same bounded-driver-state
    contract as the k-means centroids)."""
    toks = enc.select(F.explode(subwords_col).alias("token"))
    counts = toks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_occurrences")
    )
    w = Window.orderBy("token")
    return counts.select(
        F.row_number().over(w).cast("bigint").alias("token_id"),
        "token",
        "n_occurrences",
    )


def encode_documents_ids(
    enc: DataFrame,
    vocab: DataFrame | None = None,
    id_map: list[tuple[str, int]] | None = None,
) -> DataFrame:
    """Map an encoded corpus to id sequences: (doc_id, token_ids
    array<bigint>) in document token order.

    The vocab is BOUNDED BY CONSTRUCTION (see subword_vocabulary), so
    it is collected once and baked into the plan as a map literal:
    id assignment becomes transform(subwords, t -> element_at(map, t))
    — a NARROW projection with no join, no explode and no per-doc
    regroup shuffle. (The r7 first cut posexploded the token stream
    through a broadcast join + array_sort regroup — correct, but it
    shuffled every token to rebuild an array the row already had;
    measured 4.96s -> narrow at sf0.1. The collect is the same
    bounded-driver-state contract as the k-means centroids.)

    Pass ``id_map`` (from :func:`token_id_map`) to skip the vocab
    aggregation job entirely — the production shape, where the vocab
    ships with the tokenizer artifact instead of being re-derived per
    query."""
    if id_map is None:
        if vocab is None:
            raise ValueError("need vocab or id_map")
        id_map = token_id_map(vocab)
    pairs: list = []
    for token, token_id in id_map:
        pairs.extend([F.lit(token), F.lit(int(token_id))])
    m = F.create_map(*pairs)
    return enc.select(
        "doc_id",
        F.transform("subwords", lambda t: F.element_at(m, t)).alias(
            "token_ids"
        ),
    )


def token_id_map(vocab: DataFrame) -> list[tuple[str, int]]:
    """Collect the bounded vocab as a sorted [(token, token_id), ...]
    list — the driver-side tokenizer artifact (same bounded-collect
    contract as subword_vocabulary's window)."""
    return sorted(
        (r["token"], int(r["token_id"]))
        for r in vocab.select("token", "token_id").collect()
    )
