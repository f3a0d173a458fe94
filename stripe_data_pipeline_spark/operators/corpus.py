"""Corpus-preparation operators (north-star: training-data pipelines).

The steps between "raw deduped corpus" and "token stream a trainer can
consume": chunking long documents into overlapping context windows,
packing variable-length docs into fixed token budgets, decontaminating
train splits against held-out data, scrubbing PII, and quantizing
embeddings for a compact ANN index.

All five are expressed with built-in DataFrame ops (explode/sequence,
windows, joins, regexp, higher-order array functions) — no Python in
the hot path — and all are deterministic/engine-independent so DuckDB
oracles can bit-check them:

- ``chunk_documents``: explode(sequence) over token offsets → one row
  per (doc, window). Linear in output size, no shuffle at all — the
  Generate fuses into the scan stage (same plan shape as the calendar
  expansion in models/revenue.py).
- ``pack_sequences``: concatenate-then-split packing. Docs are hashed
  into ``n_groups`` independent pack groups (parallelism knob), ordered
  deterministically by md5(key) within the group, and a running token
  sum assigns each doc a (group, seq_id, offset). One window shuffle on
  the group key; at 100 TB groups ≈ cluster cores keeps every partition
  bounded at corpus_tokens/n_groups.
- ``ngram_contamination``: held-out docs sharing an n-gram shingle with
  the train split. Joins on shingle STRINGS so DuckDB can verify; the
  100 TB variant joins on xxhash64(shingle) (8-byte keys, same plan) —
  that one-line swap is deliberately left to the caller so the oracled
  path and the scale path share all other code.
- ``decontaminate_train``: the actionable form of the contamination
  report — drop every train doc sharing a shingle with held-out data
  and return the clean train set (semi join to mark, anti join to
  drop; both linear).
- ``scrub_pii``: regexp redaction of emails/phone numbers. Pure
  per-row projection; patterns restricted to the regex subset where
  Java (Spark) and RE2 (DuckDB) agree.
- ``quantize_embeddings``: symmetric per-vector int8 quantization.
  All arithmetic in IEEE double with a fixed evaluation order, so the
  quantized codes are bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.sampling import assign_split, hash_bucket

# Conservative patterns valid (and identical) in both Java regex and
# RE2: no backrefs, no lookaround.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9][0-9() .-]{6,}[0-9]"


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), " "), lambda t: t != "")


def _spread(df: DataFrame) -> DataFrame:
    """See operators.partitioning.spread_scan (conditional: no
    exchange when the scan is already parallel)."""
    from stripe_data_pipeline_spark.operators.partitioning import spread_scan

    return spread_scan(df)


def chunk_documents(
    df: DataFrame,
    size: int = 32,
    stride: int = 24,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into token windows of ``size`` tokens every
    ``stride`` tokens (overlap = size - stride).

    explode(sequence(0, n_tokens-1, stride)) generates the window
    starts per row — a Generate, not a join, so the whole operator is
    a single narrow stage that fuses into the scan: no shuffle at any
    scale, output rows ~ corpus_tokens/stride. The trailing chunk is
    allowed to be short (standard context-window prep).
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    toks = df.select(
        F.col(id_col), _tokens(text_col).alias("__toks")
    ).filter(F.size("__toks") > 0)
    starts = toks.select(
        id_col,
        "__toks",
        F.explode(
            F.sequence(F.lit(0), F.size("__toks") - 1, F.lit(stride))
        ).alias("__start"),
    )
    return starts.select(
        F.col(id_col),
        (F.col("__start") / stride).cast("bigint").alias("chunk_id"),
        F.concat_ws(
            " ", F.slice("__toks", F.col("__start") + 1, F.lit(size))
        ).alias("chunk_text"),
        F.least(F.lit(size), F.size("__toks") - F.col("__start"))
        .cast("bigint")
        .alias("chunk_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 1024,
    n_groups: int = 32,
    text_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """Concatenate-then-split packing: assign each doc a (pack_group,
    seq_id, seq_offset) so that concatenating docs in md5(key) order
    within a group and cutting every ``budget`` tokens yields the
    training sequences.

    Docs are hashed into ``n_groups`` independent groups, so the only
    shuffle is one window exchange on the group key and each group
    packs independently — at 100 TB set n_groups ≈ total cores and no
    partition ever holds more than corpus/n_groups. All-integer
    arithmetic → bit-identical on any engine.
    """
    n_tokens = F.size(_tokens(text_col)).cast("bigint")
    counts = df.select(F.col(key_col), n_tokens.alias("n_tokens"))
    return pack_token_counts(counts, budget, n_groups, key_col=key_col)


def pack_token_counts(
    df: DataFrame,
    budget: int = 1024,
    n_groups: int = 32,
    key_col: str = "doc_id",
    n_tokens_col: str = "n_tokens",
) -> DataFrame:
    """The packing core shared by whitespace-token packing
    (pack_sequences) and trained-tokenizer packing (the BPE encode
    pass): given per-doc token COUNTS, assign (pack_group, seq_id,
    seq_offset). Same plan either way — one window shuffle on the
    hash-assigned group key; n_groups is the 100 TB parallelism knob."""
    d = df.select(
        F.col(key_col),
        F.col(n_tokens_col).cast("bigint").alias("n_tokens"),
        hash_bucket(F.col(key_col), n_groups).alias("pack_group"),
        F.md5(F.col(key_col).cast("string")).alias("__ord"),
    )
    w = (
        Window.partitionBy("pack_group")
        .orderBy("__ord", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("__start")
    d = d.select(key_col, "pack_group", "n_tokens", start)
    return d.select(
        key_col,
        "pack_group",
        F.floor(F.col("__start") / budget).cast("bigint").alias("seq_id"),
        "n_tokens",
        (F.col("__start") % budget).cast("bigint").alias("seq_offset"),
    )


def shingle_array(text_col: str, n: int) -> Column:
    """Distinct n-token shingles of a document as an array column.

    array_distinct runs MAP-SIDE inside the projection, so downstream
    consumers explode an already-deduped per-doc set — the wide
    DISTINCT over (doc, shingle) pairs never happens.
    """
    toks = F.split(F.col(text_col), " ")
    n_t = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n_t - (n - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def ngram_contamination(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    hash_keys: bool = False,
) -> DataFrame:
    """Held-out-contamination report: test-split docs that share at
    least one n-token shingle with any train-split doc, with the count
    of distinct shared shingles.

    Splits come from the deterministic md5 hash-range assignment
    (operators/sampling.py), shingles are the dedup family's k-token
    windows. With ``hash_keys=False`` the join key is the shingle
    STRING, so the whole report is oracle-checkable; ``hash_keys=True``
    is the corpus-scale path — xxhash64(shingle) turns every shuffle/
    join key into 8 bytes while the plan (and, absent 64-bit hash
    collisions, the output) is IDENTICAL, so the hashed variant shares
    the string variant's oracle.

    Plan shape: per-doc shingles deduped MAP-SIDE via array_distinct
    (no wide distinct anywhere), then one LEFT SEMI join of test
    shingles against train shingles and a per-doc count. Three linear
    shuffles total (semi-join both sides + final agg), all on keys
    with corpus-proportional cardinality; the semi join never
    duplicates rows, so no quadratic surface even for shingles that
    occur in millions of train docs.
    """
    shingle = F.explode(shingle_array(text_col, n)).alias("shingle")

    sh = assign_split(
        _spread(df), id_col, train_pct=train_pct, val_pct=val_pct
    ).select(F.col(id_col), F.col("split"), shingle)
    if hash_keys:
        sh = sh.select(
            id_col, "split", F.xxhash64(F.col("shingle")).alias("shingle")
        )
    train_shingles = sh.filter(F.col("split") == "train").select("shingle")
    test = sh.filter(F.col("split") == "test")
    return (
        test.join(train_shingles, "shingle", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def decontaminate_train(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """The actionable counterpart of ``ngram_contamination``: the
    decontaminated TRAIN SET — train-split docs that share no n-token
    shingle with ANY held-out doc (val or test), all input columns
    preserved.

    Plan shape: one semi join of train shingles against held-out
    shingles marks contaminated train doc ids, then an ANTI join
    removes them from the train slice. Both joins are linear shuffles
    on corpus-proportional keys; the per-doc distinct() before the
    anti join keeps its build side at most one row per contaminated
    doc. Same engine-portable md5 split and shingle construction as
    the report query, so oracle and scale path share the whole plan.
    """
    shingle = F.explode(shingle_array(text_col, n)).alias("shingle")
    sh = assign_split(
        _spread(df), id_col, train_pct=train_pct, val_pct=val_pct
    ).select(F.col(id_col), F.col("split"), shingle)
    heldout = sh.filter(F.col("split") != "train").select("shingle")
    contaminated = (
        sh.filter(F.col("split") == "train")
        .join(heldout, "shingle", "left_semi")
        .select(id_col)
        .distinct()
    )
    train = assign_split(df, id_col, train_pct=train_pct, val_pct=val_pct).filter(
        F.col("split") == "train"
    )
    return train.join(contaminated, id_col, "left_anti").drop("split")


def scrub_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Redact email addresses and phone-number-shaped substrings.

    Pure per-row projection (regexp_replace is codegen'd JVM-side) —
    fuses into the scan, no shuffle, trivially parallel at any scale.
    Emits the scrubbed text plus the net character delta as a cheap
    audit signal (0 delta rows = nothing redacted).
    """
    cleaned = F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return df.select(
        F.col(id_col),
        cleaned.alias("clean_text"),
        (F.length(F.col(text_col)) - F.length(cleaned))
        .cast("bigint")
        .alias("n_redacted_chars"),
    )


def quantize_embeddings(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    code_i = floor(x_i*127/max|x| + 0.5).

    The compact form an ANN index stores at scale (4× smaller than
    float32, SIMD-friendly distance kernels). Per-row projection, no
    shuffle. Every step is an exactly-rounded IEEE double op in a
    fixed order, so codes are bit-identical across engines; the scale
    is emitted 1e-9 fixed-point for the same reason. Codes are
    serialized to a comma-joined string (hashable schema — array
    columns break row canonicalization downstream; same lesson as
    array_agg_sorted). Zero vectors get scale 0 and all-zero codes.
    """
    maxabs = F.array_max(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double")))
    )
    d = df.select(F.col(id_col), F.col(vec_col), maxabs.alias("__maxabs"))
    code = lambda x: F.when(  # noqa: E731
        F.col("__maxabs") == 0.0, F.lit(0)
    ).otherwise(
        F.floor((x.cast("double") * 127.0) / F.col("__maxabs") + 0.5).cast("int")
    )
    return d.select(
        F.col(id_col),
        F.floor((F.col("__maxabs") / 127.0) * 1e9 + 0.5)
        .cast("bigint")
        .alias("scale_fp"),
        F.concat_ws(
            ",", F.transform(F.col(vec_col), lambda x: code(x).cast("string"))
        ).alias("codes"),
    )


def cap_per_group(
    df: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    k: int = 100,
    prefix_len: int = 2,
) -> DataFrame:
    """Per-domain document cap: keep at most ``k`` docs per group,
    chosen deterministically by md5(key) order (a uniform shuffle of
    each group, reproducible on any engine). The C4/RefinedWeb-style
    guard against one domain dominating a pretraining mix.

    Semantically this is ``row_number() OVER (PARTITION BY group
    ORDER BY md5(key), key) <= k`` — but a direct window puts an
    ENTIRE hot domain in one task, the classic 100 TB skew-killer.
    Instead the rank is decomposed by md5 PREFIX bucket (the bucket is
    a prefix of the ordering key, so (bucket, md5) order == md5
    order):

    1. count rows per (group, prefix-bucket) — partial-combined agg,
       output is |groups| x 256 tiny rows;
    2. running count of earlier buckets per group (window over the
       tiny counts relation, not the corpus);
    3. keep only buckets whose preceding count < k — every other
       bucket provably holds ranks > k, so the corpus-side join
       discards ~all of a hot domain BEFORE any window;
    4. row_number within the surviving (group, bucket) slivers —
       each holds ~group_size/256 rows — plus the bucket offset gives
       the exact global rank.

    The corpus is touched by one agg and one join; the only window
    over corpus rows runs on ~k + group_size/256 rows per group.
    """
    ord_key = F.md5(F.col(key_col).cast("string"))
    base = df.withColumn("__ord", ord_key).withColumn(
        "__b", F.substring(F.col("__ord"), 1, prefix_len)
    )
    counts = base.groupBy(group_col, "__b").agg(F.count(F.lit(1)).alias("__n"))
    w_prior = (
        Window.partitionBy(group_col)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = (
        counts.withColumn(
            "__before", F.coalesce(F.sum("__n").over(w_prior), F.lit(0))
        )
        .filter(F.col("__before") < k)
        .select(group_col, "__b", "__before")
    )
    # |groups| x few rows; broadcast locally. At extreme domain counts
    # drop the hint and let AQE pick the join strategy.
    w_bucket = Window.partitionBy(group_col, "__b").orderBy("__ord", key_col)
    ranked = base.join(F.broadcast(boundary), [group_col, "__b"]).withColumn(
        "__rank", F.col("__before") + F.row_number().over(w_bucket)
    )
    return ranked.filter(F.col("__rank") <= k).select(
        *df.columns, F.col("__rank").cast("bigint").alias("domain_rank")
    )


def cross_doc_novelty(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_novel_bp: int = 5000,
    hash_keys: bool = False,
) -> DataFrame:
    """Cross-document novelty report (exact-substring dedup signal):
    for every doc, how many of its distinct n-token shingles first
    appeared in an EARLIER doc (by id), the novel share in basis
    points, and a keep flag. The relational form of
    "deduplicate exact substrings against everything ingested before
    you" — scan-order-free because first-ness is min(doc_id), not
    arrival order.

    Plan shape (r15, guide §2.3 "aggregate before you shuffle"): the
    join back from the per-shingle first-owner table to the per-doc
    shingle stream is GONE. Shingles are distinct per doc
    (shingle_array array_distincts map-side) and every doc containing
    shingle s satisfies min_owner(s) <= doc, so a doc's shingles split
    exactly into "owned" (min_owner == doc) and "dup"
    (min_owner < doc):

        n_dup_shingles(doc) = n_shingles(doc) - #{s : min_owner(s) == doc}

    The owned term is a second, DISTINCT-SHINGLE-sized aggregation
    over the first-owner table — so the corpus-sized shingle stream is
    shuffled once (the min agg, partial-combined), never joined, and
    the old post-join corpus-sized re-shuffle to doc_id disappears
    with it (measured at sf1: 4.2-5.7 s -> ~2.5 s warm; the r14 shape
    re-exploded the shingles for the join side too). A singleton
    shingle is owned by its only doc, so no cnt >= 2 filter is needed
    anywhere. With ``hash_keys=True`` every shuffle key is
    xxhash64(shingle) — 8 bytes, same plan, same output absent 64-bit
    collisions (shares the string variant's oracle, the
    heldout_contamination_hashed pattern).
    """
    df = _spread(df)
    arr = shingle_array(text_col, n)
    per_doc_total = df.select(
        F.col(id_col), F.size(arr).cast("bigint").alias("n_shingles")
    )
    sh = df.select(F.col(id_col), F.explode(arr).alias("shingle"))
    if hash_keys:
        sh = sh.select(id_col, F.xxhash64(F.col("shingle")).alias("shingle"))
    owned = (
        sh.groupBy("shingle")
        .agg(F.min(id_col).alias("__first"))
        .groupBy("__first")
        .agg(F.count(F.lit(1)).cast("bigint").alias("__owned"))
        .select(F.col("__first").alias(id_col), "__owned")
    )
    per_doc = per_doc_total.join(owned, id_col, "left").select(
        id_col,
        "n_shingles",
        (
            F.col("n_shingles")
            - F.coalesce(F.col("__owned"), F.lit(0))
        ).cast("bigint").alias("n_dup_shingles"),
    )
    novelty = F.expr("(n_shingles - n_dup_shingles) * 10000 div n_shingles")
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_dup_shingles",
        novelty.cast("bigint").alias("novel_bp"),
        (novelty >= F.lit(min_novel_bp)).alias("keep"),
    )


def token_length_histogram(
    df: DataFrame,
    width: int = 32,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Token-length histogram per language: docs and tokens per
    ``width``-token bucket. The corpus-shape report every data mix is
    tuned against (truncation waste at a context length, short-doc
    share per language).

    Pure projection (token count fuses into the scan) plus ONE
    partial-combined agg on (lang, bucket) — output cardinality is
    |langs| x buckets regardless of corpus size.
    """
    n_tokens = F.size(_tokens(text_col)).cast("bigint")
    return (
        df.select(
            F.col(lang_col),
            n_tokens.alias("__nt"),
        )
        .groupBy(
            lang_col,
            (F.floor(F.col("__nt") / width) * width)
            .cast("bigint")
            .alias("bucket_start"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("__nt").cast("bigint").alias("sum_tokens"),
        )
    )


def curation_funnel(
    df: DataFrame,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    buckets: int = 10000,
    salt: str = "rebal",
) -> DataFrame:
    """The whole training-data curation pipeline as ONE declarative
    plan, reported as per-language stage counts: raw -> exact-dedup
    keepers -> repetition-quality keepers -> decontaminated train
    split -> sqrt-rebalanced final sample. The funnel audit every
    corpus build emits before training.

    Stages are monotonic by construction (each ANDs the previous
    flag), and every stage reuses the already-oracled operator it
    audits (dedup.exact_dedup_keepers, text.repetition_metrics,
    decontaminate_train, sampling's rebalancing arithmetic over the
    CLEAN-TRAIN population) — so the funnel doubles as an integration
    check that the operators compose.

    Plan shape: three linear flag joins on the doc key, one tiny
    per-lang count agg whose min feeds broadcast rebalance rates, and
    a final conditional aggregation — no stage materializes anything
    bigger than the corpus row count, and the only wide exchanges are
    on doc_id / lang. Catalyst runs the independent flag pipelines in
    parallel stages.
    """
    from stripe_data_pipeline_spark.operators.dedup import exact_dedup_keepers
    from stripe_data_pipeline_spark.operators.text import repetition_metrics

    keep_ids = exact_dedup_keepers(df, id_col).select(
        F.col("keep_id").alias(id_col), F.lit(True).alias("__keeper")
    )
    rep = repetition_metrics(df, id_col=id_col).select(
        id_col, F.col("keep").alias("__q")
    )
    clean = decontaminate_train(df, id_col=id_col).select(
        F.col(id_col), F.lit(True).alias("__clean")
    )
    flags = (
        df.select(id_col, lang_col)
        .join(keep_ids, id_col, "left")
        .join(rep, id_col, "left")
        .join(clean, id_col, "left")
    )
    s_dedup = F.coalesce("__keeper", F.lit(False))
    s_quality = s_dedup & F.coalesce("__q", F.lit(False))
    s_clean = s_quality & F.coalesce("__clean", F.lit(False))
    flags = flags.select(
        id_col,
        lang_col,
        s_dedup.alias("s_dedup"),
        s_quality.alias("s_quality"),
        s_clean.alias("s_clean"),
    )
    c4 = flags.groupBy(lang_col).agg(
        F.sum(F.col("s_clean").cast("bigint")).alias("__c4")
    )
    mn = c4.filter(F.col("__c4") > 0).agg(F.min("__c4").alias("__mn"))
    rates = c4.crossJoin(F.broadcast(mn)).select(
        lang_col,
        F.when(F.col("__c4") == 0, F.lit(0).cast("bigint"))
        .otherwise(
            F.floor(
                F.sqrt(
                    F.col("__mn").cast("double") / F.col("__c4").cast("double")
                )
                * F.lit(float(buckets))
            ).cast("bigint")
        )
        .alias("__rate"),
    )
    sel = hash_bucket(F.col(id_col), buckets, salt) < F.col("__rate")
    return (
        flags.join(F.broadcast(rates), lang_col)
        .groupBy(lang_col)
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("s_dedup").cast("bigint")).alias("n_dedup"),
            F.sum(F.col("s_quality").cast("bigint")).alias("n_quality"),
            F.sum(F.col("s_clean").cast("bigint")).alias("n_clean_train"),
            F.sum((F.col("s_clean") & sel).cast("bigint")).alias("n_final"),
        )
    )


def _dup_span_frames(
    df: DataFrame,
    n: int,
    text_col: str,
    id_col: str,
    hash_keys: bool,
) -> tuple[DataFrame, DataFrame]:
    """Shared core of the span-dedup family: ``base`` (id, __toks,
    n_tokens) and ``dup_pos`` (id, n_tokens, pos) — the start
    positions of every ``n``-gram that also occurs in at least one
    OTHER document. Positional grams come from explode(sequence)
    fused into the scan; cross-doc grams are a partial-combined
    min/max-owner agg (min != max owner == ">= 2 distinct docs"
    without a COUNT DISTINCT)."""
    base = _spread(df).select(
        F.col(id_col),
        _tokens(text_col).alias("__toks"),
    ).select(
        id_col, "__toks", F.size("__toks").cast("bigint").alias("n_tokens")
    )
    grams = base.filter(F.col("n_tokens") >= n).select(
        id_col,
        "n_tokens",
        F.explode(
            F.sequence(F.lit(0), (F.col("n_tokens") - n).cast("int"))
        ).alias("pos"),
        "__toks",
    ).select(
        id_col,
        "n_tokens",
        F.col("pos").cast("bigint").alias("pos"),
        F.concat_ws(
            " ", F.slice("__toks", F.col("pos") + 1, F.lit(n))
        ).alias("gram"),
    )
    if hash_keys:
        grams = grams.withColumn("gram", F.xxhash64(F.col("gram")))
    shared = (
        grams.groupBy("gram")
        .agg(F.min(id_col).alias("__mn"), F.max(id_col).alias("__mx"))
        .filter(F.col("__mn") != F.col("__mx"))
        .select("gram")
    )
    dup_pos = grams.join(shared, "gram").select(id_col, "n_tokens", "pos")
    return base, dup_pos


def duplicate_span_stats(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_keys: bool = False,
) -> DataFrame:
    """Exact-substring duplication metric: for each doc, how many of
    its token positions are covered by an ``n``-token gram that also
    occurs in at least one OTHER document, plus the covered fraction.
    The per-doc form of "dedupe exact substrings across the corpus"
    (the span-removal pass run before tokenization); docs above a
    duplicated-span budget get dropped or trimmed downstream.

    Plan shape: positional grams come from explode(sequence) fused
    into the scan (one row per (doc, start), no shuffle to build);
    cross-doc grams are a partial-combined min/max-owner agg on the
    gram key — the classic term-stats shuffle; and the join back
    carries only grams whose owner span crosses documents. Coverage
    is the union of fixed-length intervals, computed with one lead()
    window per doc: sorted starts, each contributes
    min(n, next_start - start). Everything is integer arithmetic
    until the single final division, so the fraction is bit-exact on
    any engine.

    At 100 TB the gram agg dominates; ``hash_keys=True`` swaps the
    gram string for xxhash64(gram), shrinking every shuffle/join key
    to 8 bytes (the heldout_contamination_hashed pattern — same plan,
    same doc-level output absent 64-bit collisions, so the hashed
    variant shares the string variant's oracle).
    """
    base, dup_pos = _dup_span_frames(df, n, text_col, id_col, hash_keys)
    w = Window.partitionBy(id_col).orderBy("pos")
    covered = dup_pos.withColumn("__nxt", F.lead("pos").over(w)).select(
        id_col,
        "n_tokens",
        F.when(F.col("__nxt").isNull(), F.lit(n).cast("bigint"))
        .otherwise(F.least(F.lit(n).cast("bigint"), F.col("__nxt") - F.col("pos")))
        .alias("__cov"),
    )
    return (
        covered.groupBy(id_col, "n_tokens")
        .agg(F.sum("__cov").cast("bigint").alias("dup_tokens"))
        .select(
            id_col,
            "n_tokens",
            "dup_tokens",
            (F.col("dup_tokens").cast("double") / F.col("n_tokens").cast("double"))
            .alias("dup_fraction"),
        )
    )


def span_scrub_documents(
    df: DataFrame,
    n: int = 8,
    drop_threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_keys: bool = False,
) -> DataFrame:
    """The REMOVAL form of duplicate_span_stats (VERDICT r6 #3): emit
    the span-scrubbed corpus. Per doc:

    - no cross-doc duplicated ``n``-gram -> kept VERBATIM (action
      'keep' — original text, never re-tokenized or re-shuffled);
    - duplicated-span fraction <= ``drop_threshold`` -> TRIMMED: every
      token position covered by a duplicated gram is removed and the
      survivors rejoin with single spaces (action 'trim');
    - fraction above the threshold -> DROPPED (absent from output) —
      a mostly-duplicated doc isn't worth keeping a remnant of.

    Scale shape: the stats pass is duplicate_span_stats' plan; the
    REBUILD runs only over the trimmed subset (typically a small
    fraction of the corpus), so the clean majority never pays the
    posexplode + regroup shuffle. Covered positions explode at most
    ``n`` rows per duplicated gram; the kept-token regroup is one
    shuffle on the trimmed doc ids. All decisions are integer math
    plus one double compare, so DuckDB replays the whole transform
    bit-exactly (catalog: span_scrubbed_docs).
    """
    base, dup_pos = _dup_span_frames(df, n, text_col, id_col, hash_keys)
    # r14 optimization round: dup_pos feeds FOUR branches below (the
    # stats window/agg, the covered-position explode, and — through
    # stats — both the trim filter and the untouched anti-join), and
    # the branches are not exchange-reusable, so each re-ran the whole
    # gram build + min/max-owner shuffle. One eager materialization of
    # the (id, n_tokens, pos) relation — duplicated positions only,
    # the SMALL subset by the operator's own premise — runs it once.
    # Its consumers are window/aggregate/anti-join shapes whose
    # strategies AQE re-derives from runtime shuffle sizes, so the
    # checkpoint stats-loss trap (see jaccard_candidate_pairs) does
    # not bite here.
    dup_pos = dup_pos.localCheckpoint(eager=True)
    w = Window.partitionBy(id_col).orderBy("pos")
    covered_len = dup_pos.withColumn("__nxt", F.lead("pos").over(w)).select(
        id_col,
        "n_tokens",
        F.when(F.col("__nxt").isNull(), F.lit(n).cast("bigint"))
        .otherwise(
            F.least(F.lit(n).cast("bigint"), F.col("__nxt") - F.col("pos"))
        )
        .alias("__cov"),
    )
    stats = (
        covered_len.groupBy(id_col, "n_tokens")
        .agg(F.sum("__cov").cast("bigint").alias("dup_tokens"))
        .select(
            id_col,
            "n_tokens",
            "dup_tokens",
            (
                F.col("dup_tokens").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("dup_fraction"),
        )
    )
    trim_ids = stats.filter(F.col("dup_fraction") <= F.lit(drop_threshold))
    covered = dup_pos.select(
        F.col(id_col),
        F.explode(
            F.sequence(
                F.col("pos"),
                F.least(F.col("pos") + n - 1, F.col("n_tokens") - 1),
            )
        ).alias("t"),
    )
    toks_pos = (
        base.join(trim_ids.select(id_col), id_col)
        .select(id_col, F.posexplode("__toks").alias("t", "tok"))
        .select(id_col, F.col("t").cast("bigint").alias("t"), "tok")
    )
    kept = toks_pos.join(covered, [id_col, "t"], "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("t", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("__new_text")
    )
    # LEFT join from trim_ids (ADVICE r7): with drop_threshold >= 1.0
    # a fully-covered doc still classifies 'trim' but keeps zero
    # tokens, so ``rebuilt`` has no row for it — an inner join would
    # silently drop a doc the policy said to keep (and diverge from
    # the oracle's LEFT JOIN). It survives with empty text instead.
    trimmed = trim_ids.join(rebuilt, id_col, "left").select(
        F.col(id_col),
        F.coalesce(F.col("__new_text"), F.lit("")).alias(text_col),
        "n_tokens",
        "dup_tokens",
        F.lit("trim").alias("action"),
    )
    untouched = df.join(stats.select(id_col), id_col, "left_anti").select(
        F.col(id_col),
        F.col(text_col),
        F.size(_tokens(text_col)).cast("bigint").alias("n_tokens"),
        F.lit(0).cast("bigint").alias("dup_tokens"),
        F.lit("keep").alias("action"),
    )
    return untouched.unionByName(trimmed)


def segment_dedup_documents(
    df: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style segment-level dedup (Wenzek et al. 2020 dedup
    paragraphs by hash; Lee et al. 2022 keep the FIRST occurrence):
    split each doc into consecutive ``k``-token segments (the
    'paragraph' unit of this whitespace corpus), and keep each
    distinct segment text only at its first corpus occurrence —
    ordered by (doc_id, seg_idx) — dropping every later repeat.
    Returns one row per doc: segment counts and the rebuilt text.

    Scale shape: one posexplode + per-(doc, seg) regroup builds the
    segment table (linear, keyed by doc so it co-partitions with the
    scan), then ONE shuffle on the segment text assigns first-
    occurrence row numbers (the same dedup-key exchange an exact-hash
    dedup pays; at 100 TB swap the text key for xxhash64(text) —
    8-byte shuffle keys — exactly like ngram_contamination's hashed
    twin). The rebuild regroups kept segments per doc. No driver
    state, no quadratic stage; a duplicated segment costs the same as
    a unique one.
    """
    # r14 optimization round (guide §2.5): the tokenize + posexplode
    # evaluate before the first exchange — spread a narrow local scan
    # first (many-file corpora pass through untouched).
    toks = _spread(df).select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("__i", "__tok")
    )
    seg = (
        toks.groupBy(
            id_col, F.floor(F.col("__i") / F.lit(k)).alias("seg_idx")
        )
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__i", "__tok"))),
                    lambda s: s["__tok"],
                ),
            ).alias("seg_text")
        )
    )
    first = F.row_number().over(
        Window.partitionBy("seg_text").orderBy(id_col, "seg_idx")
    )
    flagged = seg.withColumn("__rn", first)
    totals = seg.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segs")
    )
    kept = (
        flagged.filter(F.col("__rn") == 1)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("seg_idx", "seg_text"))
                    ),
                    lambda s: s["seg_text"],
                ),
            ).alias("clean_text"),
        )
    )
    return totals.join(kept, id_col, "left").select(
        F.col(id_col),
        "n_segs",
        (F.col("n_segs") - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("bigint")
        .alias("n_dropped"),
        F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
    )


def span_corruption_pairs(
    df: DataFrame,
    span_len: int = 3,
    one_in: int = 17,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020 §3.1.4): replace
    token spans with sentinel tokens and emit (input, target) training
    pairs. The stochastic span sampler is made deterministic and
    engine-portable: position ``i`` (1-based) STARTS a ``span_len``
    span iff md5(doc_id ':' i) — the repo's portable-hash recipe
    (operators/winnow.py) — is divisible by ``one_in``; a token is
    masked iff any of the ``span_len`` trailing positions triggered.
    Consecutive masked runs collapse to one '<extra_id_K>' sentinel in
    the input; the target is each sentinel followed by the tokens it
    replaced (the exact T5 target layout). With the defaults ~6% of
    positions trigger, masking ~15% of tokens — T5's corruption rate.

    Scale shape: one posexplode, three window passes over the SAME
    (doc, pos) ordering (one partition sort, reused), one regroup per
    doc. Everything is integer/md5 arithmetic, so the DuckDB oracle
    replays it bit-exactly.
    """
    w = Window.partitionBy(id_col).orderBy("__i")
    # r14 optimization round (guide §2.5): tokenize + posexplode (and
    # the md5 trigger projection) evaluate before the window exchange
    # — spread a narrow local scan first (many-file corpora pass
    # through untouched).
    toks = _spread(df).select(
        F.col(id_col), F.posexplode(_tokens(text_col)).alias("__i0", "__tok")
    ).select(
        F.col(id_col), (F.col("__i0") + 1).alias("__i"), "__tok"
    )
    trig_hash = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col), F.col("__i"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    staged = (
        toks.withColumn(
            "__trig", (trig_hash % one_in == 0).cast("int")
        )
        .withColumn(
            "__masked",
            F.max("__trig").over(w.rowsBetween(-(span_len - 1), 0)),
        )
        .withColumn(
            "__start",
            (
                (F.col("__masked") == 1)
                & (F.coalesce(F.lag("__masked").over(w), F.lit(0)) == 0)
            ).cast("int"),
        )
        .withColumn(
            "__span",
            F.sum("__start").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    sentinel = F.concat(
        F.lit("<extra_id_"), (F.col("__span") - 1).cast("string"), F.lit(">")
    )
    inp_piece = (
        F.when(F.col("__masked") == 0, F.col("__tok"))
        .when(F.col("__start") == 1, sentinel)
    )
    tgt_piece = F.when(
        F.col("__masked") == 1,
        F.when(
            F.col("__start") == 1,
            F.concat(sentinel, F.lit(" "), F.col("__tok")),
        ).otherwise(F.col("__tok")),
    )

    def _joined(piece: Column) -> Column:
        return F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            piece.isNotNull(),
                            F.struct(F.col("__i").alias("i"), piece.alias("p")),
                        )
                    )
                ),
                lambda s: s["p"],
            ),
        )

    return staged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
        F.sum("__masked").cast("bigint").alias("n_masked"),
        F.max("__span").cast("bigint").alias("n_spans"),
        _joined(inp_piece).alias("input_text"),
        _joined(tgt_piece).alias("target_text"),
    )
