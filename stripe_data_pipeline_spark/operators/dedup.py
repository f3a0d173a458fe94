"""Deduplication operators (north-star).

Four escalating strategies, all shuffle-conscious:

- exact:     hash-groupBy on a normalized key. One shuffle on the
             md5 key; at 100 TB the key is 16 bytes/row, not the text.
- n-gram Jaccard: candidate pairs via cheap blocking (lang × length
             bucket), token-set Jaccard verify. The block self-join is
             quadratic *within a block only* — block keys must keep
             per-block cardinality bounded (salt large blocks at scale).
- MinHash + LSH: per-doc signature via a cross-engine md5-derived
             base hash over shingles (JVM built-in, no UDF), banded
             into LSH buckets; only bucket-collisions become candidate
             pairs — near-linear.
- SimHash:   60-bit weighted-majority signature; hamming-close pairs
             are near-dups. Signature is 60 bitwise aggregations over
             exploded tokens (codegen'd, no UDF).

Hash choice: the base hash for MinHash/SimHash is the first 60 bits
of md5 (``conv(substr(md5(x),1,15),16,10)``) rather than xxhash64.
md5 is ~3x slower per call but is computable bit-identically by
DuckDB (``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``), which turns
the WHOLE LSH pipeline — signatures, band keys, bucket caps,
candidate pairs, verified near-dups — into an exactly-oracled
relation instead of a rows-only check. One hash per shingle either
way; the ``num_hashes`` permutations are affine maps over that single
base hash, so the md5 cost does not multiply with signature width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized_text(text_col: str = "text") -> Column:
    return F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")


def exact_dedup_keepers(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the minimum id per normalized-text group.

    Returns (keep_id, n_copies). Equivalent semantics to the merge
    sink's unique-key dedup (stg_invoices.sql:2-4) applied to content.
    """
    return (
        df.select(F.col(id_col), F.md5(normalized_text()).alias("content_key"))
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup_summary(df: DataFrame) -> DataFrame:
    return df.select(F.md5(normalized_text()).alias("k")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("k").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("k")).alias("n_duplicates"),
    )


def _block_key() -> list[Column]:
    # lang × 50-char length bucket: cheap, high-recall blocking
    return [F.col("lang"), F.floor(F.col("n_chars") / 50).alias("len_bucket")]


def jaccard_candidate_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    max_block: int = 1000,
) -> DataFrame:
    """Blocked token-set Jaccard near-dup pairs.

    jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|) on distinct token sets,
    computed with array built-ins (JVM) after a block-key self-join.

    Per-block work is quadratic, so blocks larger than ``max_block``
    are dropped entirely — the same hot-bucket guard as LSH's
    ``max_bucket``. A (lang, len_bucket) block grows linearly with the
    corpus, so an uncapped self-join is a 100 TB scale-killer; when a
    corpus overflows the cap, the right tool is
    :func:`lsh_verified_near_dups` (near-linear candidates, exact
    verify), not a bigger cap.

    Plan shape matters: the intersection size is projected ONCE into
    scalar columns (i, s) and jaccard derived from those — writing the
    full jaccard expression into the post-join filter lets Catalyst
    push it into the join condition where the array_intersect gets
    re-evaluated (interpreted) several times per candidate pair.
    """
    toks = F.array_distinct(F.split(F.col("text"), " "))
    base = df.select(
        F.col(id_col),
        F.col("lang"),
        F.floor(F.col("n_chars") / 50).alias("len_bucket"),
        toks.alias("toks"),
    )
    block_sizes = base.groupBy("lang", "len_bucket").agg(
        F.count(F.lit(1)).alias("block_n")
    )
    # r14 note: do NOT localCheckpoint ``base`` here, even though the
    # self-join sides each embed their own tokenize pass — a
    # checkpointed LogicalRDD loses its size statistics, the planner
    # stops broadcasting the build side, and the block self-join
    # degrades to a sort-merge over full token arrays (measured 8.7 s
    # -> 33 s at sf0.1). The stats-preserving temp-parquet
    # materialization (partitioning.materialize_stats) keeps the
    # broadcast but was ALSO measured slower here (alternating
    # same-session A/B, min-of-4: 1.26 s plain vs 1.56 s
    # materialized) — the token-array write+read outweighs the two
    # saved tokenize scans. The duplicate tokenize is the cheaper
    # evil at any scale where the token arrays are the bulk of the
    # bytes.
    base = base.join(
        block_sizes.filter(F.col("block_n") <= max_block),
        ["lang", "len_bucket"],
        "inner",
    ).drop("block_n")
    # The build side broadcasts; the probe side's partitioning is what
    # parallelizes the quadratic pair work. A small corpus in one
    # parquet file scans as ONE partition — and a broadcast join keeps
    # it — so every pair computation lands on a single core. Spread it
    # explicitly (a many-file 100 TB scan gets this for free).
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(parallelism).alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.len_bucket") == F.col("b.len_bucket"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    inter = F.size(F.array_intersect(F.col("a.toks"), F.col("b.toks")))
    stats = pairs.select(
        F.col(f"a.{id_col}").alias("doc_a"),
        F.col(f"b.{id_col}").alias("doc_b"),
        inter.alias("i"),
        (F.size(F.col("a.toks")) + F.size(F.col("b.toks"))).alias("s"),
    )
    # The repartition is a deliberate optimization barrier: without it
    # Catalyst pushes the jaccard filter back into the join condition,
    # where the array_intersect is re-evaluated (twice, interpreted)
    # for every candidate pair. The barrier costs one shuffle of tiny
    # scalar rows and guarantees exactly one intersect per pair.
    stats = stats.repartition(parallelism)
    return (
        stats.withColumn(
            "jaccard",
            F.col("i").cast("double") / (F.col("s") - F.col("i")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def shingles(text_col: str = "text", k: int = 3) -> Column:
    """k-token shingles as strings (for MinHash)."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k))
    )


_MINHASH_P = (1 << 31) - 1  # Mersenne prime: pmod products stay < 2^62


def md5_base60(col: Column) -> Column:
    """First 60 bits of md5 as a positive BIGINT — the cross-engine
    base hash (DuckDB equivalent:
    ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``). 15 hex chars
    = 60 bits < 2^63, so the cast never overflows and the value is
    always non-negative, making ``%`` and ``pmod`` agree across
    engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def _perm_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Fixed (a, b) coefficients for the affine permutation family
    h_i = (a_i * base + b_i) mod p — deterministic across runs."""
    import random

    rng = random.Random(0x5EED)
    return [
        (rng.randrange(1, _MINHASH_P), rng.randrange(0, _MINHASH_P))
        for _ in range(num_hashes)
    ]


def minhash_signatures(
    df: DataFrame, id_col: str = "doc_id", num_hashes: int = 16, k: int = 3
) -> DataFrame:
    """MinHash signature per doc via the standard universal-hash
    family: ONE md5-derived base hash per shingle string (see
    :func:`md5_base60` — cross-engine, so the driver's DuckDB oracle
    reproduces signatures bit-for-bit), then ``num_hashes`` affine
    permutations h_i = (a_i*h + b_i) mod (2^31 - 1) and a min per
    permutation. String hashing is the expensive part at corpus scale
    — hashing each shingle once instead of once per signature slot
    cuts the signature stage ~num_hashes-fold (measured ~2x
    end-to-end on the LSH pipeline). All arithmetic stays under 2^62,
    safe under ANSI overflow checking.

    Everything is a Spark built-in (JVM, codegen) — one projection,
    no shuffle, no Python. The input is repartitioned first:
    signature hashing is the CPU-heavy stage and a single-file scan
    would otherwise pin it to one core.
    """
    from stripe_data_pipeline_spark.operators.partitioning import spread_scan

    df = spread_scan(df)
    sh = shingles(k=k).alias("shingles")
    bases = F.transform(
        F.col("shingles"), lambda s: F.pmod(md5_base60(s), F.lit(_MINHASH_P))
    )
    sig_cols = [
        F.array_min(
            F.transform(
                F.col("__bases"),
                lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_MINHASH_P)),
            )
        ).alias(f"mh_{i}")
        for i, (a, b) in enumerate(_perm_coeffs(num_hashes))
    ]
    return (
        df.select(F.col(id_col), sh)
        .select(F.col(id_col), bases.alias("__bases"))
        .select(F.col(id_col), *sig_cols)
    )


def band_rows(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 4,
) -> DataFrame:
    """(id, band, key) rows from a wide ``mh_i`` signature frame —
    '_'-joined mh values per band. The ONE banding construction
    (r14 review): minhash_lsh_candidates and the incremental index
    (operators/incdedup.py) both call this, so ad-hoc LSH keys and
    persisted index keys can never drift apart."""
    n_bands = num_hashes // band_size
    return sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh_{b * band_size + j}")
                                for j in range(band_size)
                            ],
                        ).alias("key"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(
        id_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 4,
    k: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """LSH banding: docs sharing any band of the MinHash signature
    become candidate pairs. Returns (doc_a, doc_b, n_shared_bands).

    Scale shape: explode to (band_key, doc) — one shuffle on band_key;
    bucket self-join is quadratic only within identical-band buckets.
    Buckets larger than ``max_bucket`` are dropped (degenerate-bucket
    guard: a band key shared by thousands of docs adds quadratic work
    while contributing near-zero dedup information — the standard LSH
    hot-bucket cap; band_size trades the same way: wider bands = fewer
    false collisions on high-self-similarity corpora).
    """
    sigs = minhash_signatures(df, id_col, num_hashes, k)
    bands = band_rows(sigs, id_col, num_hashes, band_size)
    # Three consumers read this relation (bucket histogram + both join
    # sides); without materialization each re-runs the whole signature
    # pipeline. At corpus scale you'd land signatures in a table; the
    # in-session analogue is an eager local checkpoint.
    bands = bands.localCheckpoint(eager=True)
    bucket_sizes = bands.groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    # no broadcast hint: bucket_sizes is one row per distinct bucket —
    # small here, but at corpus scale AQE should pick the strategy.
    bands = bands.join(
        bucket_sizes.filter(F.col("bucket_n") <= max_bucket),
        ["band", "key"],
        "inner",
    ).drop("bucket_n")
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-set Jaccard over a (doc_a, doc_b) candidate relation.

    Linear in candidates: two equi-joins to fetch token sets, one
    projection per pair for the intersection — no self-join anywhere.
    """
    toks = df.select(
        F.col(id_col), F.array_distinct(F.split(F.col("text"), " ")).alias("toks")
    )
    a = toks.select(F.col(id_col).alias("doc_a"), F.col("toks").alias("toks_a"))
    b = toks.select(F.col(id_col).alias("doc_b"), F.col("toks").alias("toks_b"))
    paired = candidates.select("doc_a", "doc_b").join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    stats = paired.select(
        "doc_a",
        "doc_b",
        inter.alias("i"),
        (F.size("toks_a") + F.size("toks_b")).alias("s"),
    )
    # UNCONDITIONAL optimization barrier (ADVICE r3): `stats` is
    # post-join, where partition counts are >= parallelism pre-AQE, so a
    # conditional spread_scan would always skip and let Catalyst collapse
    # the projections — re-deriving the array_intersect inside the filter
    # AND the output column. The exchange is on already-shuffled data
    # (no extra pass over the corpus) and guarantees one intersect
    # evaluation per pair.
    stats = stats.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return (
        stats.withColumn(
            "jaccard",
            F.col("i").cast("double") / (F.col("s") - F.col("i")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_candidate_pairs(
    df: DataFrame,
    n: int = 3,
    max_shingle_docs: int = 50,
    id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs for CONTAINMENT dedup: docs sharing at least
    one ``n``-token shingle rarer than ``max_shingle_docs``.

    MinHash-LSH cannot serve here — it estimates JACCARD, so a short
    doc quoted inside a long one (containment ~1, Jaccard
    ~|short|/|long|) almost never collides in any band; the planted-
    subset test proves the miss. The right generator is the
    contamination family's inverted-index join: per-doc DISTINCT
    shingles (map-side array_distinct), hot shingles dropped (the
    boilerplate guard that also caps join fan-out — recall tradeoff,
    mirrored in the oracle's HAVING), one self-equi-join on the
    shingle key, pair-deduped with a count of shared shingles.
    Linear shuffles on shingle keys; fan-out bounded by
    max_shingle_docs^2 per surviving shingle."""
    from stripe_data_pipeline_spark.operators.corpus import shingle_array

    sh = df.select(
        F.col(id_col), F.explode(shingle_array("text", n)).alias("shingle")
    )
    keep = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") <= max_shingle_docs)
        .select("shingle")
    )
    shk = sh.join(keep, "shingle")
    a = shk.select(F.col("shingle"), F.col(id_col).alias("doc_a"))
    b = shk.select(F.col("shingle"), F.col(id_col).alias("doc_b"))
    return (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


def containment_verify(
    df: DataFrame,
    candidates: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact token-set CONTAINMENT over a (doc_a, doc_b) candidate
    relation: |A ∩ B| / min(|A|, |B|) — the ASYMMETRIC near-dup
    measure (Broder 1997's resemblance-vs-containment distinction,
    public). A short document quoted wholesale inside a long one has
    containment ~1 but Jaccard ~|short|/|long|, so symmetric-Jaccard
    dedup is structurally blind to subset duplication; containment is
    the signal used to catch quote inclusion / boilerplate embedding.
    Same linear shape as jaccard_verify: two equi-joins + one
    projection per pair, no self-join anywhere."""
    toks = df.select(
        F.col(id_col),
        F.array_distinct(F.split(F.col("text"), " ")).alias("toks"),
    )
    a = toks.select(F.col(id_col).alias("doc_a"), F.col("toks").alias("toks_a"))
    b = toks.select(F.col(id_col).alias("doc_b"), F.col("toks").alias("toks_b"))
    paired = candidates.select("doc_a", "doc_b").join(a, "doc_a").join(b, "doc_b")
    inter = F.size(F.array_intersect(F.col("toks_a"), F.col("toks_b")))
    stats = paired.select(
        "doc_a",
        "doc_b",
        inter.alias("i"),
        F.least(F.size("toks_a"), F.size("toks_b")).alias("m"),
    )
    # same unconditional optimization barrier as jaccard_verify: one
    # intersect evaluation per pair, not one per consumer expression
    stats = stats.repartition(df.sparkSession.sparkContext.defaultParallelism)
    return (
        stats.withColumn(
            "containment",
            F.col("i").cast("double") / F.col("m").cast("double"),
        )
        .filter(F.col("containment") >= threshold)
        .select("doc_a", "doc_b", "containment")
    )


def lsh_verified_near_dups(
    df: DataFrame,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 4,
    k: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    """The 100 TB near-dup pipeline: MinHash+LSH candidate generation
    (near-linear, one shuffle on band key) followed by exact Jaccard
    verification (linear in candidates). Same output contract as
    :func:`jaccard_candidate_pairs` restricted to pairs LSH surfaces —
    the standard recall/cost trade (tune num_hashes/band_size for
    recall, not the block cap)."""
    candidates = minhash_lsh_candidates(
        df, id_col, num_hashes=num_hashes, band_size=band_size, k=k,
        max_bucket=max_bucket,
    )
    return jaccard_verify(df, candidates, threshold, id_col)


SIMHASH_BITS = 60  # md5_base60 supplies 60 cross-engine hash bits


def simhash_signatures(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash over tokens: bit i of the signature is the sign
    of sum over tokens of (+1 if bit i of md5_base60(token) else -1).

    Computed as 60 conditional-sum aggregations over exploded tokens —
    all JVM, one shuffle on doc id. The md5-derived base hash (vs
    xxhash64) makes the signature DuckDB-reproducible, so the catalog
    query is exactly oracled instead of rows-only.
    """
    tok = df.select(
        F.col(id_col), F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).withColumn("h", md5_base60(F.col("tok")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"s_{i}")
        for i in range(SIMHASH_BITS)
    ]
    sums = tok.groupBy(id_col).agg(*bit_sums)
    sig = None
    for i in range(SIMHASH_BITS):
        bit = F.when(F.col(f"s_{i}") > 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return sums.select(F.col(id_col), sig.alias("simhash"))


def edit_distance_pairs(
    df: DataFrame,
    title_len: int = 16,
    max_dist: int = 4,
    id_col: str = "doc_id",
    max_block: int = 500,
) -> DataFrame:
    """Blocked Levenshtein near-dup pairs over a short prefix "title"
    — the edit-distance member of the dedup family (typo-level
    near-dups in titles/URLs/short strings, where token-set Jaccard is
    blind to character noise).

    Blocking: (lang, first token). Pairs are only compared inside a
    block, so recall is bounded by the blocking choice (a pair whose
    first tokens differ is invisible — the standard tradeoff, same as
    the (lang, len_bucket) Jaccard blocks); blocks over ``max_block``
    are dropped entirely (hot-block guard). ``levenshtein`` is a JVM
    built-in with textbook DP semantics that DuckDB implements
    identically, so the whole operator is exactly oracle-checkable.

    Same plan discipline as :func:`jaccard_candidate_pairs`: the probe
    side is repartitioned so the quadratic pair work parallelizes even
    when a small corpus scans as one partition.
    """
    title = F.substring(F.col("text"), 1, title_len)
    first_tok = F.split(F.col("text"), " ").getItem(0)
    base = df.select(
        F.col(id_col),
        F.col("lang"),
        first_tok.alias("block_tok"),
        title.alias("title"),
    )
    block_sizes = base.groupBy("lang", "block_tok").agg(
        F.count(F.lit(1)).alias("block_n")
    )
    base = base.join(
        block_sizes.filter(F.col("block_n") <= max_block),
        ["lang", "block_tok"],
        "inner",
    ).drop("block_n")
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    a = base.repartition(parallelism).alias("a")
    b = base.alias("b")
    pairs = a.join(
        b,
        (F.col("a.lang") == F.col("b.lang"))
        & (F.col("a.block_tok") == F.col("b.block_tok"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    return pairs.select(
        F.col(f"a.{id_col}").alias("doc_a"),
        F.col(f"b.{id_col}").alias("doc_b"),
        F.levenshtein(F.col("a.title"), F.col("b.title")).alias("edit_dist"),
    ).filter(F.col("edit_dist") <= max_dist)


def sorted_neighborhood_candidates(
    df: DataFrame,
    window: int = 5,
    key_len: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
    parts: int = 16,
) -> DataFrame:
    """Sorted-neighborhood blocking (Hernández & Stolfo 1995 — the
    classic entity-resolution candidate generator): sort the corpus by
    a normalized key and pair each record with the ``window-1``
    records that follow it in sort order. Near-duplicates whose
    normalized prefixes agree land adjacent and get compared;
    candidate count is exactly (window-1) * N regardless of skew —
    the complementary shape to hash blocking (jaccard_candidate_pairs,
    whose hot blocks go quadratic and need caps) and to MinHash LSH
    (probabilistic), completing the dedup family's blocking trio.

    Scale shape: the global sort order materializes as an EXACT rank
    via range-partition + local row_number + partition-size offsets
    (suffix._dense_ranks — no single-partition global window); the
    neighborhood join is then one explode of w-1 integers per row and
    an equi-join ON THE RANK — an integer key with perfectly uniform
    distribution, immune to key skew at any corpus size.

    Returns (doc_a, doc_b) with doc_a's rank below doc_b's; feed to
    jaccard_verify for exact similarity.
    """
    from stripe_data_pipeline_spark.operators.suffix import _dense_ranks

    key = F.substring(normalized_text(text_col), 1, key_len)
    keyed = df.select(
        key.alias("__snkey"), F.col(id_col).cast("long").alias(id_col)
    )
    ranked = _dense_ranks(keyed, ["__snkey", id_col], parts=parts)
    a = ranked.select(
        F.col(id_col).alias("doc_a"),
        F.explode(
            F.sequence(
                F.col("__rank") + 1, F.col("__rank") + (window - 1)
            )
        ).alias("__nbr"),
    )
    b = ranked.select(
        F.col(id_col).alias("doc_b"), F.col("__rank").alias("__nbr")
    )
    return a.join(b, "__nbr").select("doc_a", "doc_b")


def sorted_neighborhood_pairs(
    df: DataFrame,
    window: int = 5,
    key_len: int = 24,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sorted-neighborhood blocking + exact token-Jaccard verify."""
    cands = sorted_neighborhood_candidates(
        df, window=window, key_len=key_len, id_col=id_col, text_col=text_col
    )
    return jaccard_verify(df, cands, threshold=threshold, id_col=id_col)
