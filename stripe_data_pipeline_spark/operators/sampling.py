"""Deterministic sampling & split assignment (north-star: training-data
pipelines).

A 100 TB corpus needs reproducible row selection: train/val/test
assignment, rate sampling, and k-examples-per-stratum — all stable
across engines, runs, partition layouts and cluster sizes. The
primitive is an md5-derived hash bucket (md5 is identical in every
engine, unlike xxhash64/murmur which differ between Spark and DuckDB),
so every operator here is a pure map-side filter/projection: no
shuffle for split/sample, one bounded window for per-group top-k.

- ``hash_bucket``: stable bucket in [0, buckets) from any key column.
- ``assign_split``: train/val/test by bucket range — adding data never
  reassigns existing keys (the property random() sampling lacks).
- ``deterministic_sample``: keep keys with bucket < rate — a
  TABLESAMPLE the planner can push to the scan, reproducible anywhere.
- ``per_group_sample``: k examples per stratum, chosen by hash order —
  reservoir-sampling semantics without state or randomness.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(col: Column, buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, buckets): first 8 md5 hex chars of
    the (salted) key parsed as an integer, mod buckets. Engine-portable
    by construction (DuckDB: CAST('0x'||substr(md5(..),1,8) AS BIGINT))."""
    key = col.cast("string")
    if salt:
        key = F.concat(F.lit(salt), key)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint") % buckets


def assign_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    buckets: int = 100,
    salt: str = "",
) -> DataFrame:
    """Add a ``split`` column (train/val/test) keyed on ``key_col``.

    Hash-range assignment is stable under corpus growth: a key's split
    never changes when rows are added/removed elsewhere, and the same
    key lands in the same split on any engine or cluster size."""
    b = hash_bucket(F.col(key_col), buckets, salt)
    split = (
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return df.withColumn("split", split)


def deterministic_sample(
    df: DataFrame, key_col: str, rate_pct: int, buckets: int = 100, salt: str = ""
) -> DataFrame:
    """Keep ~rate_pct% of rows, deterministically by key hash. A pure
    map-side filter — at 100 TB it fuses into the scan stage with no
    shuffle, and re-running (or running on another engine) selects
    exactly the same rows."""
    return df.filter(hash_bucket(F.col(key_col), buckets, salt) < rate_pct)


def per_group_sample(
    df: DataFrame, group_col: str, key_col: str, k: int, salt: str = ""
) -> DataFrame:
    """k examples per ``group_col`` stratum, picked by md5-of-key order
    (plus key tiebreak): deterministic reservoir-sample semantics. The
    window partitions by stratum, so the shuffle is one hash exchange
    on the (low-cardinality) stratum key; row_number short-circuits
    after k per partition."""
    order = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(order, F.col(key_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def rebalanced_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    buckets: int = 10000,
    salt: str = "rebal",
) -> DataFrame:
    """Temperature-style group rebalancing: downsample each stratum to
    a keep-rate of sqrt(min_count / count) — the sqrt flattening used
    to rebalance language/domain mixes without dropping rare strata
    (the smallest group keeps 100%, a 100x-larger group keeps 10%).

    Rates derive only from group counts, and row selection is the
    md5-bucket filter, so the sampled set is identical on any engine,
    run, or partition layout. sqrt and double division are exactly
    rounded IEEE ops, so even the rate computation is bit-portable.

    Plan shape: one partial-combined count agg over the (tiny) stratum
    key, a broadcast of the per-group rates back onto the fact scan,
    and a map-side filter — the corpus itself is never shuffled.
    Adds a ``rate_bp`` column (keep-rate in 1/100 bp units of
    ``buckets``) for auditability.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__cnt"))
    mn = counts.agg(F.min("__cnt").alias("__mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        group_col,
        F.floor(
            F.sqrt(F.col("__mn").cast("double") / F.col("__cnt").cast("double"))
            * F.lit(float(buckets))
        )
        .cast("bigint")
        .alias("rate_bp"),
    )
    return df.join(F.broadcast(rates), group_col).filter(
        hash_bucket(F.col(key_col), buckets, salt) < F.col("rate_bp")
    )


def source_mix_plan(
    df: DataFrame,
    token_budget: int = 1_000_000,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Token-budget mixing plan: how many tokens to draw from each
    source under sqrt-temperature weighting (alpha=0.5), as the
    repeat/epoch factor a dataloader applies. The policy artifact a
    training run consumes next to the packed-sequence mart: weights
    flatten the source distribution so rare domains aren't drowned,
    and repeat_bp > 10000 marks sources that must be upsampled
    (epochs > 1) to fill their allocation.

    weight = FLOOR(sqrt(n_tokens) * 1e6 + 0.5) is FIXED-POINT: sqrt
    and the scale-multiply are exactly-rounded IEEE ops, so the
    integer weights — and therefore every downstream sum/div — are
    bit-identical on any engine and any row order (a double-sum of
    raw sqrt weights would depend on aggregation order). Bound:
    weight * token_budget must stay under 2^63, which holds through
    ~1e12 tokens/source at a 1e6-token budget; at corpus scale drop
    the fixed-point scale to 1e3.

    Plan shape: one partial-combined agg on the (tiny) source key,
    one single-row total broadcast back — the corpus is scanned once
    and never shuffled.
    """
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(
            F.size(F.filter(F.split(F.col(text_col), " "), lambda t: t != ""))
        )
        .cast("bigint")
        .alias("n_tokens"),
    )
    per = per.withColumn(
        "weight_fp",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1e6) + F.lit(0.5))
        .cast("bigint"),
    )
    tot = per.agg(F.sum("weight_fp").alias("__tot"))
    target = F.expr(f"weight_fp * CAST({token_budget} AS BIGINT) div __tot")
    return per.crossJoin(F.broadcast(tot)).select(
        group_col,
        "n_docs",
        "n_tokens",
        "weight_fp",
        target.cast("bigint").alias("target_tokens"),
        F.expr(f"(weight_fp * CAST({token_budget} AS BIGINT) div __tot) * 10000 "
               "div n_tokens").cast("bigint").alias("repeat_bp"),
    )


def unimax_budgets(
    df: DataFrame,
    budget_num: int = 3,
    budget_den: int = 4,
    epochs: int = 1,
    group_col: str = "lang",
    text_col: str = "text",
) -> DataFrame:
    """UniMax language budgeting (Chung et al. 2023, "UniMax: Fairer
    and More Effective Language Sampling for Large-Scale Multilingual
    Pretraining"; public): allocate a token budget across languages
    by WATERFILLING with a per-language epoch cap — process languages
    in ascending corpus size; each gets
    min(epochs * n_tokens, remaining // languages_left), surplus
    rolls forward to the bigger languages. Low-resource languages
    are capped at ``epochs`` passes (no oversampling them to death);
    high-resource languages split what remains evenly — the fairness
    property temperature sampling (lang_rebalanced_sample) lacks.

    Budget = (total_tokens * budget_num) // budget_den. ALL-INTEGER
    arithmetic (floor divisions) with a deterministic processing
    order (n_tokens, lang), so the oracle's unrolled sequential CTEs
    replay the waterfill bit-for-bit.

    Scale: token counting is one partial-combined groupBy on the
    language key; the waterfill itself runs driver-side over the
    language list — bounded by contract (#languages, the same bound
    kmeans puts on K), never corpus-scaled.

    Languages with a zero token count (all-empty texts) are SKIPPED
    (ADVICE r8): they can contribute nothing to the budget and would
    otherwise divide by zero computing epochs_bp; the oracle filters
    the same way.
    """
    spark = df.sparkSession
    per = (
        df.select(
            group_col,
            F.size(
                F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
            ).alias("n"),
        )
        .groupBy(group_col)
        .agg(F.sum("n").cast("bigint").alias("n_tokens"))
        .filter(F.col("n_tokens") > 0)
    )
    rows = sorted(
        ((r["n_tokens"], r[group_col]) for r in per.collect())
    )  # bounded: one row per language
    total = sum(n for n, _ in rows)
    remaining = (total * budget_num) // budget_den
    left = len(rows)
    out = []
    for rank, (n_tokens, lang) in enumerate(rows, start=1):
        fair = remaining // left
        alloc = min(epochs * n_tokens, fair)
        remaining -= alloc
        left -= 1
        out.append(
            (lang, n_tokens, rank, alloc, (alloc * 10000) // n_tokens)
        )
    return spark.createDataFrame(
        out,
        schema=f"{group_col} string, n_tokens long, rank long, "
        "alloc_tokens long, epochs_bp long",
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int = 50,
    id_col: str = "doc_id",
    salt: str = "wsamp",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement —
    Efraimidis & Spirakis 2006 ("Weighted random sampling with a
    reservoir", public): each row draws u in (0, 1] and keeps key
    ln(u) / w; the k LARGEST keys are a weighted-without-replacement
    sample. One pass, embarrassingly parallel, bounded top-k — THE
    distributed weighted sampler (Spark's own sampleBy is only
    stratified-Bernoulli and not cross-engine reproducible).

    Determinism: u comes from the first 48 bits of
    md5(salt:id) — (h + 1) / 2^48, never zero — so any engine
    draws the same "randomness" (the split/minhash hash contract).
    Returns (id_col, weight, key_fp) for the k winners,
    key_fp = floor(ln(u)/w * 1e9). Rows with weight <= 0 are
    excluded (they cannot win under the E-S transform).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("double")
    u = (h + F.lit(1.0)) / F.lit(281474976710656.0)  # 2^48
    w = F.col(weight_col).cast("double")
    key_fp = F.floor(F.log(u) / w * F.lit(1e9)).cast("bigint")
    return (
        df.filter(F.col(weight_col) > 0)
        .select(
            id_col,
            F.col(weight_col).cast("bigint").alias("weight"),
            key_fp.alias("key_fp"),
        )
        .orderBy(F.desc("key_fp"), id_col)
        .limit(k)
    )
