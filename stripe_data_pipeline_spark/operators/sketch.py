"""Count-min sketch — mergeable approximate counting (Cormode &
Muthukrishnan 2005), the streaming/OLAP companion to the HLL
distinct-count surface (vocab_overlap_hll_check) and the pigeonhole
heavy-hitter pass (heavy_hitter_tokens).

At 100 TB the exact token-count table is itself corpus-scaled; the
CMS is a FIXED d x w grid of counters (here 4 x 256 = 1,024 cells)
built in one map-side-combined aggregation, mergeable across
partitions/days by cell-wise addition, and every point estimate is
min over d cells — an upper bound with bounded overestimate
(eps ~ e/w with probability 1 - 1/e^d). Spark's own
``F.count_min_sketch`` exists but hashes with engine-private seeds;
this implementation derives the d row hashes from md5 prefixes
(the engine-portable hash already used for split buckets and minhash
fingerprints), so a DuckDB oracle replays the sketch BIT-FOR-BIT —
collisions and all.

Plan shape: build = one partial-combined count per key, then the d
md5 row hashes computed once per DISTINCT key (weighted by its
count) instead of once per occurrence — md5 work drops from d*N to
~N cheap shuffle hashes + d*|vocab| md5s (r9 rework; bit-identical
cells since each cell count is the sum of the counts of the keys
hashing there); estimate = the queried keys' cells joined against
the 1,024-row sketch (broadcast), min per key. No driver-side state
beyond the sketch dimensions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_row_bucket(key: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket of ``key``: md5-prefix hash, engine-portable."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{row}:"), key)), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % width
    )


def cms_build(
    df: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(row, bucket, cnt) sketch cells — at most depth*width rows.

    Counts keys first (one partial-combined groupBy), then hashes
    each DISTINCT key d times with its count as the cell weight —
    cell-identical to hashing every occurrence (a cell's count is
    the sum of the counts of the keys mapping there) but the d md5
    evaluations amortize over the Zipf-tiny key table instead of
    the corpus-scaled occurrence stream.
    """
    counts = df.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("_w")
    )
    return cms_build_weighted(counts, key_col, "_w", depth, width)


def cms_build_weighted(
    counts: DataFrame,
    key_col: str = "token",
    weight_col: str = "_w",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Sketch cells from a pre-counted (key, weight) table — the
    shape to use when the caller already aggregated the stream."""
    cells = counts.select(
        F.col(weight_col).alias("_w"),
        F.posexplode(
            F.array(
                *[
                    cms_row_bucket(F.col(key_col), d, width)
                    for d in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return cells.groupBy("row", "bucket").agg(
        F.sum("_w").cast("bigint").alias("cnt")
    )


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str = "token",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point estimates: (key_col, cms_est) = min over the d cells.

    The sketch side is broadcast — it is <= depth*width rows by
    construction, the whole point of sketching.

    Probe cells absent from the stored sketch count as 0 (left join +
    coalesce), so a key the corpus never touched gets the true CMS
    estimate 0 instead of silently vanishing or overestimating from
    the surviving cells (ADVICE r8).
    """
    probes = keys.select(
        key_col,
        F.posexplode(
            F.array(
                *[
                    cms_row_bucket(F.col(key_col), d, width)
                    for d in range(depth)
                ]
            )
        ).alias("row", "bucket"),
    )
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0)))
            .cast("bigint")
            .alias("cms_est")
        )
    )


# ---------------------------------------------------------------------------
# Fixed-grid histogram quantile sketch (r9)
# ---------------------------------------------------------------------------
#
# The deterministic, mergeable companion to approx_percentile (whose
# engine-private compaction makes cross-engine parity impossible): a
# FIXED equi-width counter grid over an integer domain. Build is one
# partial-combined groupBy; shards merge by cell-wise addition
# (exactly like the CMS above — counters are counters); a quantile
# estimate is the first bucket whose running count reaches
# ceil(q * N), reported as the bucket's [lo, hi] bounds — the
# guaranteed-error-by-construction answer (error <= bucket width)
# that monitoring dashboards and reservoir-free pipelines use at
# any scale. ALL-INTEGER, so every engine replays it bit-for-bit.


def hist_build(
    df: DataFrame, val_col: str, width: int
) -> DataFrame:
    """(bucket, cnt) over floor-divided ``val_col`` (BIGINT units);
    at most domain/width cells regardless of row count."""
    return (
        df.select(F.expr(f"{val_col} div {width}").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def hist_merge(*hists: DataFrame) -> DataFrame:
    """Cell-wise addition of histogram shards — exact, like CMS."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy("bucket").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def hist_quantile_bounds(
    hist: DataFrame, qs_bp: list[int], width: int
) -> DataFrame:
    """(q_bp, target_rank, bucket, lo, hi) per requested basis-point
    quantile: target_rank = ceil(q * N) in integers, bucket = first
    cell whose cumulative count reaches it.

    The cumulative window is GLOBAL but runs over the bounded cell
    grid (domain/width rows by construction — the
    subword_vocabulary bounded-relation contract), never the input.
    """
    from pyspark.sql import Window

    spark = hist.sparkSession
    cum = hist.withColumn(
        "cum", F.sum("cnt").over(Window.orderBy("bucket"))
    )
    n = hist.agg(F.sum("cnt").cast("bigint").alias("n"))
    qs = spark.createDataFrame([(int(q),) for q in qs_bp], "q_bp bigint")
    targets = qs.crossJoin(F.broadcast(n)).select(
        "q_bp",
        F.expr("(n * q_bp + 9999) div 10000").cast("bigint").alias(
            "target_rank"
        ),
    )
    return (
        targets.join(
            F.broadcast(cum), F.col("cum") >= F.col("target_rank")
        )
        .groupBy("q_bp", "target_rank")
        .agg(F.min("bucket").cast("bigint").alias("bucket"))
        .select(
            "q_bp",
            "target_rank",
            "bucket",
            (F.col("bucket") * width).cast("bigint").alias("lo"),
            (F.col("bucket") * width + width - 1)
            .cast("bigint")
            .alias("hi"),
        )
    )


# --------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the Theta-sketch family
# (Bar-Yossef et al. 2002; Beyer et al. 2007; Apache DataSketches'
# theta sketch is this estimator). Unlike HLL (sketch.py's sibling in
# operators/ via hll_mergeable_user_counts), KMV supports SET
# INTERSECTION natively: keep the k smallest 60-bit hashes per set;
# distinct estimate = (k-1) * 2^60 // h_k (exact when fewer than k
# values exist); union = k-min over the union of sketches; the
# Jaccard estimate |combined-k-min ∩ A ∩ B| / k scales the union
# estimate into an intersection estimate. Every quantity is integer
# (HUGEINT/DECIMAL(38,0) for the (k-1)*2^60 numerator), so DuckDB
# replays the estimator bit-for-bit.
# --------------------------------------------------------------------

KMV_DOMAIN = 1 << 60  # md5_base60 hashes are uniform on [0, 2^60)


def kmv_sketch(
    df: DataFrame, val_col: str, group_col: str, k: int
) -> DataFrame:
    """Per-group KMV sketch: the k smallest md5-60-bit hashes of the
    group's DISTINCT values — (g, h, rn) with rn the 1-based rank.
    One distinct shuffle over (group, hash) is the only corpus-scale
    exchange; per-group state is bounded at k rows by construction."""
    from pyspark.sql import Window

    from stripe_data_pipeline_spark.operators.dedup import md5_base60

    d = df.select(
        F.col(group_col).alias("g"), md5_base60(F.col(val_col)).alias("h")
    ).distinct()
    w = Window.partitionBy("g").orderBy("h")
    return d.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """(g, n_kept, est): the KMV distinct-count estimate per group —
    exact n_kept when the sketch holds fewer than k hashes (the set
    was smaller than k), else (k-1) * 2^60 // h_k."""
    return sketch.groupBy("g").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.max("h").alias("hk"),
    ).select(
        "g",
        "n_kept",
        F.when(F.col("n_kept") < k, F.col("n_kept"))
        .otherwise(
            F.expr(
                f"CAST({k - 1} AS DECIMAL(38,0)) * {KMV_DOMAIN} div hk"
            )
        )
        .cast("bigint")
        .alias("est"),
    )
