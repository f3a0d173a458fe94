"""Skew-aware join (salting).

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) splits oversized *sort-merge* partitions automatically —
but it only triggers on shuffle joins and only at runtime. Salting is
the explicit, planner-independent version for known-hot keys (e.g. a
customer_id owning 10% of all line items):

    left:  key -> (key, salt = pmod(hash(entire row id), S))
    right: key -> replicate each row S times with salt = 0..S-1
    join on (key, salt) — the hot key's rows now spread over S tasks.

Replication multiplies the (usually small) build side by S, so use it
when the right side is a dimension or pre-aggregated.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salt_left(df: DataFrame, buckets: int) -> DataFrame:
    """Random-but-deterministic salt per row (hash of all columns)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*df.columns), F.lit(buckets)).cast("int")
    )


def explode_right(df: DataFrame, buckets: int) -> DataFrame:
    """Replicate each row once per salt bucket."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on ``on`` with the hot-key shuffle spread over
    ``buckets`` sub-partitions. Result equals ``left.join(right, on,
    how)`` for inner/left joins (verified by tests)."""
    lf = salt_left(left, buckets)
    rt = explode_right(right, buckets)
    out = lf.join(rt, [*on, SALT_COL], how)
    return out.drop(SALT_COL)


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """The diagnostic that decides whether a key needs salting: one
    row with total rows, distinct keys, the hottest key's row count,
    the p99 per-key count, and skew_factor = max / mean rows-per-key.
    A skew_factor near 1 means a plain shuffle join/agg balances; a
    large one means the hot key pins a task (salt it, or rely on AQE
    skew splitting for sort-merge joins).

    Plan shape: one partial-combined count per key, then a global agg
    over the per-key counts. The global stage reduces |keys| rows to
    one; its only non-mergeable piece is the exact percentile, which
    at extreme key cardinality should be swapped for the
    approx_percentile sketch (same plan, mergeable summaries — the
    approx_percentile_prices pattern). skew_factor is computed
    (max * n_keys) / n_rows in IEEE double, deterministic on any
    engine.
    """
    c = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    agg = c.agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.max("n").cast("bigint").alias("max_key_rows"),
        F.expr("percentile(n, 0.99D)").alias("p99_key_rows"),
    )
    return agg.select(
        "*",
        (
            (
                F.col("max_key_rows").cast("double")
                * F.col("n_keys").cast("double")
            )
            / F.col("n_rows").cast("double")
        ).alias("skew_factor"),
    )
