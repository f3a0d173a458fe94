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
