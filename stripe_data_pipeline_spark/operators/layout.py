"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

A 100 TB table filtered on TWO columns (customer AND date) can't be
sort-clustered on both at once — sorting on (a, b) gives perfect
pruning on ``a`` and nearly none on ``b``. Interleaving the bits of
both columns into one Morton key and range-sorting on IT gives every
file a tight min/max box in BOTH dimensions, so parquet/manifest stats
prune scans on either predicate (the Delta/Databricks OPTIMIZE ZORDER
idea — public literature; Morton 1966).

Everything here is a JVM expression tree (shiftleft/and/or — inside
whole-stage codegen, no UDF), and the key itself is bit-exactly
reproducible in DuckDB, so the catalog query holds it to a full
value oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16-bit Morton spreading masks (classic magic-number bit spreading):
# after the four steps, bit i of the input sits at bit 2i.
_SPREAD = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(c: Column) -> Column:
    x = c.cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key(a: Column, b: Column) -> Column:
    """Morton-interleave the low 16 bits of two non-negative int
    columns into one long: key bit 2i = bit i of ``a``, bit 2i+1 =
    bit i of ``b``. Callers map wider/skewed domains into [0, 2^16)
    first (modulo, epoch-day, or quantile bucket)."""
    return _spread16(a).bitwiseOR(F.shiftleft(_spread16(b), 1))


def zorder_key_sql(a: str, b: str) -> str:
    """DuckDB rendering of the same interleave (bit-exact oracle)."""

    def spread(e: str) -> str:
        x = f"({e} & 65535)"
        for shift, mask in _SPREAD:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    return f"({spread(a)} | ({spread(b)} << 1))"


def write_zorder_clustered(
    df: DataFrame,
    path: str,
    a: Column,
    b: Column,
    n_files: int = 8,
) -> None:
    """Write ``df`` as ``n_files`` files range-partitioned AND sorted by
    the Morton key of (a, b): each output file covers a compact Z-curve
    segment, i.e. a tight min/max box in BOTH columns — which is what
    parquet footer stats / manifest stats prune on. One range exchange
    (same cost class as any global sort-write)."""
    keyed = df.withColumn("__z", zorder_key(a, b))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
