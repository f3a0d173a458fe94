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


# Hilbert curve state machine, derived from the classic xy2d loop
# (Wikipedia's public-domain reference implementation) by tracking the
# rotation as a (swap, flip_x, flip_y) transform: exactly 4 states are
# reachable; per level the ORIGINAL high bits (ox, oy) index a digit
# and a next-state table. Verified exhaustively against xy2d for every
# 5-bit point and sampled at 8 bits (tests/test_round8_ops.py).
_HILBERT_DIG = (0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0)
_HILBERT_NXT = (1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2)
HILBERT_BITS = 8


def hilbert_key(a: Column, b: Column, bits: int = HILBERT_BITS) -> Column:
    """Hilbert-curve index of (a, b) on a 2^bits x 2^bits grid — the
    better-locality sibling of ``zorder_key`` (a Hilbert walk never
    makes the long diagonal jumps Morton order does, so file min/max
    boxes come out tighter for the same sort; the Delta OPTIMIZE
    successor and BigQuery clustering both moved Morton -> Hilbert).

    Pure JVM expression tree: per level, the two original high bits
    index 16-entry digit/next-state array literals (no UDF, no state
    column — the fold is unrolled ``bits`` times). The next-state
    expression is referenced twice per level, so the tree grows
    ~2^bits: 8 bits (a 65,536-cell grid, plenty for file-level
    clustering) keeps codegen comfortable; callers map wider domains
    into [0, 2^bits) first, as with zorder_key.
    """
    dig = F.array(*[F.lit(v) for v in _HILBERT_DIG])
    nxt = F.array(*[F.lit(v) for v in _HILBERT_NXT])
    x = a.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    y = b.cast("long").bitwiseAND(F.lit((1 << bits) - 1))
    st: Column = F.lit(0)
    d: Column = F.lit(0).cast("long")
    for i in reversed(range(bits)):
        q = (
            F.shiftright(x, i).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(y, i).bitwiseAND(F.lit(1))
        ).cast("int")
        idx = st * 4 + q + 1  # element_at is 1-based
        d = d + F.shiftleft(
            F.element_at(dig, idx).cast("long"), 2 * i
        )
        st = F.element_at(nxt, idx)
    return d


def hilbert_key_sql(a: str, b: str, bits: int = HILBERT_BITS) -> str:
    """DuckDB rendering: the same fold as chained scalar subexpressions
    via nested list literals (linear-size SQL: each level re-states the
    running (state, d) pair through a LIST lookup)."""
    dig = "[" + ", ".join(str(v) for v in _HILBERT_DIG) + "]"
    nxt = "[" + ", ".join(str(v) for v in _HILBERT_NXT) + "]"
    x = f"(CAST({a} AS BIGINT) & {(1 << bits) - 1})"
    y = f"(CAST({b} AS BIGINT) & {(1 << bits) - 1})"
    st = "0"
    d = "CAST(0 AS BIGINT)"
    for i in reversed(range(bits)):
        q = f"(((({x} >> {i}) & 1) * 2 + (({y} >> {i}) & 1)))"
        idx = f"(({st}) * 4 + {q} + 1)"
        d = f"({d} + (CAST(({dig}[{idx}]) AS BIGINT) << {2 * i}))"
        st = f"({nxt}[{idx}])"
    return d
