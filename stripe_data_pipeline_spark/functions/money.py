"""Money arithmetic helpers.

The reference keeps money as FLOAT64 dollars (cents / 100 — see
/root/reference/dbt/stripe/models/curated/invoices.sql:28-33 and
README.md:140-143), so we keep DoubleType end-to-end.

For *aggregated* money we sum integer cents, not doubles:
``SUM(double)`` is order-dependent (floating-point addition is not
associative and Spark sums in partition order), which makes results
non-deterministic across runs/partitionings and impossible to
hash-match against another engine. ``FLOOR(x*100 + 0.5)`` is exact
IEEE arithmetic on both Spark and DuckDB, and integer sums are
order-independent — deterministic at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_cents(col: Column) -> Column:
    """Deterministic double-dollars -> bigint-cents (half-up for the
    positive amounts used here)."""
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("bigint")


def sum_usd_cents(col: Column) -> Column:
    """Order-independent money sum: bigint cents -> double dollars."""
    return F.sum(to_cents(col)) / F.lit(100.0)


# DuckDB-side rendering of the same contract, for oracle SQL strings.
def sum_usd_cents_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(FLOOR(({expr}) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0"
