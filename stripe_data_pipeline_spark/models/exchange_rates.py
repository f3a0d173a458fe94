"""Exchange-rates dimension (S10 inline literal relation).

The reference builds a 9-row FX table from literal UNION ALL branches
(/root/reference/dbt/stripe/models/curated/exchange_rates.sql:11-29).
Spark-first: a single ``createDataFrame`` over literal rows — tiny,
always broadcast on join (J1).

``rate_date`` is parameterized (the reference uses CURRENT_DATE; we
pin it for determinism, SURVEY.md §7 risk list).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

# (from_currency, to_currency, exchange_rate) — exact literal values
# from exchange_rates.sql:11-29.
RATES: list[tuple[str, str, float]] = [
    ("usd", "usd", 1.0),
    ("gbp", "usd", 1.27),
    ("eur", "usd", 1.08),
    ("usd", "gbp", 0.79),
    ("eur", "gbp", 0.85),
    ("gbp", "eur", 1.17),
    ("usd", "eur", 0.93),
    ("eur", "eur", 1.0),
    ("gbp", "gbp", 1.0),
]

DEFAULT_RATE_DATE = dt.date(2024, 1, 1)


def exchange_rates(
    spark: SparkSession, rate_date: dt.date = DEFAULT_RATE_DATE
) -> DataFrame:
    """Built with a SQL VALUES literal, not ``createDataFrame(rows)``:
    Python-object rows become a ``Scan ExistingRDD`` that drags Python
    workers into every downstream query, while VALUES folds to a
    JVM-side LocalRelation that broadcasts for free."""
    rows = ", ".join(
        f"('{f}', '{t}', CAST({r!r} AS DOUBLE), DATE '{rate_date}')"
        for f, t, r in RATES
    )
    return spark.sql(
        "SELECT * FROM (VALUES "
        + rows
        + ") AS fx(from_currency, to_currency, exchange_rate, rate_date)"
    )


def exchange_rates_sql(rate_date: dt.date = DEFAULT_RATE_DATE) -> str:
    """The same relation as a DuckDB/ANSI VALUES clause (oracle side).

    Rates are CAST to DOUBLE: bare decimal literals are DECIMAL-typed
    in DuckDB, which would change both the output schema and the FP
    arithmetic downstream.
    """
    rows = ", ".join(
        f"('{f}', '{t}', CAST({r!r} AS DOUBLE), DATE '{rate_date}')"
        for f, t, r in RATES
    )
    return (
        "SELECT * FROM (VALUES "
        + rows
        + ") AS fx(from_currency, to_currency, exchange_rate, rate_date)"
    )
