"""Data-quality checks — the reference's implemented test plus every
check it *declares* but never builds (README.md:131-171):

- missing period_end threshold (implemented in the reference:
  tests/missing_period_end_threshold.sql) — also a catalog query
- negative amounts (README.md:164 'negative amounts')
- orphaned line items (README.md:164-168, left-anti join)
- missing FX rates (README.md:166 'missing exchange rates')
- calendar gaps (README.md:167 'gaps in the calendar')
- uniqueness / not-null of PKs (schema.yml:4-19 dbt tests — note the
  reference's test targets the nonexistent column `calendar_date`;
  ours targets the real `date_day`)

Each check returns a DataFrame of violations (empty == pass), so they
compose into any runner; `run_quality_suite` evaluates them all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_missing_period_end(line_items: DataFrame, threshold_pct: float = 3.0) -> DataFrame:
    """Violation row iff >threshold% of line items lack period_end.

    Single-pass conditional aggregation (no separate .count() action);
    try_divide keeps the empty-input case a pass instead of an ANSI
    DIVIDE_BY_ZERO error.
    """
    return (
        line_items.agg(
            F.count(F.when(F.col("period_end_date").isNull(), 1)).alias("n_missing"),
            F.try_divide(
                F.count(F.when(F.col("period_end_date").isNull(), 1)) * 100.0,
                F.count(F.lit(1)),
            ).alias("missing_pct"),
        )
        .filter(F.col("missing_pct") > threshold_pct)
    )


def check_negative_amounts(line_items: DataFrame) -> DataFrame:
    return line_items.filter(
        (F.col("amount") < 0) | (F.col("tax_amount") < 0)
    ).select("line_item_id", "amount", "tax_amount")


def check_orphaned_line_items(line_items: DataFrame, invoices: DataFrame) -> DataFrame:
    """Line items whose invoice doesn't exist (left-anti join)."""
    return line_items.join(
        invoices.select("invoice_id"), "invoice_id", "left_anti"
    ).select("line_item_id", "invoice_id")


def check_missing_fx_rates(line_items: DataFrame, fx: DataFrame) -> DataFrame:
    """Currencies in the data with no to-USD rate."""
    rates = fx.filter(F.col("to_currency") == "usd").select(
        F.col("from_currency").alias("currency")
    )
    return (
        line_items.select("currency")
        .distinct()
        .join(F.broadcast(rates), "currency", "left_anti")
    )


def check_calendar_gaps(calendar: DataFrame) -> DataFrame:
    """Dates whose predecessor is not the previous day (spine holes)."""
    from pyspark.sql import Window

    w = Window.orderBy("date_day")
    with_prev = calendar.select("date_day").withColumn(
        "prev_day", F.lag("date_day").over(w)
    )
    return with_prev.filter(
        F.col("prev_day").isNotNull()
        & (F.datediff("date_day", "prev_day") != 1)
    )


def check_unique_not_null(df: DataFrame, key: str) -> DataFrame:
    """dbt-style unique + not_null on a PK column."""
    nulls = df.filter(F.col(key).isNull()).select(
        F.lit("null_key").alias("violation"), F.lit(None).cast("string").alias("key")
    )
    dupes = (
        df.groupBy(key)
        .count()
        .filter(F.col("count") > 1)
        .select(
            F.lit("duplicate_key").alias("violation"),
            F.col(key).cast("string").alias("key"),
        )
    )
    return nulls.unionByName(dupes)


def run_quality_suite(
    line_items: DataFrame,
    invoices: DataFrame,
    fx: DataFrame,
    calendar: DataFrame,
    now=None,
) -> dict[str, int]:
    """Evaluate every check; returns violation counts (0 == pass).
    ``now`` (optional) additionally runs the _loaded_at freshness
    check on the line-items mart."""
    out = {
        "missing_period_end": check_missing_period_end(line_items).count(),
        "negative_amounts": check_negative_amounts(line_items).count(),
        "orphaned_line_items": check_orphaned_line_items(line_items, invoices).count(),
        "missing_fx_rates": check_missing_fx_rates(line_items, fx).count(),
        "calendar_gaps": check_calendar_gaps(calendar).count(),
        "invoice_pk": check_unique_not_null(invoices, "invoice_id").count(),
        "line_item_pk": check_unique_not_null(line_items, "line_item_id").count(),
    }
    if now is not None:
        out["freshness"] = check_freshness(line_items, now).count()
    return out


def check_freshness(
    df: DataFrame,
    now,
    max_age_hours: float = 26.0,
    loaded_at_col: str = "_loaded_at",
) -> DataFrame:
    """Freshness monitoring on the audit column — the reference
    DECLARES this but never builds it (README.md:155-157: '_loaded_at
    ... can be used to monitor data freshness'). A daily-cron pipeline
    ('30 1 * * *') is stale when its newest _loaded_at is older than
    one cadence plus slack (26h default). ``now`` is an explicit
    parameter like every other clock in this engine (SURVEY.md §7
    determinism). Returns one violation row (newest_loaded_at,
    age_hours) when stale or the table is empty — an empty-but-
    expected table is itself a freshness failure."""
    agg = df.agg(F.max(loaded_at_col).alias("newest_loaded_at")).select(
        "newest_loaded_at",
        (
            (F.lit(now).cast("timestamp").cast("double")
             - F.col("newest_loaded_at").cast("double")) / 3600.0
        ).alias("age_hours"),
    )
    return agg.filter(
        F.col("newest_loaded_at").isNull()
        | (F.col("age_hours") > max_age_hours)
    )
