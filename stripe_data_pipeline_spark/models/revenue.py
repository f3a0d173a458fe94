"""Daily straight-line revenue recognition — the flagship composite
operator (SURVEY.md §2.9).

Reference semantics (/root/reference/dbt/stripe/models/marts/
deferred_revenue.sql:24-123, spec README.md:72-88): for a line item
with net-of-tax USD amount M over service period [S, E]:

- daily_revenue_usd = M / days            (zero-guard: M when days = 0,
                                           deferred_revenue.sql:64-69)
- per day D:  deferred   = M              if D < S
              deferred   = 0              if D >= E
              deferred   = daily * (E-D)  otherwise   (:97-102)
              recognized = 0 / M / daily * (D-S)      (:105-110)
- day domain: invoice_created_date <= D <= period_end (closed, :118-122)

Physical strategy — the one real optimizer decision in the whole
pipeline (SURVEY.md §4): the reference expands line items against a
calendar via CROSS JOIN + date-range predicates, which Spark would
execute as a BroadcastNestedLoopJoin evaluating O(items × calendar)
predicates. We instead generate each item's own day range with
``explode(sequence(start, end))`` — linear in output rows, no join at
all, embarrassingly parallel, and it scales to 100 TB because each
row's expansion is independent (no shuffle until the final
aggregation). FX is a 9-row broadcast join (J1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.models.exchange_rates import exchange_rates_sql
from stripe_data_pipeline_spark.models.line_items import LINE_ITEMS_SQL


def with_usd_amounts(line_items: DataFrame, fx: DataFrame) -> DataFrame:
    """Net-of-tax amount + FX conversion (deferred_revenue.sql:24-56).

    J1: inner equi-join to the 9-row FX dim, explicitly broadcast.
    """
    # deferred_revenue.sql:29-32 — tax-inclusive amounts carry tax inside
    net = F.when(
        F.col("is_tax_inclusive"), F.col("amount") - F.col("tax_amount")
    ).otherwise(F.col("amount"))
    li = line_items.withColumn("amount_without_tax", net)

    joined = li.join(
        F.broadcast(fx),
        (li["currency"] == fx["from_currency"]) & (fx["to_currency"] == F.lit("usd")),
        "inner",
    )
    # deferred_revenue.sql:48-50 — FX to USD
    return joined.withColumn(
        "amount_without_tax_usd", F.col("amount_without_tax") * F.col("exchange_rate")
    ).drop("from_currency", "to_currency", "rate_date")


def with_daily_rate(df: DataFrame) -> DataFrame:
    """deferred_revenue.sql:62-69 — straight-line daily rate with
    zero-length-period guard."""
    days = F.col("service_period_days")
    return df.withColumn(
        "daily_revenue_usd",
        F.when(days > 0, F.col("amount_without_tax_usd") / days).otherwise(
            F.col("amount_without_tax_usd")
        ),
    )


def daily_revenue_facts(
    usd_line_items: DataFrame, domain_start_col: str | None = None
) -> DataFrame:
    """Explode each line item into one row per as_of day and compute the
    deferred/recognized split (deferred_revenue.sql:74-123).

    The day domain is [domain_start, period_end_inferred] (J3, closed
    interval) with domain_start = invoice_created_date in the reference
    (:118-122). ``domain_start_col`` defaults to period_start_date —
    correct for the TPC-H mapping where created == start; the Stripe
    pipeline passes "invoice_created_date".
    """
    domain_start_col = domain_start_col or "period_start_date"
    df = with_daily_rate(usd_line_items)
    # J3 rewritten: sequence+explode instead of calendar cross-join.
    df = df.withColumn(
        "as_of_date",
        F.explode(
            F.sequence(
                F.least(F.col(domain_start_col), F.col("period_end_date_inferred")),
                F.col("period_end_date_inferred"),
            )
        ),
    )

    s, e = F.col("period_start_date"), F.col("period_end_date_inferred")
    d = F.col("as_of_date")
    m = F.col("amount_without_tax_usd")
    daily = F.col("daily_revenue_usd")

    # deferred_revenue.sql:97-102
    deferred = (
        F.when(d < s, m).when(d >= e, F.lit(0.0)).otherwise(daily * F.datediff(e, d))
    )
    # deferred_revenue.sql:105-110
    recognized = (
        F.when(d < s, F.lit(0.0)).when(d >= e, m).otherwise(daily * F.datediff(d, s))
    )
    return df.withColumns(
        {"deferred_revenue_usd": deferred, "recognized_revenue_usd": recognized}
    )


def recognized_daily_facts_halfopen(usd_line_items: DataFrame) -> DataFrame:
    """The recognized_revenue mart's day domain (J4): half-open
    [period_start, period_end) — note the deliberate asymmetry vs
    deferred's closed interval (recognized_revenue.sql:92-94 vs
    deferred_revenue.sql:118-122; SURVEY.md §7 quirk list).

    Zero-length periods produce no recognition days (the reference's
    range join yields no calendar rows), so they're filtered before
    the sequence — which also keeps Spark's sequence() from generating
    a *descending* range when end-1 < start.
    """
    df = with_daily_rate(usd_line_items)
    df = df.filter(F.col("period_end_date_inferred") > F.col("period_start_date"))
    df = df.withColumn(
        "recognition_date",
        F.explode(
            F.sequence(
                F.col("period_start_date"),
                F.date_sub(F.col("period_end_date_inferred"), 1),
            )
        ),
    )
    s = F.col("period_start_date")
    d = F.col("recognition_date")
    return df.withColumn(
        "recognized_revenue_usd", F.col("daily_revenue_usd") * F.datediff(d, s)
    )


def revenue_asof(usd_line_items: DataFrame, as_of) -> DataFrame:
    """Closed-form deferred/recognized at a single as-of date — no
    per-day explode at all.

    The facts table filtered to ``as_of_date = D`` contains exactly
    the line items whose day domain covers D, each valued by the same
    CASE expressions — so computing those expressions directly on the
    line items is semantically identical and linear in line items
    (SURVEY.md §7 'prefer on-demand computation at 100 TB': the
    explode-then-filter plan materializes period_days× more rows only
    to discard all but one day).
    """
    df = with_daily_rate(usd_line_items)
    d = F.lit(as_of)
    s, e = F.col("period_start_date"), F.col("period_end_date_inferred")
    m = F.col("amount_without_tax_usd")
    daily = F.col("daily_revenue_usd")
    df = df.filter((s <= d) & (d <= e))
    deferred = (
        F.when(d < s, m).when(d >= e, F.lit(0.0)).otherwise(daily * F.datediff(e, d))
    )
    recognized = (
        F.when(d < s, F.lit(0.0)).when(d >= e, m).otherwise(daily * F.datediff(d, s))
    )
    return df.withColumns(
        {
            "as_of_date": d,
            "deferred_revenue_usd": deferred,
            "recognized_revenue_usd": recognized,
        }
    )


# ---------------------------------------------------------------------------
# DuckDB oracle renderings (same arithmetic, same expression trees).
# ---------------------------------------------------------------------------

USD_LINE_ITEMS_SQL = f"""
WITH line_items AS ({LINE_ITEMS_SQL}),
fx AS ({exchange_rates_sql()}),
usd_line_items AS (
    SELECT li.*,
           CASE WHEN li.is_tax_inclusive THEN li.amount - li.tax_amount
                ELSE li.amount END * fx.exchange_rate AS amount_without_tax_usd,
           CASE WHEN li.is_tax_inclusive THEN li.amount - li.tax_amount
                ELSE li.amount END AS amount_without_tax,
           fx.exchange_rate
    FROM line_items li
    JOIN fx ON li.currency = fx.from_currency AND fx.to_currency = 'usd'
)
"""

DAILY_FACTS_SQL = (
    USD_LINE_ITEMS_SQL
    + """,
rated AS (
    SELECT *,
           CASE WHEN service_period_days > 0
                THEN amount_without_tax_usd / service_period_days
                ELSE amount_without_tax_usd END AS daily_revenue_usd
    FROM usd_line_items
),
facts AS (
    SELECT r.*, CAST(g.as_of_date AS DATE) AS as_of_date,
           CASE WHEN CAST(g.as_of_date AS DATE) < r.period_start_date
                     THEN r.amount_without_tax_usd
                WHEN CAST(g.as_of_date AS DATE) >= r.period_end_date_inferred
                     THEN 0.0
                ELSE r.daily_revenue_usd
                     * datediff('day', CAST(g.as_of_date AS DATE), r.period_end_date_inferred)
           END AS deferred_revenue_usd,
           CASE WHEN CAST(g.as_of_date AS DATE) < r.period_start_date THEN 0.0
                WHEN CAST(g.as_of_date AS DATE) >= r.period_end_date_inferred
                     THEN r.amount_without_tax_usd
                ELSE r.daily_revenue_usd
                     * datediff('day', r.period_start_date, CAST(g.as_of_date AS DATE))
           END AS recognized_revenue_usd
    FROM rated r,
         LATERAL UNNEST(generate_series(r.period_start_date,
                                        r.period_end_date_inferred,
                                        INTERVAL 1 DAY)) AS g(as_of_date)
)
"""
)
