"""The four canonical analyst queries (README.md:174-213 — the
reference's acceptance surface, SURVEY.md §3.3), exposed BOTH ways:
as DataFrame builders (catalog/revenue_queries.py) and here as
textual SQL over registered views — Catalyst produces the same plan
from either.

``register_mart_views`` registers the warehouse tables produced by
plans/pipeline.py; each function then runs pure SQL text.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession

MART_TABLES = (
    "invoices",
    "invoice_line_items",
    "deferred_revenue",
    "recognized_revenue",
)


def register_mart_views(spark: SparkSession, warehouse_dir: str) -> None:
    for name in MART_TABLES:
        spark.read.parquet(os.path.join(warehouse_dir, name)).createOrReplaceTempView(
            name
        )
    # the generated calendar dim (README.md:210 joins it by name) — span
    # wide enough to cover both the TPC-H mapping and the Stripe fixtures
    from stripe_data_pipeline_spark.models.calendar import calendar

    calendar(spark, dt.date(1995, 1, 1), dt.date(2025, 12, 31)).createOrReplaceTempView(
        "calendar"
    )


def total_deferred_asof(spark: SparkSession, as_of: dt.date) -> DataFrame:
    """README.md:178-182 — total deferred revenue as of a date."""
    return spark.sql(
        f"""
        SELECT CAST(SUM(CAST(FLOOR(deferred_revenue_usd * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS total_deferred_usd
        FROM deferred_revenue
        WHERE as_of_date = DATE '{as_of}'
        """
    )


def deferred_by_customer(spark: SparkSession, as_of: dt.date) -> DataFrame:
    """README.md:185-193 — deferred revenue by customer, largest first."""
    return spark.sql(
        f"""
        SELECT customer_id,
               CAST(SUM(CAST(FLOOR(deferred_revenue_usd * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS deferred_usd
        FROM deferred_revenue
        WHERE as_of_date = DATE '{as_of}'
        GROUP BY customer_id
        ORDER BY deferred_usd DESC, customer_id
        """
    )


def deferred_trend(spark: SparkSession) -> DataFrame:
    """README.md:196-203 — deferred revenue trend over time."""
    return spark.sql(
        """
        SELECT as_of_date,
               CAST(SUM(CAST(FLOOR(deferred_revenue_usd * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS deferred_usd
        FROM deferred_revenue
        GROUP BY as_of_date
        ORDER BY as_of_date
        """
    )


def recognized_for_quarter(spark: SparkSession, year: int, quarter: int) -> DataFrame:
    """README.md:207-213 — recognized revenue for a calendar quarter,
    the reference's exact shape: SUM(daily_revenue_usd) over the
    recognized_revenue mart joined to the calendar dim."""
    return spark.sql(
        f"""
        SELECT CAST(SUM(CAST(FLOOR(f.daily_revenue_usd * 100.0 + 0.5) AS BIGINT))
                    AS DOUBLE) / 100.0 AS recognized_usd
        FROM recognized_revenue f
        JOIN calendar c ON f.recognition_date = c.date_day
        WHERE c.year = {year} AND c.quarter_of_year = '{quarter}'
        """
    )
