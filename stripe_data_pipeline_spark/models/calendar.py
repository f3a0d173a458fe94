"""Calendar dimension (S11 date spine + W1/W2 partition windows).

Reference: /root/reference/dbt/stripe/models/curated/calendar.sql:5-20 —
a GENERATE_DATE_ARRAY spine with derived date parts, two unbounded
partition windows (days_in_month, is_leap_year), and the weekday flag
(P7 IN-list predicate).

Deviations from the reference, replicated-or-documented per SURVEY.md §7:
- ``day_of_year`` is actually day-of-month (calendar.sql:9 misnomer) —
  replicated faithfully.
- ``is_leap_year`` = (days in year != 365) — wrong for the trailing
  partial year (calendar.sql:17 quirk) — replicated faithfully.
- ``week_of_year`` replicates BigQuery EXTRACT(WEEK) exactly
  (Sunday-anchored, 0-53: dates before the year's first Sunday are
  week 0) via the closed form (doy - first_sunday_doy + 7) div 7 —
  pure integer arithmetic, so Spark and the DuckDB oracle agree
  bit-for-bit. Neither engine's built-in week function has BQ
  semantics (Spark/DuckDB ``weekofyear`` are ISO).
- spine bounds are parameters pinned by the caller (the reference uses
  CURRENT_DATE — nondeterministic, SURVEY.md §7 risk list).

Scale note: the spine is ~10k rows for 30 years — always a broadcast
dimension, never a shuffle partner.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_START = dt.date(1995, 1, 1)
DEFAULT_END = dt.date(2002, 12, 31)


def calendar(
    spark: SparkSession,
    start: dt.date = DEFAULT_START,
    end: dt.date = DEFAULT_END,
) -> DataFrame:
    spine = spark.range(1).select(
        F.explode(F.sequence(F.lit(start), F.lit(end))).alias("date_day")
    )
    d = F.col("date_day")
    # BigQuery EXTRACT(WEEK): Sunday-anchored week number in [0, 53]
    # (calendar.sql:8). first_sunday_doy = 1 + ((8 - dayofweek(jan1)) % 7)
    # with Spark dayofweek() Sunday=1; the week is then how many Sundays
    # fall on-or-before the date — all-integer, engine-portable.
    first_sunday = F.lit(1) + (F.lit(8) - F.dayofweek(F.trunc(d, "year"))) % 7
    bq_week = F.floor(
        (F.dayofyear(d) - first_sunday + F.lit(7)) / F.lit(7)
    ).cast("int")
    df = spine.select(
        d,
        F.year(d).alias("year"),
        bq_week.alias("week_of_year"),
        F.dayofmonth(d).alias("day_of_year"),  # sic — calendar.sql:9 misnomer
        F.quarter(d).cast("string").alias("quarter_of_year"),
        F.month(d).alias("month_of_year"),
        F.date_format(d, "MMMM").alias("month_name"),
        (F.weekday(d) + 1).alias("day_of_week"),  # ISO 1-7, calendar.sql:13 %u
        F.date_format(d, "EEEE").alias("day_of_week_name"),
    )
    # calendar.sql:15 — IF(name IN ('Saturday','Sunday'), FALSE, TRUE)
    df = df.withColumn(
        "is_weekday",
        F.when(F.col("day_of_week_name").isin("Saturday", "Sunday"), False).otherwise(
            True
        ),
    )
    # W1 (calendar.sql:16): COUNT over (year, month) partition, unbounded frame
    w_month = Window.partitionBy("year", "month_of_year")
    # W2 (calendar.sql:17): leap-year flag from COUNT over year partition
    w_year = Window.partitionBy("year")
    return df.withColumns(
        {
            "days_in_month": F.count("date_day").over(w_month),
            "is_leap_year": F.when(
                F.count("date_day").over(w_year) == 365, False
            ).otherwise(True),
        }
    )


def calendar_sql(start: dt.date = DEFAULT_START, end: dt.date = DEFAULT_END) -> str:
    """DuckDB rendering of the same model (oracle side)."""
    return f"""
WITH spine AS (
    SELECT CAST(g.date_day AS DATE) AS date_day
    FROM UNNEST(generate_series(DATE '{start}', DATE '{end}', INTERVAL 1 DAY)) AS g(date_day)
),
parts AS (
    SELECT date_day,
           CAST(year(date_day) AS INT) AS year,
           CAST(FLOOR((dayofyear(date_day)
                       - (1 + ((8 - (dayofweek(date_trunc('year', date_day)) + 1)) % 7))
                       + 7) / 7e0) AS INT) AS week_of_year,
           CAST(day(date_day) AS INT) AS day_of_year,
           CAST(quarter(date_day) AS VARCHAR) AS quarter_of_year,
           CAST(month(date_day) AS INT) AS month_of_year,
           monthname(date_day) AS month_name,
           CAST(isodow(date_day) AS INT) AS day_of_week,
           dayname(date_day) AS day_of_week_name,
           CASE WHEN dayname(date_day) IN ('Saturday', 'Sunday') THEN FALSE
                ELSE TRUE END AS is_weekday
    FROM spine
)
SELECT *,
       COUNT(date_day) OVER (PARTITION BY year, month_of_year) AS days_in_month,
       CASE WHEN COUNT(date_day) OVER (PARTITION BY year) = 365 THEN FALSE
            ELSE TRUE END AS is_leap_year
FROM parts
"""
