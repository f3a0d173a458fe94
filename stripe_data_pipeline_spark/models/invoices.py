"""Curated invoices model (P2 rename-and-cast).

Reference: dbt/stripe/models/curated/invoices.sql:16-52 — id renames,
cents/100 -> FLOAT64 dollars, unix -> (epoch, timestamp, date)
triples, `_loaded_at` audit column (parameterized here: SURVEY.md §7
bans now() inside transforms).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ts_triple(col: str, prefix: str) -> list:
    epoch = F.col(col).cast("long")
    ts = F.timestamp_seconds(epoch)
    return [
        epoch.alias(f"{prefix}_timestamp"),
        ts.alias(f"{prefix}_at"),
        F.to_date(ts).alias(f"{prefix}_date"),
    ]


def curated_invoices(stg: DataFrame, loaded_at: dt.datetime) -> DataFrame:
    money = lambda c: (F.col(c).cast("double") / 100).alias(c)  # noqa: E731
    return stg.select(
        F.col("id").alias("invoice_id"),
        F.col("customer").alias("customer_id"),
        F.col("subscription").alias("subscription_id"),
        *_ts_triple("created", "created_at")[:2],
        F.col("created_at_date"),
        F.col("status"),
        F.col("currency"),
        money("amount_due"),
        money("amount_paid"),
        money("amount_remaining"),
        money("subtotal"),
        money("total"),
        money("tax"),
        F.col("automatic_tax"),
        F.col("collection_method"),
        *_ts_triple("period_start", "period_start"),
        *_ts_triple("period_end", "period_end"),
        F.col("metadata"),
        F.lit(loaded_at).alias("_loaded_at"),
    ).withColumnRenamed("created_at_timestamp", "created_timestamp")
