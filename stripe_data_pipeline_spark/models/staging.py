"""Staging models (P1 star-plus projections).

Reference: dbt/stripe/models/staging/stg_{invoices,subscriptions,
subscription_updates}.sql — `SELECT s.*, DATE(TIMESTAMP_SECONDS(
CAST(created AS INT64))) AS created_at_date FROM source` with
incremental MERGE on id (stg_invoices.sql:1-13).

The derived ``created_at_date`` is the partition column for every
staging table (S8) — it's what makes the daily incremental filter a
partition-pruning scan at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage(raw: DataFrame) -> DataFrame:
    """P1: passthrough + created_at_date (stg_invoices.sql:10-13)."""
    return raw.withColumn(
        "created_at_date",
        F.to_date(F.timestamp_seconds(F.col("created").cast("long"))),
    )


# per-resource aliases, for pipeline readability
stg_invoices = stage
stg_subscriptions = stage
stg_subscription_updates = stage
