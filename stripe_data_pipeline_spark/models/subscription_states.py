"""Latest subscription state from the event changelog.

The reference lands ``stg_subscription_updates`` (Stripe events of
type customer.subscription.*, extract_stripe_data.py:23-24) but no
model consumes it (SURVEY.md §2.10: stg_subscription_updates.sql has
no downstream ref()). This model is the natural completion: compact
the append-only changelog to one current row per subscription.

- JSON extraction on the free-form ``data`` payload
  (JSON_EXTRACT_SCALAR equivalents, schema-on-read)
- newest event per subscription via row_number (deterministic
  tiebreak on event id); the continuous-streaming variant is
  streaming/stateful.py.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def curated_subscription_states(
    stg_updates: DataFrame, loaded_at: dt.datetime
) -> DataFrame:
    parsed = stg_updates.select(
        F.col("id").alias("event_id"),
        F.col("created").cast("long").alias("event_created"),
        F.col("type").alias("event_type"),
        F.get_json_object("data", "$.object.id").alias("subscription_id"),
        F.get_json_object("data", "$.object.status").alias("status"),
    ).filter(F.col("subscription_id").isNotNull())

    w = Window.partitionBy("subscription_id").orderBy(
        F.desc("event_created"), F.desc("event_id")
    )
    return (
        parsed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "subscription_id",
            "status",
            F.col("event_id").alias("last_event_id"),
            F.timestamp_seconds(F.col("event_created")).alias("last_event_at"),
            F.lit(loaded_at).alias("_loaded_at"),
        )
    )
