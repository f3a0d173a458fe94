"""Curated invoice_line_items from nested Stripe invoices.

Reference: dbt/stripe/models/curated/invoice_line_items.sql —
the structurally richest model:

- :30-31  J2 lateral UNNEST of lines.data -> F.explode (typed struct,
          not JSON re-parsing: we normalize once, README.md:50-63)
- :36-61  scalar extraction + rename/cast (typed field access)
- :65-71  A4 tax total: correlated SUM over the taxes array ->
          F.aggregate higher-order fold, COALESCE 0
- :73-86  A5 tax_behavior: `... LIMIT 1` scalar subquery ->
          F.element_at(taxes, 1); is_tax_inclusive COALESCE FALSE
- :96-100 service_period_days via DATE_DIFF
- :102-116 missing period_end fallback: start + 1 day, plus the
          is_missing flag
- :32    P3 status = 'paid' filter (also pre-filtered at the source
          by the extractor, extract_stripe_data.py:32)

Spark-first note: all the array work happens with higher-order
functions on the exploded struct — zero joins, zero UDFs, one
Generate node in the plan.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def curated_invoice_line_items(stg: DataFrame, loaded_at: dt.datetime) -> DataFrame:
    # :32 equality filter, then :30-31 explode (inner-join semantics:
    # invoices with no line items drop, as UNNEST does)
    exploded = stg.filter(F.col("status") == "paid").select(
        F.col("id").alias("invoice_id"),
        F.col("customer").alias("customer_id"),
        F.col("subscription").alias("invoice_subscription"),
        F.col("status").alias("invoice_status"),
        F.col("created").cast("long").alias("created_epoch"),
        F.col("automatic_tax"),
        F.explode("lines.data").alias("li"),
    )

    li = F.col("li")
    created_ts = F.timestamp_seconds(F.col("created_epoch"))
    period_start_ts = F.timestamp_seconds(li["period"]["start"])
    period_end_ts = F.timestamp_seconds(li["period"]["end"])

    # :65-71 — SUM over nested array, cents -> dollars inside the fold
    tax_amount = F.coalesce(
        F.aggregate(
            li["taxes"],
            F.lit(0.0),
            lambda acc, t: acc + t["amount"].cast("double") / 100,
        ),
        F.lit(0.0),
    )
    # :73-86 — first tax row's behavior; inclusive flag defaults FALSE.
    # try_element_at: NULL on empty arrays (the `... LIMIT 1` scalar
    # subquery returns NULL) — plain element_at throws under ANSI mode.
    tax_behavior = F.try_element_at(li["taxes"], F.lit(1))["tax_behavior"]
    is_tax_inclusive = F.coalesce(tax_behavior == "inclusive", F.lit(False))

    df = exploded.select(
        li["id"].alias("line_item_id"),
        F.col("invoice_id"),
        F.col("customer_id"),
        # :40 — line-item subscription falls back to the invoice's
        F.coalesce(li["subscription"], F.col("invoice_subscription")).alias(
            "subscription_id"
        ),
        F.col("invoice_status"),
        created_ts.alias("invoice_created_at"),
        F.to_date(created_ts).alias("invoice_created_date"),
        li["type"].alias("line_item_type"),
        li["description"].alias("description"),
        (li["amount"].cast("double") / 100).alias("amount"),
        li["currency"].alias("currency"),
        li["quantity"].cast("long").alias("quantity"),
        li["period"]["start"].alias("period_start_timestamp"),
        period_start_ts.alias("period_start_at"),
        F.to_date(period_start_ts).alias("period_start_date"),
        li["period"]["end"].alias("period_end_timestamp"),
        period_end_ts.alias("period_end_at"),
        F.to_date(period_end_ts).alias("period_end_date"),
        tax_amount.alias("tax_amount"),
        tax_behavior.alias("tax_behavior"),
        is_tax_inclusive.alias("is_tax_inclusive"),
        li["metadata"].alias("metadata"),
        F.col("automatic_tax"),
    )

    # :102-116 — fallback + flags; :96-100 — service period length
    df = df.withColumns(
        {
            "is_missing_period_end": F.col("period_end_date").isNull(),
            "period_end_date_inferred": F.coalesce(
                F.col("period_end_date"), F.date_add(F.col("period_start_date"), 1)
            ),
        }
    )
    return df.withColumns(
        {
            "service_period_days": F.datediff(
                "period_end_date_inferred", "period_start_date"
            ).cast("long"),
            "_loaded_at": F.lit(loaded_at),
        }
    )
