"""Explicit StructTypes for Stripe resources (FIXTURES.md §A).

The reference reads raw JSON 'as-is' via schema-on-read external
tables (README.md:38-42; external_tables.yml:5-19). At 100 TB,
schema inference is an extra full pass over the data, so we pin
explicit schemas for the fields the models consume
(invoice_line_items.sql:36-88) and leave the long tail out — Spark's
JSON reader ignores unknown fields, mirroring 'as-is with minimal
transformation'.
"""

from __future__ import annotations

from pyspark.sql import types as T

TAX_SCHEMA = T.StructType(
    [
        T.StructField("amount", T.LongType()),
        T.StructField("tax_behavior", T.StringType()),
    ]
)

LINE_ITEM_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("type", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("amount", T.LongType()),  # integer cents
        T.StructField("currency", T.StringType()),
        T.StructField("quantity", T.LongType()),
        T.StructField("subscription", T.StringType()),
        T.StructField(
            "period",
            T.StructType(
                [
                    T.StructField("start", T.LongType()),  # epoch seconds
                    T.StructField("end", T.LongType()),
                ]
            ),
        ),
        T.StructField("taxes", T.ArrayType(TAX_SCHEMA)),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

INVOICE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("customer", T.StringType()),
        T.StructField("subscription", T.StringType()),
        T.StructField("created", T.LongType()),  # epoch seconds (cursor)
        T.StructField("status", T.StringType()),
        T.StructField("currency", T.StringType()),
        T.StructField("amount_due", T.LongType()),
        T.StructField("amount_paid", T.LongType()),
        T.StructField("amount_remaining", T.LongType()),
        T.StructField("subtotal", T.LongType()),
        T.StructField("total", T.LongType()),
        T.StructField("tax", T.LongType()),
        T.StructField("automatic_tax", T.StringType()),
        T.StructField("collection_method", T.StringType()),
        T.StructField("period_start", T.LongType()),
        T.StructField("period_end", T.LongType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "lines",
            T.StructType([T.StructField("data", T.ArrayType(LINE_ITEM_SCHEMA))]),
        ),
    ]
)

SUBSCRIPTION_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("created", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("customer", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("created", T.LongType()),
        T.StructField("type", T.StringType()),
        T.StructField("data", T.StringType()),  # free-form JSON text
    ]
)
