"""Curated invoice_line_items analogue over the driver's TPC-H-ish data.

The reference's curated line-item model
(/root/reference/dbt/stripe/models/curated/invoice_line_items.sql:36-118)
renames/casts raw JSON fields, derives the tax columns (A4/A5), and
infers a missing ``period_end`` as start + 1 day (:102-116). The
driver's test tables have no Stripe JSON, so we apply the
FIXTURES.md §B mapping — deterministic, DuckDB-expressible — to
``lineitem``:

- amount            = l_extendedprice * (1 - l_discount)
- tax_amount        = l_extendedprice * l_tax
- currency          = {0:usd, 1:eur, 2:gbp}[l_suppkey % 3]
- tax_behavior      = {0:'inclusive', 1:'exclusive', 2:NULL}[l_partkey % 3]
- period_start_date = date(l_shipdate)
- period_end_date   = NULL when l_linenumber = 7 (models the missing-
                      period_end branch), else start + (1 + (l_linenumber % 4)*7) days
- line_item_id      = l_orderkey * 10 + l_linenumber

Everything downstream (revenue marts, data-quality checks) consumes
this model, exactly as the reference materializes invoice_line_items
once and reuses it (README.md:50-63 'normalize once').

The matching DuckDB SQL fragment lives in LINE_ITEMS_SQL so oracle
queries share byte-identical arithmetic: every expression is plain
IEEE double math evaluated in the same tree shape on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.io import read_table


def curated_line_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")

    amount = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    tax_amount = F.col("l_extendedprice") * F.col("l_tax")
    currency = (
        F.when(F.col("l_suppkey") % 3 == 0, "usd")
        .when(F.col("l_suppkey") % 3 == 1, "eur")
        .otherwise("gbp")
    )
    tax_behavior = (
        F.when(F.col("l_partkey") % 3 == 0, "inclusive")
        .when(F.col("l_partkey") % 3 == 1, "exclusive")
        .otherwise(F.lit(None).cast("string"))
    )
    period_start = F.to_date("l_shipdate")
    period_end = F.when(
        F.col("l_linenumber") != 7,
        F.date_add(period_start, (F.lit(1) + (F.col("l_linenumber") % 4) * 7).cast("int")),
    )

    df = li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("line_item_id"),
        F.col("l_orderkey").alias("invoice_id"),
        F.col("l_suppkey").alias("customer_id"),
        F.col("l_quantity").cast("long").alias("quantity"),
        amount.alias("amount"),
        tax_amount.alias("tax_amount"),
        currency.alias("currency"),
        tax_behavior.alias("tax_behavior"),
        period_start.alias("period_start_date"),
        period_end.alias("period_end_date"),
    )

    # invoice_line_items.sql:79-86 — is_tax_inclusive with COALESCE(.., FALSE)
    # invoice_line_items.sql:102-116 — missing period_end fallback (+1 day)
    df = df.withColumns(
        {
            "is_tax_inclusive": F.coalesce(
                F.col("tax_behavior") == "inclusive", F.lit(False)
            ),
            "is_missing_period_end": F.col("period_end_date").isNull(),
            "period_end_date_inferred": F.coalesce(
                F.col("period_end_date"), F.date_add(F.col("period_start_date"), 1)
            ),
        }
    )
    # invoice_line_items.sql:96-100 — service period length in days
    return df.withColumn(
        "service_period_days",
        F.datediff("period_end_date_inferred", "period_start_date").cast("long"),
    )


# DuckDB rendering of the exact same model, as a CTE body over `lineitem`.
LINE_ITEMS_SQL = """
SELECT
    l_orderkey * 10 + l_linenumber AS line_item_id,
    l_orderkey AS invoice_id,
    l_suppkey AS customer_id,
    CAST(l_quantity AS BIGINT) AS quantity,
    l_extendedprice * (1 - l_discount) AS amount,
    l_extendedprice * l_tax AS tax_amount,
    CASE WHEN l_suppkey % 3 = 0 THEN 'usd'
         WHEN l_suppkey % 3 = 1 THEN 'eur'
         ELSE 'gbp' END AS currency,
    CASE WHEN l_partkey % 3 = 0 THEN 'inclusive'
         WHEN l_partkey % 3 = 1 THEN 'exclusive'
         ELSE NULL END AS tax_behavior,
    CAST(l_shipdate AS DATE) AS period_start_date,
    CASE WHEN l_linenumber <> 7
         THEN CAST(l_shipdate AS DATE) + (1 + (l_linenumber % 4) * 7)
         ELSE NULL END AS period_end_date,
    COALESCE(CASE WHEN l_partkey % 3 = 0 THEN 'inclusive'
                  WHEN l_partkey % 3 = 1 THEN 'exclusive'
                  ELSE NULL END = 'inclusive', FALSE) AS is_tax_inclusive,
    (CASE WHEN l_linenumber <> 7
          THEN CAST(l_shipdate AS DATE) + (1 + (l_linenumber % 4) * 7)
          ELSE NULL END) IS NULL AS is_missing_period_end,
    COALESCE(CASE WHEN l_linenumber <> 7
                  THEN CAST(l_shipdate AS DATE) + (1 + (l_linenumber % 4) * 7)
                  ELSE NULL END,
             CAST(l_shipdate AS DATE) + 1) AS period_end_date_inferred,
    CAST(datediff('day', CAST(l_shipdate AS DATE),
                  COALESCE(CASE WHEN l_linenumber <> 7
                                THEN CAST(l_shipdate AS DATE) + (1 + (l_linenumber % 4) * 7)
                                ELSE NULL END,
                           CAST(l_shipdate AS DATE) + 1)) AS BIGINT) AS service_period_days
FROM lineitem
"""
