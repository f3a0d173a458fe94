"""Scalar function library (SURVEY.md §2.8)."""

from stripe_data_pipeline_spark.functions.money import sum_usd_cents  # noqa: F401
