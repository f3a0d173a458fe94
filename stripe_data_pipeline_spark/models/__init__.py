"""Stripe domain models re-expressed Spark-first.

Each model is a pure ``DataFrame -> DataFrame`` function (the dbt-model
analogue, SURVEY.md §1.4); materialization is the caller's concern via
``io.write_table`` / ``incremental.merge_upsert``.
"""
