"""Oracle-checked query catalog.

Every implemented operator from SURVEY.md §2 (plus the north-star
extension operators) registers one named query here; __spark_entry__
exposes the registry to the driver. Importing this package populates
the registry.
"""

from stripe_data_pipeline_spark.catalog.registry import QUERIES, QuerySpec, register

# Populate the registry (import order = display order).
from stripe_data_pipeline_spark.catalog import revenue_queries  # noqa: E402,F401
from stripe_data_pipeline_spark.catalog import relational_queries  # noqa: E402,F401
from stripe_data_pipeline_spark.catalog import text_queries  # noqa: E402,F401
from stripe_data_pipeline_spark.catalog import similarity_queries  # noqa: E402,F401
from stripe_data_pipeline_spark.catalog import multimodal_queries  # noqa: E402,F401
from stripe_data_pipeline_spark.catalog import streaming_queries  # noqa: E402,F401
from stripe_data_pipeline_spark.catalog import sampling_queries  # noqa: E402,F401
from stripe_data_pipeline_spark.catalog import corpus_queries  # noqa: E402,F401

__all__ = ["QUERIES", "QuerySpec", "register"]
