"""stripe_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, idiomatic-Spark implementation of the query and
data-processing capabilities of the reference ELT pipeline
(mhd-adam/stripe-data-pipeline: Airflow + dbt + BigQuery), extended
with large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Layout
------
- ``session``    SparkSession factory (AQE, UTC, tuned shuffle partitions)
- ``io``         readers/writers (parquet/json sources, partitioned/merge sinks)
- ``functions``  scalar function library (date/json/money helpers)
- ``operators``  reusable relational + extension operators
- ``models``     the Stripe domain models (staging -> curated -> marts)
- ``plans``      analyst query entry points
- ``streaming``  Structured Streaming variants (AvailableNow + foreachBatch merge)
- ``catalog``    the oracle-checked query registry consumed by __spark_entry__
"""

__version__ = "0.1.0"
