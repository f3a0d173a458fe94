"""Streaming variant of the ingestion pipeline (SURVEY.md §2.10, §7
step 7).

The reference's cadence is a daily scheduled batch (cron '30 1 * * *',
extract_stripe_data.py:143) over an overwritten NDJSON snapshot. The
Structured Streaming equivalent watches the drop directory and drains
whatever is available per invocation:

    readStream(NDJSON, explicit schema) -> stage() (P1)
    -> dropDuplicates(id)  [within-drain redelivery]
    -> foreachBatch merge_upsert(id)  [across-drain idempotency]
    with Trigger.AvailableNow + checkpoint

Batch and streaming share the *same model function* (models/staging.
stage) and the same merge sink — the streaming pipeline is the batch
pipeline with a different driver loop, which is exactly the unified-
engine property Structured Streaming exists for. Tests prove the
staging table converges to the batch pipeline's output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from stripe_data_pipeline_spark.incremental import merge_upsert
from stripe_data_pipeline_spark.models.staging import stage
from stripe_data_pipeline_spark.sources.stripe_schema import INVOICE_SCHEMA


def stream_invoices_to_staging(
    spark: SparkSession,
    drop_dir: str,
    target_path: str,
    checkpoint_dir: str,
) -> None:
    """Drain all available invoice NDJSON into the staging table."""
    raw = spark.readStream.schema(INVOICE_SCHEMA).json(drop_dir)
    staged = stage(raw).dropDuplicates(["id"])

    def merge(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_upsert(
            batch.sparkSession,
            target_path,
            batch.dropDuplicates(["id"]),
            keys=["id"],
            partition_by="created_at_date",
        )

    (
        staged.writeStream.foreachBatch(merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
