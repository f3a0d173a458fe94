"""Streaming ingestion of the event changelog (SURVEY.md §2.10).

The reference lands Stripe events (``customer.subscription.*``,
extract_stripe_data.py:23-24) in staging and never consumes them; the
natural completion is a streaming pipeline:

    file source (NDJSON/parquet drop) -> watermark + dropDuplicates
    -> foreachBatch merge into the staging table

run with ``Trigger.AvailableNow`` — the streaming analogue of the
reference's daily scheduled batch (cron '30 1 * * *',
extract_stripe_data.py:143): each invocation drains everything
available, exactly-once via checkpoint + idempotent merge.

``latest_state_per_key`` is the changelog-compaction operator
(row_number batch form; in continuous streaming it would be
``applyInPandasWithState``) — see catalog 'latest_event_per_user'.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from stripe_data_pipeline_spark.incremental import merge_upsert

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def stream_events_to_table(
    spark: SparkSession,
    input_dir: str,
    target_path: str,
    checkpoint_dir: str,
    watermark: str = "1 day",
    fmt: str = "json",
) -> None:
    """Drain the event drop into the staging table, exactly-once-ish.

    Late/duplicate delivery handling: dropDuplicatesWithinWatermark on
    the event id (the streaming equivalent of the reference's MERGE
    unique_key idempotency, stg_*.sql:1-6); the foreachBatch merge
    makes redelivery across restarts idempotent too. Plain
    dropDuplicates([id]) would never evict dedup state (the watermark
    only bounds state when the event-time column is in the subset) —
    WithinWatermark keeps the state store bounded across daily
    AvailableNow drains on a persistent checkpoint.
    """
    stream = (
        spark.readStream.schema(EVENT_SCHEMA).format(fmt).load(input_dir)
    )
    deduped = stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )

    def merge_batch(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        merge_upsert(batch.sparkSession, target_path, batch, keys=["event_id"])

    (
        deduped.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def latest_state_per_key(
    events: DataFrame, key: str = "user_id", ts_col: str = "ts", id_col: str = "event_id"
) -> DataFrame:
    """Changelog compaction: newest event per key (deterministic
    tiebreak on the event id)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(F.desc(ts_col), F.desc(id_col))
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def windowed_event_counts(
    events: DataFrame, window: str = "1 hour", ts_col: str = "ts"
) -> DataFrame:
    """Tumbling-window aggregation (the streaming analogue of the
    calendar-day rollup; works identically on batch and streams)."""
    return (
        events.groupBy(F.window(ts_col, window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
