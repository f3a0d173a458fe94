"""Streaming ingestion converges to the batch pipeline's staging
output (batch/stream unification, SURVEY.md §2.10)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.models.staging import stage
from stripe_data_pipeline_spark.sources.fixtures import write_fixture
from stripe_data_pipeline_spark.sources.stripe_schema import INVOICE_SCHEMA
from stripe_data_pipeline_spark.streaming.invoices import stream_invoices_to_staging


def test_stream_matches_batch_staging(spark, tmp_path):
    raw = tmp_path / "raw"
    drop = tmp_path / "drop"
    target = str(tmp_path / "stg_invoices")
    ckpt = str(tmp_path / "ckpt")

    write_fixture(str(raw), n_invoices=25)  # includes duplicate redeliveries
    drop.mkdir()
    shutil.copy(raw / "invoices.json", drop / "day1.json")

    stream_invoices_to_staging(spark, str(drop), target, ckpt)
    streamed = spark.read.parquet(target)

    batch = stage(
        spark.read.schema(INVOICE_SCHEMA).json(str(raw / "invoices.json"))
    ).dropDuplicates(["id"])
    assert streamed.count() == batch.count() == 25
    s_ids = sorted(r["id"] for r in streamed.select("id").collect())
    b_ids = sorted(r["id"] for r in batch.select("id").collect())
    assert s_ids == b_ids
    # P1 derived partition column present and populated
    assert streamed.filter(F.col("created_at_date").isNull()).count() == 0

    # day-2 drop: superset snapshot; only genuinely new ids land
    write_fixture(str(raw), n_invoices=32)
    shutil.copy(raw / "invoices.json", drop / "day2.json")
    stream_invoices_to_staging(spark, str(drop), target, ckpt)
    assert spark.read.parquet(target).count() == 32

    # draining again with nothing new is a no-op (checkpoint + merge)
    stream_invoices_to_staging(spark, str(drop), target, ckpt)
    assert spark.read.parquet(target).count() == 32
