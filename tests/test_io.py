"""IO layer: NDJSON sink/scan round-trip (S3/S4) and partitioned +
clustered writes (S7/S8/S9)."""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark import io as eio


def test_ndjson_roundtrip_overwrite(spark, tmp_path):
    path = str(tmp_path / "drop")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    eio.write_ndjson(df, path)
    back = eio.read_json(spark, path)
    assert sorted((r["id"], r["v"]) for r in back.collect()) == [(1, "a"), (2, "b")]
    # S3 semantics: a second write fully replaces the drop
    eio.write_ndjson(spark.createDataFrame([(9, "z")], "id long, v string"), path)
    spark.catalog.refreshByPath(path)
    assert [(r["id"], r["v"]) for r in eio.read_json(spark, path).collect()] == [
        (9, "z")
    ]


def test_partitioned_clustered_write(spark, sf_dir, tmp_path):
    path = str(tmp_path / "orders_part")
    df = eio.read_table(spark, sf_dir, "orders").withColumn(
        "order_date", F.to_date("o_orderdate")
    )
    eio.write_table(
        df, path, partition_by="o_orderstatus", cluster_by="o_custkey"
    )
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    # partition pruning: filtering the partition col scans one dir
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
