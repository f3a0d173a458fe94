"""GENERATED ALWAYS AS columns (manifest_table.set_generation_expr —
the Delta generated-columns shape): declaration validates existing
rows, merges compute omitted columns and refuse conflicting supplied
values, update_where recomputes from post-SET sources and refuses
direct SETs, the canonical derived-partition-column flow works end to
end, declarations follow renames and survive derived commits, and the
in-lock TOCTOU guard refuses a merge racing a declaration change."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT


def _mk(spark, root):
    df = spark.createDataFrame(
        [
            (1, "2024-01-05", 10.0),
            (2, "2024-01-20", 20.0),
            (3, "2024-02-03", 30.0),
        ],
        "id long, d string, v double",
    ).select(
        "id",
        F.col("d").cast("date").alias("d"),
        "v",
        F.date_trunc("month", F.col("d").cast("date"))
        .cast("date")
        .alias("month"),
    )
    MT.merge_upsert_atomic(spark, root, df, keys=["id"], partition_by="month")
    MT.set_generation_expr(
        spark, root, "month", "CAST(date_trunc('month', d) AS DATE)"
    )


def test_merge_computes_omitted_generated_column(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    batch = spark.createDataFrame(
        [(4, "2024-03-15", 40.0)], "id long, d string, v double"
    ).select("id", F.col("d").cast("date").alias("d"), "v")
    MT.merge_upsert_atomic(spark, root, batch, keys=["id"], partition_by="month")
    rows = {
        (r["id"], str(r["month"]))
        for r in MT.read_table(spark, root).collect()
    }
    assert (4, "2024-03-01") in rows
    assert "2024-03-01" in MT.read_manifest(root)["parts"]


def test_merge_refuses_conflicting_supplied_value(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    bad = spark.createDataFrame(
        [(5, "2024-03-15", 50.0, "1999-01-01")],
        "id long, d string, v double, month string",
    ).select(
        "id",
        F.col("d").cast("date").alias("d"),
        "v",
        F.col("month").cast("date").alias("month"),
    )
    v = int(MT.read_manifest(root)["version"])
    with pytest.raises(ValueError, match="GENERATED ALWAYS AS"):
        MT.merge_upsert_atomic(spark, root, bad, keys=["id"], partition_by="month")
    assert int(MT.read_manifest(root)["version"]) == v  # nothing committed
    # a batch supplying the MATCHING value is accepted (Delta rule)
    ok = bad.withColumn(
        "month", F.expr("CAST(date_trunc('month', d) AS DATE)")
    )
    MT.merge_upsert_atomic(spark, root, ok, keys=["id"], partition_by="month")
    assert MT.read_table(spark, root).filter("id = 5").count() == 1


def test_declaration_validates_existing_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 10.0, 99.0)], "id long, v double, doubled double"
    )
    MT.merge_upsert_atomic(spark, root, df, keys=["id"])
    with pytest.raises(ValueError, match="existing rows violate"):
        MT.set_generation_expr(spark, root, "doubled", "v * 2")
    with pytest.raises(KeyError):
        MT.set_generation_expr(spark, root, "nope", "v * 2")
    with pytest.raises(ValueError, match="references itself"):
        MT.set_generation_expr(spark, root, "doubled", "doubled + 0")


def test_update_where_recomputes_and_refuses_direct_set(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10.0, 20.0)], "id long, v double, doubled double")
    MT.merge_upsert_atomic(spark, root, df, keys=["id"])
    MT.set_generation_expr(spark, root, "doubled", "v * 2")
    with pytest.raises(ValueError, match="GENERATED"):
        MT.update_where(spark, root, F.col("id") == 1, {"doubled": F.lit(0.0)})
    MT.update_where(spark, root, F.col("id") == 1, {"v": F.lit(50.0)})
    r = MT.read_table(spark, root).collect()[0]
    assert (r["v"], r["doubled"]) == (50.0, 100.0)  # recomputed
    # updating a source of a generated PARTITION column is refused
    root2 = str(tmp_path / "t2")
    _mk(spark, root2)
    with pytest.raises(ValueError, match="move rows across partitions"):
        MT.update_where(
            spark, root2, F.col("id") == 1,
            {"d": F.lit("2025-06-06").cast("date")},
        )


def test_declaration_follows_rename_and_survives_commits(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.rename_column(spark, root, "d", "event_date")
    gen = MT.read_manifest(root)["generation"]
    assert gen == {"month": "CAST(date_trunc('month', event_date) AS DATE)"}
    # renaming the generated column itself moves the key
    MT.rename_column(spark, root, "month", "event_month")
    gen = MT.read_manifest(root)["generation"]
    assert list(gen) == ["event_month"]
    # merges under the renamed declaration still compute it
    batch = spark.createDataFrame(
        [(9, "2024-04-09", 90.0)], "id long, event_date string, v double"
    ).select(
        "id", F.col("event_date").cast("date").alias("event_date"), "v"
    )
    MT.merge_upsert_atomic(
        spark, root, batch, keys=["id"], partition_by="event_month"
    )
    assert "2024-04-01" in MT.read_manifest(root)["parts"]
    # derived commits carry the declaration
    MT.compact_partition(spark, root, "2024-04-01")
    MT.add_constraint(spark, root, "v_pos", "v > 0")
    assert list(MT.read_manifest(root)["generation"]) == ["event_month"]
    # dropping a source column is refused; dropping the generated
    # column drops the declaration
    with pytest.raises(ValueError, match="drop_generation_expr"):
        MT.drop_column(spark, root, "event_date")
    MT.drop_generation_expr(root, "event_month")
    assert "generation" not in MT.read_manifest(root)


def test_occ_merge_refuses_racing_declaration_change(
    spark, tmp_path, monkeypatch
):
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 10.0, 20.0)], "id long, v double, doubled double")
    MT.merge_upsert_atomic(spark, root, df, keys=["id"])
    real_lock = MT._writer_lock
    fired = {"done": False}

    def racing_lock(r, *a, **kw):
        if not fired["done"]:
            fired["done"] = True
            MT.set_generation_expr(spark, root, "doubled", "v * 2")
        return real_lock(r, *a, **kw)

    batch = spark.createDataFrame([(2, 5.0, 10.0)], "id long, v double, doubled double")
    monkeypatch.setattr(MT, "_writer_lock", racing_lock)
    with pytest.raises(ValueError, match="generation expressions changed"):
        MT.merge_upsert_atomic(
            spark, root, batch, keys=["id"], concurrency="occ"
        )
    monkeypatch.undo()
    # retried against the fresh declaration it lands
    MT.merge_upsert_atomic(spark, root, batch, keys=["id"])
    assert MT.read_table(spark, root).count() == 2


def test_streaming_ingest_into_generated_partition_mart(spark, tmp_path):
    """The canonical streaming-ingest composition: foreachBatch merges
    into a mart whose partition column is GENERATED — every
    micro-batch omits the column, the declaration computes and
    partitions it identically, and the txn ledger keeps re-delivered
    epochs exactly-once. No writer can mis-partition the mart."""
    import os

    src = str(tmp_path / "src")
    rows = spark.createDataFrame(
        [(i, f"2024-0{1 + i % 3}-1{i % 9}", float(i)) for i in range(30)],
        "id long, d string, v double",
    ).select("id", F.col("d").cast("date").alias("d"), "v")
    rows.repartition(3).write.parquet(src)
    mart = str(tmp_path / "mart")
    seed = rows.limit(1).withColumn(
        "month", F.expr("CAST(date_trunc('MONTH', d) AS DATE)")
    )
    MT.merge_upsert_atomic(spark, mart, seed, keys=["id"], partition_by="month")
    MT.set_generation_expr(
        spark, mart, "month", "CAST(date_trunc('MONTH', d) AS DATE)"
    )

    def sink(batch, epoch_id):
        MT.merge_upsert_atomic(
            spark, mart, batch, keys=["id"], partition_by="month",
            txn_app="gen_ingest", txn_version=epoch_id,
        )

    (
        spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    got = MT.read_table(spark, mart)
    assert got.count() == 30
    assert (
        got.filter(
            F.col("month") != F.expr("CAST(date_trunc('MONTH', d) AS DATE)")
        ).count()
        == 0
    )
    assert {"2024-01-01", "2024-02-01", "2024-03-01"} <= set(
        MT.read_manifest(mart)["parts"]
    )
    # the declaration travels with a zero-copy clone
    dst = str(tmp_path / "clone")
    MT.clone_table(mart, dst)
    assert MT.read_manifest(dst)["generation"] == {
        "month": "CAST(date_trunc('MONTH', d) AS DATE)"
    }
