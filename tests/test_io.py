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


def test_compact_table_preserves_content_and_reduces_files(spark, tmp_path):
    import glob
    import os

    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.io import compact_table

    path = str(tmp_path / "frag")
    # simulate many micro-batch appends -> many small files
    for i in range(6):
        spark.range(i * 100, (i + 1) * 100).withColumn(
            "v", F.col("id") * 2
        ).write.mode("append").parquet(path)
    before_files = len(glob.glob(os.path.join(path, "*.parquet")))
    assert before_files >= 6
    before = {(r["id"], r["v"]) for r in spark.read.parquet(path).collect()}

    n_files = compact_table(spark, path, target_rows_per_file=300, cluster_by="id")
    after_files = len(glob.glob(os.path.join(path, "*.parquet")))
    assert n_files == 2 and after_files == 2  # ceil(600/300)
    after_rows = spark.read.parquet(path).collect()
    assert {(r["id"], r["v"]) for r in after_rows} == before
    # clustering restored: each file internally sorted by id
    import pandas as pd

    for f in glob.glob(os.path.join(path, "*.parquet")):
        ids = pd.read_parquet(f)["id"].tolist()
        assert ids == sorted(ids)


def test_json_quarantine_splits_good_and_malformed(spark, tmp_path):
    """Schema-drift quarantine: malformed NDJSON lines land in the
    quarantine relation with their raw text; good lines parse under
    the declared schema; nothing is silently dropped."""
    from pyspark.sql import types as T

    from stripe_data_pipeline_spark.io import read_json_with_quarantine

    p = tmp_path / "drop.json"
    p.write_text(
        '{"id": "a", "created": 100}\n'
        "this is not json at all\n"
        '{"id": "b", "created": 200}\n'
        '{"id": "c", "created": }\n'  # truncated value
    )
    schema = T.StructType(
        [
            T.StructField("id", T.StringType()),
            T.StructField("created", T.LongType()),
        ]
    )
    good, quarantine = read_json_with_quarantine(spark, str(p), schema)
    assert sorted((r["id"], r["created"]) for r in good.collect()) == [
        ("a", 100),
        ("b", 200),
    ]
    bad = quarantine.collect()
    assert len(bad) == 2
    assert {r["raw_record"] for r in bad} == {
        "this is not json at all",
        '{"id": "c", "created": }',
    }
    assert all(r["source_file"].endswith("drop.json") for r in bad)
    assert good.columns == ["id", "created"]  # corrupt col dropped


def test_csv_roundtrip_hostile_values_and_testdata(spark, sf_dir, tmp_path):
    """CSV source/sink (r12): the pinned RFC 4180 dialect round-trips
    bit-exactly — embedded delimiters/quotes/newlines, NULL vs empty
    string, timestamps to the microsecond — and a real testdata table
    survives a parquet -> CSV -> DataFrame trip with zero diff."""
    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.io import read_csv, read_table, write_csv

    hostile = spark.createDataFrame(
        [
            (1, 'comma, "quoted", done', 1.5),
            (2, "line\nbreak", -0.25),
            (3, None, None),
            (4, "", 0.0),
            (5, "\\N literal backslash-N", 2.0),
        ],
        "id long, s string, v double",
    )
    p = str(tmp_path / "hostile")
    write_csv(hostile, p)
    back = read_csv(spark, p, hostile.schema)
    assert back.exceptAll(hostile).count() == 0
    assert hostile.exceptAll(back).count() == 0
    r3 = back.filter("id = 3").collect()[0]
    r4 = back.filter("id = 4").collect()[0]
    assert r3["s"] is None and r4["s"] == ""  # NULL vs '' preserved

    ev = read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    )
    p2 = str(tmp_path / "events_csv")
    write_csv(ev, p2)
    back2 = read_csv(spark, p2, ev.schema)
    assert back2.exceptAll(ev).count() == 0
    assert ev.exceptAll(back2).count() == 0
