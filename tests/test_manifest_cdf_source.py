"""Streaming change-feed source (sources/manifest_cdf_source.py):
per-version parity with batch read_changes, resume-at-offset, NATIVE
merge-on-read DML replay (delete_where_mor / delete_where_pos spans
emit the deleted rows; apply spans contribute zero tasks), and the
fail-loudly guards (schema change, rewrites under pending tombstones,
unreplayable tombstone transitions)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT
from stripe_data_pipeline_spark.sources.manifest_cdf_source import (
    ManifestCdfStreamReader,
    register_manifest_cdf_source,
)


def _mk_table(spark, tmp_path) -> str:
    root = str(tmp_path / "t")
    v1 = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", 2.0), (3, "b", 3.0)],
        "id long, part string, v double",
    )
    MT.merge_upsert_atomic(spark, root, v1, keys=["id"], partition_by="part")
    v2 = spark.createDataFrame(
        [(2, "b", 20.0), (4, "a", 4.0)], "id long, part string, v double"
    )
    MT.merge_upsert_atomic(spark, root, v2, keys=["id"], partition_by="part")
    MT.delete_where(spark, root, F.col("id") == 1)  # v3
    return root


def _drain(spark, root, tmp_path, tag, **opts) -> "DataFrame":
    sink = str(tmp_path / f"feed_{tag}")
    reader = spark.readStream.format("manifestcdf").option("path", root)
    for k, v in opts.items():
        reader = reader.option(k, v)
    (
        reader.load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / f"ck_{tag}"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.read.parquet(sink)


def test_feed_matches_batch_read_changes_per_version(spark, tmp_path):
    root = _mk_table(spark, tmp_path)
    register_manifest_cdf_source(spark)
    feed = _drain(spark, root, tmp_path, "all")
    assert feed.count() == 7  # 3 inserts, update pair, 1 delete
    for v in (2, 3):
        batch = MT.read_changes(
            spark, root, from_version=v - 1, to_version=v
        ).withColumn("_commit_version", F.lit(v).cast("long"))
        got = feed.filter(F.col("_commit_version") == v).select(*batch.columns)
        assert got.exceptAll(batch).count() == 0
        assert batch.exceptAll(got).count() == 0
    # startingVersion skips already-consumed history
    tail = _drain(spark, root, tmp_path, "tail", startingVersion="3")
    assert {
        (r["id"], r["_change_type"], r["_commit_version"])
        for r in tail.collect()
    } == {(1, "delete", 3)}


def test_schema_change_fails_loudly_and_eq_delete_streams_natively(
    spark, tmp_path
):
    root = _mk_table(spark, tmp_path)
    # schema change under the stream: the reader's declared schema is
    # the v3 logical one; an added column must stop the plan
    MT.merge_upsert_atomic(
        spark,
        root,
        spark.createDataFrame([(9, "a", 9.0, "x")],
                              "id long, part string, v double, extra string"),
        keys=["id"],
        partition_by="part",
    )
    from pyspark.sql import types as T

    old_schema = T.StructType.fromJson(
        __import__("json").loads(MT.read_manifest(root, 3)["schema"])
    ).add("_change_type", T.StringType()).add("_commit_version", T.LongType())
    r = ManifestCdfStreamReader(old_schema, {"path": root})
    with pytest.raises(ValueError, match="changed the table schema"):
        r.partitions({"version": 3}, {"version": 4})
    # an equality MOR commit streams NATIVELY: the span emits exactly
    # the deleted rows, matching batch read_changes
    MT.delete_where_mor(spark, root, F.col("id") == 2, keys=["id"])  # v5
    cur = T.StructType.fromJson(
        __import__("json").loads(MT.read_manifest(root)["schema"])
    ).add("_change_type", T.StringType()).add("_commit_version", T.LongType())
    r2 = ManifestCdfStreamReader(cur, {"path": root})
    parts = r2.partitions({"version": 4}, {"version": 5})
    rows = [t for p in parts for t in r2.read(p)]
    # id=2 lives in part b after the v2 update: one delete row
    assert len(rows) == 1
    got = dict(zip([f.name for f in cur.fields], rows[0]))
    assert (got["id"], got["_change_type"], got["_commit_version"]) == (
        2, "delete", 5,
    )
    # apply_deletes: physical rewrite of logically-dead rows -> the
    # span plans ZERO tasks (batch read_changes is empty for it too)
    MT.apply_deletes(spark, root)  # v6
    assert r2.partitions({"version": 5}, {"version": 6}) == []


def test_vacuumed_span_fails_loudly_not_silently_empty(spark, tmp_path):
    """A consumer resuming below the vacuum horizon must get a clear
    error (its span's manifests are gone), never a silently empty
    batch — silent gaps in a change feed are data loss."""
    root = _mk_table(spark, tmp_path)
    from pyspark.sql import types as T

    MT.vacuum(root, retain_history=0, grace_sec=0.0)  # history reaped
    schema = T.StructType.fromJson(
        __import__("json").loads(MT.read_manifest(root)["schema"])
    ).add("_change_type", T.StringType()).add("_commit_version", T.LongType())
    r = ManifestCdfStreamReader(schema, {"path": root})
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        r.partitions({"version": 1}, {"version": 3})


def test_rename_under_the_stream_stops_loudly(spark, tmp_path):
    """A metadata-only rename changes the logical name set, so a
    stream declared under the old schema must stop with the
    schema-change error (restart picks up the new names), never emit
    rows under stale column names."""
    root = _mk_table(spark, tmp_path)
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(
        __import__("json").loads(MT.read_manifest(root)["schema"])
    ).add("_change_type", T.StringType()).add("_commit_version", T.LongType())
    MT.rename_column(spark, root, "v", "value_usd")  # v4
    r = ManifestCdfStreamReader(schema, {"path": root})
    with pytest.raises(ValueError, match="changed the table schema"):
        r.partitions({"version": 3}, {"version": 4})


def test_cdf_feed_maintains_downstream_aggregate(spark, tmp_path):
    """The canonical CDF consumer: a downstream SUM-per-group mart
    maintained INCREMENTALLY from the feed (insert rows add, delete
    rows subtract — update pairs net out), never rescanning the
    source. After draining all versions the derived mart must equal
    the batch aggregate of the current snapshot."""
    root = _mk_table(spark, tmp_path)  # v1 inserts, v2 update+insert, v3 delete
    register_manifest_cdf_source(spark)
    agg: dict = {}

    def fold(batch, _id):
        for r in batch.collect():  # bounded: per-batch change rows
            sign = 1 if r["_change_type"] == "insert" else -1
            agg[r["part"]] = agg.get(r["part"], 0.0) + sign * r["v"]

    (
        spark.readStream.format("manifestcdf")
        .option("path", root)
        .load()
        .writeStream.foreachBatch(fold)
        .option("checkpointLocation", str(tmp_path / "ck_agg"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    batch = {
        r["part"]: r["s"]
        for r in MT.read_table(spark, root)
        .groupBy("part")
        .agg(F.sum("v").alias("s"))
        .collect()
    }
    got = {k: v for k, v in agg.items() if abs(v) > 1e-9}
    assert got == batch


def test_pos_delete_streams_natively_across_the_full_lifecycle(
    spark, tmp_path
):
    """A delete_where_pos commit (zero parts-diff) streams NATIVELY:
    the span's tasks pyarrow-take exactly the tombstoned coordinates
    — only for the dirs they touch — and emit them as delete rows;
    the later apply_pos_deletes span plans ZERO tasks; an end-to-end
    drain across the whole lifecycle bit-matches batch read_changes;
    and the downstream stream keeps flowing through DML with no
    restart."""
    root = _mk_table(spark, tmp_path)
    from pyspark.sql import types as T

    MT.delete_where_pos(spark, root, F.col("id") == 2)  # v4
    schema = T.StructType.fromJson(
        __import__("json").loads(MT.read_manifest(root)["schema"])
    ).add("_change_type", T.StringType()).add("_commit_version", T.LongType())
    r = ManifestCdfStreamReader(schema, {"path": root})
    parts = r.partitions({"version": 3}, {"version": 4})
    # id=2 lives only in part b (after the v2 update): exactly one
    # dir task, not one per dir
    assert len(parts) == 1
    rows = [t for p in parts for t in r.read(p)]
    assert len(rows) == 1
    got = dict(zip([f.name for f in schema.fields], rows[0]))
    assert (got["id"], got["v"], got["_change_type"]) == (2, 20.0, "delete")
    MT.apply_pos_deletes(spark, root)  # v5: zero tasks
    assert r.partitions({"version": 4}, {"version": 5}) == []
    # ...and the stream keeps flowing through a later ordinary merge
    MT.merge_upsert_atomic(
        spark,
        root,
        spark.createDataFrame(
            [(77, "a", 7.0)], "id long, part string, v double"
        ),
        keys=["id"],
        partition_by="part",
    )  # v6
    assert r.partitions({"version": 5}, {"version": 6})
    # end-to-end drain parity with batch read_changes per version
    register_manifest_cdf_source(spark)
    feed = _drain(spark, root, tmp_path, "poslife")
    for v in (4, 5, 6):
        batch = MT.read_changes(
            spark, root, from_version=v - 1, to_version=v
        ).withColumn("_commit_version", F.lit(v).cast("long"))
        got_v = feed.filter(F.col("_commit_version") == v).select(
            *batch.columns
        )
        assert got_v.exceptAll(batch).count() == 0
        assert batch.exceptAll(got_v).count() == 0


def test_rewrite_under_pending_tombstones_refuses(spark, tmp_path):
    """delete_where (CoW) is a legal WRITE under pending positional
    tombstones, but the STREAM cannot replay a raw per-dir diff of it
    (rows already logically dead would double-count) — that span must
    refuse, batch read_changes remains the documented path."""
    root = _mk_table(spark, tmp_path)
    from pyspark.sql import types as T

    MT.delete_where_pos(spark, root, F.col("id") == 2)  # v4: native
    MT.delete_where(spark, root, F.col("id") == 3)  # v5: CoW rewrite
    schema = T.StructType.fromJson(
        __import__("json").loads(MT.read_manifest(root)["schema"])
    ).add("_change_type", T.StringType()).add("_commit_version", T.LongType())
    r = ManifestCdfStreamReader(schema, {"path": root})
    assert r.partitions({"version": 3}, {"version": 4})  # native DML
    with pytest.raises(ValueError, match="rewrites data dirs"):
        r.partitions({"version": 4}, {"version": 5})
