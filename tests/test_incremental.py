"""Incremental merge runtime tests — the reference's core guarantee
(README.md:93-129): idempotent reprocessing, key-based upsert,
partition-scoped rewrites."""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.incremental import (
    incremental_merge_run,
    merge_upsert,
    resolve_high_watermark,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "id long, day string, v double")


def _read_sorted(spark, path):
    return [
        (r["id"], r["day"], r["v"])
        for r in spark.read.parquet(path).orderBy("id", "day").collect()
    ]


def test_merge_insert_then_idempotent(spark, tmp_path):
    target = str(tmp_path / "t1")
    batch = _rows(spark, [(1, "a", 1.0), (2, "a", 2.0)])
    merge_upsert(spark, target, batch, keys=["id"])
    assert _read_sorted(spark, target) == [(1, "a", 1.0), (2, "a", 2.0)]
    # reprocessing the same batch changes nothing (MERGE idempotency)
    merge_upsert(spark, target, batch, keys=["id"])
    assert _read_sorted(spark, target) == [(1, "a", 1.0), (2, "a", 2.0)]


def test_merge_updates_matched_rows(spark, tmp_path):
    target = str(tmp_path / "t2")
    merge_upsert(spark, target, _rows(spark, [(1, "a", 1.0), (2, "a", 2.0)]), ["id"])
    merge_upsert(spark, target, _rows(spark, [(2, "a", 20.0), (3, "b", 3.0)]), ["id"])
    assert _read_sorted(spark, target) == [(1, "a", 1.0), (2, "a", 20.0), (3, "b", 3.0)]


def test_partitioned_merge_rewrites_only_touched_partitions(spark, tmp_path):
    target = str(tmp_path / "t3")
    base = _rows(spark, [(1, "a", 1.0), (2, "b", 2.0), (3, "b", 3.0)])
    merge_upsert(spark, target, base, keys=["id"], partition_by="day")
    upd = _rows(spark, [(3, "b", 30.0), (4, "c", 4.0)])
    merge_upsert(spark, target, upd, keys=["id"], partition_by="day")
    assert _read_sorted(spark, target) == [
        (1, "a", 1.0),
        (2, "b", 2.0),
        (3, "b", 30.0),
        (4, "c", 4.0),
    ]


def test_composite_key_merge(spark, tmp_path):
    # deferred_revenue.sql:3 uses unique_key=[line_item_id, as_of_date]
    target = str(tmp_path / "t4")
    merge_upsert(spark, target, _rows(spark, [(1, "a", 1.0), (1, "b", 2.0)]), ["id", "day"])
    merge_upsert(spark, target, _rows(spark, [(1, "b", 20.0)]), ["id", "day"])
    assert _read_sorted(spark, target) == [(1, "a", 1.0), (1, "b", 20.0)]


def test_partitioned_merge_moves_key_across_partitions(spark, tmp_path):
    # An update that changes a key's partition value must displace the
    # stale row from its old partition — the reference's MERGE matches
    # unique_key globally, not per-partition.
    target = str(tmp_path / "t6")
    base = _rows(spark, [(1, "a", 1.0), (2, "b", 2.0)])
    merge_upsert(spark, target, base, keys=["id"], partition_by="day")
    moved = _rows(spark, [(1, "c", 10.0)])  # id=1 moves day a -> c
    merge_upsert(spark, target, moved, keys=["id"], partition_by="day")
    assert _read_sorted(spark, target) == [(1, "c", 10.0), (2, "b", 2.0)]
    # the emptied partition directory is gone, not just empty
    assert not (tmp_path / "t6" / "day=a").exists()


def test_partitioned_merge_null_partition_value(spark, tmp_path):
    target = str(tmp_path / "t7")
    base = spark.createDataFrame(
        [(1, None, 1.0), (2, "b", 2.0)], "id long, day string, v double"
    )
    merge_upsert(spark, target, base, keys=["id"], partition_by="day")
    upd = spark.createDataFrame([(1, None, 10.0)], "id long, day string, v double")
    merge_upsert(spark, target, upd, keys=["id"], partition_by="day")
    assert _read_sorted(spark, target) == [(1, None, 10.0), (2, "b", 2.0)]


def test_partitioned_merge_escaped_partition_values(spark, tmp_path):
    # Spark percent-escapes special chars in partition DIR names
    # (':' -> %3A etc.); reconstructing dirs from str(value) would miss
    # the staged dir and silently drop the new partition data. The merge
    # must move what Spark actually wrote and still purge emptied dirs.
    target = str(tmp_path / "t8")
    base = _rows(spark, [(1, "shard:a", 1.0), (2, "shard:b", 2.0)])
    merge_upsert(spark, target, base, keys=["id"], partition_by="day")
    assert (tmp_path / "t8" / "day=shard%3Aa").exists()
    # update inside an escaped partition
    upd = _rows(spark, [(1, "shard:a", 10.0)])
    merge_upsert(spark, target, upd, keys=["id"], partition_by="day")
    assert _read_sorted(spark, target) == [
        (1, "shard:a", 10.0),
        (2, "shard:b", 2.0),
    ]
    # move a key OUT of an escaped partition: stale dir must be purged
    moved = _rows(spark, [(1, "shard:c", 100.0)])
    merge_upsert(spark, target, moved, keys=["id"], partition_by="day")
    assert _read_sorted(spark, target) == [
        (1, "shard:c", 100.0),
        (2, "shard:b", 2.0),
    ]
    assert not (tmp_path / "t8" / "day=shard%3Aa").exists()


def test_high_watermark_run(spark, tmp_path):
    target = str(tmp_path / "t5")
    src1 = _rows(spark, [(1, "a", 1.0), (2, "a", 2.0)])
    assert resolve_high_watermark(spark, target, "id") is None
    n = incremental_merge_run(spark, src1, target, keys=["id"], cursor_col="id")
    assert n == 2
    # second run over the same source: nothing past the watermark
    n = incremental_merge_run(spark, src1, target, keys=["id"], cursor_col="id")
    assert n == 0
    # new rows past the watermark flow through
    src2 = src1.unionAll(_rows(spark, [(5, "b", 5.0)]))
    n = incremental_merge_run(spark, src2, target, keys=["id"], cursor_col="id")
    assert n == 1
    assert _read_sorted(spark, target) == [(1, "a", 1.0), (2, "a", 2.0), (5, "b", 5.0)]
