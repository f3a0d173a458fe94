"""Merge-on-read delete invariants (manifest_table.delete_where_mor /
apply_deletes): zero-rewrite commits, read-path anti-join at every
version, the resurrection guard on merge/update, materialization
touching only partitions that hold deleted keys, vacuum safety for
referenced delete files, and clone carrying pending deletes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT


def _mk(spark, root, rows=None):
    rows = rows or [
        (1, "a", 10.0),
        (2, "a", 20.0),
        (3, "b", 30.0),
        (4, "b", 40.0),
        (5, "c", 50.0),
    ]
    df = spark.createDataFrame(rows, "id long, part string, v double")
    MT.merge_upsert_atomic(spark, root, df, keys=["id"], partition_by="part")


def test_mor_delete_rewrites_nothing_and_hides_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    before = MT.read_manifest(root)
    n = MT.delete_where_mor(spark, root, F.col("v") >= 30.0, keys=["id"])
    assert n == 3
    after = MT.read_manifest(root)
    # zero-rewrite: the data parts mapping is IDENTICAL
    assert after["parts"] == before["parts"]
    assert len(after["deletes"]) == 1
    ids = {r["id"] for r in MT.read_table(spark, root).collect()}
    assert ids == {1, 2}
    # time travel to the pre-delete snapshot still sees all rows
    ids_v1 = {
        r["id"] for r in MT.read_table(spark, root, version=1).collect()
    }
    assert ids_v1 == {1, 2, 3, 4, 5}


def test_mor_deletes_accumulate_and_key_mismatch_raises(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    assert MT.delete_where_mor(spark, root, F.col("id") == 1, keys=["id"]) == 1
    assert MT.delete_where_mor(spark, root, F.col("id") == 3, keys=["id"]) == 1
    m = MT.read_manifest(root)
    assert len(m["deletes"]) == 2
    ids = {r["id"] for r in MT.read_table(spark, root).collect()}
    assert ids == {2, 4, 5}
    with pytest.raises(ValueError, match="one key set"):
        MT.delete_where_mor(spark, root, F.col("v") > 0, keys=["part"])
    # an already-hidden row matches nothing: no new commit
    v = int(m["version"])
    assert MT.delete_where_mor(spark, root, F.col("id") == 1, keys=["id"]) == 0
    assert int(MT.read_manifest(root)["version"]) == v


def test_merge_and_update_refuse_pending_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_mor(spark, root, F.col("id") == 2, keys=["id"])
    batch = spark.createDataFrame(
        [(2, "a", 99.0)], "id long, part string, v double"
    )
    with pytest.raises(ValueError, match="pending merge-on-read"):
        MT.merge_upsert_atomic(
            spark, root, batch, keys=["id"], partition_by="part"
        )
    with pytest.raises(ValueError, match="pending merge-on-read"):
        MT.update_where(spark, root, F.col("id") == 1, {"v": F.lit(0.0)})
    # after materialization the same merge succeeds and re-inserts
    assert MT.apply_deletes(spark, root) == 1
    MT.merge_upsert_atomic(
        spark, root, batch, keys=["id"], partition_by="part"
    )
    rows = {r["id"]: r["v"] for r in MT.read_table(spark, root).collect()}
    assert rows[2] == 99.0


def test_apply_deletes_touches_only_hit_partitions(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_mor(spark, root, F.col("part") == "a", keys=["id"])
    before = MT.read_manifest(root)["parts"]
    assert MT.apply_deletes(spark, root) == 2
    m = MT.read_manifest(root)
    assert "deletes" not in m or not m["deletes"]
    # partition a rewritten away entirely (emptied); b and c untouched
    assert "a" not in m["parts"]
    assert m["parts"]["b"] == before["b"]
    assert m["parts"]["c"] == before["c"]
    ids = {r["id"] for r in MT.read_table(spark, root).collect()}
    assert ids == {3, 4, 5}
    assert MT.apply_deletes(spark, root) == 0  # idempotent no-op


def test_vacuum_spares_referenced_delete_files(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_mor(spark, root, F.col("id") == 1, keys=["id"])
    rel = MT.read_manifest(root)["deletes"][0]
    MT.vacuum(root, retain_history=0, grace_sec=0.0)
    assert os.path.isdir(os.path.join(root, rel))
    ids = {r["id"] for r in MT.read_table(spark, root).collect()}
    assert ids == {2, 3, 4, 5}
    MT.apply_deletes(spark, root)
    MT.vacuum(root, retain_history=0, grace_sec=0.0)
    assert not os.path.isdir(os.path.join(root, rel))


def test_clone_carries_pending_deletes(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk(spark, src)
    MT.delete_where_mor(spark, src, F.col("id") <= 2, keys=["id"])
    MT.clone_table(src, dst)
    ids = {r["id"] for r in MT.read_table(spark, dst).collect()}
    assert ids == {3, 4, 5}
    # clone materializes independently; source unchanged
    assert MT.apply_deletes(spark, dst) == 2
    assert len(MT.read_manifest(src)["deletes"]) == 1
    ids_src = {r["id"] for r in MT.read_table(spark, src).collect()}
    assert ids_src == {3, 4, 5}


def test_timestamp_as_of_time_travel(spark, tmp_path):
    import time

    root = str(tmp_path / "t")
    _mk(spark, root)  # v1
    t_between = int(time.time() * 1000)
    time.sleep(0.05)
    batch = spark.createDataFrame(
        [(9, "c", 90.0)], "id long, part string, v double"
    )
    MT.merge_upsert_atomic(
        spark, root, batch, keys=["id"], partition_by="part"
    )  # v2
    ids_then = {
        r["id"]
        for r in MT.read_table(spark, root, as_of_ms=t_between).collect()
    }
    assert ids_then == {1, 2, 3, 4, 5}
    ids_now = {
        r["id"]
        for r in MT.read_table(
            spark, root, as_of_ms=int(time.time() * 1000)
        ).collect()
    }
    assert ids_now == {1, 2, 3, 4, 5, 9}
    hist = MT.history(root)
    assert all(h["committed_at_ms"] is not None for h in hist)
    assert MT.version_as_of(root, t_between) == 1
    with pytest.raises(ValueError, match="no retained commit"):
        MT.version_as_of(root, hist[0]["committed_at_ms"] - 10_000)
    with pytest.raises(ValueError, match="not both"):
        MT.read_table(spark, root, version=1, as_of_ms=t_between)
