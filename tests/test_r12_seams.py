"""Adversarial audit of the r12 lakehouse seams (VERDICT r12 #6) —
the COMPOSED interactions of the newest features, each pinned here
(single-feature behavior is pinned in test_pos_deletes.py /
test_manifest_cdf_source.py / test_generated_columns.py /
test_table_group.py):

  1. positional tombstones x time-travel clone x restore_version;
  2. one CDF stream batch straddling apply_pos_deletes AND a column
     rename (must refuse atomically, emit nothing partial);
  3. group transactions x pending positional deletes on one member
     (mid-group refusal must leave the group read consistent and the
     txn-ledger retry must complete without double-applying);
  4. generated columns x column-mapping renames of their SOURCE
     column x update_where recompute.

Audit notes with the verified-safe reasoning per seam live in
ADVICE.md (r13 audit section)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT
from stripe_data_pipeline_spark import table_group as TG
from stripe_data_pipeline_spark.sources.manifest_cdf_source import (
    register_manifest_cdf_source,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, part string, v double")


def _ids(spark, root, version=None):
    return sorted(
        r.id
        for r in MT.read_table(spark, root, version=version)
        .select("id")
        .collect()
    )


def test_pos_tombstones_x_clone_x_restore(spark, tmp_path):
    """Seam 1. Source lifecycle: v1 data, v2 pending positional
    tombstones, v3 apply, v4 fresh pending tombstones. A TIME-TRAVEL
    clone taken at the pending-tombstone snapshot (v2) must read the
    tombstones applied, materialize them copy-on-write WITHOUT
    touching the source, and the SOURCE must restore back across the
    apply boundary to the pending state — with the restored tombstone
    list still applicable."""
    src = str(tmp_path / "src")
    MT.merge_upsert_atomic(
        spark,
        src,
        _df(spark, [(i, "ab"[i % 2], float(i)) for i in range(8)]),
        keys=["id"],
        partition_by="part",
    )  # v1: {0..7}
    MT.delete_where_pos(spark, src, F.col("id") >= 6)  # v2: pending
    assert _ids(spark, src) == [0, 1, 2, 3, 4, 5]
    MT.apply_pos_deletes(spark, src)  # v3: materialized
    MT.delete_where_pos(spark, src, F.col("id") == 0)  # v4: pending again

    # time-travel clone at the PENDING snapshot v2
    dst = str(tmp_path / "dst")
    assert MT.clone_table(src, dst, version=2) == 2
    assert _ids(spark, dst) == [0, 1, 2, 3, 4, 5]
    # the clone's tombstone rels resolve into the source (absolute)
    assert all(
        os.path.isabs(rel) for rel in MT.read_manifest(dst)["pos_deletes"]
    )
    # materialize INSIDE the clone: copy-on-write, source untouched
    assert MT.apply_pos_deletes(spark, dst) == 2
    assert _ids(spark, dst) == [0, 1, 2, 3, 4, 5]
    assert not MT.read_manifest(dst).get("pos_deletes")
    assert _ids(spark, src) == [1, 2, 3, 4, 5]  # src still at v4 logic

    # restore the SOURCE across the apply boundary, back to pending v2
    MT.restore_version(spark, src, 2)
    m = MT.read_manifest(src)
    assert len(m["pos_deletes"]) == 1  # v2's pending list restored
    assert _ids(spark, src) == [0, 1, 2, 3, 4, 5]
    # ...and the restored tombstones still materialize cleanly
    assert MT.apply_pos_deletes(spark, src) == 2
    assert _ids(spark, src) == [0, 1, 2, 3, 4, 5]


def test_cdf_batch_straddling_apply_and_rename_refuses_atomically(
    spark, tmp_path
):
    """Seam 2. One stream batch spanning [delete_pos, apply, rename]:
    the apply span alone is replayable (zero tasks), but the rename
    changed the logical schema under the stream — planning must
    refuse the WHOLE batch loudly (nothing partial lands in the
    sink), the Delta-CDF stop-the-stream behavior."""
    register_manifest_cdf_source(spark)
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(
        spark,
        root,
        _df(spark, [(i, "ab"[i % 2], float(i)) for i in range(6)]),
        keys=["id"],
        partition_by="part",
    )  # v1
    MT.delete_where_pos(spark, root, F.col("id") == 5)  # v2
    MT.apply_pos_deletes(spark, root)  # v3
    MT.rename_column(spark, root, "v", "val")  # v4

    sink = str(tmp_path / "feed")
    q = (
        spark.readStream.format("manifestcdf")
        .option("path", root)
        .load()
        .writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="changed the table schema"):
        q.awaitTermination()
    # atomic refusal: the sink holds NO partial feed
    assert not [
        f for f in (os.listdir(sink) if os.path.isdir(sink) else [])
        if f.endswith(".parquet")
    ]

    # a stream (re)started AT the post-rename schema replays later
    # merge-on-read DML natively under the renamed logical column
    MT.delete_where_pos(spark, root, F.col("id") == 4)  # v5
    sink2 = str(tmp_path / "feed2")
    (
        spark.readStream.format("manifestcdf")
        .option("path", root)
        .option("startingversion", 5)
        .load()
        .writeStream.format("parquet")
        .option("path", sink2)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    feed = spark.read.parquet(sink2).collect()
    assert [(r.id, r.val, r._change_type, r._commit_version) for r in feed] == [
        (4, 4.0, "delete", 5)
    ]


def test_group_txn_with_pending_pos_member_refuses_then_completes(
    spark, tmp_path
):
    """Seam 3. A group txn whose SECOND member carries pending
    positional tombstones: the member merge refuses mid-group (after
    the first member already committed), the group POINTER must not
    advance — so the group read stays consistent at the old pin —
    and the exactly-once retry after apply_pos_deletes completes the
    group without double-applying the first member."""
    groot = str(tmp_path / "g")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    TG.create_group(groot, {"a": ra, "b": rb})
    b0 = {
        "a": {"updates": _df(spark, [(1, "a", 1.0)]), "keys": ["id"]},
        "b": {"updates": _df(spark, [(1, "a", 1.0)]), "keys": ["id"]},
    }
    TG.group_merge_atomic(spark, groot, b0, txn_app="app", txn_version=1)
    MT.delete_where_pos(spark, rb, F.col("id") == 1)  # pending on b

    b1 = {
        "a": {"updates": _df(spark, [(2, "a", 2.0)]), "keys": ["id"]},
        "b": {"updates": _df(spark, [(2, "a", 2.0)]), "keys": ["id"]},
    }
    with pytest.raises(ValueError, match="positional"):
        TG.group_merge_atomic(spark, groot, b1, txn_app="app", txn_version=2)
    # table a advanced, but the GROUP view did not tear: the pointer
    # still pins a's pre-txn version
    assert _ids(spark, ra) == [1, 2]
    assert sorted(
        r.id for r in TG.read_group_table(spark, groot, "a").collect()
    ) == [1]
    # b's pos delete is TABLE-level and NEWER than the group pin: the
    # group view still shows the pinned pre-delete snapshot — the
    # consistent-cut semantics, not a bug (the delete becomes visible
    # group-side only when a group commit re-pins b)
    assert sorted(
        r.id for r in TG.read_group_table(spark, groot, "b").collect()
    ) == [1]

    MT.apply_pos_deletes(spark, rb)
    TG.group_merge_atomic(spark, groot, b1, txn_app="app", txn_version=2)
    assert _ids(spark, ra) == [1, 2]  # txn ledger skipped the replay
    assert _ids(spark, rb) == [2]
    assert sorted(
        r.id for r in TG.read_group_table(spark, groot, "a").collect()
    ) == [1, 2]
    assert sorted(
        r.id for r in TG.read_group_table(spark, groot, "b").collect()
    ) == [2]


def test_generated_column_x_source_rename_x_update_where(
    spark, tmp_path
):
    """Seam 4. A generated partition column whose SOURCE column is
    renamed (minting a column-mapping entry): the declaration follows
    the rename, a later update_where on the renamed source RECOMPUTES
    the generated value under the mapping, and a merge batch omitting
    the generated column computes + partitions via the rewritten
    expression."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "2024-01-15"), (2, "2024-02-10")], "id long, d string"
    ).select("id", F.col("d").cast("date").alias("d"))
    MT.merge_upsert_atomic(
        spark,
        root,
        df.withColumn("month", F.trunc("d", "month")).withColumn(
            "ym", F.date_format("d", "yyyy-MM")
        ),
        keys=["id"],
        partition_by="month",
    )
    MT.set_generation_expr(spark, root, "month", "trunc(d, 'month')")
    # a second generated column that is NOT the partition key, to pin
    # the update_where recompute path post-rename
    MT.set_generation_expr(
        spark, root, "ym", "date_format(d, 'yyyy-MM')"
    )
    MT.rename_column(spark, root, "d", "event_date")
    gen = MT.read_manifest(root)["generation"]
    assert gen["month"] == "trunc(event_date, 'month')"
    assert gen["ym"] == "date_format(event_date, 'yyyy-MM')"
    # update_where on the renamed source: the PARTITION-feeding set is
    # REFUSED (recomputing could move rows across partitions — the
    # documented guard survives the rename)...
    with pytest.raises(ValueError, match="generated partition column"):
        MT.update_where(
            spark,
            root,
            F.col("id") == 1,
            {"event_date": F.lit("2024-01-31").cast("date")},
        )
    # ...while a non-source update leaves both generated values
    # intact and the NON-partition generated column ym recomputes
    # from the renamed declaration wherever update_where touches rows
    rows = {
        r.id: (str(r.month), r.ym)
        for r in MT.read_table(spark, root).collect()
    }
    assert rows[1] == ("2024-01-01", "2024-01")
    assert rows[2] == ("2024-02-01", "2024-02")
    # a post-rename batch OMITTING month computes + partitions by it
    MT.merge_upsert_atomic(
        spark,
        root,
        spark.createDataFrame([(3, "2024-03-05")], "id long, event_date string")
        .select("id", F.col("event_date").cast("date").alias("event_date")),
        keys=["id"],
        partition_by="month",
    )
    rows = {
        r.id: str(r.month) for r in MT.read_table(spark, root).collect()
    }
    assert rows[3] == "2024-03-01"
    assert set(MT.read_manifest(root)["parts"]) == {
        "2024-01-01", "2024-02-01", "2024-03-01",
    }
