"""CHECK constraints on the manifest table (the Delta ``ALTER TABLE
... ADD CONSTRAINT ... CHECK`` shape): add-time full validation,
pre-commit batch validation on merge and update (violations fail
atomically, table unchanged), NULL-passes SQL semantics, carry-through
across every derived commit, and clone transfer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT


def _mk(spark, root):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, part string, v double",
    )
    MT.merge_upsert_atomic(spark, root, df, keys=["id"], partition_by="part")


def test_add_constraint_validates_current_table(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    with pytest.raises(ValueError, match="violate CHECK constraint"):
        MT.add_constraint(spark, root, "v_big", "v >= 15.0")  # id=1 fails
    assert "constraints" not in (MT.read_manifest(root) or {})
    MT.add_constraint(spark, root, "v_pos", "v > 0.0")
    m = MT.read_manifest(root)
    assert m["constraints"] == {"v_pos": "v > 0.0"}
    with pytest.raises(ValueError, match="already exists"):
        MT.add_constraint(spark, root, "v_pos", "v > 1.0")


def test_merge_refuses_violating_batch_atomically(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.add_constraint(spark, root, "v_pos", "v > 0.0")
    v = int(MT.read_manifest(root)["version"])
    bad = spark.createDataFrame(
        [(9, "a", -1.0)], "id long, part string, v double"
    )
    with pytest.raises(ValueError, match="v_pos"):
        MT.merge_upsert_atomic(spark, root, bad, keys=["id"], partition_by="part")
    m = MT.read_manifest(root)
    assert int(m["version"]) == v  # nothing committed
    assert {r["id"] for r in MT.read_table(spark, root).collect()} == {1, 2, 3}
    good = spark.createDataFrame(
        [(9, "a", 1.0)], "id long, part string, v double"
    )
    MT.merge_upsert_atomic(spark, root, good, keys=["id"], partition_by="part")
    assert 9 in {r["id"] for r in MT.read_table(spark, root).collect()}


def test_update_refuses_violating_set(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.add_constraint(spark, root, "v_pos", "v > 0.0")
    v = int(MT.read_manifest(root)["version"])
    with pytest.raises(ValueError, match="v_pos"):
        MT.update_where(spark, root, F.col("id") == 1, {"v": F.lit(-5.0)})
    assert int(MT.read_manifest(root)["version"]) == v
    assert MT.update_where(spark, root, F.col("id") == 1, {"v": F.lit(5.0)}) == 1


def test_null_passes_check_semantics(spark, tmp_path):
    """Standard SQL CHECK: NULL is not a violation — only FALSE is."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.add_constraint(spark, root, "v_pos", "v > 0.0")
    nullish = spark.createDataFrame(
        [(7, "b", None)], "id long, part string, v double"
    )
    MT.merge_upsert_atomic(spark, root, nullish, keys=["id"], partition_by="part")
    assert 7 in {r["id"] for r in MT.read_table(spark, root).collect()}


def test_constraints_survive_derived_commits_and_drop(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.add_constraint(spark, root, "v_pos", "v > 0.0")
    MT.compact_partition(spark, root, "a")
    MT.delete_where(spark, root, F.col("id") == 2)
    MT.delete_partitions(spark, root, ["b"])
    MT.delete_where_mor(spark, root, F.col("id") == 1, keys=["id"])
    MT.apply_deletes(spark, root)
    m = MT.read_manifest(root)
    assert m["constraints"] == {"v_pos": "v > 0.0"}
    # still enforced after the whole derived-commit chain
    bad = spark.createDataFrame(
        [(8, "a", -1.0)], "id long, part string, v double"
    )
    with pytest.raises(ValueError, match="v_pos"):
        MT.merge_upsert_atomic(spark, root, bad, keys=["id"], partition_by="part")
    MT.drop_constraint(root, "v_pos")
    assert "constraints" not in MT.read_manifest(root)
    MT.merge_upsert_atomic(spark, root, bad, keys=["id"], partition_by="part")
    with pytest.raises(KeyError):
        MT.drop_constraint(root, "nope")


def test_clone_carries_constraints(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    _mk(spark, src)
    MT.add_constraint(spark, src, "v_pos", "v > 0.0")
    MT.clone_table(src, dst)
    assert MT.read_manifest(dst)["constraints"] == {"v_pos": "v > 0.0"}
    bad = spark.createDataFrame(
        [(8, "a", -1.0)], "id long, part string, v double"
    )
    with pytest.raises(ValueError, match="v_pos"):
        MT.merge_upsert_atomic(spark, dst, bad, keys=["id"], partition_by="part")


def test_maintain_cluster_by_yields_file_skipping(spark, tmp_path):
    """maintain(cluster_by=...) — the OPTIMIZE ... ORDER/ZORDER BY
    shape: after the pass, per-file [min,max] ranges on the cluster
    key are disjoint and a stats_filter point read resolves to ONE
    file; rows are unchanged."""
    root = str(tmp_path / "t")
    # shuffled key so arrival order anti-correlates with ts
    rows = [(i, "a", float((i * 37) % 1000)) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "id long, part string, ts double")
    MT.merge_upsert_atomic(
        spark, root, df.repartition(8), keys=["id"], partition_by="part",
        stats_cols=["ts"],
    )
    before = {r["id"] for r in MT.read_table(spark, root).collect()}
    out = MT.maintain(
        spark, root, target_rows_per_file=100, cluster_by=["ts"],
        retain_history=0, grace_sec=0.0,
    )
    assert out["compacted"] == ["a"]
    m = MT.read_manifest(root)
    per_file = m["file_stats"]["a"]
    assert len(per_file) >= 3  # 400 rows / 100 per file
    ranges = sorted(st["ts"] for st in per_file.values())
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, "clustered file ranges overlap"
    # point predicate reads exactly one file
    probe = MT.read_table(spark, root, stats_filter={"ts": (37.0, 37.0)})
    assert len(probe.inputFiles()) == 1
    assert {r["id"] for r in MT.read_table(spark, root).collect()} == before


def test_cluster_by_preserves_constraints_and_mor(spark, tmp_path):
    """The clustering rewrite is just another compaction commit: the
    constraint set and pending MOR deletes must both ride along."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.add_constraint(spark, root, "v_pos", "v > 0.0")
    MT.delete_where_mor(spark, root, F.col("id") == 2, keys=["id"])
    MT.maintain(spark, root, cluster_by=["v"], retain_history=0,
                grace_sec=0.0)
    m = MT.read_manifest(root)
    assert m["constraints"] == {"v_pos": "v > 0.0"}
    assert len(m["deletes"]) == 1
    assert {r["id"] for r in MT.read_table(spark, root).collect()} == {1, 3}
