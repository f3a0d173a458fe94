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


def test_locked_merge_revalidates_raced_constraint(spark, tmp_path):
    """ADVICE r10 (medium): a constraint added between the entry
    pre-check (unlocked) and the locked commit was never enforced on
    the batch. The in-lock delta re-validation must refuse it. Driven
    at the locked helper with a stale validated set — exactly the
    state the race produces."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.add_constraint(spark, root, "v_pos", "v > 0.0")
    v = int(MT.read_manifest(root)["version"])
    bad = spark.createDataFrame(
        [(9, "a", -1.0)], "id long, part string, v double"
    )
    with pytest.raises(ValueError, match="v_pos"), MT._writer_lock(root):
        MT._merge_upsert_atomic_locked(
            spark, root, bad, keys=["id"], partition_by="part",
            validated_constraints={},  # the pre-check saw no constraints
        )
    assert int(MT.read_manifest(root)["version"]) == v
    assert {r["id"] for r in MT.read_table(spark, root).collect()} == {1, 2, 3}


def test_occ_merge_refuses_constraint_raced_in_after_staging(spark, tmp_path):
    """OCC shape of the same race: the competitor ADDS a constraint
    after B's entry pre-check and staging but before B's commit lock
    (the 'staged' fault point). _can_rebase permits pure
    add_constraint commits (no schema/parts/deletes change), so
    without the in-lock delta re-validation B's violating batch would
    land. It must refuse, clean its staging, and leave the table
    unchanged; a CONFORMING batch under the same race must commit."""
    root = str(tmp_path / "t")
    _mk(spark, root)

    def add_cons_at_staged(state):
        def fault(point):
            if point == "staged" and not state["done"]:
                state["done"] = True
                MT.add_constraint(spark, root, "v_cap", "v < 100.0")
        return fault

    bad = spark.createDataFrame(
        [(9, "a", 500.0)], "id long, part string, v double"
    )
    with pytest.raises(ValueError, match="v_cap"):
        MT.merge_upsert_atomic(
            spark, root, bad, keys=["id"], partition_by="part",
            concurrency="occ", _fault=add_cons_at_staged({"done": False}),
        )
    assert {r["id"] for r in MT.read_table(spark, root).collect()} == {1, 2, 3}
    import os
    assert not [f for f in os.listdir(root) if f.startswith(".staging-")]
    MT.drop_constraint(root, "v_cap")
    good = spark.createDataFrame(
        [(9, "a", 50.0)], "id long, part string, v double"
    )
    MT.merge_upsert_atomic(
        spark, root, good, keys=["id"], partition_by="part",
        concurrency="occ", _fault=add_cons_at_staged({"done": False}),
    )
    assert 9 in {r["id"] for r in MT.read_table(spark, root).collect()}
    # the raced-in constraint itself must survive B's commit
    assert "v_cap" in MT.read_manifest(root)["constraints"]


def test_constraint_over_column_omitted_by_evolving_batch(spark, tmp_path):
    """ADVICE r10 (low): a schema-evolving batch may legitimately omit
    a constraint-referenced column (unionByName allowMissingColumns);
    the merged rows read it as NULL, which passes CHECK — validation
    must project the typed NULL instead of failing resolution."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.add_constraint(spark, root, "v_pos", "v > 0.0")
    no_v = spark.createDataFrame([(7, "b")], "id long, part string")
    MT.merge_upsert_atomic(spark, root, no_v, keys=["id"], partition_by="part")
    rows = {r["id"]: r["v"] for r in MT.read_table(spark, root).collect()}
    assert rows[7] is None  # landed, v NULL — passes CHECK


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


def test_maintain_cluster_by_is_incremental(spark, tmp_path):
    """VERDICT r10 #7: repeated OPTIMIZE passes must cost proportional
    to NEW data. Pass 1 clusters both partitions; pass 2 with nothing
    changed rewrites NOTHING; after a merge dirties ONE partition,
    pass 3 rewrites exactly that partition — and the point probe
    still reads one file. recluster_all forces the full rewrite."""
    root = str(tmp_path / "t")
    rows = [(i, "a" if i % 2 else "b", float((i * 37) % 500))
            for i in range(1, 401)]
    df = spark.createDataFrame(rows, "id long, part string, ts double")
    MT.merge_upsert_atomic(
        spark, root, df.repartition(8), keys=["id"], partition_by="part",
    )
    out1 = MT.maintain(
        spark, root, target_rows_per_file=100, cluster_by=["ts"],
        retain_history=0, grace_sec=0.0,
    )
    assert sorted(out1["compacted"]) == ["a", "b"]
    out2 = MT.maintain(
        spark, root, target_rows_per_file=100, cluster_by=["ts"],
        retain_history=0, grace_sec=0.0,
    )
    assert out2["compacted"] == []  # steady state: zero rewrites
    # a merge into partition a mints an unmarked dir -> only a is stale
    MT.merge_upsert_atomic(
        spark, root,
        spark.createDataFrame([(1001, "a", 42.5)],
                              "id long, part string, ts double"),
        keys=["id"], partition_by="part",
    )
    out3 = MT.maintain(
        spark, root, target_rows_per_file=100, cluster_by=["ts"],
        retain_history=0, grace_sec=0.0,
    )
    assert out3["compacted"] == ["a"]
    probe = MT.read_table(spark, root, stats_filter={"ts": (37.0, 37.0)})
    # ranges may TOUCH at a boundary (hi1 == lo2), so a point can match
    # two files per partition — but most files must be skipped
    n_total = len(MT.read_table(spark, root).inputFiles())
    assert len(probe.inputFiles()) <= 4 < n_total
    assert probe.filter(F.col("ts") == 37.0).count() == \
        sum(1 for i in range(1, 401) if (i * 37) % 500 == 37)
    # a different spec is a different marker -> everything is stale
    out4 = MT.maintain(
        spark, root, target_rows_per_file=100, cluster_by=["id"],
        retain_history=0, grace_sec=0.0,
    )
    assert sorted(out4["compacted"]) == ["a", "b"]
    out5 = MT.maintain(
        spark, root, target_rows_per_file=100, cluster_by=["id"],
        retain_history=0, grace_sec=0.0, recluster_all=True,
    )
    assert sorted(out5["compacted"]) == ["a", "b"]


def test_cluster_marker_not_fooled_by_partition_value(spark, tmp_path):
    """ADVICE r11 (low): a string partition VALUE that itself contains
    ``-c{spec_hash}-`` must not make the partition look permanently
    clustered (substring matching across the whole relpath would skip
    it forever — never clustered, never even plain-compacted). The
    marker is matched structurally: full key prefix + 8-hex uuid
    tail."""
    spec = ["ts"]
    h = MT._cluster_spec_hash(spec)
    evil = f"x-c{h}-deadbeef"  # partition value embedding the marker
    rows = [(i, evil, float((i * 37) % 500)) for i in range(1, 201)]
    df = spark.createDataFrame(rows, "id long, part string, ts double")
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(
        spark, root, df.repartition(8), keys=["id"], partition_by="part",
    )
    out1 = MT.maintain(
        spark, root, target_rows_per_file=100, cluster_by=spec,
        retain_history=0, grace_sec=0.0,
    )
    assert out1["compacted"] == [evil]  # NOT skipped on first pass
    out2 = MT.maintain(
        spark, root, target_rows_per_file=100, cluster_by=spec,
        retain_history=0, grace_sec=0.0,
    )
    assert out2["compacted"] == []  # incremental skip still works
    t = MT.read_table(spark, root)
    assert t.count() == 200 and t.filter(F.col("part") == evil).count() == 200


def test_maintain_cluster_by_records_stats_on_statless_table(spark, tmp_path):
    """ADVICE r10 (low): a table whose merges never passed stats_cols
    has no file_stats key — the clustering pass must still record
    per-file stats for the columns its expressions reference, or the
    full-table rewrite buys no skipping, silently."""
    root = str(tmp_path / "t")
    rows = [(i, float((i * 37) % 1000)) for i in range(1, 401)]
    df = spark.createDataFrame(rows, "id long, ts double")
    MT.merge_upsert_atomic(spark, root, df.repartition(8), keys=["id"])
    assert "file_stats" not in MT.read_manifest(root)
    MT.maintain(
        spark, root, target_rows_per_file=100, cluster_by=["ts"],
        retain_history=0, grace_sec=0.0,
    )
    m = MT.read_manifest(root)
    per_file = m["file_stats"][MT._FULL]
    assert len(per_file) >= 3
    ranges = sorted(st["ts"] for st in per_file.values())
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
    probe = MT.read_table(spark, root, stats_filter={"ts": (37.0, 37.0)})
    assert len(probe.inputFiles()) == 1


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
