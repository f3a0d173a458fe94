"""Positional (row-index) merge-on-read delete invariants
(manifest_table.delete_where_pos / apply_pos_deletes) — the Delta
deletion-vector / Iceberg position-delete shape: zero-rewrite commits
on KEYLESS tables (duplicate rows included), read-path (file, row_idx)
anti-join at every version, refusal of raw-byte rewriters while
tombstones are pending, safety of rename / CoW delete / repartition,
materialization touching only tombstoned partitions, CDF surfacing,
clone travel, vacuum retention, and the file-identity percent-decoding
on hostile partition values."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT


def _mk(spark, root, partition_by="part"):
    # deliberately KEYLESS payload: (part, grp, v) with exact duplicate
    # rows — equality deletes cannot even express "delete those rows"
    rows = [
        ("a", 1, 10.0),
        ("a", 1, 10.0),  # duplicate on purpose
        ("a", 2, 20.0),
        ("b", 1, 30.0),
        ("b", 3, 40.0),
        ("c", 3, 50.0),
    ]
    df = spark.createDataFrame(rows, "part string, grp long, v double")
    # the merge sink needs keys; synthesize a surrogate and then treat
    # the table as keyless from the caller's perspective
    MT.merge_upsert_atomic(
        spark,
        root,
        df.withColumn("k", F.monotonically_increasing_id()),
        keys=["k"],
        partition_by=partition_by,
    )


def _vals(spark, root, **kw):
    return sorted(
        (r["part"], r["grp"], r["v"])
        for r in MT.read_table(spark, root, **kw).collect()
    )


def test_pos_delete_rewrites_nothing_and_hides_keyless_rows(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    before = MT.read_manifest(root)
    n = MT.delete_where_pos(spark, root, F.col("grp") == 1)
    assert n == 3  # both duplicates die — no key column involved
    after = MT.read_manifest(root)
    assert after["parts"] == before["parts"]  # zero data rewrite
    assert len(after["pos_deletes"]) == 1
    assert "delete_keys" not in after
    assert [t[1] for t in _vals(spark, root)] == [2, 3, 3]
    # time travel to the pre-delete snapshot sees everything
    assert len(_vals(spark, root, version=1)) == 6


def test_pos_deletes_accumulate_and_empty_match_commits_nothing(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _mk(spark, root)
    assert MT.delete_where_pos(spark, root, F.col("v") == 10.0) == 2
    assert MT.delete_where_pos(spark, root, F.col("v") == 40.0) == 1
    m = MT.read_manifest(root)
    assert len(m["pos_deletes"]) == 2
    assert [t[2] for t in _vals(spark, root)] == [20.0, 30.0, 50.0]
    v = int(m["version"])
    # already-hidden rows are never re-marked; nothing commits
    assert MT.delete_where_pos(spark, root, F.col("v") == 10.0) == 0
    assert int(MT.read_manifest(root)["version"]) == v


def test_raw_rewriters_refuse_while_pos_pending(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("grp") == 3)
    upd = spark.createDataFrame(
        [("a", 9, 99.0, 999)], "part string, grp long, v double, k long"
    )
    with pytest.raises(ValueError, match="positional"):
        MT.merge_upsert_atomic(spark, root, upd, keys=["k"], partition_by="part")
    with pytest.raises(ValueError, match="positional"):
        MT.update_where(
            spark, root, F.col("grp") == 2, {"v": F.lit(0.0)}
        )
    with pytest.raises(ValueError, match="positional"):
        MT.compact_partition(spark, root, "a")
    # equality tombstones may coexist, but their materializer must not
    # rewrite raw bytes out from under the positions
    MT.delete_where_mor(spark, root, F.col("v") == 20.0, keys=["k"])
    with pytest.raises(ValueError, match="positional"):
        MT.apply_deletes(spark, root)
    # both kinds applied on the read path at once: grp==3 rows dead by
    # position, the v==20 row dead by key — a:10,a:10,b:30 remain
    assert [t[2] for t in _vals(spark, root)] == [10.0, 10.0, 30.0]


def test_cow_delete_and_repartition_stay_safe_under_pos_pending(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("grp") == 3)  # kills b:40, c:50
    # copy-on-write delete of OTHER rows: its scan applies the pending
    # positions, so the rewritten dir cannot resurrect them
    assert MT.delete_where(spark, root, F.col("v") == 30.0) == 1
    assert [t[2] for t in _vals(spark, root)] == [10.0, 10.0, 20.0]
    # full-rewrite partition evolution materializes the backlog
    MT.repartition_table(spark, root, None)
    m = MT.read_manifest(root)
    assert not m.get("pos_deletes")
    assert [t[2] for t in _vals(spark, root)] == [10.0, 10.0, 20.0]


def test_rename_never_invalidates_positions(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("v") == 50.0)
    MT.rename_column(spark, root, "v", "amount")
    got = sorted(
        r["amount"] for r in MT.read_table(spark, root).collect()
    )
    assert got == [10.0, 10.0, 20.0, 30.0, 40.0]
    # and positions recorded AFTER the rename still apply
    MT.delete_where_pos(spark, root, F.col("amount") == 30.0)
    got = sorted(r["amount"] for r in MT.read_table(spark, root).collect())
    assert got == [10.0, 10.0, 20.0, 40.0]


def test_apply_pos_deletes_touches_only_tombstoned_partitions(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("part") == "c")  # empties c
    MT.delete_where_pos(spark, root, F.col("v") == 30.0)  # thins b
    before = MT.read_manifest(root)["parts"]
    assert MT.apply_pos_deletes(spark, root) == 2
    m = MT.read_manifest(root)
    assert not m.get("pos_deletes")
    # 'a' was never tombstoned: its dir must be byte-identical
    assert m["parts"]["a"] == before["a"]
    assert m["parts"]["b"] != before["b"]
    assert "c" not in m["parts"]  # emptied partition dropped
    assert [t[2] for t in _vals(spark, root)] == [10.0, 10.0, 20.0, 40.0]
    # maintenance and merges work again
    assert MT.compact_partition(spark, root, "a") >= 1
    upd = spark.createDataFrame(
        [("d", 7, 70.0, 1000)], "part string, grp long, v double, k long"
    )
    MT.merge_upsert_atomic(spark, root, upd, keys=["k"], partition_by="part")
    assert len(_vals(spark, root)) == 5


def test_pos_delete_cdf_and_apply_feed(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("grp") == 1)  # v1 -> v2
    feed = MT.read_changes(spark, root, 1, 2)
    rows = feed.collect()
    assert {r["_change_type"] for r in rows} == {"delete"}
    assert sorted(r["grp"] for r in rows) == [1, 1, 1]
    MT.apply_pos_deletes(spark, root)  # v2 -> v3: physically dead rows
    assert MT.read_changes(spark, root, 2, 3).count() == 0
    # the whole span collapses to the same logical delta
    whole = MT.read_changes(spark, root, 1, 3)
    assert whole.filter("_change_type = 'delete'").count() == 3
    assert whole.filter("_change_type = 'insert'").count() == 0


def test_restore_across_pos_delete_feeds_inserts_back(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("grp") == 3)  # v2
    MT.restore_version(spark, root, 1)  # v3: tombstones cleared
    assert len(_vals(spark, root)) == 6
    feed = MT.read_changes(spark, root, 2, 3)
    assert feed.filter("_change_type = 'insert'").count() == 2
    assert feed.filter("_change_type = 'delete'").count() == 0
    # restore BACK ONTO the tombstoned snapshot re-pends them
    MT.restore_version(spark, root, 2)
    assert len(_vals(spark, root)) == 4
    assert len(MT.read_manifest(root)["pos_deletes"]) == 1


def test_clone_carries_positions_and_diverges_cow(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk(spark, src)
    MT.delete_where_pos(spark, src, F.col("grp") == 1)
    MT.clone_table(src, dst)
    assert [t[1] for t in _vals(spark, dst)] == [2, 3, 3]
    # materializing on the clone rewrites into the CLONE's parts only
    src_parts = MT.read_manifest(src)["parts"]
    MT.apply_pos_deletes(spark, dst)
    assert MT.read_manifest(src)["parts"] == src_parts
    assert len(MT.read_manifest(src)["pos_deletes"]) == 1
    assert [t[1] for t in _vals(spark, dst)] == [2, 3, 3]
    assert [t[1] for t in _vals(spark, src)] == [2, 3, 3]


def test_vacuum_spares_tombstones_then_reaps_after_apply(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("grp") == 1)
    pos_rel = MT.read_manifest(root)["pos_deletes"][0]
    MT.vacuum(root, retain_history=0, grace_sec=0.0)
    assert os.path.isdir(os.path.join(root, pos_rel))
    assert [t[1] for t in _vals(spark, root)] == [2, 3, 3]
    MT.apply_pos_deletes(spark, root)
    MT.vacuum(root, retain_history=0, grace_sec=0.0)
    assert not os.path.isdir(os.path.join(root, pos_rel))
    assert [t[1] for t in _vals(spark, root)] == [2, 3, 3]


def test_file_identity_decodes_hostile_partition_values(spark, tmp_path):
    """Partition values containing space / %xx / '+' / '=' exercise
    the URI percent-decoding in _pos_identity: a space encodes to %20,
    a literal % to %25, while '+' passes through RAW in the Hadoop
    URI (form-decoding would eat it — hence the %2B pre-escape)."""
    root = str(tmp_path / "t")
    rows = [
        ("has space", 1.0),
        ("has space", 2.0),
        ("pct%20val", 3.0),
        ("plus+val", 4.0),
        ("eq=val", 5.0),
    ]
    df = spark.createDataFrame(rows, "part string, v double").withColumn(
        "k", F.monotonically_increasing_id()
    )
    MT.merge_upsert_atomic(spark, root, df, keys=["k"], partition_by="part")
    n = MT.delete_where_pos(
        spark, root, F.col("v").isin(1.0, 3.0, 4.0, 5.0)
    )
    assert n == 4
    got = sorted(
        (r["part"], r["v"]) for r in MT.read_table(spark, root).collect()
    )
    assert got == [("has space", 2.0)]


def test_occ_compact_discards_when_pos_lands_mid_flight(
    spark, tmp_path, monkeypatch
):
    """A positional delete committed between the OCC compactor's
    pre-check and its locked commit must void the staged rewrite —
    committing it would reorder rows out from under fresh tombstones."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    real_lock = MT._writer_lock
    fired = {"done": False}

    def racing_lock(r, *a, **kw):
        # inject the racing delete BEFORE the compactor acquires the
        # lock for its commit section (recursion guarded)
        if not fired["done"]:
            fired["done"] = True
            MT.delete_where_pos(spark, root, F.col("v") == 10.0)
        return real_lock(r, *a, **kw)

    monkeypatch.setattr(MT, "_writer_lock", racing_lock)
    rc = MT.compact_partition(spark, root, "a", concurrency="occ")
    monkeypatch.undo()
    assert rc == -1  # staged rewrite discarded
    assert [t[2] for t in _vals(spark, root)] == [20.0, 30.0, 40.0, 50.0]


def test_read_plan_shape_clean_vs_tombstoned(spark, tmp_path):
    """Scale pin: a table WITHOUT positional tombstones must read with
    ZERO extra plan nodes (the no-op branch), and a tombstoned read is
    one broadcast-able anti-join keyed on the _metadata file identity
    — never a shuffle of the data side at any scale."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    clean = MT.read_table(spark, root)
    p = clean._jdf.queryExecution().executedPlan().toString()
    assert "__pos_rel" not in p and "Join" not in p
    MT.delete_where_pos(spark, root, F.col("v") == 50.0)
    dirty = MT.read_table(spark, root)
    p = dirty._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p  # tombstones broadcast, data never shuffles
    assert "SortMergeJoin" not in p


def test_maintain_refuses_upfront_under_pos_backlog(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("v") == 50.0)
    with pytest.raises(ValueError, match="maintain.*positional"):
        MT.maintain(spark, root, retain_history=0, grace_sec=0.0)
    MT.apply_pos_deletes(spark, root)
    out = MT.maintain(spark, root, retain_history=0, grace_sec=0.0)
    assert "compacted" in out  # pass runs normally after the drain


def test_pos_deletes_compose_with_file_skipping(spark, tmp_path):
    """The file-granular skipping path (stats_filter + bloom sidecars)
    builds per-FILE scan paths; the positional anti-join must still
    hide tombstoned rows there — and a point probe for a tombstoned
    key must come back empty, not resurrect through the pruned scan."""
    import hashlib

    import pyspark.sql.functions as F2

    root = str(tmp_path / "t")
    df = spark.range(0, 1000).select(
        F2.col("id"),
        (F2.col("id") % 10).alias("g"),
        F2.md5(F2.col("id").cast("string")).alias("key"),
    )
    MT.merge_upsert_atomic(
        spark, root, df.repartition(4), keys=["id"],
        stats_cols=["id"], bloom_cols=["key"],
    )
    assert MT.delete_where_pos(spark, root, F2.col("g") == 3) == 100
    live = hashlib.md5(b"500").hexdigest()
    dead = hashlib.md5(b"503").hexdigest()  # g == 3
    t = MT.read_table(spark, root, stats_filter={"key": (live, live)})
    assert t.filter(F2.col("key") == live).count() == 1
    assert len(t.inputFiles()) < 4  # skipping still prunes files
    t2 = MT.read_table(spark, root, stats_filter={"key": (dead, dead)})
    assert t2.filter(F2.col("key") == dead).count() == 0


class Kill(RuntimeError):
    """Stands in for SIGKILL at a fault point (see
    tests/test_manifest_table.py — same protocol boundaries)."""


def _kill_at(point: str):
    def fault(name: str):
        if name == point:
            raise Kill(point)

    return fault


@pytest.mark.parametrize(
    "point", ["staged", "moved_one", "manifest_tmp_written"]
)
def test_apply_pos_deletes_crash_atomic(spark, tmp_path, point):
    """apply_pos_deletes shares the manifest commit protocol: a crash
    at any staging/move/tmp-write boundary leaves the table on the
    complete OLD snapshot — tombstones still pending, every read
    identical — and the retried apply lands cleanly."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("grp") == 3)
    before = _vals(spark, root)
    v = int(MT.read_manifest(root)["version"])
    with pytest.raises(Kill):
        MT.apply_pos_deletes(spark, root, _fault=_kill_at(point))
    m = MT.read_manifest(root)
    assert int(m["version"]) == v  # nothing committed
    assert len(m["pos_deletes"]) == 1  # still pending
    assert _vals(spark, root) == before  # reads unchanged
    # the retry materializes normally
    assert MT.apply_pos_deletes(spark, root) == 2
    assert not MT.read_manifest(root).get("pos_deletes")
    assert _vals(spark, root) == before


def test_crash_after_commit_is_the_new_snapshot(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_pos(spark, root, F.col("grp") == 3)
    before = _vals(spark, root)
    with pytest.raises(Kill):
        MT.apply_pos_deletes(spark, root, _fault=_kill_at("committed"))
    m = MT.read_manifest(root)
    assert not m.get("pos_deletes")  # commit landed before the crash
    assert _vals(spark, root) == before
    assert MT.apply_pos_deletes(spark, root) == 0  # idempotent no-op


def test_partition_targeted_pos_delete(spark, tmp_path):
    """partition_values confines the marking scan manifest-side — the
    GDPR shape: only the named partitions are read, the predicate only
    applies inside them, other partitions' matching rows survive."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    n = MT.delete_where_pos(
        spark, root, F.col("grp") == 1, partition_values=["a"]
    )
    assert n == 2  # b's grp=1 row is outside the named partition
    assert [t for t in _vals(spark, root)] == [
        ("a", 2, 20.0),
        ("b", 1, 30.0),
        ("b", 3, 40.0),
        ("c", 3, 50.0),
    ]
