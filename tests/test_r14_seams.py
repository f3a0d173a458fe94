"""Round-14 adversarial audit of the r13 expectation seams (VERDICT
r13 #2) plus the new quarantine retention lifecycle (VERDICT r13 #3):

(a) DML × expectations — update_where was the documented bypass
    (VERDICT r13 "What's wrong": declare ``value < 250`` then
    ``update_where(..., set={"value": "300"})`` silently broke the
    advertised invariant). The scope is now PINNED: update_where
    refuses a SET that would produce violating rows (every policy
    behaves as ``fail`` on DML — drop/quarantine are flow policies);
    deletes never gate (removal cannot manufacture a violation).
(b) column-mapping renames × expectation expressions — identifiers
    rewrite, single-quoted literals survive, and the gate (merge AND
    update_where) keeps firing on the new name.
(c) quarantine capture × schema evolution × restore_version — the
    three-way composition none of the r13 tests ran together.
(d) streaming-gate crash BETWEEN the staged capture and the txn
    ledger commit, with at-least-once redelivery — the foreachBatch
    crash window (merge_upsert_atomic with txn_app/txn_version IS the
    foreachBatch body; redelivery replays the same epoch id).
(e) clear_quarantine — expire processed captures metadata-only;
    time-travel/restore/vacuum interactions pinned.
(f) reserved audit-column collisions (_violated,
    _quarantined_at_version — ADVICE r13, low).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT


class Kill(RuntimeError):
    pass


def _kill_at(point: str):
    def fault(name: str):
        if name == point:
            raise Kill(point)

    return fault


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        (F.col("id") % 3).alias("g"),
    )


def _kept(spark, root):
    return sorted(
        r.k for r in MT.read_table(spark, root).select("k").collect()
    )


def _quar_keys(spark, root, version=None):
    return sorted(
        r.k
        for r in MT.read_quarantine(spark, root, version=version).collect()
    )


# ---------------------------------------------------------------- (a)


def test_update_where_refuses_set_violating_expectation(spark, tmp_path):
    """The VERDICT r13 scenario verbatim: value < 250 declared, then
    update_where SETs 300 — must refuse with the table unchanged,
    whatever the policy."""
    for policy in ("fail", "drop", "quarantine"):
        root = str(tmp_path / f"t_{policy}")
        MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 5), keys=["k"])
        MT.set_expectation(spark, root, "v_cap", "v < 250", policy=policy)
        v0 = int(MT.read_manifest(root)["version"])
        with pytest.raises(ValueError, match="v_cap"):
            MT.update_where(
                spark, root, F.col("k") == 1, {"v": F.lit(300)}
            )
        assert int(MT.read_manifest(root)["version"]) == v0
        assert [
            r.v
            for r in MT.read_table(spark, root)
            .filter(F.col("k") == 1)
            .collect()
        ] == [10]
        # nothing quarantined either: DML refuses, it never diverts
        assert _quar_keys(spark, root) == []


def test_update_where_ok_when_post_set_rows_pass(spark, tmp_path):
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 5), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 250", policy="quarantine")
    assert MT.update_where(
        spark, root, F.col("k") == 1, {"v": F.lit(249)}
    ) == 1
    assert [
        r.v
        for r in MT.read_table(spark, root).filter(F.col("k") == 1).collect()
    ] == [249]


def test_update_where_ignores_standing_violations_elsewhere(
    spark, tmp_path
):
    """Expectations never validate standing data: a row that violated
    BEFORE the declaration must not block an unrelated update — only
    the post-SET matched rows are probed."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(
        spark,
        root,
        spark.range(0, 3).select(
            F.col("id").alias("k"), (F.col("id") * 1000).alias("v")
        ),
        keys=["k"],
    )  # k=1,2 violate v < 250 already
    MT.set_expectation(spark, root, "v_cap", "v < 250", policy="quarantine")
    assert MT.update_where(
        spark, root, F.col("k") == 0, {"v": F.lit(7)}
    ) == 1
    # but touching a standing violator with a still-violating SET
    # refuses (the probe sees the post-SET matched row)
    with pytest.raises(ValueError, match="v_cap"):
        MT.update_where(spark, root, F.col("k") == 1, {"v": F.lit(999)})
    # while FIXING the violator through update_where is fine
    assert MT.update_where(
        spark, root, F.col("k") == 1, {"v": F.lit(0)}
    ) == 1


def test_update_where_gate_sees_recomputed_generated_columns(
    spark, tmp_path
):
    """An expectation over a GENERATED column must be probed against
    the post-SET recomputation, not the stale stored value."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(
        spark,
        root,
        _batch(spark, 0, 3).withColumn("v2", F.col("v") * 2),
        keys=["k"],
    )
    MT.set_generation_expr(spark, root, "v2", "v * 2")
    MT.set_expectation(spark, root, "v2_cap", "v2 < 100", policy="fail")
    # SET v=60 -> v2 recomputes to 120 >= 100: refuse
    with pytest.raises(ValueError, match="v2_cap"):
        MT.update_where(spark, root, F.col("k") == 0, {"v": F.lit(60)})
    # SET v=40 -> v2=80: fine
    assert MT.update_where(
        spark, root, F.col("k") == 0, {"v": F.lit(40)}
    ) == 1


def test_deletes_never_gate(spark, tmp_path):
    """Pinned scope: copy-on-write, equality-MOR and positional
    deletes all proceed under declared expectations — removal only
    shrinks the violation set."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 6), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 250", policy="fail")
    assert MT.delete_where(spark, root, F.col("k") == 5) == 1
    assert MT.delete_where_pos(spark, root, F.col("k") == 4) == 1
    MT.apply_pos_deletes(spark, root)
    assert MT.delete_where_mor(spark, root, F.col("k") == 3, ["k"]) == 1
    assert _kept(spark, root) == [0, 1, 2]


# ---------------------------------------------------------------- (b)


def test_rename_rewrites_expectation_expr_but_not_literals(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(
        spark,
        root,
        _batch(spark, 0, 3).withColumn("tag", F.lit("v is big")),
        keys=["k"],
    )
    MT.set_expectation(
        spark, root, "cap", "v < 70 OR tag = 'v is big'", policy="drop"
    )
    MT.rename_column(spark, root, "v", "amount")
    got = MT.read_manifest(root)["expectations"]["cap"]["expr"]
    # identifier rewritten; the 'v is big' literal untouched (the
    # r12 date_trunc('month') rule, applied to expectations)
    assert got == "amount < 70 OR tag = 'v is big'"


def test_gate_fires_on_renamed_column_merge_and_update(spark, tmp_path):
    """The COVERAGE.md claim under attack: declare on v, rename
    v -> amount, then both write paths must enforce on amount."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    MT.rename_column(spark, root, "v", "amount")
    MT.merge_upsert_atomic(
        spark,
        root,
        _batch(spark, 7, 9).withColumnRenamed("v", "amount"),
        keys=["k"],
    )  # amount=70,80 both violate
    assert _quar_keys(spark, root) == [7, 8]
    assert _kept(spark, root) == [0, 1, 2]
    with pytest.raises(ValueError, match="v_cap"):
        MT.update_where(
            spark, root, F.col("k") == 0, {"amount": F.lit(500)}
        )
    # the capture kept the BATCH's column names at capture time
    assert "amount" in MT.read_quarantine(spark, root).columns


# ---------------------------------------------------------------- (c)


def test_quarantine_schema_evolution_then_restore(spark, tmp_path):
    """The three-way seam: capture under schema A (v3), evolve the
    schema mid-life, capture under schema B (v5), restore to the v3
    snapshot — the quarantine must rewind to the first capture only,
    read back under ITS schema — then a fresh gated merge accumulates
    a new capture on top of the restored state."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])  # v1
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")  # v2
    MT.merge_upsert_atomic(spark, root, _batch(spark, 7, 9), keys=["k"])  # v3
    # schema evolution: the next gated batch carries an extra column
    MT.merge_upsert_atomic(
        spark,
        root,
        _batch(spark, 9, 11).withColumn("src", F.lit("feed2")),
        keys=["k"],
    )  # v4: quarantines k=9,10 with src
    assert _quar_keys(spark, root) == [7, 8, 9, 10]
    MT.restore_version(spark, root, 3)  # v5
    assert _quar_keys(spark, root) == [7, 8]
    q = MT.read_quarantine(spark, root)
    # the restored capture set predates the evolution: no src column
    assert "src" not in q.columns
    # time travel still sees the post-evolution capture at v4
    assert _quar_keys(spark, root, version=4) == [7, 8, 9, 10]
    # and the gate is still live post-restore, accumulating anew
    MT.merge_upsert_atomic(spark, root, _batch(spark, 11, 13), keys=["k"])
    assert _quar_keys(spark, root) == [7, 8, 11, 12]
    versions = {
        r.k: r._quarantined_at_version
        for r in MT.read_quarantine(spark, root).collect()
    }
    assert versions == {7: 3, 8: 3, 11: 6, 12: 6}


# ---------------------------------------------------------------- (d)


@pytest.mark.parametrize("point", ["staged", "manifest_tmp_written"])
def test_streaming_crash_between_capture_and_ledger_commit(
    spark, tmp_path, point
):
    """The foreachBatch crash window (VERDICT r13 #2d): the epoch's
    merge stages its quarantine capture, then dies BEFORE the txn
    ledger commits (merge_upsert_atomic with txn_app/txn_version is
    exactly the foreachBatch body — Structured Streaming's contract
    on crash is at-least-once redelivery of the same epoch id).
    The redelivered epoch must land admitted rows + capture + ledger
    entry in ONE version, a second redelivery must reap its duplicate
    capture, and the crash's orphan must be vacuum garbage."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    v0 = int(MT.read_manifest(root)["version"])
    with pytest.raises(Kill):
        MT.merge_upsert_atomic(
            spark, root, _batch(spark, 3, 10), keys=["k"],
            txn_app="stream", txn_version=7, _fault=_kill_at(point),
        )
    # crash exposed nothing: no rows, no capture, no ledger entry
    assert int(MT.read_manifest(root)["version"]) == v0
    assert _kept(spark, root) == [0, 1, 2]
    assert _quar_keys(spark, root) == []
    assert not MT._txn_already_applied(
        MT.read_manifest(root), "stream", 7
    )
    # redelivery of the SAME epoch commits everything atomically
    MT.merge_upsert_atomic(
        spark, root, _batch(spark, 3, 10), keys=["k"],
        txn_app="stream", txn_version=7,
    )
    assert _kept(spark, root) == [0, 1, 2, 3, 4, 5, 6]
    assert _quar_keys(spark, root) == [7, 8, 9]
    m = MT.read_manifest(root)
    assert MT._txn_already_applied(m, "stream", 7)
    # a SECOND redelivery (duplicate delivery post-commit) is a no-op
    # that reaps its own fresh capture
    MT.merge_upsert_atomic(
        spark, root, _batch(spark, 3, 10), keys=["k"],
        txn_app="stream", txn_version=7,
    )
    assert _quar_keys(spark, root) == [7, 8, 9]
    # the crash's orphaned capture dir is unreferenced and reaped
    MT.vacuum(root, grace_sec=0.0)
    live = MT._referenced_rels(MT.read_manifest(root))
    on_disk = {
        f"parts/{d}" for d in os.listdir(os.path.join(root, "parts"))
    }
    assert on_disk == live
    assert _quar_keys(spark, root) == [7, 8, 9]


# ---------------------------------------------------------------- (e)


def _mk_two_captures(spark, root):
    """v1 merge, v2 declare, v3 capture (k=7,8), v4 capture (k=9,10)."""
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 7, 9), keys=["k"])
    MT.merge_upsert_atomic(spark, root, _batch(spark, 9, 11), keys=["k"])


def test_clear_quarantine_all_and_floor(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_two_captures(spark, root)
    assert _quar_keys(spark, root) == [7, 8, 9, 10]
    # floor: clear only captures from versions <= 3 (the first batch)
    assert MT.clear_quarantine(root, before_version=3) == 2
    assert _quar_keys(spark, root) == [9, 10]
    m = MT.read_manifest(root)
    assert m["operation"] == {
        "type": "clear_quarantine",
        "before_version": 3,
        "cleared_rels": 1,
        "cleared_rows": 2,
    }
    # time travel: the pre-clear snapshot still sees both captures
    assert _quar_keys(spark, root, version=4) == [7, 8, 9, 10]
    # clear the rest; a second clear is a no-op without a commit
    assert MT.clear_quarantine(root) == 2
    assert _quar_keys(spark, root) == []
    v = int(MT.read_manifest(root)["version"])
    assert MT.clear_quarantine(root) == 0
    assert int(MT.read_manifest(root)["version"]) == v
    # the declaration is untouched: new violations re-accumulate
    MT.merge_upsert_atomic(spark, root, _batch(spark, 11, 13), keys=["k"])
    assert _quar_keys(spark, root) == [11, 12]


def test_clear_quarantine_is_restore_safe(spark, tmp_path):
    """Restore to a pre-clear snapshot resurrects the cleared
    captures — the clear is metadata-only, exactly like parts."""
    root = str(tmp_path / "t")
    _mk_two_captures(spark, root)  # captures live at v3, v4
    MT.clear_quarantine(root)  # v5
    assert _quar_keys(spark, root) == []
    MT.restore_version(spark, root, 4)  # v6
    assert _quar_keys(spark, root) == [7, 8, 9, 10]


def test_clear_quarantine_vacuum_retention(spark, tmp_path):
    """The dirs outlive the clear only while a RETAINED manifest
    references them: vacuum with full history spares them (time
    travel keeps working); vacuum with retain_history=0 after the
    clear reaps them, and the cleared state stays consistent."""
    root = str(tmp_path / "t")
    _mk_two_captures(spark, root)
    q_dirs = set(MT.read_manifest(root)["quarantine"])
    MT.clear_quarantine(root)
    # generous retention: pre-clear manifests retained -> dirs spared
    removed = MT.vacuum(root, retain_history=10, grace_sec=0.0)
    assert not (set(removed) & q_dirs)
    assert _quar_keys(spark, root, version=4) == [7, 8, 9, 10]
    # zero retention: nothing references the captures anymore
    removed = MT.vacuum(root, grace_sec=0.0)
    assert q_dirs <= set(removed)
    assert _quar_keys(spark, root) == []
    assert _kept(spark, root) == [0, 1, 2]  # table data untouched
    # restore to the reaped snapshot now rightly refuses
    with pytest.raises(FileNotFoundError, match="vacuum"):
        MT.restore_version(spark, root, 4)


def test_clear_quarantine_missing_table(tmp_path):
    with pytest.raises(FileNotFoundError):
        MT.clear_quarantine(str(tmp_path / "nope"))


# ---------------------------------------------------------------- (f)


def test_reserved_audit_columns_refuse_not_corrupt(spark, tmp_path):
    """ADVICE r13 (low): a batch column literally named _violated or
    _quarantined_at_version would collide with the audit columns the
    capture write / read_quarantine append — refuse up front."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    for col in ("_violated", "_quarantined_at_version"):
        with pytest.raises(ValueError, match="reserved"):
            MT.merge_upsert_atomic(
                spark,
                root,
                _batch(spark, 7, 9).withColumn(col, F.lit("x")),
                keys=["k"],
            )
    # and the refusals left no debris behind
    assert _quar_keys(spark, root) == []
    assert _kept(spark, root) == [0, 1, 2]


def test_clear_quarantine_racing_occ_merge(spark, tmp_path):
    """Newest-code race (the r11 lesson: audit code in its first
    round): an OCC merge stages its batch + capture OUTSIDE the lock;
    clear_quarantine commits in the window before the merge's
    validate+commit. Whichever way the merge lands (rebase or
    replan), the cleared captures must STAY cleared and the merge's
    own fresh capture must be visible — _commit_plan carries the
    quarantine map from the CURRENT (post-clear) snapshot, never from
    the stale base."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 7, 9), keys=["k"])
    assert _quar_keys(spark, root) == [7, 8]
    fired = []

    def interleave(point: str) -> None:
        # _plan_merge staging runs outside the lock in OCC mode, so
        # the clear can take the writer lock and commit right here
        if point == "staged" and not fired:
            fired.append(point)
            assert MT.clear_quarantine(root) == 2

    MT.merge_upsert_atomic(
        spark, root, _batch(spark, 9, 11), keys=["k"],
        concurrency="occ", _fault=interleave,
    )
    assert fired  # the race actually happened
    assert _quar_keys(spark, root) == [9, 10]  # cleared stay cleared
    assert _kept(spark, root) == [0, 1, 2]


def test_set_expectation_refuses_reserved_table_columns(spark, tmp_path):
    """r14 review: declaring an expectation on a table whose SCHEMA
    already holds a reserved audit name would brick every later gated
    merge (the gate refuses those names on each batch) — refuse at
    declaration time instead, where the operator can still decline."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(
        spark,
        root,
        _batch(spark, 0, 3).withColumn("_violated", F.lit("x")),
        keys=["k"],
    )  # legal: no declaration exists yet
    with pytest.raises(ValueError, match="reserved"):
        MT.set_expectation(spark, root, "v_cap", "v < 70")
    # the table stays fully writable: no declaration was committed
    MT.merge_upsert_atomic(spark, root, _batch(spark, 3, 5)
                           .withColumn("_violated", F.lit("y")), keys=["k"])
    assert _kept(spark, root) == [0, 1, 2, 3, 4]


def test_clear_quarantine_respects_group_pin(spark, tmp_path):
    """Composition with multi-table transactions: a member's
    clear_quarantine advances the TABLE version but the GROUP pointer
    still pins the pre-clear snapshot — the crash-consistent group
    read must keep seeing the pre-clear quarantine, and vacuum_group
    must spare the cleared capture dirs the pin still references."""
    from stripe_data_pipeline_spark import table_group as TG

    groot = str(tmp_path / "g")
    ra = str(tmp_path / "a")
    MT.merge_upsert_atomic(spark, ra, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, ra, "v_cap", "v < 70", policy="quarantine")
    TG.create_group(groot, {"a": ra})
    TG.group_merge_atomic(
        spark, groot, {"a": {"updates": _batch(spark, 7, 9), "keys": ["k"]}},
    )  # pins the post-merge version (captures k=7,8)
    pinned_v = TG.read_group(groot)["tables"]["a"]["version"]
    assert MT.clear_quarantine(ra) == 2  # table-level maintenance
    assert _quar_keys(spark, ra) == []  # current table snapshot: cleared
    # the group-pinned snapshot predates the clear: quarantine intact
    assert _quar_keys(spark, ra, version=pinned_v) == [7, 8]
    removed = TG.vacuum_group(groot, grace_sec=0.0)
    # the pinned snapshot's capture dirs survived the vacuum
    assert _quar_keys(spark, ra, version=pinned_v) == [7, 8]
    assert all("q-" not in rel for rels in removed.values() for rel in rels)
    # re-pinning the group past the clear releases them
    TG.group_merge_atomic(
        spark, groot, {"a": {"updates": _batch(spark, 2, 3), "keys": ["k"]}},
    )
    removed = TG.vacuum_group(groot, grace_sec=0.0)
    assert any("q-" in rel for rels in removed.values() for rel in rels)
    assert _quar_keys(spark, ra) == []
