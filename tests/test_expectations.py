"""Declarative data-quality expectations with quarantine (r13,
VERDICT r12 #3) — the DLT EXPECT ... ON VIOLATION / dbt-test shape the
reference DECLARES but never enforces
(/root/reference/dbt/stripe/models/curated/schema.yml:4-19 declares
not_null/unique tests; /root/reference/README.md:131-171 documents
them): per-expectation policies fail | drop | quarantine enforced on
every merge batch, violating rows routed to a quarantine relation
committed atomically in the SAME manifest version, counts recorded in
the commit audit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT


class Kill(RuntimeError):
    """Stands in for SIGKILL at a fault point (the
    test_manifest_table.py protocol)."""


def _kill_at(point: str):
    def fault(name: str):
        if name == point:
            raise Kill(point)

    return fault


def _batch(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 10).alias("v"),
        F.when(F.col("id") == 7, None)
        .otherwise(F.col("id") % 3)
        .alias("g"),
    )


def _mk(spark, root):
    """v1: baseline merge; v2+v3: declarations; v4: the gated merge.
    Rows k=3..9 arrive under [v_cap: v<70 quarantine] and [g_known:
    g<>1 drop]: k=7,8,9 have v>=70 -> quarantined; k=4 has g=1 ->
    dropped; k=7's NULL g passes g_known (NULL passes, the CHECK
    truth table) but is quarantined by v_cap anyway."""
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    MT.set_expectation(spark, root, "g_known", "g <> 1", policy="drop")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 3, 10), keys=["k"])


def _kept(spark, root):
    return sorted(
        r.k for r in MT.read_table(spark, root).select("k").collect()
    )


def _quar(spark, root, version=None):
    return sorted(
        (r.k, tuple(sorted(r._violated)), r._quarantined_at_version)
        for r in MT.read_quarantine(spark, root, version=version).collect()
    )


def test_split_semantics_and_atomic_same_version_commit(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    assert _kept(spark, root) == [0, 1, 2, 3, 5, 6]
    assert _quar(spark, root) == [
        (7, ("v_cap",), 4),
        (8, ("v_cap",), 4),
        (9, ("v_cap",), 4),
    ]
    m = MT.read_manifest(root)
    # admitted rows and the capture share ONE commit (version 4), and
    # the audit records counts for every expectation — zero included
    assert int(m["version"]) == 4
    assert m["operation"]["expectations"] == {
        "v_cap": {"policy": "quarantine", "violations": 3},
        "g_known": {"policy": "drop", "violations": 1},
    }
    d = MT.table_detail(root)
    assert d["n_quarantine_files"] == 1 and d["n_quarantined_rows"] == 3
    # the audit is queryable over time: history()/history_df surface
    # the gated merge's per-expectation counts ("how dirty was last
    # night's feed" from pure metadata)
    h = {e["version"]: e.get("expectations") for e in MT.history(root)}
    assert h[4]["v_cap"]["violations"] == 3 and h[1] is None
    hdf = MT.history_df(spark, root).filter("version = 4").collect()[0]
    assert '"violations": 3' in hdf["expectations"]
    # time travel: the pre-gate snapshot has no quarantine
    assert _quar(spark, root, version=1) == []


def test_null_passes_and_zero_violation_audit(spark, tmp_path):
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "g_known", "g <> 1", policy="quarantine")
    # k=7 has NULL g: NULL passes (only FALSE violates)
    MT.merge_upsert_atomic(
        spark, root, _batch(spark, 6, 8), keys=["k"]
    )
    assert _kept(spark, root) == [0, 1, 2, 6, 7]
    assert _quar(spark, root) == []
    # enforcement RAN and recorded zero: the audit proves the gate ran
    assert MT.read_manifest(root)["operation"]["expectations"] == {
        "g_known": {"policy": "quarantine", "violations": 0}
    }


def test_fail_policy_refuses_whole_batch_without_debris(spark, tmp_path):
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    MT.set_expectation(spark, root, "v_hard", "v < 90", policy="fail")
    v = int(MT.read_manifest(root)["version"])
    with pytest.raises(ValueError, match="v_hard"):
        MT.merge_upsert_atomic(spark, root, _batch(spark, 3, 10), keys=["k"])
    # atomic refusal: no commit, no admitted rows, no quarantine —
    # even though OTHER rows of the same batch were quarantine-bound
    assert int(MT.read_manifest(root)["version"]) == v
    assert _kept(spark, root) == [0, 1, 2]
    assert _quar(spark, root) == []
    # the staged capture was reaped on the refusal path, not left for
    # vacuum: parts/ holds only referenced dirs
    live = MT._referenced_rels(MT.read_manifest(root))
    on_disk = {
        f"parts/{d}" for d in os.listdir(os.path.join(root, "parts"))
    }
    assert on_disk == live


def test_quarantine_wins_over_drop(spark, tmp_path):
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    # k=4 violates BOTH (g=1 drop, v=40>=35 quarantine): preserving
    # data wins — the row is quarantined, with only the quarantine
    # expectation in _violated (drop names aren't capture reasons)
    MT.set_expectation(spark, root, "v_cap", "v < 35", policy="quarantine")
    MT.set_expectation(spark, root, "g_known", "g <> 1", policy="drop")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 3, 5), keys=["k"])
    assert _kept(spark, root) == [0, 1, 2, 3]
    assert _quar(spark, root) == [(4, ("v_cap",), 4)]


def test_occ_merge_carries_quarantine(spark, tmp_path):
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    MT.merge_upsert_atomic(
        spark, root, _batch(spark, 3, 10), keys=["k"], concurrency="occ"
    )
    assert _kept(spark, root) == [0, 1, 2, 3, 4, 5, 6]
    assert [k for k, _, _ in _quar(spark, root)] == [7, 8, 9]


def test_exactly_once_replay_does_not_duplicate_quarantine(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    for _ in range(2):  # at-least-once redelivery of the same epoch
        MT.merge_upsert_atomic(
            spark, root, _batch(spark, 3, 10), keys=["k"],
            txn_app="app", txn_version=1,
        )
    assert [k for k, _, _ in _quar(spark, root)] == [7, 8, 9]
    # the replay's duplicate capture was reaped, not orphaned (the
    # superseded data dirs of earlier versions are ordinary
    # vacuum-later garbage; only q- dirs are this test's subject)
    live = MT._referenced_rels(MT.read_manifest(root))
    orphan_q = [
        d
        for d in os.listdir(os.path.join(root, "parts"))
        if d.startswith("q-") and f"parts/{d}" not in live
    ]
    assert orphan_q == []


@pytest.mark.parametrize("point", ["staged", "manifest_tmp_written"])
def test_kill_at_commit_boundary_is_atomic(spark, tmp_path, point):
    """VERDICT r12 #3's kill-test: a crash between quarantine staging
    and the manifest commit exposes NEITHER the admitted rows NOR the
    quarantined ones; the retry lands both in one version."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    v = int(MT.read_manifest(root)["version"])
    with pytest.raises(Kill):
        MT.merge_upsert_atomic(
            spark, root, _batch(spark, 3, 10), keys=["k"],
            _fault=_kill_at(point),
        )
    assert int(MT.read_manifest(root)["version"]) == v
    assert _kept(spark, root) == [0, 1, 2]  # no admitted rows
    assert _quar(spark, root) == []  # no capture visible
    # the retry commits admitted + capture atomically
    MT.merge_upsert_atomic(spark, root, _batch(spark, 3, 10), keys=["k"])
    assert _kept(spark, root) == [0, 1, 2, 3, 4, 5, 6]
    assert [k for k, _, _ in _quar(spark, root)] == [7, 8, 9]
    # the crash's orphaned capture dir is unreferenced garbage for
    # vacuum (grace 0: no concurrent writer here)
    MT.vacuum(root, grace_sec=0.0)
    live = MT._referenced_rels(MT.read_manifest(root))
    on_disk = {
        f"parts/{d}" for d in os.listdir(os.path.join(root, "parts"))
    }
    assert on_disk == live


def test_vacuum_spares_quarantine_dirs(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    before = _quar(spark, root)
    removed = MT.vacuum(root, grace_sec=0.0)
    assert all("q-" not in rel for rel in removed)
    assert _quar(spark, root) == before


def test_toctou_declaration_moved_refuses_and_reaps(spark, tmp_path):
    """The in-lock guard: a batch split under stale declarations must
    refuse (the admitted set was gated by the wrong policy) and reap
    its staged capture."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    with pytest.raises(ValueError, match="expectations changed"):
        MT._merge_upsert_atomic_locked(
            spark, root, _batch(spark, 10, 12), keys=["k"],
            validated_constraints={},
            validated_generation={},
            validated_expectations={},  # stale: table has two
        )


def test_derived_commits_carry_expectations_and_quarantine(
    spark, tmp_path
):
    """The carrier sweep (the ADVICE-r9 resurrection-hazard pattern,
    applied to the new field): every derived commit must re-point the
    quarantine capture and keep the declarations enforced."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    want_q = [k for k, _, _ in _quar(spark, root)]
    ops = [
        lambda: MT.add_constraint(spark, root, "k_pos", "k >= 0"),
        lambda: MT.drop_constraint(root, "k_pos"),
        lambda: MT.update_where(
            spark, root, F.col("k") == 0, {"v": F.lit(5)}
        ),
        lambda: MT.compact_partition(spark, root, None),
        lambda: MT.delete_where(spark, root, F.col("k") == 6),
        lambda: MT.delete_where_mor(spark, root, F.col("k") == 5, ["k"]),
        lambda: MT.apply_deletes(spark, root),
        lambda: MT.delete_where_pos(spark, root, F.col("k") == 3),
        lambda: MT.apply_pos_deletes(spark, root),
        lambda: MT.rename_column(spark, root, "g", "grp"),
        lambda: MT.repartition_table(spark, root, "grp"),
    ]
    for op in ops:
        op()
        m = MT.read_manifest(root)
        assert set(m.get("expectations") or {}) == {"v_cap", "g_known"}, (
            m["operation"]
        )
        assert [k for k, _, _ in _quar(spark, root)] == want_q, (
            m["operation"]
        )
    # the rename rewrote the declaration's identifiers (constraint rule)
    assert (
        MT.read_manifest(root)["expectations"]["g_known"]["expr"]
        == "grp <> 1"
    )
    # ...and the gate still enforces post-rename, on the new name:
    # k=10 violates BOTH (grp=1 drop, v=100 quarantine) so quarantine
    # wins; k=11 (v=110 >= 70) quarantines
    MT.merge_upsert_atomic(
        spark,
        root,
        _batch(spark, 10, 12).withColumnRenamed("g", "grp"),
        keys=["k"],
        partition_by="grp",
    )
    assert 10 not in _kept(spark, root) and 11 not in _kept(spark, root)
    assert [k for k, _, _ in _quar(spark, root)] == [*want_q, 10, 11]


def test_restore_rewinds_quarantine_to_target(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)  # v4 carries the capture
    MT.restore_version(spark, root, 1)  # pre-gate snapshot
    assert _quar(spark, root) == []
    assert _kept(spark, root) == [0, 1, 2]
    # declarations are administrative (the constraint rule): they
    # survive restore FROM CURRENT, so the gate still enforces
    assert set(MT.read_manifest(root)["expectations"]) == {
        "v_cap", "g_known",
    }
    MT.restore_version(spark, root, 4)
    assert [k for k, _, _ in _quar(spark, root)] == [7, 8, 9]


def test_clone_carries_quarantine_absolute(spark, tmp_path):
    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    _mk(spark, src)
    MT.clone_table(src, dst)
    assert [k for k, _, _ in _quar(spark, dst)] == [7, 8, 9]
    # zero-copy: the clone's capture rels resolve into the source
    assert all(
        os.path.isabs(rel)
        for rel in MT.read_manifest(dst)["quarantine"]
    )
    # the clone's gate is live too
    MT.merge_upsert_atomic(spark, dst, _batch(spark, 17, 19), keys=["k"])
    assert [k for k, _, _ in _quar(spark, dst)] == [7, 8, 9, 17, 18]
    # ...and the source never observed any of it
    assert [k for k, _, _ in _quar(spark, src)] == [7, 8, 9]


def test_drop_column_refuses_while_expectation_references_it(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    _mk(spark, root)
    with pytest.raises(ValueError, match="drop_expectation first"):
        MT.drop_column(spark, root, "g")
    MT.drop_expectation(root, "g_known")
    MT.drop_column(spark, root, "g")  # now fine
    assert set(MT.read_manifest(root)["expectations"]) == {"v_cap"}


def test_schema_evolution_batch_omitting_gated_column(spark, tmp_path):
    """An expectation over a column the batch omits evaluates against
    the typed NULL the merged rows will hold — NULL passes (the
    _validate_constraints rule)."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 10", policy="quarantine")
    MT.merge_upsert_atomic(
        spark,
        root,
        spark.range(20, 22).select(F.col("id").alias("k")),
        keys=["k"],
    )
    assert _kept(spark, root) == [0, 1, 2, 20, 21]
    assert _quar(spark, root) == []


def test_quarantine_capture_unions_across_batch_schemas(spark, tmp_path):
    """Two gated merges whose BATCHES carry different columns: each
    capture stores the batch exactly as it arrived; read_quarantine
    unions them by name with missing columns as NULLs."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 7, 9), keys=["k"])
    # second gated batch adds an extra column (schema evolution)
    MT.merge_upsert_atomic(
        spark,
        root,
        _batch(spark, 9, 11).withColumn("src", F.lit("feed2")),
        keys=["k"],
    )
    q = {
        r.k: (r.src, r._quarantined_at_version)
        for r in MT.read_quarantine(spark, root).collect()
    }
    assert q[7] == (None, 3) and q[8] == (None, 3)
    assert q[9] == ("feed2", 4) and q[10] == ("feed2", 4)


def test_set_expectation_validates_policy_and_duplicates(
    spark, tmp_path
):
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    with pytest.raises(ValueError, match="policy"):
        MT.set_expectation(spark, root, "x", "v < 10", policy="warn")
    MT.set_expectation(spark, root, "x", "v < 10")
    with pytest.raises(ValueError, match="already exists"):
        MT.set_expectation(spark, root, "x", "v < 20")
    with pytest.raises(KeyError):
        MT.drop_expectation(root, "nope")


def test_group_txn_members_enforce_their_own_gates(spark, tmp_path):
    """Composition with multi-table transactions: group_merge_atomic
    delegates to each member's gated merge, so a member's declaration
    splits ITS batch (capture committed in the member's own manifest
    version) while ungated members admit everything; the group
    pointer pins both post-merge versions together."""
    from stripe_data_pipeline_spark import table_group as TG

    groot = str(tmp_path / "g")
    ra, rb = str(tmp_path / "a"), str(tmp_path / "b")
    MT.merge_upsert_atomic(spark, ra, _batch(spark, 0, 2), keys=["k"])
    MT.merge_upsert_atomic(spark, rb, _batch(spark, 0, 2), keys=["k"])
    MT.set_expectation(spark, rb, "v_cap", "v < 70", policy="quarantine")
    TG.create_group(groot, {"a": ra, "b": rb})
    TG.group_merge_atomic(
        spark,
        groot,
        {
            "a": {"updates": _batch(spark, 6, 9), "keys": ["k"]},
            "b": {"updates": _batch(spark, 6, 9), "keys": ["k"]},
        },
        txn_app="g",
        txn_version=1,
    )
    assert _kept(spark, ra) == [0, 1, 6, 7, 8]  # ungated member
    assert _kept(spark, rb) == [0, 1, 6]  # 7,8 quarantined (v>=70)
    assert [k for k, _, _ in _quar(spark, rb)] == [7, 8]
    # the group view serves the SAME consistent cut
    assert sorted(
        r.k for r in TG.read_group_table(spark, groot, "b").collect()
    ) == [0, 1, 6]


def test_invalid_concurrency_refuses_before_staging(spark, tmp_path):
    """r13 review: a typo'd concurrency mode must refuse BEFORE the
    gate stages a capture — no quarantine debris on the refusal."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    with pytest.raises(ValueError, match="concurrency"):
        MT.merge_upsert_atomic(
            spark, root, _batch(spark, 3, 10), keys=["k"],
            concurrency="occ_typo",
        )
    on_disk_q = [
        d for d in os.listdir(os.path.join(root, "parts"))
        if d.startswith("q-")
    ]
    assert on_disk_q == []  # nothing was staged, let alone leaked


def test_set_expectation_validates_expression_at_declaration(
    spark, tmp_path
):
    """r13 review: a typo'd column fails AT DECLARATION (analysis on
    an empty relation, zero data scans) instead of poisoning every
    later merge."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    with pytest.raises(Exception, match="valu"):
        MT.set_expectation(spark, root, "typo", "valu < 70")
    assert not MT.read_manifest(root).get("expectations")
    # ...and merges still flow (the bad declaration never landed)
    MT.merge_upsert_atomic(spark, root, _batch(spark, 3, 5), keys=["k"])
    assert _kept(spark, root) == [0, 1, 2, 3, 4]


def test_reserved_flag_prefix_refuses_not_corrupts(spark, tmp_path):
    """r13 review: a batch column named like an internal violation
    flag would be silently overwritten by the gate — refuse loudly."""
    root = str(tmp_path / "t")
    MT.merge_upsert_atomic(spark, root, _batch(spark, 0, 3), keys=["k"])
    MT.set_expectation(spark, root, "v_cap", "v < 70", policy="quarantine")
    with pytest.raises(ValueError, match="_sdps_viol_"):
        MT.merge_upsert_atomic(
            spark,
            root,
            _batch(spark, 3, 5).withColumn("_sdps_viol_0", F.lit(True)),
            keys=["k"],
        )
    assert _kept(spark, root) == [0, 1, 2]
