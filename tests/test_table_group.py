"""Multi-table transaction group: both marts advance or neither —
kill-point tested at every boundary of the group commit."""

from __future__ import annotations

import pytest

from stripe_data_pipeline_spark import table_group as TG
from stripe_data_pipeline_spark import manifest_table as MT


class _Kill(Exception):
    pass


def _kill_at(point):
    def fault(p):
        if p == point:
            raise _Kill(point)
    return fault


def _batches(spark, tag):
    a = spark.createDataFrame(
        [(1, f"a-{tag}", 10.0), (2, f"a-{tag}", 20.0)],
        "id long, label string, v double",
    )
    b = spark.createDataFrame(
        [(1, f"b-{tag}", 1.0)], "id long, label string, v double"
    )
    return {
        "mart_a": {"updates": a, "keys": ["id"]},
        "mart_b": {"updates": b, "keys": ["id"]},
    }


def _mk_group(spark, tmp_path):
    roots = {n: str(tmp_path / n) for n in ("mart_a", "mart_b")}
    g = str(tmp_path / "group")
    TG.create_group(g, roots)
    TG.group_merge_atomic(spark, g, _batches(spark, "run1"))
    return g, roots


def _group_labels(spark, g):
    return {
        n: sorted(
            r["label"] for r in TG.read_group_table(spark, g, n).collect()
        )
        for n in ("mart_a", "mart_b")
    }


def test_group_commit_advances_both(spark, tmp_path):
    g, _ = _mk_group(spark, tmp_path)
    labels = _group_labels(spark, g)
    assert labels == {"mart_a": ["a-run1", "a-run1"], "mart_b": ["b-run1"]}
    TG.group_merge_atomic(spark, g, _batches(spark, "run2"))
    labels = _group_labels(spark, g)
    assert labels == {"mart_a": ["a-run2", "a-run2"], "mart_b": ["b-run2"]}
    # group time travel: version 2 still shows run1 in BOTH marts
    old = {
        n: sorted(
            r["label"]
            for r in TG.read_group_table(spark, g, n, group_version=2)
            .collect()
        )
        for n in ("mart_a", "mart_b")
    }
    assert old == {"mart_a": ["a-run1", "a-run1"], "mart_b": ["b-run1"]}


@pytest.mark.parametrize(
    "point",
    [
        "table_committed:mart_a",
        "table_committed:mart_b",
        "group_tmp_written",
    ],
)
def test_no_torn_read_at_any_kill_point(spark, tmp_path, point):
    """Kill the writer (a) after the first table's commit, (b) after
    the second's, (c) after the group tmp write but before the
    pointer rename: group readers must see run1 in BOTH marts — never
    one mart from each run — and the idempotent re-run completes."""
    g, roots = _mk_group(spark, tmp_path)
    with pytest.raises(_Kill):
        TG.group_merge_atomic(
            spark, g, _batches(spark, "run2"),
            txn_app="nightly", txn_version=2, _fault=_kill_at(point),
        )
    labels = _group_labels(spark, g)
    assert labels == {"mart_a": ["a-run1", "a-run1"], "mart_b": ["b-run1"]}
    # per-table manifests may have advanced — invisible to the group
    va = int(MT.read_manifest(roots["mart_a"])["version"])
    # recovery: redeliver the SAME run (same txn); already-committed
    # tables skip via their txn ledger, the rest commit, pointer lands
    TG.group_merge_atomic(
        spark, g, _batches(spark, "run2"),
        txn_app="nightly", txn_version=2,
    )
    labels = _group_labels(spark, g)
    assert labels == {"mart_a": ["a-run2", "a-run2"], "mart_b": ["b-run2"]}
    # table A was NOT merged twice by the re-run
    if point != "table_committed:mart_a":
        pass  # A may or may not have committed pre-kill depending on point
    else:
        assert int(MT.read_manifest(roots["mart_a"])["version"]) == va


def test_replayed_group_run_is_noop(spark, tmp_path):
    g, roots = _mk_group(spark, tmp_path)
    TG.group_merge_atomic(
        spark, g, _batches(spark, "run2"), txn_app="n", txn_version=2
    )
    va = int(MT.read_manifest(roots["mart_a"])["version"])
    TG.group_merge_atomic(
        spark, g, _batches(spark, "run2"), txn_app="n", txn_version=2
    )
    assert int(MT.read_manifest(roots["mart_a"])["version"]) == va
    assert _group_labels(spark, g)["mart_a"] == ["a-run2", "a-run2"]


def test_unknown_table_refused(spark, tmp_path):
    g, _ = _mk_group(spark, tmp_path)
    with pytest.raises(KeyError, match="mart_c"):
        TG.group_merge_atomic(
            spark, g,
            {"mart_c": {"updates": None, "keys": ["id"]}},
        )


def test_vacuum_group_survives_concurrent_table_writer(
    spark, tmp_path, monkeypatch
):
    """ADVICE r11 (medium): a table-level writer (legal — the group
    model re-pins tables not written this run) committing BETWEEN
    vacuum_group's group-locked manifest read and the per-table vacuum
    shifts a precomputed current_v - pinned_v window forward, reaping
    the group-pinned snapshot. The retention depth must be resolved as
    a version FLOOR inside the table's own writer lock."""
    g, roots = _mk_group(spark, tmp_path)
    with pytest.raises(_Kill):
        TG.group_merge_atomic(
            spark, g, _batches(spark, "run2"),
            txn_app="n", txn_version=2,
            _fault=_kill_at("table_committed:mart_a"),
        )
    pinned_v = TG.read_group(g)["tables"]["mart_a"]["version"]
    real_vacuum = MT.vacuum

    def racing_vacuum(root, **kw):
        if root == roots["mart_a"]:
            # the concurrent writer lands after vacuum_group's read,
            # before the table vacuum acquires the table lock
            extra = spark.createDataFrame(
                [(99, "a-race", 9.0)], "id long, label string, v double"
            )
            MT.merge_upsert_atomic(spark, root, extra, keys=["id"])
        return real_vacuum(root, **kw)

    monkeypatch.setattr(TG.MT, "vacuum", racing_vacuum)
    TG.vacuum_group(g, grace_sec=0.0)
    # the pinned snapshot must still resolve — exact, no
    # FileNotFoundError on the crash-consistent group read
    pinned = MT.read_table(
        spark, roots["mart_a"], version=pinned_v
    ).collect()
    assert sorted(r["label"] for r in pinned) == ["a-run1", "a-run1"]
    assert _group_labels(spark, g)["mart_a"] == ["a-run1", "a-run1"]


def test_vacuum_group_spares_pinned_snapshots(spark, tmp_path):
    """After a crashed group run (table A advanced past the pointer),
    a naive per-table vacuum(retain_history=0) would reap the pinned
    snapshot's dirs; vacuum_group must retain back to the pin so the
    group read stays exact — and after the rerun completes the group,
    a second vacuum_group reclaims the superseded dirs."""
    g, roots = _mk_group(spark, tmp_path)
    with pytest.raises(_Kill):
        TG.group_merge_atomic(
            spark, g, _batches(spark, "run2"),
            txn_app="n", txn_version=2,
            _fault=_kill_at("table_committed:mart_a"),
        )
    # mart_a advanced; the group still pins its previous version
    TG.vacuum_group(g, grace_sec=0.0)
    labels = _group_labels(spark, g)
    assert labels == {"mart_a": ["a-run1", "a-run1"], "mart_b": ["b-run1"]}
    # complete the run, vacuum again: current group state stays exact
    TG.group_merge_atomic(
        spark, g, _batches(spark, "run2"), txn_app="n", txn_version=2
    )
    TG.vacuum_group(g, grace_sec=0.0)
    labels = _group_labels(spark, g)
    assert labels == {"mart_a": ["a-run2", "a-run2"], "mart_b": ["b-run2"]}
