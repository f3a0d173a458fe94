"""Multi-table atomic transactions — a GROUP of manifest tables that
advance together or not at all (VERDICT r10 #8).

The per-table commit protocol is already crash-atomic, but a pipeline
run that updates SEVERAL marts (the reference's implicit DAG-run
atomicity: one Airflow run refreshes staging -> curated -> marts,
stripe_update_dag.py:7-42) needs a cross-table visibility unit — a
reader must never observe mart A from tonight's run next to mart B
from last night's.

Protocol (the two-level-pointer shape Iceberg gets from a catalog
commit and Delta from a commit coordinator):

1. Each table's new snapshot commits through its OWN crash-atomic
   protocol (merge_upsert_atomic) — these commits are real but
   NOT YET VISIBLE to group readers, whose versions are pinned by the
   group pointer, exactly as staged dirs are invisible until a table
   manifest references them.
2. One GROUP manifest (``{table: {root, version}}``) commits by
   tmp-write + fsync + atomic rename — the single instant the whole
   run becomes visible.

A crash anywhere leaves the group pointer on the OLD versions of
EVERY table (kill-point tested): per-table manifests may have
advanced, but group readers see a consistent old run; the re-run
completes idempotently (pass ``txn_app``/``txn_version`` so re-
delivered batches skip tables that already committed) and re-points.

Scale note: the group commit adds zero data IO — it is one JSON
rename regardless of table sizes; all heavy lifting stays in the
per-table merges.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

from stripe_data_pipeline_spark import manifest_table as MT

_GROUP = "GROUP"
_HISTORY = "group_history"


def _group_path(group_root: str) -> str:
    return os.path.join(group_root, _GROUP)


def read_group(group_root: str) -> dict | None:
    """The committed group pointer, or None before the first commit."""
    try:
        with open(_group_path(group_root)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _commit_group(group_root: str, pointer: dict, _fault=None) -> None:
    """tmp-write + fsync + rename — the same atomic step as a table
    manifest commit, with a history copy for group time travel."""
    import time as _time

    pointer.setdefault("committed_at_ms", int(_time.time() * 1000))
    hist = os.path.join(group_root, _HISTORY)
    os.makedirs(hist, exist_ok=True)
    with open(
        os.path.join(hist, f"g{int(pointer['version']):08d}.json"), "w"
    ) as f:
        json.dump(pointer, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    tmp = os.path.join(group_root, f"GROUP.tmp-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(pointer, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    if _fault:
        _fault("group_tmp_written")
    os.replace(tmp, _group_path(group_root))
    if _fault:
        _fault("group_committed")


def create_group(group_root: str, tables: dict[str, str]) -> None:
    """Register ``{name: table_root}`` as a transaction group. Tables
    may be empty (version -1) or already populated; the pointer pins
    whatever is committed right now."""
    os.makedirs(group_root, exist_ok=True)
    with MT._writer_lock(group_root):
        if read_group(group_root) is not None:
            raise ValueError(f"group already exists at {group_root}")
        entries = {}
        for name, root in tables.items():
            m = MT.read_manifest(root)
            entries[name] = {
                "root": os.path.abspath(root),
                "version": -1 if m is None else int(m["version"]),
            }
        _commit_group(group_root, {"version": 1, "tables": entries})


def group_merge_atomic(
    spark: SparkSession,
    group_root: str,
    batches: dict[str, dict],
    txn_app: str | None = None,
    txn_version: int | None = None,
    _fault=None,
) -> None:
    """Commit one batch into SEVERAL tables as a single visibility
    unit. ``batches`` maps table name -> merge kwargs
    (``updates`` (DataFrame), ``keys``, optional ``partition_by`` /
    ``stats_cols``). Tables commit in sorted-name order through their
    own crash-atomic merges; the group pointer then re-pins every
    member table (including ones not written this run) in one rename.

    Pass ``txn_app``/``txn_version`` for exactly-once under re-runs:
    a crashed run's re-delivery skips tables whose per-table txn
    ledger already recorded the version, finishes the rest, and
    completes the interrupted group commit. ``_fault`` hooks fire at
    ``table_committed:<name>`` and the group-commit points —
    tests/test_table_group.py kills the writer at each and asserts no
    torn group read."""
    with MT._writer_lock(group_root):
        g = read_group(group_root)
        if g is None:
            raise FileNotFoundError(f"no group at {group_root}")
        unknown = set(batches) - set(g["tables"])
        if unknown:
            raise KeyError(f"tables not in group: {sorted(unknown)}")
        for name in sorted(batches):
            spec = batches[name]
            MT.merge_upsert_atomic(
                spark,
                g["tables"][name]["root"],
                spec["updates"],
                keys=spec["keys"],
                partition_by=spec.get("partition_by"),
                stats_cols=spec.get("stats_cols"),
                txn_app=txn_app,
                txn_version=txn_version,
            )
            if _fault:
                _fault(f"table_committed:{name}")
        entries = {}
        for name, ent in g["tables"].items():
            m = MT.read_manifest(ent["root"])
            entries[name] = {
                "root": ent["root"],
                "version": -1 if m is None else int(m["version"]),
            }
        pointer = {"version": int(g["version"]) + 1, "tables": entries}
        if txn_app is not None:
            pointer["txns"] = {
                **(g.get("txns") or {}),
                txn_app: int(txn_version),
            }
        elif g.get("txns"):
            pointer["txns"] = g["txns"]
        _commit_group(group_root, pointer, _fault)


def read_group_table(
    spark: SparkSession,
    group_root: str,
    name: str,
    group_version: int | None = None,
    **read_kwargs,
) -> DataFrame:
    """Read a member table AT THE VERSION THE GROUP POINTER PINS —
    the consistent cross-table view. ``group_version`` time-travels
    the whole group. Extra kwargs pass through to read_table
    (partition_values, stats_filter, ...)."""
    if group_version is None:
        g = read_group(group_root)
        if g is None:
            raise FileNotFoundError(f"no group at {group_root}")
    else:
        with open(
            os.path.join(group_root, _HISTORY, f"g{group_version:08d}.json")
        ) as f:
            g = json.load(f)
    ent = g["tables"][name]
    if ent["version"] < 0:
        raise FileNotFoundError(f"table {name!r} empty at this group version")
    return MT.read_table(
        spark, ent["root"], version=ent["version"], **read_kwargs
    )


def vacuum_group(group_root: str, grace_sec: float = 600.0) -> dict:
    """Vacuum every member table WITHOUT reaping anything the group
    pointer still pins. A plain per-table ``vacuum(retain_history=0)``
    keeps only the table's CURRENT version — but after a crashed group
    run the pointer legitimately pins an OLDER version (the per-table
    commit advanced, the group commit never landed), and reaping it
    would turn the crash-consistent group read into a
    FileNotFoundError. Here each table's retention is computed FROM
    the pointer: retain exactly back to the pinned version (0 when
    the pointer is current). The same retention interplay Delta/
    Iceberg document for readers pinned to old snapshots, enforced
    mechanically for the group's own reader. Returns
    {table: removed_relpaths}.

    The retention depth is resolved INSIDE each table's writer lock
    (``retain_to_version`` floor), not precomputed from a manifest
    read taken under only the group lock: a concurrent table-level
    writer (legal — group_merge_atomic re-pins tables not written
    this run) committing between that read and the vacuum would shift
    a ``current_v - pinned_v`` window forward and reap the pinned
    snapshot (ADVICE r11, medium)."""
    with MT._writer_lock(group_root):
        g = read_group(group_root)
        if g is None:
            raise FileNotFoundError(f"no group at {group_root}")
        removed: dict[str, list] = {}
        for name, ent in g["tables"].items():
            if MT.read_manifest(ent["root"]) is None:
                removed[name] = []
                continue
            pinned_v = int(ent["version"])
            removed[name] = MT.vacuum(
                ent["root"],
                retain_history=0,
                grace_sec=grace_sec,
                retain_to_version=pinned_v if pinned_v >= 0 else None,
            )
        return removed
