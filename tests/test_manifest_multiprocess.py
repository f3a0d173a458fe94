"""CROSS-PROCESS manifest-table stress (VERDICT r5 #3): the threaded
OCC test in tests/test_manifest_table.py shares one JVM, so it cannot
catch fork-level bugs in the file-lock protocol
(manifest_table.py:93-140) — e.g. O_EXCL semantics, the stale-break
rename race, or a vacuum in one process reaping another process's
in-flight staging. These tests spawn REAL subprocesses (one per
writer, each with its own interpreter — and for the OCC test its own
SparkSession/JVM) against one shared table and assert no lost
updates, no corrupt manifest, and grace-window safety."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import stripe_data_pipeline_spark.manifest_table as MT

HERE = os.path.dirname(os.path.abspath(__file__))
LOCK_WORKER = os.path.join(HERE, "proc_lock_worker.py")
OCC_WORKER = os.path.join(HERE, "proc_occ_worker.py")


def _run_workers(cmds: list[list[str]], timeout: float) -> list[str]:
    procs = [
        subprocess.Popen(
            c, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True
        )
        for c in cmds
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed rc={p.returncode}:\n{err[-3000:]}"
        outs.append(out)
    return outs


def test_lock_mutual_exclusion_across_processes(tmp_path):
    """6 separate interpreters race _writer_lock around a read-modify-
    write of one counter; any mutual-exclusion hole between PROCESSES
    (not threads) loses increments."""
    root = str(tmp_path / "lockroot")
    os.makedirs(root)
    with open(os.path.join(root, "counter.txt"), "w") as f:
        f.write("0")
    n_procs, n_each = 6, 20
    cmds = [
        [sys.executable, LOCK_WORKER, root, str(n_each), "30.0"]
        for _ in range(n_procs)
    ]
    _run_workers(cmds, timeout=120)
    with open(os.path.join(root, "counter.txt")) as f:
        assert int(f.read()) == n_procs * n_each
    assert not os.path.exists(os.path.join(root, ".writer.lock"))


def test_stale_lock_broken_exactly_once_across_processes(tmp_path):
    """A dead writer's stale lock (old mtime) must be broken by the
    atomic-rename path such that the contending PROCESSES still
    serialize — with remove-then-create, both could end up 'holding'
    the lock and the counter would lose increments."""
    root = str(tmp_path / "staleroot")
    os.makedirs(root)
    with open(os.path.join(root, "counter.txt"), "w") as f:
        f.write("0")
    lock = os.path.join(root, ".writer.lock")
    with open(lock, "w") as f:
        f.write("99999")  # a pid that is long gone
    past = time.time() - 3600
    os.utime(lock, (past, past))
    n_procs, n_each = 4, 10
    cmds = [
        [sys.executable, LOCK_WORKER, root, str(n_each), "1.0"]
        for _ in range(n_procs)
    ]
    _run_workers(cmds, timeout=120)
    with open(os.path.join(root, "counter.txt")) as f:
        assert int(f.read()) == n_procs * n_each


def test_occ_cross_process_writers_no_lost_updates(spark, tmp_path):
    """Two REAL Spark processes (separate JVMs) interleave OCC merges
    on one table: disjoint private partitions (rebase path), one
    contended shared partition (full-replan path), a locked vacuum
    racing the other process's lock-free staging, and an OCC
    compaction. Afterwards the parent session verifies the committed
    state from a third process's point of view."""
    root = str(tmp_path / "occ_procs")
    n_merges = 4
    cmds = [
        [sys.executable, OCC_WORKER, root, str(wid), str(n_merges)]
        for wid in (1, 2)
    ]
    outs = _run_workers(cmds, timeout=600)
    reports = [json.loads(o.strip().splitlines()[-1]) for o in outs]
    assert {r["wid"] for r in reports} == {1, 2}

    # No lost updates: every key from both workers is present with the
    # LAST merge's value, in the right partition.
    df = MT.read_table(spark, root)
    rows = {r["id"]: (r["day"], r["val"]) for r in df.collect()}
    expected_ids = (
        {1000 + i for i in range(5)}
        | {2000 + i for i in range(5)}
        | {9100 + i for i in range(3)}
        | {9200 + i for i in range(3)}
    )
    assert set(rows) == expected_ids
    for i in expected_ids:
        day = "shared" if i >= 9000 else f"w{i // 1000}"
        assert rows[i] == (day, n_merges - 1), (i, rows[i])

    # Manifest integrity: every referenced dir exists; one commit per
    # merge landed (version counts merges + any won compactions).
    m = MT.read_manifest(root)
    for rel in m["parts"].values():
        assert os.path.isdir(os.path.join(root, rel)), rel
    n_compactions = sum(r["compactions"] for r in reports)
    # first commit is version 1; each later commit increments by 1
    assert int(m["version"]) == 2 * n_merges + n_compactions

    # Quiesced vacuum leaves no stale staging/tmp behind and the table
    # still reads identically afterwards.
    MT.vacuum(root, grace_sec=0.0)
    leftovers = [
        f
        for f in os.listdir(root)
        if f.startswith((".staging-", "MANIFEST.tmp-"))
    ]
    assert leftovers == []
    spark.catalog.refreshByPath(root)
    assert MT.read_table(spark, root).count() == len(expected_ids)


POS_WORKER = os.path.join(HERE, "proc_pos_worker.py")


def test_pos_deletes_race_occ_merges_across_processes(tmp_path):
    """A real-process deleter (delete_where_pos + apply_pos_deletes
    rounds) races a real-process OCC merger on one table. Serializable
    history invariants, checked by time travel over the commit log:
    at every delete_pos version the marked rows are hidden; at every
    apply version the visible rows equal its predecessor's (empty
    logical delta); at every merge version the full 20-key batch is
    present with one uniform val (merges refuse pending tombstones, so
    no merge can have committed over a live tombstone)."""
    import sys as _sys

    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.session import get_spark

    spark = get_spark("pos-race-check", master="local[4]",
                      shuffle_partitions=4)
    root = str(tmp_path / "t")
    seed = spark.createDataFrame(
        [(i, -1) for i in range(20)], "id INT, val INT"
    )
    MT.merge_upsert_atomic(spark, root, seed, keys=["id"])
    cmds = [
        [_sys.executable, POS_WORKER, root, "deleter", "4"],
        [_sys.executable, POS_WORKER, root, "merger", "4"],
    ]
    outs = _run_workers(cmds, timeout=420)
    deleter = json.loads(outs[0].strip().splitlines()[-1])
    assert sum(d["deleted"] for d in deleter) >= 2  # the race was real
    hist = MT.history(root)
    assert {h["type"] for h in hist} >= {"delete_pos", "merge"}
    for h in hist:
        v = h["version"]
        t = MT.read_table(spark, root, version=v)
        if h["type"] == "delete_pos":
            assert t.filter(F.col("id") % 10 == 3).count() == 0
            assert t.filter(F.col("id") % 10 != 3).count() == 18
        elif h["type"] == "apply_pos_deletes":
            prev = MT.read_table(spark, root, version=v - 1)
            assert t.exceptAll(prev).count() == 0
            assert prev.exceptAll(t).count() == 0
        elif h["type"] == "merge" and v > 1:
            assert t.count() == 20
            assert t.select("val").distinct().count() == 1
    # the final manifest is clean and writable
    assert not MT.read_manifest(root).get("pos_deletes")
    MT.merge_upsert_atomic(
        spark,
        root,
        spark.createDataFrame([(99, 99)], "id INT, val INT"),
        keys=["id"],
    )
