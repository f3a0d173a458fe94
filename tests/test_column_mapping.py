"""Column-mapping evolution (VERDICT r10 #5 — the Delta
column-mapping shape): rename/drop as metadata-only commits, physical
names pinned in the manifest, reads projecting through the mapping,
constraints and MOR delete keys following renames, and
drop-then-re-add never resurrecting the dropped column's bytes."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT


def _mk(spark, root):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, part string, amount double",
    )
    MT.merge_upsert_atomic(
        spark, root, df, keys=["id"], partition_by="part",
        stats_cols=["amount"],
    )


def _dirs_of(root):
    m = MT.read_manifest(root)
    return dict(m["parts"])


def test_rename_is_metadata_only_and_reads_project(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    before = _dirs_of(root)
    MT.rename_column(spark, root, "amount", "value_usd")
    assert _dirs_of(root) == before  # no dir rewritten
    t = MT.read_table(spark, root)
    assert sorted(t.columns) == ["id", "part", "value_usd"]
    assert {(r["id"], r["value_usd"]) for r in t.collect()} == {
        (1, 10.0), (2, 20.0), (3, 30.0),
    }
    m = MT.read_manifest(root)
    assert m["column_mapping"] == {"value_usd": "amount"}
    with pytest.raises(KeyError):
        MT.rename_column(spark, root, "amount", "x")  # old name is gone
    with pytest.raises(ValueError):
        MT.rename_column(spark, root, "id", "part")  # target exists


def test_time_travel_across_rename_bit_matches(spark, tmp_path):
    """Each snapshot reads under its OWN schema+mapping: v1 shows the
    old name with identical values; the current version the new."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    v1_rows = {
        (r["id"], r["amount"])
        for r in MT.read_table(spark, root, version=1).collect()
    }
    MT.rename_column(spark, root, "amount", "value_usd")
    MT.merge_upsert_atomic(
        spark, root,
        spark.createDataFrame([(4, "b", 40.0)],
                              "id long, part string, value_usd double"),
        keys=["id"], partition_by="part", stats_cols=["value_usd"],
    )
    # v1 unchanged, old logical name
    t1 = MT.read_table(spark, root, version=1)
    assert sorted(t1.columns) == ["amount", "id", "part"]
    assert {(r["id"], r["amount"]) for r in t1.collect()} == v1_rows
    # current: merged row visible under the new name; post-rename merge
    # wrote the column under its pinned PHYSICAL name
    cur = {(r["id"], r["value_usd"])
           for r in MT.read_table(spark, root).collect()}
    assert cur == {(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0)}


def test_stats_and_hwm_survive_rename(spark, tmp_path):
    """Manifest stats and footer file_stats are keyed by PHYSICAL name,
    so a rename invalidates nothing: the HWM still resolves from the
    manifest alone and stats_filter still prunes."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.rename_column(spark, root, "amount", "value_usd")
    assert MT.resolve_high_watermark(spark, root, "value_usd") == 30.0
    probe = MT.read_table(spark, root, stats_filter={"value_usd": (30.0, 30.0)})
    assert {r["id"] for r in probe.collect()} == {3}
    # manifest-level pruning actually happened (partition a dropped)
    assert len({os.path.dirname(f) for f in probe.inputFiles()}) == 1


def test_constraints_follow_rename(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.add_constraint(spark, root, "amt_pos", "amount > 0.0")
    MT.rename_column(spark, root, "amount", "value_usd")
    m = MT.read_manifest(root)
    assert m["constraints"] == {"amt_pos": "value_usd > 0.0"}
    bad = spark.createDataFrame(
        [(9, "a", -1.0)], "id long, part string, value_usd double"
    )
    with pytest.raises(ValueError, match="amt_pos"):
        MT.merge_upsert_atomic(spark, root, bad, keys=["id"],
                               partition_by="part")


def test_mor_delete_keys_follow_rename(spark, tmp_path):
    """Deletes recorded BEFORE a key rename must still anti-join after
    it (delete files store physical names), and delete_where_mor
    keyed on the NEW name keeps working."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.delete_where_mor(spark, root, F.col("id") == 1, keys=["id"])
    MT.rename_column(spark, root, "id", "order_id")
    t = MT.read_table(spark, root)
    assert {r["order_id"] for r in t.collect()} == {2, 3}
    assert MT.read_manifest(root)["delete_keys"] == ["order_id"]
    MT.delete_where_mor(spark, root, F.col("order_id") == 2, keys=["order_id"])
    assert {r["order_id"] for r in MT.read_table(spark, root).collect()} == {3}
    MT.apply_deletes(spark, root)
    assert {r["order_id"] for r in MT.read_table(spark, root).collect()} == {3}


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    """The physical name of a dropped column is RETIRED: re-adding the
    same logical name mints a fresh physical name, so old files read
    NULL instead of the dropped bytes."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    before = _dirs_of(root)
    MT.drop_column(spark, root, "amount")
    assert _dirs_of(root) == before  # metadata-only
    assert sorted(MT.read_table(spark, root).columns) == ["id", "part"]
    MT.merge_upsert_atomic(
        spark, root,
        spark.createDataFrame([(1, "a", 999.0)],
                              "id long, part string, amount double"),
        keys=["id"], partition_by="part",
    )
    rows = {r["id"]: r["amount"] for r in MT.read_table(spark, root).collect()}
    assert rows == {1: 999.0, 2: None, 3: None}
    m = MT.read_manifest(root)
    assert "amount" in m["retired_physical"]
    assert m["column_mapping"]["amount"] != "amount"  # fresh physical


def test_drop_refusals(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    with pytest.raises(ValueError, match="partition column"):
        MT.drop_column(spark, root, "part")
    MT.add_constraint(spark, root, "amt_pos", "amount > 0.0")
    with pytest.raises(ValueError, match="constraint"):
        MT.drop_column(spark, root, "amount")
    MT.drop_constraint(root, "amt_pos")
    MT.delete_where_mor(spark, root, F.col("id") == 1, keys=["id"])
    with pytest.raises(ValueError, match="delete key"):
        MT.drop_column(spark, root, "id")
    MT.apply_deletes(spark, root)
    MT.drop_column(spark, root, "amount")
    with pytest.raises(KeyError):
        MT.drop_column(spark, root, "amount")


def test_mapping_survives_derived_commits_and_clone(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.rename_column(spark, root, "amount", "value_usd")
    MT.compact_partition(spark, root, "a")
    MT.update_where(spark, root, F.col("id") == 1, {"value_usd": F.lit(11.0)})
    MT.delete_where(spark, root, F.col("id") == 2)
    MT.maintain(spark, root, cluster_by=["value_usd"], retain_history=0,
                grace_sec=0.0)
    m = MT.read_manifest(root)
    assert m["column_mapping"] == {"value_usd": "amount"}
    rows = {(r["id"], r["value_usd"])
            for r in MT.read_table(spark, root).collect()}
    assert rows == {(1, 11.0), (3, 30.0)}
    dst = str(tmp_path / "clone")
    MT.clone_table(root, dst)
    assert MT.read_manifest(dst)["column_mapping"] == {"value_usd": "amount"}
    assert {(r["id"], r["value_usd"])
            for r in MT.read_table(spark, dst).collect()} == rows


def test_rename_swap_chain_stays_consistent(spark, tmp_path):
    """b->c then a->b: logical b now binds a's original bytes, logical
    c binds b's — the mapping chain must keep physical names unique
    and reads exact."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 100, 200)], "id long, a long, b long")
    MT.merge_upsert_atomic(spark, root, df, keys=["id"])
    MT.rename_column(spark, root, "b", "c")
    MT.rename_column(spark, root, "a", "b")
    r = MT.read_table(spark, root).collect()[0]
    assert (r["b"], r["c"]) == (100, 200)
    m = MT.read_manifest(root)
    assert m["column_mapping"] == {"c": "b", "b": "a"}


def test_write_after_swap_chain(spark, tmp_path):
    """ADVICE r11 (high): after a chained/swapped mapping (b->c then
    a->b => {c: b, b: a}) every DATA-REWRITING op must still work.
    withColumnsRenamed folds the pairs sequentially and renames two
    columns to the same name (COLUMN_ALREADY_EXISTS, table
    un-writable); _stage_versioned must project simultaneously."""
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, 100, 200), (2, 300, 400)], "id long, a long, b long"
    )
    MT.merge_upsert_atomic(spark, root, df, keys=["id"])
    MT.rename_column(spark, root, "b", "c")
    MT.rename_column(spark, root, "a", "b")
    # merge: upsert one row, insert one, in the LOGICAL space
    up = spark.createDataFrame([(2, 301, 401), (3, 500, 600)],
                               "id long, b long, c long")
    MT.merge_upsert_atomic(spark, root, up, keys=["id"])
    MT.update_where(spark, root, F.col("id") == 1, {"b": F.col("b") + 1})
    MT.delete_where(spark, root, F.col("id") == 3)
    rows = {
        (r["id"], r["b"], r["c"])
        for r in MT.read_table(spark, root).collect()
    }
    assert rows == {(1, 101, 200), (2, 301, 401)}
    # physical uniqueness on disk: files still carry a/b, never a dup
    m = MT.read_manifest(root)
    assert m["column_mapping"] == {"c": "b", "b": "a"}
    phys = [f.name for f in MT._physical_schema(m).fields]
    assert len(phys) == len(set(phys))


def test_change_feed_across_rename(spark, tmp_path):
    """A metadata-only rename yields an EMPTY feed (no dir, no delete
    file changed); a merge after the rename diffs in the new logical
    space; a span crossing the rename reports old-version rows under
    the NEW names (the aligned-to-newer-schema contract)."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    v1 = int(MT.read_manifest(root)["version"])
    MT.rename_column(spark, root, "amount", "value_usd")
    v2 = int(MT.read_manifest(root)["version"])
    assert MT.read_changes(spark, root, v1, v2).count() == 0
    MT.merge_upsert_atomic(
        spark, root,
        spark.createDataFrame([(2, "a", 25.0)],
                              "id long, part string, value_usd double"),
        keys=["id"], partition_by="part",
    )
    v3 = int(MT.read_manifest(root)["version"])
    feed = MT.read_changes(spark, root, v1, v3)
    got = {(r["_change_type"], r["id"], r["value_usd"])
           for r in feed.collect()}
    assert got == {("delete", 2, 20.0), ("insert", 2, 25.0)}


def test_mor_delete_feed_across_rename_of_key(spark, tmp_path):
    """Delete-list delta on unchanged dirs, with the KEY renamed in
    between: the physical-identity key matching must still select
    exactly the deleted rows."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    v1 = int(MT.read_manifest(root)["version"])
    MT.delete_where_mor(spark, root, F.col("id") == 1, keys=["id"])
    MT.rename_column(spark, root, "id", "order_id")
    v3 = int(MT.read_manifest(root)["version"])
    feed = MT.read_changes(spark, root, v1, v3)
    got = {(r["_change_type"], r["order_id"]) for r in feed.collect()}
    assert got == {("delete", 1)}


def test_occ_refuses_rebase_across_rename(spark, tmp_path):
    """An OCC merge staged under the old mapping must NOT rebase onto
    a snapshot whose mapping changed mid-flight — it replans (and the
    replanned merge lands under the new mapping)."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    state = {"stagings": 0, "renamed": False}

    def fault(point):
        if point == "staged":
            state["stagings"] += 1
            if not state["renamed"]:
                state["renamed"] = True
                MT.rename_column(spark, root, "amount", "value_usd")

    up = spark.createDataFrame(
        [(9, "b", 90.0)], "id long, part string, value_usd double"
    )
    MT.merge_upsert_atomic(
        spark, root, up, keys=["id"], partition_by="part",
        concurrency="occ", _fault=fault,
    )
    assert state["stagings"] == 2  # replanned, did not rebase
    rows = {(r["id"], r["value_usd"])
            for r in MT.read_table(spark, root).collect()}
    assert rows == {(1, 10.0), (2, 20.0), (3, 30.0), (9, 90.0)}


# --- model-based property test: random evolution sequences vs a model ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_POOL = ["v", "w", "x", "y"]  # small pool so drop-then-readd happens

_merge_op = st.tuples(
    st.just("merge"),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),   # id
            st.sampled_from(["a", "b"]),             # day
            st.integers(min_value=0, max_value=99),  # base value
        ),
        min_size=1,
        max_size=3,
    ),
    st.booleans(),  # also introduce a new column from the pool?
)
_evolve_ops = st.lists(
    st.one_of(
        _merge_op,
        st.tuples(st.just("rename"), st.integers(0, 3), st.integers(0, 3)),
        st.tuples(st.just("drop"), st.integers(0, 3)),
        st.just(("compact",)),
        st.just(("vacuum",)),
    ),
    min_size=1,
    max_size=7,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(ops=_evolve_ops)
def test_random_evolution_sequences_match_model(
    spark, tmp_path_factory, ops
):
    """Any interleaving of merges (some introducing columns), renames,
    drops (with re-adds of previously dropped/renamed names — the
    byte-resurrection hazard), compactions and vacuums must read back
    exactly what a dict model predicts, and every retained snapshot
    must time-travel to its own recorded state under its own schema."""
    from pyspark.sql import types as T

    root = str(tmp_path_factory.mktemp("cmprop") / "t")
    cols: list[str] = ["v"]
    rows: dict[int, dict] = {}
    snapshots: list[tuple[int, list[str], dict]] = []

    def table_state():
        if not MT.read_manifest(root):
            return None
        got = {}
        for r in MT.read_table(spark, root).collect():
            got[r["id"]] = {c: r[c] for c in cols}
            assert sorted(r.asDict()) == sorted(["id", "day"] + cols)
        return got

    def model_state():
        return {i: {c: row.get(c) for c in cols} for i, row in rows.items()}

    for op in ops:
        if op[0] == "merge":
            _, triples, add_col = op
            new_col = None
            if add_col:
                unused = [c for c in _POOL if c not in cols]
                if unused:
                    new_col = unused[0]
            batch_cols = cols + ([new_col] if new_col else [])
            fields = [
                T.StructField("id", T.LongType()),
                T.StructField("day", T.StringType()),
            ] + [T.StructField(c, T.LongType()) for c in batch_cols]
            data = []
            seen = set()
            for i, day, v in triples:
                if i in seen:
                    continue
                seen.add(i)
                data.append(
                    (i, day, *[v + k for k in range(len(batch_cols))])
                )
            batch = spark.createDataFrame(data, T.StructType(fields))
            MT.merge_upsert_atomic(spark, root, batch, ["id"], "day")
            if new_col:
                for row in rows.values():
                    row.setdefault(new_col, None)
                cols.append(new_col)
            for i, day, v in triples:
                if i in {d[0] for d in data}:
                    pass
            for d in data:
                rows[d[0]] = {
                    c: d[2 + k] for k, c in enumerate(batch_cols)
                }
                rows[d[0]]["__day"] = d[1]
        elif op[0] == "rename" and MT.read_manifest(root):
            _, i, j = op
            old = cols[i % len(cols)]
            unused = [c for c in _POOL + ["z"] if c not in cols]
            if not unused:
                continue
            new = unused[j % len(unused)]
            MT.rename_column(spark, root, old, new)
            cols[cols.index(old)] = new
            for row in rows.values():
                if old in row:
                    row[new] = row.pop(old)
        elif op[0] == "drop" and MT.read_manifest(root):
            if len(cols) <= 1:
                continue
            _, i = op
            victim = cols[i % len(cols)]
            MT.drop_column(spark, root, victim)
            cols.remove(victim)
            for row in rows.values():
                row.pop(victim, None)
        elif op[0] == "compact" and MT.read_manifest(root):
            parts = MT.read_manifest(root)["parts"]
            if parts:
                MT.compact_partition(spark, root, sorted(parts)[0], 1000)
        elif op[0] == "vacuum":
            MT.vacuum(root, retain_history=20, grace_sec=0)
        # invariant after EVERY op
        got = table_state()
        if got is not None:
            assert got == model_state()
            m = MT.read_manifest(root)
            snapshots.append(
                (int(m["version"]), list(cols), model_state())
            )
    # every retained snapshot time-travels to its own recorded state
    for version, snap_cols, snap_rows in snapshots:
        t = MT.read_table(spark, root, version=version)
        got = {
            r["id"]: {c: r[c] for c in snap_cols} for r in t.collect()
        }
        assert got == snap_rows, f"time travel to v{version} diverged"


def test_change_feed_refuses_span_crossing_delete_key_drop(spark, tmp_path):
    """A feed span that crosses apply_deletes + drop of the former
    delete-key column cannot express the old side under the newer
    schema — it must raise the documented loud error (Delta blocks
    CDF across mapping changes wholesale; we fail only on this one
    shape), and sub-spans that avoid the drop still work."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    v1 = int(MT.read_manifest(root)["version"])
    MT.delete_where_mor(spark, root, F.col("id") == 1, keys=["id"])
    v2 = int(MT.read_manifest(root)["version"])
    MT.apply_deletes(spark, root)
    MT.drop_column(spark, root, "amount")
    # id still exists, but drop another key-bearing shape: rename id
    # away and re-add a fresh id so the OLD snapshot's delete key "id"
    # maps to a physical no newer logical column carries
    MT.rename_column(spark, root, "id", "order_id")
    MT.drop_column(spark, root, "order_id")
    v_end = int(MT.read_manifest(root)["version"])
    # the OLD side (v2) holds PENDING deletes keyed on a column the
    # newer schema no longer carries -> loud refusal, not a deep
    # unresolved-column error
    with pytest.raises(ValueError, match="pending delete key"):
        MT.read_changes(spark, root, v2, v_end).collect()
    # sub-spans that do not cross the drop still read fine
    feed = MT.read_changes(spark, root, v1, v2)
    assert {r["_change_type"] for r in feed.collect()} == {"delete"}
    # and a span whose OLD side has no pending deletes crosses the
    # drop without needing key translation at all
    assert MT.read_changes(spark, root, v1, v_end).count() >= 0


def test_mapping_survives_constraint_and_tombstone_commits(spark, tmp_path):
    """r12 audit fix: add_constraint / drop_constraint /
    delete_where_mor / delete_where_pos are metadata-or-tombstone
    commits that must carry the column mapping — before the fix,
    add_constraint after a rename DROPPED the mapping and every
    renamed column read NULL from the physical files."""
    root = str(tmp_path / "t")
    _mk(spark, root)
    MT.rename_column(spark, root, "amount", "value_usd")
    MT.add_constraint(spark, root, "v_pos", "value_usd > 0")
    m = MT.read_manifest(root)
    assert m["column_mapping"] == {"value_usd": "amount"}
    rows = {(r["id"], r["value_usd"])
            for r in MT.read_table(spark, root).collect()}
    assert rows == {(1, 10.0), (2, 20.0), (3, 30.0)}
    MT.drop_constraint(root, "v_pos")
    assert MT.read_manifest(root)["column_mapping"] == {
        "value_usd": "amount"
    }
    MT.delete_where_mor(spark, root, F.col("id") == 3, keys=["id"])
    assert MT.read_manifest(root)["column_mapping"] == {
        "value_usd": "amount"
    }
    MT.apply_deletes(spark, root)
    MT.delete_where_pos(spark, root, F.col("id") == 2)
    m = MT.read_manifest(root)
    assert m["column_mapping"] == {"value_usd": "amount"}
    assert {(r["id"], r["value_usd"])
            for r in MT.read_table(spark, root).collect()} == {(1, 10.0)}
