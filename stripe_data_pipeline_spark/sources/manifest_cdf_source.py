"""Streaming CHANGE-DATA-FEED source over the manifest table — the
Delta "streaming from a table's change feed" shape (VERDICT r11's
lakehouse+streaming seam, built on round 12): downstream marts
subscribe to a table's row-level changes instead of re-scanning it.

``spark.readStream.format("manifestcdf").option("path", root)``
yields the same (rows + _change_type) relation as
:func:`manifest_table.read_changes`, one committed VERSION per
micro-batch offset, each row tagged ``_commit_version`` — so a
crashed consumer resumes exactly at its checkpointed version, and
``Trigger.AvailableNow`` drains precisely the committed history.

Spark-first scale design: ``partitions(start, end)`` plans one input
partition per (version, touched partition key) — the SAME pruning
read_changes does (untouched dirs are byte-identical and never
scanned), and the per-task unit is a single partition's old-vs-new
dir diff, parallel across touched partitions and versions. The task
body is pure pyarrow/pandas (executors have no SparkSession): scan
the two immutable dirs, project physical->logical through the span's
column mapping, multiset-diff (the exceptAll semantics), emit
insert/delete rows.

Merge-on-read DML streams NATIVELY (r12, Delta-CDF parity): a
``delete_where_pos`` commit plans one task per touched dir that
pyarrow-``take``s exactly the appended tombstone coordinates; a
``delete_where_mor`` commit plans one task per data dir semi-joining
the appended key tuples (excluding rows already dead under unchanged
positional tombstones); ``apply_deletes`` / ``apply_pos_deletes``
contribute ZERO tasks (a physical rewrite of rows already logically
dead — the batch read_changes feed for the same span is empty).

Honest scope (fails loudly, like read_changes' own guards): spans
that change the declared schema, rewrite data dirs while tombstones
are pending, or move tombstone state in an unreplayable shape (a
restore across delete commits) are refused — read those in batch via
read_changes; Delta's CDF streaming has the same schema-change
stop-the-stream behavior.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

FEED_COLS = ["_change_type", "_commit_version"]


def _load_manifest(root: str, version: int | None) -> dict | None:
    """Executor-safe manifest read (mirrors manifest_table.read_manifest
    without importing Spark-side helpers)."""
    if version is None:
        p = os.path.join(root, "MANIFEST")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)
    p = os.path.join(root, "history", f"v{version:08d}.json")
    if not os.path.exists(p):
        # version 0 == before the first commit: an empty snapshot
        return None
    with open(p) as fh:
        return json.load(fh)


def _logical_fields(m: dict) -> list:
    return T.StructType.fromJson(json.loads(m["schema"])).fields


def _scan_dir_logical(d: str, m: dict):
    """pyarrow scan of one immutable dir, projected to the manifest's
    LOGICAL columns (physical names are pinned at column creation, so
    this reads renamed columns' original bytes; columns a file
    predates read as None)."""
    import pandas as pd
    import pyarrow.parquet as pq

    mapping = m.get("column_mapping") or {}
    fields = _logical_fields(m)
    frames = []
    for fname in sorted(os.listdir(d)):
        if not fname.endswith(".parquet"):
            continue
        tbl = pq.read_table(os.path.join(d, fname))
        cols = {}
        for f in fields:
            phys = mapping.get(f.name, f.name)
            if phys in tbl.column_names:
                cols[f.name] = tbl.column(phys).to_pandas()
            else:
                cols[f.name] = pd.Series([None] * tbl.num_rows)
        frames.append(pd.DataFrame(cols))
    if not frames:
        return pd.DataFrame({f.name: pd.Series(dtype=object) for f in fields})
    return pd.concat(frames, ignore_index=True)


def _multiset_except(a, b):
    """exceptAll semantics: rows of ``a`` minus ``b`` with
    multiplicity. NaN-safe groupby (dropna=False)."""
    import pandas as pd

    if b.empty:
        return a
    key = list(a.columns)
    ac = a.groupby(key, dropna=False, sort=False).size()
    bc = b.groupby(key, dropna=False, sort=False).size()
    diff = ac.sub(bc, fill_value=0).clip(lower=0).astype(int)
    diff = diff[diff > 0]
    if diff.empty:
        return a.iloc[0:0]
    out = diff.index.to_frame(index=False)
    out.columns = key
    return out.loc[out.index.repeat(diff.to_numpy())].reset_index(drop=True)


@dataclass(frozen=True)
class CdfSpanPartition(InputPartition):
    root: str
    version: int
    key: str
    old_rel: str | None
    new_rel: str | None


@dataclass(frozen=True)
class CdfTombstonePartition(InputPartition):
    """A merge-on-read DELETE commit's slice of the feed for ONE data
    dir: no data dir changed, so the task re-derives the deleted rows
    from the commit's appended tombstone files. ``kind`` = 'pos'
    ((file, row_index) coordinates — the task pyarrow-takes exactly
    those rows) or 'eq' (key tuples — the task semi-joins the dir
    against the appended keys, after excluding rows already dead under
    the span's UNCHANGED positional tombstones). ``prior_pos_rels`` is
    empty for 'pos' (delete_where_pos marks only live rows by
    construction)."""

    root: str
    version: int
    dir_rel: str
    appended_rels: tuple
    kind: str
    delete_keys: tuple = ()
    prior_pos_rels: tuple = ()


class ManifestCdfStreamReader(DataSourceStreamReader):
    def __init__(self, schema: T.StructType, options: dict):
        self._root = options.get("path")
        if not self._root:
            raise ValueError("manifestcdf source needs a path")
        self._start = int(options.get("startingversion", 1))
        self._schema = schema

    def initialOffset(self) -> dict:
        return {"version": self._start - 1}

    def latestOffset(self) -> dict:
        m = _load_manifest(self._root, None)
        v = 0 if m is None else int(m["version"])
        return {"version": v}

    def _tombstone_dirnames(self, rels: tuple) -> set[str]:
        """Driver-side planning read: the distinct data-dir names a
        set of POSITIONAL tombstone files touches (one small column
        scan per file — tombstones are ∝ deleted rows, not data)."""
        import pyarrow.parquet as pq

        names: set[str] = set()
        for rel in rels:
            d = rel if os.path.isabs(rel) else os.path.join(self._root, rel)
            for fname in sorted(os.listdir(d)):
                if not fname.endswith(".parquet"):
                    continue
                col = (
                    pq.read_table(os.path.join(d, fname), columns=["rel"])
                    .column("rel")
                    .to_pylist()
                )
                names |= {
                    r.rsplit("/", 1)[0].rsplit("/", 1)[-1] for r in col
                }
        return names

    def partitions(
        self, start: dict, end: dict
    ) -> list[InputPartition]:
        out: list[InputPartition] = []
        declared = {f.name for f in self._schema.fields} - set(FEED_COLS)
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            m_new = _load_manifest(self._root, v)
            if m_new is None:
                raise FileNotFoundError(
                    f"manifestcdf: version {v} of {self._root} is gone "
                    "(vacuumed past the stream's position?)"
                )
            m_old = _load_manifest(self._root, v - 1) if v > 1 else None
            if {f.name for f in _logical_fields(m_new)} != declared:
                raise ValueError(
                    f"manifestcdf: version {v} changed the table schema "
                    "under the stream — restart the stream to pick up "
                    "the new schema (Delta CDF streaming stops the same "
                    "way)"
                )
            old_eq = list((m_old or {}).get("deletes") or [])
            new_eq = list(m_new.get("deletes") or [])
            old_pos = list((m_old or {}).get("pos_deletes") or [])
            new_pos = list(m_new.get("pos_deletes") or [])
            old_parts = {} if m_old is None else m_old["parts"]
            new_parts = m_new["parts"]
            delta = sorted(
                k
                for k in set(old_parts) | set(new_parts)
                if old_parts.get(k) != new_parts.get(k)
            )
            op = (m_new.get("operation") or {}).get("type")
            if old_eq == new_eq and old_pos == new_pos:
                # tombstone state steady: the feed is exactly the
                # per-dir raw diff — but only when no pending
                # tombstones intersect the rewritten dirs' rows (a
                # CoW delete / partition drop under pending tombstones
                # would double-count rows already logically dead)
                if (new_eq or new_pos) and delta:
                    raise ValueError(
                        f"manifestcdf: version {v} ({op}) rewrites data "
                        "dirs while merge-on-read tombstones are "
                        "pending — drain them first or read this span "
                        "in batch via read_changes"
                    )
                for key in delta:
                    out.append(
                        CdfSpanPartition(
                            self._root,
                            v,
                            key,
                            old_parts.get(key),
                            new_parts.get(key),
                        )
                    )
                continue
            # --- tombstone state moved: replay the DML natively ---
            if (
                op == "delete_pos"
                and not delta
                and old_eq == new_eq
                and new_pos[: len(old_pos)] == old_pos
            ):
                # positional DELETE: the appended tombstones name the
                # deleted rows exactly; one task per touched data dir
                # pyarrow-takes those coordinates (delete_where_pos
                # marks only rows live at v-1, so no re-filtering)
                appended = tuple(new_pos[len(old_pos):])
                dirnames = self._tombstone_dirnames(appended)
                for _key, prel in sorted(new_parts.items()):
                    if os.path.basename(prel) in dirnames:
                        out.append(
                            CdfTombstonePartition(
                                self._root, v, prel, appended, "pos"
                            )
                        )
                continue
            if (
                op == "delete_mor"
                and not delta
                and old_pos == new_pos
                and new_eq[: len(old_eq)] == old_eq
            ):
                # equality DELETE: semi-join every data dir against the
                # appended key tuples (the same unchanged-dir key-delta
                # plan batch read_changes uses), excluding rows already
                # dead under the span's unchanged positional tombstones
                appended = tuple(new_eq[len(old_eq):])
                mapping = m_new.get("column_mapping") or {}
                dk = tuple(
                    (k, mapping.get(k, k)) for k in m_new["delete_keys"]
                )
                for _key, prel in sorted(new_parts.items()):
                    out.append(
                        CdfTombstonePartition(
                            self._root,
                            v,
                            prel,
                            appended,
                            "eq",
                            dk,
                            tuple(new_pos),
                        )
                    )
                continue
            if (
                op == "apply_pos_deletes"
                and not new_pos
                and old_pos
                and old_eq == new_eq
            ) or (
                op == "apply_deletes"
                and not new_eq
                and old_eq
                and old_pos == new_pos
            ):
                # materialization: a physical rewrite of rows already
                # logically dead — the logical delta is provably empty,
                # so the version contributes NO tasks (matching batch
                # read_changes' empty feed for the same span)
                continue
            raise ValueError(
                f"manifestcdf: version {v} ({op}) changed merge-on-read "
                "tombstone state in a shape the stream cannot replay "
                "(e.g. a restore across delete commits) — read this "
                "span in batch via read_changes"
            )
        return out

    def _read_tombstone(
        self, p: CdfTombstonePartition
    ) -> Iterator[tuple]:
        """Replay one data dir's slice of a merge-on-read DELETE
        commit: no dir changed, so the deleted rows are re-derived
        from the commit's appended tombstone files — by coordinate
        take() for 'pos', by key semi-join for 'eq'."""
        import pandas as pd
        import pyarrow.parquet as pq

        m_new = _load_manifest(p.root, p.version)
        mapping = m_new.get("column_mapping") or {}
        cols = [
            f.name for f in self._schema.fields if f.name not in FEED_COLS
        ]

        def load_stones(rels: tuple):
            frames = []
            for rel in rels:
                sd = rel if os.path.isabs(rel) else os.path.join(p.root, rel)
                for fname in sorted(os.listdir(sd)):
                    if fname.endswith(".parquet"):
                        frames.append(
                            pq.read_table(os.path.join(sd, fname)).to_pandas()
                        )
            return (
                pd.concat(frames, ignore_index=True) if frames else None
            )

        def to_logical(tbl) -> pd.DataFrame:
            out = {}
            for name in cols:
                phys = mapping.get(name, name)
                if phys in tbl.column_names:
                    out[name] = tbl.column(phys).to_pandas()
                else:
                    out[name] = pd.Series([None] * tbl.num_rows)
            return pd.DataFrame(out)

        def emit(df: pd.DataFrame) -> Iterator[tuple]:
            for row in df.itertuples(index=False):
                vals = [None if pd.isna(x) else x for x in row]
                yield (*vals, "delete", p.version)

        d = (
            p.dir_rel
            if os.path.isabs(p.dir_rel)
            else os.path.join(p.root, p.dir_rel)
        )
        dirname = os.path.basename(d)
        stones = load_stones(p.appended_rels)
        prior = (
            load_stones(p.prior_pos_rels) if p.prior_pos_rels else None
        )
        for fname in sorted(os.listdir(d)):
            if not fname.endswith(".parquet"):
                continue
            rel_sfx = f"parts/{dirname}/{fname}"
            if p.kind == "pos":
                want = stones.loc[stones["rel"] == rel_sfx, "pos"]
                if want.empty:
                    continue
                tbl = pq.read_table(os.path.join(d, fname))
                taken = tbl.take(sorted(int(x) for x in want))
                yield from emit(to_logical(taken))
            else:
                tbl = pq.read_table(os.path.join(d, fname))
                if prior is not None:
                    dead = set(
                        int(x)
                        for x in prior.loc[prior["rel"] == rel_sfx, "pos"]
                    )
                    if dead:
                        tbl = tbl.take(
                            [i for i in range(tbl.num_rows) if i not in dead]
                        )
                phys_keys = [phys for _l, phys in p.delete_keys]
                frame = to_logical(tbl)
                frame_keys = pd.DataFrame(
                    {
                        phys: tbl.column(phys).to_pandas()
                        for phys in phys_keys
                    }
                )
                mask = (
                    frame_keys.merge(
                        stones[phys_keys].drop_duplicates(),
                        on=phys_keys,
                        how="left",
                        indicator=True,
                    )["_merge"]
                    == "both"
                ).to_numpy()
                if mask.any():
                    yield from emit(frame.loc[mask])

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        import pandas as pd

        if isinstance(partition, CdfTombstonePartition):
            yield from self._read_tombstone(partition)
            return
        m_new = _load_manifest(partition.root, partition.version)
        m_old = (
            _load_manifest(partition.root, partition.version - 1)
            if partition.version > 1
            else None
        )
        cols = [
            f.name for f in self._schema.fields if f.name not in FEED_COLS
        ]

        def side(rel: str | None, m: dict | None):
            if rel is None or m is None:
                return pd.DataFrame({c: pd.Series(dtype=object) for c in cols})
            # both sides project under the NEWER manifest (physical
            # names are pinned, so old dirs read correctly; the schema
            # guard in partitions() already pinned the logical set)
            return _scan_dir_logical(
                os.path.join(partition.root, rel), m_new
            )[cols]

        new_df = side(partition.new_rel, m_new)
        old_df = side(partition.old_rel, m_old if m_old else m_new)
        for kind, rows in (
            ("insert", _multiset_except(new_df, old_df)),
            ("delete", _multiset_except(old_df, new_df)),
        ):
            for row in rows.itertuples(index=False):
                vals = [
                    None if pd.isna(v) else v
                    for v in row
                ]
                yield (*vals, kind, partition.version)

    def commit(self, end: dict) -> None:
        pass  # offsets are derived from immutable committed manifests


class ManifestCdfDataSource(DataSource):
    """``spark.readStream.format("manifestcdf").option("path", root)``
    — row-level change feed of a manifest table, one committed version
    per offset, schema = table's logical columns + _change_type +
    _commit_version."""

    @classmethod
    def name(cls) -> str:
        return "manifestcdf"

    def schema(self) -> T.StructType:
        root = self.options.get("path")
        m = _load_manifest(root, None)
        if m is None:
            raise FileNotFoundError(f"no MANIFEST at {root}")
        return T.StructType(
            list(_logical_fields(m))
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )

    def streamReader(
        self, schema: T.StructType
    ) -> ManifestCdfStreamReader:
        return ManifestCdfStreamReader(schema, self.options)


def register_manifest_cdf_source(spark) -> None:
    try:
        spark.dataSource.register(ManifestCdfDataSource)
    except Exception:  # noqa: BLE001 — already registered this session
        pass
