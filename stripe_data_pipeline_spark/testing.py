"""Shared test/oracle-comparison helpers.

The driver's correctness gate compares Spark results against DuckDB
oracle SQL (row count + schema + order-insensitive value hash); these
helpers reproduce that comparison locally so every operator can be
gated before the driver sees it.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd

from stripe_data_pipeline_spark.io import TESTDATA_TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        return None if math.isnan(v) else v
    if isinstance(v, (np.floating,)):
        return float(v)
    if isinstance(v, (np.integer,)):
        return int(v)
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(norm_cell(x) for x in v)
    if isinstance(v, pd.Timestamp):
        return v.to_pydatetime()
    return v


def norm_rows(cols: list[str], rows: list[tuple]) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return [cols[i] for i in order], out


def compare(
    s_cols: list[str], s_rows: list[tuple], d_cols: list[str], d_rows: list[tuple]
) -> list[str]:
    """Return a list of mismatch descriptions (empty == exact match)."""
    errs: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        errs.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errs
    if len(s_rows) != len(d_rows):
        errs.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
        return errs
    cols, s_norm = norm_rows(s_cols, s_rows)
    _, d_norm = norm_rows(d_cols, d_rows)
    n_cols = len(cols)
    mism = [0] * n_cols
    max_diff = [0.0] * n_cols
    example: list = [None] * n_cols
    for a_row, b_row in zip(s_norm, d_norm):
        for i in range(n_cols):
            a, b = a_row[i], b_row[i]
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b:
                    mism[i] += 1
                    diff = abs(a - b)
                    if diff > max_diff[i]:
                        max_diff[i], example[i] = diff, (a, b)
            elif a != b or type(a) is not type(b):
                mism[i] += 1
                if example[i] is None:
                    example[i] = (a, b)
    for i in range(n_cols):
        if mism[i]:
            errs.append(
                f"col {cols[i]}: {mism[i]}/{len(s_norm)} mismatched values"
                + (
                    f" (max abs diff {max_diff[i]:.3e}, e.g. {example[i]})"
                    if max_diff[i]
                    else f" (e.g. {example[i]!r})"
                )
            )
    return errs


def check_query(spark, con, spec, sf_dir: str) -> list[str]:
    """Run one QuerySpec on both engines and compare (empty == pass)."""
    s_df = spec.fn(spark, sf_dir)
    s_cols = s_df.columns
    s_rows = [tuple(r) for r in s_df.collect()]
    if spec.oracle is None:
        return []
    cur = con.execute(spec.oracle)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    return compare(s_cols, s_rows, d_cols, d_rows)
