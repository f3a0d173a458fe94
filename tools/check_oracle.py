"""Local approximation of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at a
given scale factor, then compares row count, column names, dtypes and
(order-insensitively) the actual values. Floats must match exactly —
the engine is designed for bit-identical arithmetic with the oracle —
but near-misses are reported with their max abs diff to aid debugging.

Usage: python3 tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from stripe_data_pipeline_spark.catalog import QUERIES  # noqa: E402
from stripe_data_pipeline_spark.io import TESTDATA_TABLES  # noqa: E402
from stripe_data_pipeline_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
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


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("check_oracle")
    con = duck_con(sf_dir)
    failures = 0
    for name, spec in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            s_df = spec.fn(spark, sf_dir)
            s_cols = s_df.columns
            s_rows = [tuple(r) for r in s_df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"ok?   {name}: rows={len(s_rows)} (no oracle, rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(spec.oracle)
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        errs = compare(s_cols, s_rows, d_cols, d_rows)
        if errs:
            failures += 1
            print(f"FAIL  {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")
            for e in errs:
                print(f"      {e}")
        else:
            print(f"PASS  {name}: rows={len(s_rows)} [{time.time()-t0:.1f}s]")
    print(f"\n{failures} failures / {len(QUERIES)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
