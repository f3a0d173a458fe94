"""Local approximation of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB at a
given scale factor, then compares row count, column names and
(order-insensitively) the actual values. Floats must match exactly —
the engine is designed for bit-identical arithmetic with the oracle.

Usage: python3 tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stripe_data_pipeline_spark.catalog import QUERIES  # noqa: E402
from stripe_data_pipeline_spark.session import get_spark  # noqa: E402
from stripe_data_pipeline_spark.testing import duck_con  # noqa: E402
from stripe_data_pipeline_spark.testing import check_query  # noqa: E402


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
            errs = check_query(spark, con, spec, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: error: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if errs:
            failures += 1
            print(f"FAIL  {name} [{dt:.1f}s]")
            for e in errs:
                print(f"      {e}")
        elif spec.oracle is None:
            print(f"ok?   {name}: (no oracle, rows-only) [{dt:.1f}s]")
        else:
            print(f"PASS  {name} [{dt:.1f}s]")
    print(f"\n{failures} failures / {len(QUERIES)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
