"""Capture .explain("formatted") output for named queries into
plans/r14/<query>_<tag>.txt — the optimization round's before/after
plan evidence (the judge checks plan claims against these files).

Usage: python tools/capture_plans.py <tag> q1 q2 ...   [--sf-dir DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from stripe_data_pipeline_spark.catalog import QUERIES  # noqa: E402
from stripe_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("tag", choices=["before", "after"])
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r14"))
    args = ap.parse_args()

    os.makedirs(args.outdir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in args.queries:
        if name not in QUERIES:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        df = QUERIES[name].fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    main()
