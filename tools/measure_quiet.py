"""Standalone quiet-box query timer for pin (re-)measurement.

Usage:
    python tools/measure_quiet.py [--sf1] [--runs N] q1 q2 ...

Times each named catalog query at the given scale (default sf0.1;
--sf1 uses the replicated /tmp/spark_graft_sf1 directory built by
stripe_data_pipeline_spark.sf_scale.ensure_scaled_dir) by calling
bench.measure_query_runs — the SAME function the bench sweep uses
(warm run for ARTIFACT_WARM queries, noop sink, System.gc between
runs), so the adjudication protocol cannot drift from what produced
the pins — isolated from the full headline sweep so a pin re-measure
never fights the bench's own load.  Prints one JSON line per query
and a final summary map.

This is the "re-run standalone" half of the regression-adjudication
protocol documented in bench_baseline.json's _comment: an in-bench
flag means re-measure here on a quiet box before concluding a plan
regressed (loadavg is recorded alongside each timing so the verdict
can tell quiet from loaded).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import measure_query_runs  # noqa: E402
from stripe_data_pipeline_spark.catalog import QUERIES  # noqa: E402
from stripe_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf1", action="store_true")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    spark = get_spark("measure_quiet")
    spark.range(1000).selectExpr("sum(id)").collect()
    sf_dir = args.sf_dir
    if args.sf1:
        from stripe_data_pipeline_spark.sf_scale import ensure_scaled_dir

        sf_dir = ensure_scaled_dir(spark, base_dir=args.sf_dir)

    out: dict[str, dict] = {}
    for name in args.queries:
        if name not in QUERIES:
            out[name] = {"error": "unknown query"}
            continue
        runs = [
            round(s, 3)
            for s in measure_query_runs(spark, name, sf_dir, args.runs)
        ]
        rec = {
            "min": min(runs),
            "runs": runs,
            "loadavg": [round(x, 2) for x in os.getloadavg()],
            "sf_dir": sf_dir,
        }
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print("SUMMARY " + json.dumps({k: v.get("min") for k, v in out.items()}))


if __name__ == "__main__":
    main()
