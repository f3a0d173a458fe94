"""Interleaved A/B timing: for each query, alternate runs between two
repo checkouts (before=/tmp/repo_head, after=/root/repo) inside ONE
quiet window, so external load hits both sides equally.

Two subprocesses per query (one per side) would pay session startup
per run; instead we run each side's min-of-N in its own persistent
subprocess, but ALTERNATE the order per query (A,B then B,A ...) and
report both mins with loadavg.

Usage: python tools/ab_measure.py q1 q2 ... [--runs N]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, os, sys, time
repo = sys.argv[1]
sys.path.insert(0, repo)
from stripe_data_pipeline_spark.catalog import QUERIES
from stripe_data_pipeline_spark.session import get_spark
from bench import measure_query_runs
spark = get_spark("ab_measure")
spark.range(1000).selectExpr("sum(id)").collect()
sf_dir = "/root/testdata/sf0.1"
print("READY", flush=True)
for line in sys.stdin:
    name = line.strip()
    if not name:
        break
    runs = measure_query_runs(spark, name, sf_dir, int(sys.argv[2]))
    print("RESULT " + json.dumps({
        "q": name, "min": round(min(runs), 3),
        "runs": [round(r, 3) for r in runs],
        "load": round(os.getloadavg()[0], 2)}), flush=True)
"""


def start(repo: str, runs: int) -> subprocess.Popen:
    env = dict(os.environ)
    p = subprocess.Popen(
        [sys.executable, "-c", RUNNER, repo, str(runs)],
        stdin=subprocess.PIPE,
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=repo,
        env=env,
    )
    while True:
        line = p.stdout.readline()
        if line.startswith("READY"):
            return p
        if not line:
            raise RuntimeError(f"runner for {repo} died")


def ask(p: subprocess.Popen, name: str) -> dict:
    p.stdin.write(name + "\n")
    p.stdin.flush()
    while True:
        line = p.stdout.readline()
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
        if not line:
            raise RuntimeError("runner died")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    before = start("/tmp/repo_head", runs)
    after = start("/root/repo", runs)
    out = {}
    for i, q in enumerate(args):
        order = (
            [("before", before), ("after", after)]
            if i % 2 == 0
            else [("after", after), ("before", before)]
        )
        rec = {}
        for tag, proc in order:
            rec[tag] = ask(proc, q)
        out[q] = {
            "before": rec["before"]["min"],
            "after": rec["after"]["min"],
            "detail": rec,
        }
        print(json.dumps({q: {k: out[q][k] for k in ("before", "after")},
                          "load": rec["after"]["load"]}), flush=True)
    print("SUMMARY " + json.dumps(
        {q: (v["before"], v["after"]) for q, v in out.items()}
    ))
    for p in (before, after):
        p.stdin.close()
        p.wait(timeout=60)


if __name__ == "__main__":
    main()
