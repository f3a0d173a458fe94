"""Interleaved A/B of a SESSION CONFIG: same repo (/root/repo), two
persistent sessions differing only in one env knob, alternating runs
per query inside one window so load hits both sides equally."""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, os, sys, time
repo = "/root/repo"
sys.path.insert(0, repo)
os.chdir(repo)
from stripe_data_pipeline_spark.catalog import QUERIES
from stripe_data_pipeline_spark.session import get_spark
from bench import measure_query_runs
spark = get_spark("ab_conf")
spark.range(1000).selectExpr("sum(id)").collect()
print("READY", flush=True)
for line in sys.stdin:
    name = line.strip()
    if not name:
        break
    runs = measure_query_runs(spark, name, "/root/testdata/sf0.1", int(sys.argv[1]))
    print("RESULT " + json.dumps({
        "q": name, "min": round(min(runs), 3),
        "load": round(os.getloadavg()[0], 2)}), flush=True)
"""


def start(env_extra: dict, runs: int) -> subprocess.Popen:
    env = dict(os.environ)
    env.update(env_extra)
    p = subprocess.Popen(
        [sys.executable, "-c", RUNNER, str(runs)],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL, text=True, env=env,
    )
    while True:
        line = p.stdout.readline()
        if line.strip() == "READY":
            return p
        if line == "" or p.poll() is not None:
            # EOF: the runner died before READY (stderr goes to
            # DEVNULL, so re-run it by hand to see the traceback)
            raise RuntimeError(
                f"runner session exited rc={p.poll()} before READY"
            )


def ask(p, name):
    p.stdin.write(name + "\n")
    p.stdin.flush()
    while True:
        line = p.stdout.readline()
        if line.startswith("RESULT "):
            return json.loads(line[7:])
        if line == "" or p.poll() is not None:
            raise RuntimeError(
                f"runner session died (rc={p.poll()}) while measuring "
                f"{name!r}"
            )


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", required=True, help="KEY=VAL for the B side")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()
    k, v = args.env.split("=", 1)
    a = start({}, args.runs)
    b = start({k: v}, args.runs)
    for i, q in enumerate(args.queries):
        order = [(a, "base"), (b, "conf")] if i % 2 == 0 else [(b, "conf"), (a, "base")]
        res = {}
        for p, tag in order:
            res[tag] = ask(p, q)
        print(json.dumps({q: {"base": res["base"]["min"], "conf": res["conf"]["min"],
                              "load": res["conf"]["load"]}}), flush=True)
    for p in (a, b):
        p.stdin.write("\n")
        p.stdin.flush()
        p.wait(timeout=60)


if __name__ == "__main__":
    main()
