"""Subprocess worker for the CROSS-PROCESS OCC stress test (VERDICT
r5 #3). Not a pytest module — spawned by
tests/test_manifest_multiprocess.py via sys.executable with its OWN
SparkSession (separate JVM), so the file-lock + manifest protocol is
exercised between real processes, not threads sharing one JVM.

Each worker runs ``n_merges`` optimistic merges against one shared
manifest table:

- a private partition (``w<wid>``) holding its own keys — concurrent
  commits from the other worker land via the provable-rebase path;
- a SHARED partition (``shared``) holding worker-disjoint keys — the
  rebase precondition (disjoint partitions) fails there, forcing the
  full discard-and-replan retry loop under real inter-process races;
- merge m writes val=m for every key, so the final table must show
  val = n_merges-1 for EVERY key: any lost update (a commit clobbered
  by a racing process) leaves a stale val behind;
- mid-run it also runs a locked ``vacuum`` (grace-windowed — must not
  reap the other process's in-flight staging) and an OCC
  ``compact_partition`` on its private partition (-1 = cleanly lost
  the race, acceptable).

Prints one JSON line with the worker's view; exit 0 = all commits
landed.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import stripe_data_pipeline_spark.manifest_table as MT  # noqa: E402


def main() -> None:
    root, wid, n_merges = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"occ-worker-{wid}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    compactions = 0
    for m in range(n_merges):
        rows = [(wid * 1000 + i, f"w{wid}", m) for i in range(5)]
        rows += [(9000 + wid * 100 + i, "shared", m) for i in range(3)]
        df = spark.createDataFrame(rows, "id INT, day STRING, val INT")
        MT.merge_upsert_atomic(
            spark,
            root,
            df,
            keys=["id"],
            partition_by="day",
            concurrency="occ",
            max_retries=50,
        )
        if m == 1:
            # Locked vacuum racing the OTHER process's lock-free OCC
            # staging: the grace window must spare its young dirs.
            MT.vacuum(root, grace_sec=600.0)
        if m == 2:
            got = MT.compact_partition(
                spark, root, f"w{wid}", 10_000, concurrency="occ"
            )
            if got >= 0:
                compactions += 1
    print(
        json.dumps(
            {"wid": wid, "final_val": n_merges - 1, "compactions": compactions}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
