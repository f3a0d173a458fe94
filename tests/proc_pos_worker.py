"""Subprocess worker for the CROSS-PROCESS positional-delete race
test. Not a pytest module — spawned by
tests/test_manifest_multiprocess.py with its OWN SparkSession, so the
writer-lock + tombstone protocol is exercised between real processes.

mode=deleter: rounds of ``delete_where_pos(id % 10 == 3)`` followed by
``apply_pos_deletes`` (the drain), recording the committed version of
each non-empty tombstone commit — the test time-travels to each and
asserts the marked rows are hidden AT that version.

mode=merger: OCC merges writing val=m for a fixed 20-key batch; a
merge that races pending tombstones refuses with the positional-delete
ValueError and is retried after the deleter drains — every merge that
REPORTS success records its committed version, and the test asserts
the full batch is visible there. Exit 0 = every intended commit landed.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import stripe_data_pipeline_spark.manifest_table as MT  # noqa: E402


def main() -> None:
    root, mode, rounds = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[2]")
        .appName(f"pos-worker-{mode}")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "2")
        .getOrCreate()
    )
    out = []
    if mode == "deleter":
        for r in range(rounds):
            n = MT.delete_where_pos(spark, root, F.col("id") % 10 == 3)
            if n > 0:
                v = int(MT.read_manifest(root)["version"])
                out.append({"round": r, "deleted": int(n), "version": v})
            MT.apply_pos_deletes(spark, root)
            time.sleep(0.2)
    elif mode == "merger":
        for m in range(rounds):
            rows = [(i, m) for i in range(20)]
            df = spark.createDataFrame(rows, "id INT, val INT")
            while True:
                try:
                    MT.merge_upsert_atomic(
                        spark, root, df, keys=["id"], concurrency="occ",
                        max_retries=10,
                    )
                    break
                except ValueError as e:
                    if "positional" not in str(e):
                        raise
                    time.sleep(0.3)  # tombstones pending: wait for drain
            v = int(MT.read_manifest(root)["version"])
            out.append({"merge": m, "version": v})
    else:
        raise SystemExit(f"unknown mode {mode}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
