"""A/B: minhash_lsh_candidates current shape (checkpoint + bucket
histogram + join-back + two-sided self-join) vs single-pass
groupBy(band,key).collect_list + in-JVM pair explode.

Usage: python3 tools/proto_lsh.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from stripe_data_pipeline_spark.operators import dedup as D  # noqa: E402
from stripe_data_pipeline_spark.catalog.text_queries import read_table  # noqa: E402
from stripe_data_pipeline_spark.session import get_spark  # noqa: E402


def cands_onepass(
    df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    band_size: int = 4,
    k: int = 3,
    max_bucket: int = 200,
) -> DataFrame:
    sigs = D.minhash_signatures(df, id_col, num_hashes, k)
    bands = D.band_rows(sigs, id_col, num_hashes, band_size)
    buckets = (
        bands.groupBy("band", "key")
        .agg(F.collect_list(F.col(id_col)).alias("ids"))
        .filter(F.size("ids") <= max_bucket)
    )
    ids = F.array_sort(F.col("ids"))
    pairs = F.flatten(
        F.transform(
            ids,
            lambda a, i: F.transform(
                F.slice(ids, i + 2, F.size(ids)),
                lambda b: F.struct(a.alias("doc_a"), b.alias("doc_b")),
            ),
        )
    )
    return (
        buckets.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = get_spark("proto_lsh")
    sc = spark.sparkContext
    docs = read_table(spark, sf_dir, "documents")

    a = D.minhash_lsh_candidates(docs)
    b = cands_onepass(docs)
    noop(a)
    noop(b)
    for name, df in [("old", a), ("new", b)] * 3:
        # rebuild each time: the old path's localCheckpoint would
        # otherwise amortize across runs in a way the bench's fresh
        # fn() calls don't
        df = D.minhash_lsh_candidates(docs) if name == "old" else cands_onepass(docs)
        sc.setJobDescription(f"lsh {name}")
        t0 = time.time()
        noop(df)
        print(f"{name:4s} {time.time() - t0:6.2f}s", flush=True)

    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb, f"MISMATCH {len(ra)} vs {len(rb)}"
    print(f"IDENTICAL: {len(ra)} pairs")


if __name__ == "__main__":
    main()
