"""A/B: lm_doc_scores 4-branch shape (toks subtree re-executed per
branch) vs single-corpus-pass doc_tf design:

  doc_tf = one explode emitting, per doc, a sentinel row (p=NULL,
  w=first token) plus one row per adjacent pair, grouped by
  (doc, p, w) with an occurrence count k.

Every downstream table derives from doc_tf WITHOUT re-scanning text:
  uni(w)  = sum k over all rows (every token is first-of-doc or
            second-of-exactly-one-pair)   [exact]
  bi(p,w) = sum k over non-sentinel rows  [exact]
  N,V     = from uni                       [exact]
  scoring: sentinel rows take the smoothed-unigram term, pair rows
  the smoothed-bigram term; per-doc nll_fp = sum k * term_fp (term_fp
  identical for equal (p,w), so the multiply replicates the repeated
  addition exactly on integers).

doc_tf is localCheckpointed (3 consumers).
Usage: python3 tools/proto_lm.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from stripe_data_pipeline_spark.catalog.text_queries import read_table  # noqa: E402
from stripe_data_pipeline_spark.operators.text import lm_doc_scores  # noqa: E402
from stripe_data_pipeline_spark.session import get_spark  # noqa: E402


def lm_doc_scores_onepass(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    toks = df.select(
        F.col(id_col),
        F.filter(F.split(F.col(text_col), " "), lambda t: t != "").alias("t"),
    ).filter(F.size("t") > 0)
    pairs_col = F.zip_with(
        F.slice(F.col("t"), 1, F.size("t") - 1),
        F.slice(F.col("t"), 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("p"), b.alias("w")),
    )
    rows = toks.select(
        id_col,
        F.explode(
            F.concat(
                F.array(
                    F.struct(
                        F.lit(None).cast("string").alias("p"),
                        F.element_at("t", 1).alias("w"),
                    )
                ),
                pairs_col,
            )
        ).alias("pw"),
    ).select(id_col, F.col("pw.p").alias("p"), F.col("pw.w").alias("w"))
    doc_tf = (
        rows.groupBy(id_col, "p", "w")
        .agg(F.count(F.lit(1)).alias("k"))
        .localCheckpoint(eager=True)
    )
    uni = doc_tf.groupBy("w").agg(F.sum("k").alias("cu"))
    stats = uni.agg(F.sum("cu").alias("N"), F.count(F.lit(1)).alias("V"))
    bi = (
        doc_tf.filter(F.col("p").isNotNull())
        .groupBy("p", "w")
        .agg(F.sum("k").alias("cb"))
    )
    first = (
        doc_tf.filter(F.col("p").isNull())
        .join(uni, "w")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("k"),
            F.floor(
                -F.log(
                    (F.col("cu") + 1).cast("double")
                    / (F.col("N") + F.col("V")).cast("double")
                )
                * F.lit(1e9)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_fp"),
        )
    )
    rest = (
        doc_tf.filter(F.col("p").isNotNull())
        .join(bi, ["p", "w"])
        .join(uni.select(F.col("w").alias("p"), F.col("cu").alias("cp")), "p")
        .crossJoin(F.broadcast(stats))
        .select(
            F.col(id_col),
            F.col("k"),
            F.floor(
                -F.log(
                    (F.col("cb") + 1).cast("double")
                    / (F.col("cp") + F.col("V")).cast("double")
                )
                * F.lit(1e9)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("term_fp"),
        )
    )
    return (
        first.unionByName(rest)
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("bigint").alias("n_scored"),
            F.sum(F.col("k") * F.col("term_fp")).cast("bigint").alias("nll_fp"),
        )
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = get_spark("proto_lm")
    sc = spark.sparkContext
    docs = read_table(spark, sf_dir, "documents")

    noop(lm_doc_scores(docs))
    noop(lm_doc_scores_onepass(docs))
    for name in ["old", "new"] * 3:
        df = lm_doc_scores(docs) if name == "old" else lm_doc_scores_onepass(docs)
        sc.setJobDescription(f"lm {name}")
        t0 = time.time()
        noop(df)
        print(f"{name:4s} {time.time() - t0:6.2f}s", flush=True)

    ra = sorted(map(tuple, lm_doc_scores(docs).collect()))
    rb = sorted(map(tuple, lm_doc_scores_onepass(docs).collect()))
    assert ra == rb, f"MISMATCH: {len(ra)} vs {len(rb)}; first diff " + str(
        next((x, y) for x, y in zip(ra, rb) if x != y)
    )
    print(f"IDENTICAL: {len(ra)} docs")


if __name__ == "__main__":
    main()
