"""Round-9 second-batch operator invariants.

- segment_dedup_documents: keep-first semantics on planted duplicate
  segments, rebuilt text, fully-deduped docs survive with empty text;
- span_corruption_pairs: the T5 reconstruction law — splicing each
  target span back over its sentinel reproduces the source text — plus
  the mask-rate and span-count accounting;
- sole_returning_supplier_q21ish's agg fold: the one-aggregate
  decorrelation equals the EXISTS/NOT-EXISTS definition on a planted
  micro-case.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.corpus import (
    segment_dedup_documents,
    span_corruption_pairs,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_dedup_keeps_first_occurrence(spark):
    # k=2 segments; doc 0 owns "a b" and "c d"; doc 1 repeats "a b"
    # (dropped) then contributes "x y" (kept); doc 2 is entirely a
    # repeat and must survive with empty text.
    rows = [
        (0, "a b c d"),
        (1, "a b x y"),
        (2, "a b c d"),
    ]
    out = {
        r["doc_id"]: r
        for r in segment_dedup_documents(_docs(spark, rows), k=2).collect()
    }
    assert out[0]["n_dropped"] == 0 and out[0]["clean_text"] == "a b c d"
    assert out[1]["n_dropped"] == 1 and out[1]["clean_text"] == "x y"
    assert out[2]["n_dropped"] == 2 and out[2]["clean_text"] == ""
    assert all(out[d]["n_segs"] == 2 for d in (0, 1, 2))


def test_segment_dedup_partial_tail_segment(spark):
    # 5 tokens at k=2 -> segments "a b", "c d", "e"; the short tail is
    # a first-class segment (dedupable like any other).
    rows = [(0, "a b c d e"), (1, "e")]
    out = {
        r["doc_id"]: r
        for r in segment_dedup_documents(_docs(spark, rows), k=2).collect()
    }
    assert out[0]["n_segs"] == 3 and out[0]["n_dropped"] == 0
    assert out[1]["n_segs"] == 1 and out[1]["n_dropped"] == 1


def test_span_corruption_reconstruction_law(spark, sf_dir):
    from stripe_data_pipeline_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents").limit(50)
    rows = span_corruption_pairs(docs, span_len=3, one_in=17).collect()
    originals = {
        r["doc_id"]: " ".join(t for t in r["text"].split(" ") if t)
        for r in docs.collect()
    }
    assert rows, "span corruption dropped every doc"
    masked_any = 0
    for r in rows:
        # parse target into {sentinel: tokens}
        spans: dict[str, list[str]] = {}
        cur = None
        for tok in r["target_text"].split(" "):
            if not tok:
                continue
            if re.fullmatch(r"<extra_id_\d+>", tok):
                cur = tok
                spans[cur] = []
            else:
                assert cur is not None, "target starts without a sentinel"
                spans[cur].append(tok)
        rebuilt: list[str] = []
        for tok in r["input_text"].split(" "):
            if re.fullmatch(r"<extra_id_\d+>", tok):
                rebuilt.extend(spans[tok])
            elif tok:
                rebuilt.append(tok)
        assert " ".join(rebuilt) == originals[r["doc_id"]]
        assert r["n_spans"] == len(spans)
        assert r["n_masked"] == sum(len(v) for v in spans.values())
        masked_any += r["n_masked"]
        # runs can exceed span_len when triggers chain, never be empty
        assert all(len(v) >= 1 for v in spans.values())
    assert masked_any > 0, "trigger rate produced zero masked tokens"


def test_q21_agg_fold_matches_exists_definition(spark):
    # order 1: suppliers {10, 20}, only 10 returns -> 10 qualifies.
    # order 2: suppliers {10, 20}, both return -> nobody qualifies.
    # order 3: single-supplier {10}, returns -> fails the EXISTS arm.
    li = spark.createDataFrame(
        [
            (1, 10, "R"),
            (1, 20, "N"),
            (2, 10, "R"),
            (2, 20, "R"),
            (3, 10, "R"),
        ],
        "l_orderkey long, l_suppkey long, l_returnflag string",
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    qual = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
    )
    got = {(r["l_orderkey"], r["l_suppkey"]) for r in qual.collect()}
    assert got == {(1, 10)}


def test_clone_table_is_zero_copy_and_isolated(spark, tmp_path):
    import glob
    import os

    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark import manifest_table as MT

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0)],
        "id long, part string, v double",
    )
    MT.merge_upsert_atomic(spark, src, base, keys=["id"], partition_by="part")
    v = MT.clone_table(src, dst)
    assert v == 1
    # zero-copy: the clone holds NO parquet files of its own
    assert glob.glob(os.path.join(dst, "parts", "**", "*.parquet"),
                     recursive=True) == []
    assert MT.read_table(spark, dst).count() == 3
    # copy-on-write: merging into the clone (update id=1, insert id=4)
    # never touches the source
    upd = spark.createDataFrame(
        [(1, "a", 99.0), (4, "c", 40.0)], "id long, part string, v double"
    )
    MT.merge_upsert_atomic(spark, dst, upd, keys=["id"], partition_by="part")
    got_clone = {
        r["id"]: r["v"] for r in MT.read_table(spark, dst).collect()
    }
    assert got_clone == {1: 99.0, 2: 20.0, 3: 30.0, 4: 40.0}
    got_src = {r["id"]: r["v"] for r in MT.read_table(spark, src).collect()}
    assert got_src == {1: 10.0, 2: 20.0, 3: 30.0}
    # time travel on the clone recovers the cloned snapshot
    assert MT.read_table(spark, dst, version=1).count() == 3
    # vacuum on the clone must never sweep the source's dirs
    MT.vacuum(dst, retain_history=0)
    assert MT.read_table(spark, src).count() == 3
    # double-clone onto an existing table refuses
    import pytest as _pytest

    with _pytest.raises(ValueError):
        MT.clone_table(src, dst)
