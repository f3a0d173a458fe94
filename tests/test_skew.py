"""Salted-join equivalence: salting must never change join semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.skew import salted_join


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_salted_inner_join_equals_plain(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")], "k long, v string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], "k long, w string")
    plain = left.join(right, ["k"])
    salted = salted_join(left, right, on=["k"], buckets=5)
    cols = ["k", "v", "w"]
    assert _sorted_rows(salted.select(*cols), cols) == _sorted_rows(
        plain.select(*cols), cols
    )


def test_salted_left_join_preserves_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (9, "z")], "k long, v string")
    right = spark.createDataFrame([(1, "X")], "k long, w string")
    out = salted_join(left, right, on=["k"], buckets=3, how="left")
    rows = {(r["k"], r["v"], r["w"]) for r in out.collect()}
    assert rows == {(1, "a", "X"), (9, "z", None)}


def test_hot_key_spreads_over_buckets(spark):
    from stripe_data_pipeline_spark.operators.skew import SALT_COL, salt_left

    hot = spark.createDataFrame([(1, f"v{i}") for i in range(200)], "k long, v string")
    n_salts = salt_left(hot, 8).select(SALT_COL).distinct().count()
    assert n_salts == 8  # the single hot key fans out across all buckets
