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


def test_salting_bounds_max_partition_size(spark):
    # The PAYOFF, not just equivalence (VERDICT r02 #7): plant a hot key
    # owning half the rows and measure rows per shuffle-join output
    # partition. Plain join co-locates every hot-key row in one task;
    # salted spreads them. AQE skew-splitting and broadcast are disabled
    # so the test observes raw hash partitioning, i.e. what a
    # 1000-executor shuffle would do per task.
    confs = {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # enough shuffle partitions that salt buckets don't collide into
        # the same handful of tasks (the session fixture uses 4)
        "spark.sql.shuffle.partitions": "32",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        n_hot, n_rest = 1000, 1000
        left = spark.createDataFrame(
            [(1, i) for i in range(n_hot)]
            + [(2 + i % 50, i) for i in range(n_rest)],
            "k long, v long",
        )
        right = spark.createDataFrame(
            [(k,) for k in range(1, 60)], "k long"
        ).withColumn("w", F.col("k") * 10)

        def max_partition_rows(df):
            sizes = (
                df.withColumn("pid", F.spark_partition_id())
                .groupBy("pid")
                .count()
                .collect()
            )
            return max(r["count"] for r in sizes)

        plain_max = max_partition_rows(left.join(right, ["k"]))
        salted_max = max_partition_rows(
            salted_join(left, right, on=["k"], buckets=32)
        )
        assert plain_max >= n_hot  # hot key lands whole in one task
        assert salted_max <= plain_max // 3  # salting bounds the hot task
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
