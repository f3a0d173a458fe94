"""Bucketed co-located join: correct results AND no shuffle in the plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.io import read_table, write_bucketed_table


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    write_bucketed_table(
        read_table(spark, sf_dir, "orders"), "b_orders", "o_orderkey", 8
    )
    write_bucketed_table(
        read_table(spark, sf_dir, "lineitem"), "b_lineitem", "l_orderkey", 8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_skips_shuffle(spark, sf_dir, bucketed):
    o = spark.table("b_orders")
    li = spark.table("b_lineitem")
    # disable broadcast so the join must use the bucketing
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o["o_orderkey"] == li["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        # and the result matches the plain-table join
        expected = (
            read_table(spark, sf_dir, "orders")
            .join(
                read_table(spark, sf_dir, "lineitem"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
