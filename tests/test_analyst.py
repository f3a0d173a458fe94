"""Analyst SQL surface (README.md:174-213) over the pipeline's marts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.plans import analyst
from stripe_data_pipeline_spark.plans.pipeline import run_pipeline
from stripe_data_pipeline_spark.sources.fixtures import write_fixture


@pytest.fixture(scope="module")
def marts(spark, tmp_path_factory):
    raw = str(tmp_path_factory.mktemp("raw"))
    wh = str(tmp_path_factory.mktemp("wh"))
    write_fixture(raw, n_invoices=30)
    tables = run_pipeline(spark, raw, wh, dt.datetime(2024, 6, 1))
    analyst.register_mart_views(spark, wh)
    return tables


def test_total_deferred_asof_matches_dataframe_path(spark, marts):
    as_of = dt.date(2024, 1, 15)
    sql_total = analyst.total_deferred_asof(spark, as_of).first()["total_deferred_usd"]
    df_total = (
        marts["deferred_revenue"]
        .filter(F.col("as_of_date") == as_of)
        .agg(
            (
                F.sum(
                    F.floor(F.col("deferred_revenue_usd") * 100.0 + 0.5).cast("bigint")
                ).cast("double")
                / 100.0
            ).alias("t")
        )
        .first()["t"]
    )
    assert sql_total == df_total
    assert sql_total > 0


def test_by_customer_and_trend_and_quarter(spark, marts):
    as_of = dt.date(2024, 1, 15)
    by_cust = analyst.deferred_by_customer(spark, as_of).collect()
    assert len(by_cust) > 0
    # ordered largest-first with deterministic tiebreak
    vals = [r["deferred_usd"] for r in by_cust]
    assert vals == sorted(vals, reverse=True)

    trend = analyst.deferred_trend(spark).collect()
    assert len(trend) > 30  # daily rows across the fixture's periods

    q1 = analyst.recognized_for_quarter(spark, 2024, 1).first()["recognized_usd"]
    assert q1 is not None and q1 > 0
