"""Data-quality suite tests: the reference's declared checks
(README.md:131-171), verified against planted violations."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.models import quality as Q
from stripe_data_pipeline_spark.models.calendar import calendar
from stripe_data_pipeline_spark.models.exchange_rates import exchange_rates
from stripe_data_pipeline_spark.plans.pipeline import run_pipeline
from stripe_data_pipeline_spark.sources.fixtures import write_fixture


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    raw = str(tmp_path_factory.mktemp("raw"))
    wh = str(tmp_path_factory.mktemp("wh"))
    write_fixture(raw, n_invoices=30)
    return run_pipeline(spark, raw, wh, dt.datetime(2024, 6, 1))


def test_suite_on_clean_pipeline(spark, warehouse):
    t = warehouse
    counts = Q.run_quality_suite(
        t["invoice_line_items"], t["invoices"], exchange_rates(spark), calendar(spark)
    )
    # the fixture plants ~20% missing period_end (above the 3% gate);
    # everything else is clean
    assert counts["missing_period_end"] == 1
    for name in (
        "negative_amounts",
        "orphaned_line_items",
        "missing_fx_rates",
        "calendar_gaps",
        "invoice_pk",
        "line_item_pk",
    ):
        assert counts[name] == 0, name


def test_planted_violations_detected(spark, warehouse):
    t = warehouse
    li = t["invoice_line_items"]
    bad_li = li.unionByName(
        li.limit(1).withColumns(
            {
                "line_item_id": F.lit("il_bad"),
                "amount": F.lit(-5.0),
                "invoice_id": F.lit("in_missing"),
                "currency": F.lit("jpy"),
            }
        )
    )
    assert Q.check_negative_amounts(bad_li).count() == 1
    assert Q.check_orphaned_line_items(bad_li, t["invoices"]).count() == 1
    assert (
        Q.check_missing_fx_rates(bad_li, exchange_rates(spark)).first()["currency"]
        == "jpy"
    )
    # duplicate PK detection
    assert Q.check_unique_not_null(bad_li.unionByName(bad_li), "line_item_id").count() > 0
    # calendar with a hole
    cal = calendar(spark).filter(F.col("date_day") != F.lit(dt.date(1995, 6, 15)))
    gaps = Q.check_calendar_gaps(cal).collect()
    assert len(gaps) == 1 and gaps[0]["date_day"] == dt.date(1995, 6, 16)


def test_subscription_states_compaction(spark, warehouse):
    states = warehouse["subscription_states"]
    # one row per subscription, status extracted from the event payload
    assert states.count() == states.select("subscription_id").distinct().count()
    assert states.filter(F.col("status") != "active").count() == 0
    # the kept event is the newest for its subscription (fixture events
    # arrive in id order per subscription)
    row = states.filter(F.col("subscription_id") == "sub_0").first()
    assert row["last_event_id"] == "evt_80"


def test_missing_period_end_empty_input_is_pass(spark):
    # empty input must be a pass (no ANSI DIVIDE_BY_ZERO)
    empty = spark.createDataFrame([], "line_item_id string, period_end_date date")
    assert Q.check_missing_period_end(empty).count() == 0


def test_week_of_year_is_bigquery_sunday_anchored(spark):
    """BigQuery EXTRACT(WEEK) parity (reference calendar.sql:8): weeks
    start Sunday; dates before the year's first Sunday are week 0."""
    cal = calendar(spark, dt.date(2022, 1, 1), dt.date(2023, 12, 31))
    got = {r["date_day"]: r["week_of_year"] for r in cal.collect()}
    assert got[dt.date(2022, 1, 1)] == 0  # Saturday, before first Sunday
    assert got[dt.date(2022, 1, 2)] == 1  # the first Sunday of 2022
    assert got[dt.date(2022, 1, 8)] == 1  # Saturday, still week 1
    assert got[dt.date(2022, 1, 9)] == 2
    assert got[dt.date(2023, 1, 1)] == 1  # Jan 1 IS a Sunday -> week 1
    assert got[dt.date(2023, 12, 31)] == 53  # Sunday, 53rd of 2023
    assert got[dt.date(2022, 12, 31)] == 52


def test_freshness_check(spark):
    """README.md:155-157 declares _loaded_at freshness monitoring but
    never builds it; ours flags a mart older than the daily cadence
    plus slack, and treats an EMPTY mart as stale too."""
    import datetime as dt

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 6, 1, 1, 30))], "id long, _loaded_at timestamp"
    )
    fresh_now = dt.datetime(2024, 6, 1, 12, 0)
    stale_now = dt.datetime(2024, 6, 3, 12, 0)
    assert Q.check_freshness(df, fresh_now).count() == 0
    stale = Q.check_freshness(df, stale_now).collect()
    assert len(stale) == 1 and stale[0]["age_hours"] > 26
    empty = df.filter(F.lit(False))
    assert Q.check_freshness(empty, fresh_now).count() == 1  # empty == stale
