"""Golden tests for the flagship revenue recognition (SURVEY.md §5
item 2): hand-computed deferred/recognized values on a fixed fixture
covering every cited branch of the reference model
(deferred_revenue.sql:24-123, invoice_line_items.sql:102-116).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.models.exchange_rates import exchange_rates
from stripe_data_pipeline_spark.models.revenue import (
    daily_revenue_facts,
    revenue_asof,
    with_usd_amounts,
)

D = dt.date


def line_items_fixture(spark):
    """Curated-line-items-shaped input with the §5 edge cases:
    A: plain usd, exclusive tax, 10-day period
    B: zero-length period (division guard)
    C: eur, tax-inclusive (net-of-tax + FX)
    D: missing period_end (inferred = start + 1 day)
    """
    rows = [
        # (id, amount, tax, currency, inclusive, start, end_inferred, days, missing)
        (1, 100.0, 0.0, "usd", False, D(2024, 1, 1), D(2024, 1, 11), 10, False),
        (2, 50.0, 0.0, "usd", False, D(2024, 2, 1), D(2024, 2, 1), 0, False),
        (3, 216.0, 16.0, "eur", True, D(2024, 3, 1), D(2024, 3, 3), 2, False),
        (4, 30.0, 0.0, "gbp", False, D(2024, 4, 1), D(2024, 4, 2), 1, True),
    ]
    return spark.createDataFrame(
        rows,
        "line_item_id long, amount double, tax_amount double, currency string, "
        "is_tax_inclusive boolean, period_start_date date, "
        "period_end_date_inferred date, service_period_days long, "
        "is_missing_period_end boolean",
    )


@pytest.fixture(scope="module")
def facts(spark):
    usd = with_usd_amounts(line_items_fixture(spark), exchange_rates(spark))
    rows = daily_revenue_facts(usd).collect()
    return {
        (r["line_item_id"], r["as_of_date"]): (
            r["deferred_revenue_usd"],
            r["recognized_revenue_usd"],
        )
        for r in rows
    }


def test_day_domain_is_closed_interval(facts):
    # item 1: [jan 1, jan 11] inclusive -> 11 rows (J3 closed interval)
    days_1 = [k for k in facts if k[0] == 1]
    assert len(days_1) == 11
    assert (1, D(2024, 1, 1)) in facts and (1, D(2024, 1, 11)) in facts


def test_straight_line_split(facts):
    # item 1: M=100 over 10 days -> daily = 10
    assert facts[(1, D(2024, 1, 1))] == (100.0, 0.0)  # day == start
    assert facts[(1, D(2024, 1, 6))] == (50.0, 50.0)  # 5 days left / 5 done
    assert facts[(1, D(2024, 1, 11))] == (0.0, 100.0)  # day >= end
    # deferred + recognized == M on every day
    for d, r in (facts[k] for k in facts if k[0] == 1):
        assert d + r == 100.0


def test_zero_length_period_guard(facts):
    # item 2: S == E -> one day, immediately fully recognized
    # (deferred_revenue.sql:65-69 division guard)
    days_2 = [k for k in facts if k[0] == 2]
    assert days_2 == [(2, D(2024, 2, 1))]
    assert facts[(2, D(2024, 2, 1))] == (0.0, 50.0)


def test_tax_inclusive_fx(facts):
    # item 3: net = 216-16 = 200 eur * 1.08 = 216 usd; 2 days -> daily 108
    assert facts[(3, D(2024, 3, 1))][0] == pytest.approx(216.0)
    assert facts[(3, D(2024, 3, 2))] == (108.0, 108.0)
    assert facts[(3, D(2024, 3, 3))] == (0.0, pytest.approx(216.0))


def test_missing_period_end_one_day(facts):
    # item 4: inferred end = start+1 (invoice_line_items.sql:102-116);
    # gbp 30 * 1.27 = 38.1 usd over 1 day
    days_4 = sorted(k[1] for k in facts if k[0] == 4)
    assert days_4 == [D(2024, 4, 1), D(2024, 4, 2)]
    d0, r0 = facts[(4, D(2024, 4, 1))]
    assert d0 == pytest.approx(38.1) and r0 == 0.0


def test_asof_closed_form_matches_facts(spark, facts):
    usd = with_usd_amounts(line_items_fixture(spark), exchange_rates(spark))
    for as_of in [D(2024, 1, 6), D(2024, 3, 3), D(2024, 4, 1)]:
        rows = revenue_asof(usd, as_of).collect()
        got = {
            r["line_item_id"]: (
                r["deferred_revenue_usd"],
                r["recognized_revenue_usd"],
            )
            for r in rows
        }
        expected = {k[0]: v for k, v in facts.items() if k[1] == as_of}
        assert got == expected
