"""Property-based tests (hypothesis): invariants that must hold for
any input, not just fixtures.

The partitioning-invariance property is the load-bearing one: the
engine claims bit-exact determinism at any parallelism — which is
exactly what integer-cents aggregation buys (functions/money.py).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.functions.money import sum_usd_cents
from stripe_data_pipeline_spark.incremental import merge_upsert

amounts = st.lists(
    st.floats(min_value=0, max_value=1e6, allow_nan=False, allow_infinity=False),
    min_size=1,
    max_size=60,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(vals=amounts, parts=st.integers(min_value=1, max_value=7))
def test_money_sum_invariant_to_partitioning(spark, vals, parts):
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    a = df.repartition(1).agg(sum_usd_cents(F.col("v")).alias("s")).first()["s"]
    b = df.repartition(parts).agg(sum_usd_cents(F.col("v")).alias("s")).first()["s"]
    assert a == b  # bit-exact, any parallelism


batches = st.lists(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9),
                  st.integers(min_value=0, max_value=100)),
        min_size=1,
        max_size=6,
    ),
    min_size=1,
    max_size=4,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(seq=batches)
def test_merge_replays_like_a_dict(spark, tmp_path_factory, seq):
    """merge_upsert applied batch-by-batch == dict.update replay."""
    target = str(tmp_path_factory.mktemp("merge") / "t")
    expected: dict[int, int] = {}
    for batch in seq:
        # last write per key wins within a batch, as MERGE requires
        # unique keys per source batch
        dedup = {k: v for k, v in batch}
        df = spark.createDataFrame(
            [(k, v) for k, v in dedup.items()], "id long, v long"
        )
        merge_upsert(spark, target, df, keys=["id"])
        expected.update(dedup)
    got = {
        r["id"]: r["v"] for r in spark.read.parquet(target).collect()
    }
    assert got == expected


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    amount=st.floats(min_value=0.01, max_value=1e5, allow_nan=False),
    days=st.integers(min_value=0, max_value=400),
)
def test_revenue_conservation(spark, amount, days):
    """deferred + recognized == net amount on every day of any period."""
    import datetime as dt

    from stripe_data_pipeline_spark.models.exchange_rates import exchange_rates
    from stripe_data_pipeline_spark.models.revenue import (
        daily_revenue_facts,
        with_usd_amounts,
    )

    start = dt.date(2024, 1, 1)
    li = spark.createDataFrame(
        [(1, amount, 0.0, "usd", False, start, start + dt.timedelta(days=days), days)],
        "line_item_id long, amount double, tax_amount double, currency string, "
        "is_tax_inclusive boolean, period_start_date date, "
        "period_end_date_inferred date, service_period_days long",
    )
    facts = daily_revenue_facts(with_usd_amounts(li, exchange_rates(spark)))
    rows = facts.collect()
    assert len(rows) == days + 1  # closed interval
    for r in rows:
        assert (
            abs(
                r["deferred_revenue_usd"]
                + r["recognized_revenue_usd"]
                - r["amount_without_tax_usd"]
            )
            < 1e-6
        )
