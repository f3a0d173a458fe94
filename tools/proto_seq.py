"""A/B: date-typed sequence() explode vs integer-offset sequence + date_add
for revenue_trend_daily. Run on a quiet box. Usage:
  python3 tools/proto_seq.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from stripe_data_pipeline_spark.catalog.revenue_queries import facts  # noqa: E402
from stripe_data_pipeline_spark.functions.money import sum_usd_cents  # noqa: E402
from stripe_data_pipeline_spark.models.revenue import (  # noqa: E402
    with_daily_rate,
)
from stripe_data_pipeline_spark.catalog.revenue_queries import (  # noqa: E402
    exchange_rates,
)
from stripe_data_pipeline_spark.models.line_items import (  # noqa: E402
    curated_line_items,
)
from stripe_data_pipeline_spark.models.revenue import with_usd_amounts  # noqa: E402
from stripe_data_pipeline_spark.session import get_spark  # noqa: E402


def facts_intseq(spark, sf_dir):
    li = curated_line_items(spark, sf_dir)
    usd = with_usd_amounts(li, exchange_rates(spark))
    df = with_daily_rate(usd)
    start = F.least(
        F.col("period_start_date"), F.col("period_end_date_inferred")
    )
    df = df.withColumn(
        "_day_off",
        F.explode(
            F.sequence(
                F.lit(0),
                F.datediff(F.col("period_end_date_inferred"), start),
            )
        ),
    )
    df = df.withColumn("as_of_date", F.date_add(start, F.col("_day_off"))).drop(
        "_day_off"
    )
    s, e = F.col("period_start_date"), F.col("period_end_date_inferred")
    d = F.col("as_of_date")
    m = F.col("amount_without_tax_usd")
    daily = F.col("daily_revenue_usd")
    deferred = (
        F.when(d < s, m).when(d >= e, F.lit(0.0)).otherwise(daily * F.datediff(e, d))
    )
    recognized = (
        F.when(d < s, F.lit(0.0)).when(d >= e, m).otherwise(daily * F.datediff(d, s))
    )
    return df.withColumns(
        {"deferred_revenue_usd": deferred, "recognized_revenue_usd": recognized}
    )


def trend(fx):
    return (
        fx.groupBy("as_of_date")
        .agg(
            sum_usd_cents(F.col("deferred_revenue_usd")).alias("deferred_usd"),
            sum_usd_cents(F.col("recognized_revenue_usd")).alias("recognized_usd"),
            F.count(F.lit(1)).alias("n_line_items"),
        )
        .orderBy("as_of_date")
    )


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    spark = get_spark("proto_seq")
    sc = spark.sparkContext

    a = trend(facts(spark, sf_dir))
    b = trend(facts_intseq(spark, sf_dir))

    # warm both once
    noop(a)
    noop(b)

    for name, df in [("date_seq", a), ("int_seq", b)] * 3:
        sc.setJobDescription(f"proto {name}")
        t0 = time.time()
        noop(df)
        print(f"{name:10s} {time.time() - t0:6.2f}s", flush=True)

    # exact-equality check (collected; sf0.1 trend output is ~2400 rows)
    ra = a.collect()
    rb = b.collect()
    assert len(ra) == len(rb), (len(ra), len(rb))
    for x, y in zip(ra, rb):
        assert x == y, (x, y)
    print(f"IDENTICAL: {len(ra)} rows")


if __name__ == "__main__":
    main()
