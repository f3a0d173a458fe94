"""Relational operator queries (SURVEY.md §2.2-2.8).

One oracle-checked query per operator row of the survey inventory,
over the driver's TPC-H-ish tables. Each docstring cites the
reference construct it re-expresses (file:line into /root/reference/).

Determinism rules used throughout (see functions.money):
- money/double sums go through integer cents;
- per-row double arithmetic keeps identical expression trees on both
  engines (IEEE 754 makes those bit-identical);
- every LIMIT query carries a total order with a unique tiebreaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.catalog.registry import register
from stripe_data_pipeline_spark.functions.money import (
    sum_usd_cents,
    sum_usd_cents_sql,
    to_cents,
)
from stripe_data_pipeline_spark.io import read_table

# ---------------------------------------------------------------------------
# §2.2 Projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "orders_rename_cast",
    oracle="""
SELECT o_orderkey AS invoice_id,
       o_custkey AS customer_id,
       o_orderstatus AS status,
       o_totalprice / 100 AS total_usd,
       CAST(epoch(o_orderdate) AS BIGINT) AS created_at_epoch,
       CAST(o_orderdate AS DATE) AS created_at_date
FROM orders
""",
    doc="P2 rename-and-cast projection: id renames, cents->dollars "
    "division, unix->date derivation (curated/invoices.sql:16-52).",
)
def q_orders_rename_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("invoice_id"),
        F.col("o_custkey").alias("customer_id"),
        F.col("o_orderstatus").alias("status"),
        (F.col("o_totalprice") / 100).alias("total_usd"),
        F.unix_timestamp("o_orderdate").alias("created_at_epoch"),
        F.to_date("o_orderdate").alias("created_at_date"),
    )


@register(
    "orders_star_plus",
    oracle="""
SELECT *, CAST(o_orderdate AS DATE) AS created_at_date
FROM orders
""",
    doc="P1 star-plus staging projection: SELECT s.*, derived "
    "partition date (stg_invoices.sql:10-13).",
)
def q_orders_star_plus(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "orders").withColumn(
        "created_at_date", F.to_date("o_orderdate")
    )


@register(
    "orders_status_filter",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE) AS order_date
FROM orders WHERE o_orderstatus = 'F'
""",
    doc="P3 equality filter WHERE status = 'paid' "
    "(curated/invoice_line_items.sql:32); pushed to the parquet scan.",
)
def q_orders_status_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_totalprice",
            F.to_date("o_orderdate").alias("order_date"),
        )
    )


@register(
    "orders_high_watermark",
    oracle="""
SELECT o_orderkey, o_orderstatus, CAST(o_orderdate AS DATE) AS order_date
FROM orders
WHERE o_orderdate > (SELECT MAX(o_orderdate) FROM orders WHERE o_orderstatus = 'F')
""",
    doc="P4/S2 incremental high-watermark filter: uncorrelated scalar "
    "subquery MAX (curated/invoices.sql:11-13; extract_stripe_data.py:43-59). "
    "Spark side resolves the HWM driver-side then filters — the filter "
    "lands on the scan and prunes date partitions at scale.",
)
def q_orders_high_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    hwm = (
        orders.filter(F.col("o_orderstatus") == "F")
        .agg(F.max("o_orderdate"))
        .first()[0]
    )
    return orders.filter(F.col("o_orderdate") > F.lit(hwm)).select(
        "o_orderkey",
        "o_orderstatus",
        F.to_date("o_orderdate").alias("order_date"),
    )


@register(
    "events_in_list",
    oracle="""
SELECT event_type, COUNT(*) AS n
FROM events
WHERE event_type IN ('signup', 'purchase')
GROUP BY event_type
""",
    doc="P7 IN-list predicate (curated/calendar.sql:15).",
)
def q_events_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# §2.3 Joins
# ---------------------------------------------------------------------------


@register(
    "dim_chain_join",
    oracle="""
SELECT r.r_name AS region_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(FLOOR(c.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_acctbal
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    doc="J1 small-dimension equi-joins, explicitly broadcast "
    "(marts/deferred_revenue.sql:52-56 FX-join pattern, chained).",
)
def q_dim_chain_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            sum_usd_cents(F.col("c_acctbal")).alias("total_acctbal"),
        )
    )


@register(
    "orders_lineitem_join",
    oracle=f"""
SELECT o.o_orderstatus AS status,
       {sum_usd_cents_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       COUNT(*) AS n_items
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderstatus
""",
    doc="Fact-to-fact equi-join on the natural key (invoice -> line "
    "items, curated/invoice_line_items.sql:30 parent-child). Shuffle "
    "hash/sort-merge territory at scale — co-partition or bucket both "
    "sides on orderkey to avoid one of the shuffles.",
)
def q_orders_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            sum_usd_cents(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "customer_orders_left_join",
    oracle="""
SELECT c.c_custkey AS customer_id, COUNT(o.o_orderkey) AS n_orders
FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
GROUP BY c.c_custkey
""",
    doc="Left outer join preserving order-less customers (extension "
    "beyond the reference's inner/cross-only joins, SURVEY.md §2.3).",
)
def q_customer_orders_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy(F.col("c_custkey").alias("customer_id"))
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@register(
    "customers_with_open_orders_semi",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')
""",
    doc="Left-semi join (EXISTS) — SURVEY.md §2.3 notes semi/anti as "
    "implementation devices for the merge sink and orphan tests "
    "(README.md:164-168).",
)
def q_customers_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "customers_without_orders_anti",
    oracle="""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderstatus = 'P')
""",
    doc="Left-anti join (NOT EXISTS) — the 'orphaned line items' test "
    "shape from README.md:164-168. Anti-joins against P-status orders "
    "(every customer has SOME order in this data, so the unqualified "
    "form is vacuously empty and would prove nothing).",
)
def q_customers_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "doc_words_exploded_top20",
    oracle="""
SELECT w.word, COUNT(*) AS n
FROM documents d, LATERAL UNNEST(string_split(d.text, ' ')) AS w(word)
GROUP BY w.word
ORDER BY n DESC, w.word
LIMIT 20
""",
    doc="J2 correlated lateral array join (UNNEST) — one row per array "
    "element with parent columns repeated "
    "(curated/invoice_line_items.sql:30-31).",
)
def q_doc_words_exploded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "word")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# §2.4 Aggregations
# ---------------------------------------------------------------------------


@register(
    "max_cursor",
    oracle="""
SELECT MAX(CAST(epoch(o_orderdate) AS BIGINT)) AS last_timestamp
FROM orders
""",
    doc="A1/S2 ungrouped MAX incremental cursor "
    "(extract_stripe_data.py:14,22,30 'SELECT MAX(CAST(created AS INT64))').",
)
def q_max_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .agg(F.max(F.unix_timestamp("o_orderdate")).alias("last_timestamp"))
    )


@register(
    "grouped_stats",
    oracle="""
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       MIN(c_acctbal) AS min_bal,
       MAX(c_acctbal) AS max_bal,
       (CAST(SUM(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0)
           / CAST(COUNT(*) AS DOUBLE) AS avg_bal
FROM customer
GROUP BY c_mktsegment
""",
    doc="A3 grouped aggregation + DISTINCT count (extension; reference "
    "has only SUM/MAX/COUNT). avg computed from integer cents for "
    "order-independence.",
)
def q_grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.min("c_acctbal").alias("min_bal"),
            F.max("c_acctbal").alias("max_bal"),
            (
                (F.sum(to_cents(F.col("c_acctbal"))).cast("double") / F.lit(100.0))
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_bal"),
        )
    )


@register(
    "pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sum_usd_cents_sql("l_quantity")} AS sum_qty,
       {sum_usd_cents_sql("l_extendedprice")} AS sum_base_price,
       {sum_usd_cents_sql("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       {sum_usd_cents_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1-shaped pricing summary: the canonical wide grouped "
    "aggregation (A3) with multiple derived-measure sums; partial "
    "aggregation map-side, one shuffle on the tiny group key.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.to_date("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            sum_usd_cents(F.col("l_quantity")).alias("sum_qty"),
            sum_usd_cents(F.col("l_extendedprice")).alias("sum_base_price"),
            sum_usd_cents(disc_price).alias("sum_disc_price"),
            sum_usd_cents(charge).alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# §2.5 Window functions (+ §2.10 batch analogues)
# ---------------------------------------------------------------------------


@register(
    "latest_event_per_user",
    oracle="""
SELECT user_id, event_id, event_type, value
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                 ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
) t WHERE rn = 1
""",
    doc="Latest-state per key via ROW_NUMBER — the batch analogue of "
    "the subscription-updates changelog compaction (SURVEY.md §2.10; "
    "stg_subscription_updates has no downstream consumer in the "
    "reference — this completes it).",
)
def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        read_table(spark, sf_dir, "events")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "value")
    )


@register(
    "running_value_per_user",
    oracle="""
SELECT event_id, user_id,
       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / 100.0 AS running_value
FROM events
""",
    doc="Ordered-frame running SUM (extension; the reference computes "
    "running totals closed-form instead — SURVEY.md §2.5 note).",
)
def q_running_value_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (F.sum(to_cents(F.col("value"))).over(w).cast("double") / F.lit(100.0)).alias(
            "running_value"
        ),
    )


@register(
    "top3_orders_per_status",
    oracle="""
SELECT o_orderstatus, o_orderkey, o_totalprice
FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderstatus
                                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
    FROM orders
) t WHERE rn <= 3
""",
    doc="Ranking window (row_number top-N per group; extension — "
    "SURVEY.md §2.5 'not present' list).",
)
def q_top3_orders_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        read_table(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_orderstatus", "o_orderkey", "o_totalprice")
    )


@register(
    "event_gaps",
    oracle="""
SELECT event_id, user_id,
       CAST(FLOOR(epoch(ts)) AS BIGINT)
         - CAST(FLOOR(epoch(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))) AS BIGINT)
         AS gap_seconds
FROM events
""",
    doc="LAG over ordered partition: inter-event gaps per user "
    "(extension; sessionization building block).",
)
def q_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    return read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        (ep - F.lag(ep).over(w)).alias("gap_seconds"),
    )


# ---------------------------------------------------------------------------
# §2.6 Sorts / limits, §2.7 Set ops
# ---------------------------------------------------------------------------


@register(
    "top20_orders",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
    doc="O1 global ORDER BY DESC + LIMIT (README.md:192,202). Spark "
    "executes as TakeOrderedAndProject — no global sort materialized.",
)
def q_top20_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@register(
    "union_all_slices",
    oracle=f"""
SELECT bucket,
       COUNT(*) AS n,
       {sum_usd_cents_sql("o_totalprice")} AS total
FROM (
    SELECT 'high' AS bucket, o_totalprice FROM orders WHERE o_totalprice >= 200000
    UNION ALL
    SELECT 'low' AS bucket, o_totalprice FROM orders WHERE o_totalprice < 50000
) t
GROUP BY bucket
""",
    doc="U1 UNION ALL chain (curated/exchange_rates.sql:12-28).",
)
def q_union_all_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    high = o.filter(F.col("o_totalprice") >= 200000).select(
        F.lit("high").alias("bucket"), "o_totalprice"
    )
    low = o.filter(F.col("o_totalprice") < 50000).select(
        F.lit("low").alias("bucket"), "o_totalprice"
    )
    return (
        high.unionAll(low)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            sum_usd_cents(F.col("o_totalprice")).alias("total"),
        )
    )


@register(
    "custkey_set_ops",
    oracle="""
SELECT 'both' AS which, COUNT(*) AS n FROM (
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
) t
UNION ALL
SELECT 'f_only' AS which, COUNT(*) AS n FROM (
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
) t
""",
    doc="INTERSECT / EXCEPT set operations (extension; SURVEY.md §2.7 "
    "'not present' list).",
)
def q_custkey_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    f_keys = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o_keys = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    both = f_keys.intersect(o_keys).agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("both").alias("which"), "n"
    )
    f_only = (
        f_keys.subtract(o_keys)
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("f_only").alias("which"), "n")
    )
    return both.unionAll(f_only)


# ---------------------------------------------------------------------------
# §2.8 Scalar functions
# ---------------------------------------------------------------------------


@register(
    "date_functions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INT) AS order_year,
       CAST(quarter(o_orderdate) AS VARCHAR) AS order_quarter,
       CAST(month(o_orderdate) AS INT) AS order_month,
       monthname(CAST(o_orderdate AS DATE)) AS order_month_name,
       CAST(isodow(o_orderdate) AS INT) AS order_dow,
       dayname(CAST(o_orderdate AS DATE)) AS order_dow_name,
       CAST(o_orderdate AS DATE) + 30 AS due_date,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS age_days,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month_start
FROM orders
""",
    doc="§2.8 date/time scalar-function table: EXTRACT/FORMAT_DATE/"
    "DATE_ADD/DATE_DIFF equivalents (curated/calendar.sql:5-20, "
    "curated/invoices.sql:39-46).",
)
def q_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.to_date("o_orderdate")
    return read_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year(d).alias("order_year"),
        F.quarter(d).cast("string").alias("order_quarter"),
        F.month(d).alias("order_month"),
        F.date_format(d, "MMMM").alias("order_month_name"),
        (F.weekday(d) + 1).alias("order_dow"),
        F.date_format(d, "EEEE").alias("order_dow_name"),
        F.date_add(d, 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("age_days"),
        F.trunc(d, "month").alias("order_month_start"),
    )


@register(
    "json_extraction",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS n,
       COUNT(json_extract_string(props, '$.missing')) AS n_missing_key
FROM events
GROUP BY CAST(json_extract_string(props, '$.k') AS BIGINT) % 10
""",
    doc="JSON_EXTRACT_SCALAR on schema-on-read documents "
    "(curated/invoice_line_items.sql:40-61) + P5 null semantics for "
    "absent paths.",
)
def q_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        read_table(spark, sf_dir, "events")
        .groupBy((k % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.get_json_object("props", "$.missing")).alias("n_missing_key"),
        )
    )


@register(
    "variant_shredding_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       {sum_usd_cents_sql("value")} AS total_value,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
           AS total_k,
       CAST(SUM(user_id % 10) AS BIGINT) AS total_tag1,
       CAST(0 AS BIGINT) AS n_missing
FROM events
GROUP BY event_type
""",
    doc="Spark 4 VARIANT semi-structured round trip: each event is "
    "re-serialized as a nested JSON document (scalars + a nested "
    "object + an array + the re-parsed props payload), parsed into "
    "the binary VariantType with parse_json, and every field read "
    "back through variant_get typed-path extraction — nested-object "
    "path, array index, cross-document payload, and a "
    "try_variant_get on a missing path (NULL, counted as 0). The "
    "per-type aggregate must bit-match plain SQL over the base "
    "columns, proving the encode→shred→decode cycle is lossless. "
    "VariantType is the engine's schema-on-read answer for ingest "
    "pipelines where per-record shapes drift: the binary encoding "
    "keeps extraction JVM-side and columnar-batch-friendly instead "
    "of per-row JSON string re-parsing.",
)
def q_variant_shredding_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.col("event_id").alias("id"),
            F.struct(
                F.col("event_type").alias("type"),
                F.col("value").alias("amount"),
            ).alias("meta"),
            F.array(F.col("user_id"), F.col("user_id") % 10).alias("tags"),
            F.from_json(F.col("props"), "k INT").alias("props"),
        )
    )
    v = F.parse_json(doc)
    shredded = ev.select(
        F.variant_get(v, "$.meta.type", "string").alias("event_type"),
        F.variant_get(v, "$.meta.amount", "double").alias("amount"),
        F.variant_get(v, "$.props.k", "int").alias("k"),
        F.variant_get(v, "$.tags[1]", "bigint").alias("tag1"),
        F.try_variant_get(v, "$.missing.path", "int").alias("missing"),
    )
    return shredded.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        sum_usd_cents(F.col("amount")).alias("total_value"),
        F.sum("k").cast("bigint").alias("total_k"),
        F.sum("tag1").cast("bigint").alias("total_tag1"),
        F.count("missing").alias("n_missing"),
    )


@register(
    "conditional_functions",
    oracle="""
SELECT CASE WHEN p_retailprice >= 1500 THEN 'premium'
            WHEN p_retailprice >= 1000 THEN 'standard'
            ELSE 'budget' END AS tier,
       COUNT(*) AS n,
       COUNT(NULLIF(p_size, 1)) AS n_size_not_1,
       COALESCE(NULL, 'x') AS coalesced
FROM part
GROUP BY CASE WHEN p_retailprice >= 1500 THEN 'premium'
              WHEN p_retailprice >= 1000 THEN 'standard'
              ELSE 'budget' END
""",
    doc="CASE WHEN / IF / COALESCE / NULLIF conditional family "
    "(curated/invoice_line_items.sql:102-113, calendar.sql:15,17).",
)
def q_conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    tier = (
        F.when(F.col("p_retailprice") >= 1500, "premium")
        .when(F.col("p_retailprice") >= 1000, "standard")
        .otherwise("budget")
    )
    return (
        read_table(spark, sf_dir, "part")
        .groupBy(tier.alias("tier"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.nullif(F.col("p_size"), F.lit(1))).alias("n_size_not_1"),
            F.first(F.coalesce(F.lit(None), F.lit("x"))).alias("coalesced"),
        )
    )


# ---------------------------------------------------------------------------
# Multi-dimensional aggregation (extension)
# ---------------------------------------------------------------------------


@register(
    "price_percentiles",
    oracle="""
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.95) AS p95,
       MAX(o_totalprice) AS p_max
FROM orders
GROUP BY o_orderstatus
""",
    doc="Exact percentiles with linear interpolation (Spark "
    "`percentile` == DuckDB `quantile_cont`, verified bit-exact). At "
    "scale prefer approx_percentile (t-digest sketch) — the exact "
    "version sorts each group.",
)
def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.95)").alias("p95"),
            F.max("o_totalprice").alias("p_max"),
        )
    )


@register(
    "approx_percentile_prices",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_extendedprice, 0.5) AS p50_exact,
       quantile_cont(l_extendedprice, 0.95) AS p95_exact,
       TRUE AS sketch_within_tol
FROM lineitem
GROUP BY l_returnflag
""",
    doc="Sketch percentiles (approx_percentile, the GK quantile "
    "summary) — the 100 TB replacement for the exact sort-based "
    "price_percentiles: mergeable fixed-size per-partition summaries, "
    "no per-group sort. The sketch itself is engine-specific, so the "
    "oracle contract is: exact percentiles (bit-matched to DuckDB "
    "quantile_cont) PLUS a Spark-side assertion that the sketch "
    "landed within 2% relative of exact, emitted as a column the "
    "oracle pins to TRUE. accuracy=1000 bounds rank error at 0.1%, "
    "far inside the 2% value tolerance.",
)
def q_approx_percentile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = F.expr("percentile(l_extendedprice, array(0.5D, 0.95D))")
    ap = F.expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 1000)")
    agg = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(ex.alias("ex"), ap.alias("ap"))
    )
    within = (
        F.abs(F.col("ap")[0] - F.col("ex")[0]) <= F.col("ex")[0] * F.lit(2e-2)
    ) & (F.abs(F.col("ap")[1] - F.col("ex")[1]) <= F.col("ex")[1] * F.lit(2e-2))
    return agg.select(
        "l_returnflag",
        F.col("ex")[0].alias("p50_exact"),
        F.col("ex")[1].alias("p95_exact"),
        within.alias("sketch_within_tol"),
    )


@register(
    "pivot_qty_by_status",
    oracle=f"""
SELECT l_returnflag,
       {sum_usd_cents_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O,
       {sum_usd_cents_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F
FROM lineitem
GROUP BY l_returnflag
""",
    doc="PIVOT (conditional aggregation; extension).",
)
def q_pivot_qty_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(sum_usd_cents(F.col("l_quantity")))
    )


@register(
    "asof_join_events_orders",
    oracle="""
WITH compacted AS (
    SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
    FROM orders
    GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey AS last_order_key
FROM events e
ASOF LEFT JOIN compacted o
    ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    doc="As-of (backward) join — an operator Spark lacks natively "
    "(SURVEY.md §2.3 'not present' list), built as union + keyed "
    "window last-non-null: one shuffle on the key instead of a "
    "nested-loop range join. Oracle is DuckDB's native ASOF JOIN.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.asof import asof_join

    events = read_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    compacted = (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("user_id"), F.col("o_orderdate"))
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    out = asof_join(
        events,
        compacted,
        key="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        payload=["o_orderkey"],
    )
    return out.select(
        "event_id", "user_id", F.col("o_orderkey").alias("last_order_key")
    )


@register(
    "sessionized_events",
    oracle="""
WITH gapped AS (
    SELECT event_id, user_id, ts,
           CASE WHEN CAST(FLOOR(epoch(ts)) AS BIGINT)
                     - CAST(FLOOR(epoch(LAG(ts) OVER w)) AS BIGINT) > 1800
                     OR LAG(ts) OVER w IS NULL
                THEN 1 ELSE 0 END AS is_new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
    SELECT user_id, event_id,
           CAST(SUM(is_new_session) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_no
    FROM gapped
)
SELECT user_id, session_no, COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_no
""",
    doc="Gap-based sessionization (30-min inactivity): lag -> new-"
    "session flag -> running sum = session id. The standard "
    "training-data event-grouping operator, all window built-ins.",
)
def q_sessionized_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ep = F.unix_timestamp("ts")
    gap = ep - F.lag(ep).over(w)
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sessions = ev.withColumn("is_new_session", is_new).withColumn(
        "session_no",
        F.sum("is_new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "regional_revenue_q5ish",
    oracle=f"""
SELECT r.r_name AS region,
       CAST(year(o.o_orderdate) AS INT) AS order_year,
       {sum_usd_cents_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       COUNT(*) AS n_items
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY r.r_name, year(o.o_orderdate)
""",
    doc="TPC-H Q5-shaped five-table join chain (region->nation->"
    "supplier->lineitem->orders): Catalyst reorders, dims broadcast, "
    "only the fact-fact edge shuffles.",
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = read_table(spark, sf_dir, "region")
    n = read_table(spark, sf_dir, "nation")
    s = read_table(spark, sf_dir, "supplier")
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    # r15 (guide §3.1): hint the WHOLE dim chain broadcast, not just
    # region — with only the leaf hinted, the planner's post-join size
    # estimate ballooned and it SORT-MERGE-joined the 10k-row
    # region x nation x supplier result against lineitem, shuffling
    # and sorting the whole fact table on l_suppkey. It then
    # auto-BROADCAST the 1.5M-row projected orders side, paying a
    # slow driver-side hash-relation build per run; orders x lineitem
    # is fact x fact, so shuffled-hash is the deliberate (and
    # 100 TB-correct) strategy. Measured at sf1: 8.1 -> 4.0 s,
    # plan SMJ(lineitem) -> BHJ(dims) and BHJ(orders) -> SHJ(orders);
    # result row-identical.
    dims = F.broadcast(
        r.join(n, n["n_regionkey"] == r["r_regionkey"])
        .join(s, s["s_nationkey"] == n["n_nationkey"])
        .select("r_name", "s_suppkey")
    )
    return (
        li.join(dims, li["l_suppkey"] == dims["s_suppkey"])
        .join(
            o.hint("shuffle_hash"), o["o_orderkey"] == li["l_orderkey"]
        )
        .groupBy(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(
            sum_usd_cents(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "salted_skew_join",
    oracle=f"""
SELECT n.n_name AS nation,
       COUNT(*) AS n_customers,
       {sum_usd_cents_sql("c.c_acctbal")} AS total_bal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    doc="Salted equi-join (operators/skew.py): hot-key shuffle spread "
    "over salt buckets; semantics identical to the plain join, which "
    "is what the oracle checks.",
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.skew import salted_join

    c = read_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_nationkey", "nationkey"
    )
    n = read_table(spark, sf_dir, "nation").withColumnRenamed(
        "n_nationkey", "nationkey"
    )
    return (
        salted_join(c, n, on=["nationkey"], buckets=4)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            sum_usd_cents(F.col("c_acctbal")).alias("total_bal"),
        )
    )


@register(
    "string_functions",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       substr(p_name, 1, 8) AS name_prefix,
       concat(p_brand, ':', p_type) AS brand_type,
       CAST(length(p_name) AS INT) AS name_len,
       replace(p_type, ' ', '_') AS type_snake,
       CASE WHEN p_type LIKE '%BRASS%' THEN TRUE ELSE FALSE END AS is_brass,
       lpad(CAST(p_size AS VARCHAR), 3, '0') AS size_padded
FROM part
""",
    doc="String scalar family (extension — the reference uses only "
    "literals/equality, SURVEY.md §2.8): upper/substr/concat/length/"
    "replace/LIKE/lpad.",
)
def q_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.length("p_name").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.col("p_type").like("%BRASS%").alias("is_brass"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("size_padded"),
    )


@register(
    "events_hourly_windows",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type,
       COUNT(*) AS n_events
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
    doc="Tumbling 1-hour window aggregation — the batch/streaming-"
    "unified rollup (SURVEY.md §2.10: F.window works identically on "
    "readStream).",
)
def q_events_hourly_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.streaming.events import windowed_event_counts

    return windowed_event_counts(
        read_table(spark, sf_dir, "events"), "1 hour"
    )


@register(
    "events_rolling_hour_count",
    oracle="""
SELECT event_id, user_id,
       COUNT(*) OVER (PARTITION BY user_id
                      ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                      RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
           AS n_last_hour
FROM events
""",
    doc="RANGE-framed window over event time: per-user count of events "
    "in the trailing hour (extension; SURVEY.md §2.5 'not present' "
    "list — ordered range frames).",
)
def q_events_rolling_hour_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ep = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id").orderBy(ep).rangeBetween(-3600, 0)
    return read_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


@register(
    "approx_distinct_parts",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       TRUE AS approx_within_5pct
FROM lineitem
GROUP BY l_returnflag
""",
    doc="approx_count_distinct (HyperLogLog++) per returnflag — the "
    "sketch path for count-distinct at 100 TB (exact countDistinct "
    "is a full shuffle of the distinct keys; HLL is a constant-size "
    "mergeable sketch). Flag-pinned oracle (VERDICT r4 #1, the "
    "vocab_overlap_hll_check pattern): the sketch estimate itself is "
    "engine-specific, so the query emits the exact count plus a "
    "within-5%% boolean the oracle pins TRUE — the sketch is "
    "deterministic given the data, so the flag is stable, and a "
    "broken sketch path flips it red at the driver.",
)
def q_approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("approx_parts") - F.col("exact_parts"))
            <= F.col("exact_parts") * F.lit(0.05)
        ).alias("approx_within_5pct"),
    )


@register(
    "sql_api_segment_revenue",
    oracle=f"""
SELECT c.c_mktsegment AS segment,
       o.o_orderpriority AS priority,
       {sum_usd_cents_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
GROUP BY c.c_mktsegment, o.o_orderpriority
""",
    doc="SQL-API surface (§3.3): the same Catalyst plans are reachable "
    "via spark.sql over registered views — this query is textual SQL "
    "end-to-end (TPC-H Q3-ish shape: dim->fact->fact join chain).",
)
def q_sql_api_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_mktsegment AS segment,
               o.o_orderpriority AS priority,
               CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100.0 + 0.5)
                             AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
               COUNT(DISTINCT o.o_orderkey) AS n_orders
        FROM customer c
        JOIN orders o ON o.o_custkey = c.c_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
        GROUP BY c.c_mktsegment, o.o_orderpriority
        """
    )


@register(
    "cube_counts",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
    doc="CUBE grouping sets (extension; SURVEY.md §2.4 'not present' list).",
)
def q_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        read_table(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "hll_mergeable_user_counts",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       TRUE AS est_within_10pct,
       (SELECT COUNT(DISTINCT user_id) FROM events) AS exact_all_users,
       TRUE AS union_within_10pct
FROM events
GROUP BY event_type
""",
    doc="MERGEABLE HLL sketches (hll_sketch_agg / hll_union_agg): "
    "per-event-type user sketches, each estimated, then UNIONED into "
    "one corpus-wide sketch. The 100 TB pattern this proves: "
    "constant-size partial sketches built per partition/day merge "
    "into exact-union estimates without ever re-shuffling raw keys "
    "(register maxima are commutative), unlike exact countDistinct "
    "which shuffles every distinct key. Flag-pinned oracle (VERDICT "
    "r4 #2, the vocab_overlap_hll_check pattern): the datasketches "
    "binary is engine-specific, so the query emits exact counts plus "
    "within-10%% booleans — for BOTH the per-type estimates and the "
    "unioned sketch — that the oracle pins TRUE. Mergeability law "
    "(union-of-sketches == sketch-of-union) additionally pytest-gated "
    "(tests/test_operators.py).",
)
def q_hll_mergeable_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    merged = per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_all_types")
    )
    exact_all = ev.agg(F.countDistinct("user_id").alias("exact_all_users"))
    within = lambda est, exact: (  # noqa: E731
        F.abs(est.cast("double") - F.col(exact).cast("double"))
        <= F.col(exact).cast("double") * F.lit(0.10)
    )
    return (
        per_type.select(
            "event_type",
            "exact_users",
            within(F.hll_sketch_estimate("sk"), "exact_users").alias(
                "est_within_10pct"
            ),
        )
        .crossJoin(F.broadcast(exact_all))
        .crossJoin(F.broadcast(merged))
        .select(
            "event_type",
            "exact_users",
            "est_within_10pct",
            "exact_all_users",
            within(F.col("est_all_types"), "exact_all_users").alias(
                "union_within_10pct"
            ),
        )
        .orderBy("event_type")
    )


@register(
    "datasketches_hll_check",
    oracle="""
WITH per_ck AS (
    SELECT o_custkey,
           MAX(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS in_f,
           MAX(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS in_o
    FROM orders
    GROUP BY o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS exact_all,
       CAST(SUM(in_f) AS BIGINT) AS exact_f,
       CAST(SUM(in_o) AS BIGINT) AS exact_o,
       CAST(SUM(in_f * in_o) AS BIGINT) AS exact_f_and_o,
       CAST(SUM(in_f * (1 - in_o)) AS BIGINT) AS exact_f_not_o,
       CAST(SUM(in_f + in_o - in_f * in_o) AS BIGINT) AS exact_f_or_o,
       TRUE AS hll_merge_within_10pct,
       TRUE AS theta_union_within_10pct,
       TRUE AS theta_intersection_within_10pct,
       TRUE AS theta_difference_within_10pct
FROM per_ck
""",
    doc="BUILT-IN DATASKETCHES interop (VERDICT r11 #5): the Apache "
    "DataSketches aggregates a user reaches for FIRST, beside the "
    "hand-rolled HLL/KMV — hll_sketch_agg partials built on TWO "
    "SHARDS (orderkey parity) merged via the BINARY hll_union buffer "
    "merge, plus the theta family for SET ALGEBRA sketches cannot "
    "do in HLL: theta_union / theta_intersection / theta_difference "
    "of the F-status vs O-status customer sets. Flag-pinned oracle "
    "(the hll_mergeable_user_counts pattern): sketch buffers are "
    "engine-specific bytes, so the row carries exact counts plus "
    "within-10%% booleans the oracle pins TRUE (at this cardinality "
    "theta runs in exact mode, so the set-op flags have zero slack "
    "in practice). The 100 TB shape: per-shard constant-size "
    "buffers, one driver-free merge, no distinct-key shuffle.",
)
def q_datasketches_hll_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    ck = F.col("o_custkey")
    sketches = o.agg(
        F.hll_sketch_agg(F.when(F.col("o_orderkey") % 2 == 0, ck)).alias("sk0"),
        F.hll_sketch_agg(F.when(F.col("o_orderkey") % 2 == 1, ck)).alias("sk1"),
        F.theta_sketch_agg(
            F.when(F.col("o_orderstatus") == "F", ck)
        ).alias("th_f"),
        F.theta_sketch_agg(
            F.when(F.col("o_orderstatus") == "O", ck)
        ).alias("th_o"),
    )
    exact = (
        o.groupBy("o_custkey")
        .agg(
            F.max((F.col("o_orderstatus") == "F").cast("int")).alias("in_f"),
            F.max((F.col("o_orderstatus") == "O").cast("int")).alias("in_o"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_all"),
            F.sum("in_f").cast("bigint").alias("exact_f"),
            F.sum("in_o").cast("bigint").alias("exact_o"),
            F.sum(F.col("in_f") * F.col("in_o"))
            .cast("bigint")
            .alias("exact_f_and_o"),
            F.sum(F.col("in_f") * (1 - F.col("in_o")))
            .cast("bigint")
            .alias("exact_f_not_o"),
            F.sum(F.col("in_f") + F.col("in_o") - F.col("in_f") * F.col("in_o"))
            .cast("bigint")
            .alias("exact_f_or_o"),
        )
    )
    within = lambda est, exact: (  # noqa: E731
        F.abs(est.cast("double") - F.col(exact).cast("double"))
        <= F.col(exact).cast("double") * F.lit(0.10)
    )
    return exact.crossJoin(F.broadcast(sketches)).select(
        "exact_all",
        "exact_f",
        "exact_o",
        "exact_f_and_o",
        "exact_f_not_o",
        "exact_f_or_o",
        within(
            F.hll_sketch_estimate(F.hll_union("sk0", "sk1")), "exact_all"
        ).alias("hll_merge_within_10pct"),
        within(
            F.theta_sketch_estimate(F.theta_union("th_f", "th_o")),
            "exact_f_or_o",
        ).alias("theta_union_within_10pct"),
        within(
            F.theta_sketch_estimate(F.theta_intersection("th_f", "th_o")),
            "exact_f_and_o",
        ).alias("theta_intersection_within_10pct"),
        within(
            F.theta_sketch_estimate(F.theta_difference("th_f", "th_o")),
            "exact_f_not_o",
        ).alias("theta_difference_within_10pct"),
    )


@register(
    "key_skew_report_events",
    oracle="""
WITH c AS (
    SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
)
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(MAX(n) AS BIGINT) AS max_key_rows,
       quantile_cont(n, 0.99) AS p99_key_rows,
       (CAST(MAX(n) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE))
           / CAST(SUM(n) AS DOUBLE) AS skew_factor
FROM c
""",
    doc="Key-skew diagnostic over events.user_id: total rows, distinct "
    "keys, hottest key's count, p99 per-key count, and skew_factor = "
    "max/mean rows-per-key — the report that decides salting "
    "(operators/skew.py) vs plain shuffle. Per-key counts partial-"
    "combine; the global stage reduces |keys| rows to one.",
)
def q_key_skew_report_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.skew import key_skew_report

    return key_skew_report(read_table(spark, sf_dir, "events"), "user_id")


@register(
    "user_rfm_features",
    oracle=f"""
SELECT user_id,
       CAST(date_diff('second', MAX(ts), TIMESTAMP '2024-01-25 00:00:00')
            AS BIGINT) AS recency_sec,
       CAST(COUNT(*) AS BIGINT) AS frequency,
       {sum_usd_cents_sql("value")} AS monetary,
       CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_event_types,
       CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days
FROM events
WHERE ts < TIMESTAMP '2024-01-25 00:00:00'
GROUP BY user_id
""",
    doc="User-level RFM feature mart (the feature-engineering shape a "
    "training pipeline joins to labels): recency/frequency/monetary + "
    "type and active-day diversity, as of an explicit reference date "
    "(never CURRENT_TIMESTAMP — SURVEY.md §7 determinism). One "
    "partial-combined agg on user_id after a scan-pushed ts filter; "
    "monetary uses the fixed-point cents contract so the double is "
    "order-independent.",
)
def q_user_rfm_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.functions.money import sum_usd_cents

    as_of = "2024-01-25 00:00:00"
    ev = read_table(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit(as_of).cast("timestamp_ntz")
    )
    return ev.groupBy("user_id").agg(
        (
            # NTZ has no direct long cast; the session is pinned UTC so
            # NTZ -> TIMESTAMP -> epoch seconds is value-preserving
            F.lit(as_of).cast("timestamp").cast("long")
            - F.max(F.col("ts").cast("timestamp")).cast("long")
        )
        .cast("bigint")
        .alias("recency_sec"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        sum_usd_cents(F.col("value")).alias("monetary"),
        F.countDistinct("event_type").cast("bigint").alias("n_event_types"),
        F.countDistinct(F.col("ts").cast("date")).cast("bigint").alias("active_days"),
    )


@register(
    "event_funnel_conversion",
    oracle="""
WITH s AS (
    SELECT user_id, MIN(ts) AS signup_ts
    FROM events WHERE event_type = 'signup'
    GROUP BY user_id
), p AS (
    SELECT s.user_id, MIN(e.ts) AS purchase_ts
    FROM s JOIN events e
      ON e.user_id = s.user_id
     AND e.event_type = 'purchase'
     AND e.ts >= s.signup_ts
    GROUP BY s.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_signup_users,
       CAST(COUNT(p.purchase_ts) AS BIGINT) AS n_purchased,
       CAST(SUM(CASE WHEN p.purchase_ts < s.signup_ts + INTERVAL 1 DAY
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_converted_24h,
       CAST(CAST(SUM(CASE WHEN p.purchase_ts < s.signup_ts + INTERVAL 1 DAY
                          THEN 1 ELSE 0 END) AS BIGINT) * 10000
            // COUNT(*) AS BIGINT) AS conversion_bp
FROM s LEFT JOIN p USING (user_id)
""",
    doc="Event-funnel conversion (sequence analytics): per user the "
    "first signup, the first purchase at-or-after it, and the 24h "
    "conversion rate in basis points. Two partial-combined min aggs "
    "on user_id + one co-keyed join — Catalyst reuses the user_id "
    "exchange; no window, no self-join explosion; integer bp output.",
)
def q_event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    p = (
        s.join(ev.filter(F.col("event_type") == "purchase"), "user_id")
        .filter(F.col("ts") >= F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    j = s.join(p, "user_id", "left")
    converted = (
        F.col("purchase_ts")
        < F.col("signup_ts") + F.expr("INTERVAL 1 DAY")
    ).cast("bigint")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_signup_users"),
        F.count("purchase_ts").cast("bigint").alias("n_purchased"),
        F.sum(F.coalesce(converted, F.lit(0))).cast("bigint").alias("n_converted_24h"),
        F.expr(
            "CAST(sum(coalesce(CAST(purchase_ts < signup_ts + INTERVAL 1 DAY "
            "AS BIGINT), 0)) * 10000 div count(1) AS BIGINT)"
        ).alias("conversion_bp"),
    )


@register(
    "weekly_retention_cohorts",
    oracle="""
WITH firsts AS (
    SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
    FROM events GROUP BY user_id
), active AS (
    SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS active_week
    FROM events
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS BIGINT)
           AS offset_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM firsts f JOIN active a USING (user_id)
GROUP BY 1, 2
""",
    doc="Weekly retention cohorts: users grouped by first-seen week, "
    "counted in each later active week (the cohort-retention matrix). "
    "One min agg + one distinct on user-week + a user_id-keyed join; "
    "output cardinality is weeks^2 regardless of event volume.",
)
def q_weekly_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        firsts.join(active, "user_id")
        .groupBy(
            "cohort_week",
            F.floor(
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            )
            .cast("bigint")
            .alias("offset_weeks"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


@register(
    "daily_value_anomalies",
    oracle="""
WITH d AS (
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events GROUP BY 1
), s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(cents) AS BIGINT) AS total,
           CAST(SUM(cents * cents) AS BIGINT) AS total_sq
    FROM d
)
SELECT d.day,
       CAST(d.cents AS DOUBLE) / 100.0 AS day_value,
       CAST(d.cents AS DOUBLE)
           > (CAST(s.total AS DOUBLE) / CAST(s.n AS DOUBLE))
             + 2.0 * sqrt(
                 CAST(s.total_sq AS DOUBLE) / CAST(s.n AS DOUBLE)
                 - (CAST(s.total AS DOUBLE) / CAST(s.n AS DOUBLE))
                   * (CAST(s.total AS DOUBLE) / CAST(s.n AS DOUBLE))
             ) AS is_anomaly
FROM d, s
""",
    doc="Daily-total anomaly flags: days whose event-value total "
    "exceeds mean + 2 sigma across days. Sums and sums-of-squares are "
    "integer cents (order-independent), so mean/variance/sqrt are a "
    "fixed IEEE expression tree over identical integers — the z-score "
    "is bit-exact cross-engine without any float aggregation. One "
    "day-key agg + a single-row stats broadcast. cents^2 fits bigint "
    "through ~90M-dollar days; beyond that move the square to "
    "DECIMAL(38,0).",
)
def q_daily_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    d = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(to_cents(F.col("value"))).cast("bigint").alias("cents")
    )
    s = d.agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.sum("cents").cast("bigint").alias("__total"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("__total_sq"),
    )
    mean = F.col("__total").cast("double") / F.col("__n").cast("double")
    var = (
        F.col("__total_sq").cast("double") / F.col("__n").cast("double")
        - mean * mean
    )
    return d.crossJoin(F.broadcast(s)).select(
        "day",
        (F.col("cents").cast("double") / F.lit(100.0)).alias("day_value"),
        (F.col("cents").cast("double") > mean + F.lit(2.0) * F.sqrt(var)).alias(
            "is_anomaly"
        ),
    )


@register(
    "column_null_audit",
    oracle="""
WITH c AS (
    SELECT CASE WHEN l_linenumber <> 7
                THEN CAST(CAST(l_shipdate AS DATE)
                          + INTERVAL ((l_linenumber % 4) * 7 + 1) DAY AS VARCHAR)
           END AS period_end,
           CASE WHEN l_partkey % 3 = 0 THEN 'inclusive'
                WHEN l_partkey % 3 = 1 THEN 'exclusive' END AS tax_behavior,
           l_returnflag AS return_flag
    FROM lineitem
)
SELECT col, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null
FROM (
    SELECT 'period_end' AS col, period_end AS v FROM c
    UNION ALL
    SELECT 'tax_behavior', tax_behavior FROM c
    UNION ALL
    SELECT 'return_flag', return_flag FROM c
)
GROUP BY col
""",
    doc="Column-level null audit via UNPIVOT over the curated "
    "line-item derivation (whose period_end/tax_behavior are "
    "genuinely nullable — the reference's not_null tests, "
    "README.md:164-168, as one relation). Spark "
    "unpivot/melt -> one partial-combined agg on the tiny column-name "
    "key; the melt is a per-row Expand, no shuffle of the wide table.",
)
def q_column_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").select(
        F.when(
            F.col("l_linenumber") != 7,
            F.date_add(
                F.col("l_shipdate").cast("date"),
                (F.col("l_linenumber") % 4) * 7 + 1,
            ).cast("string"),
        ).alias("period_end"),
        F.when(F.col("l_partkey") % 3 == 0, "inclusive")
        .when(F.col("l_partkey") % 3 == 1, "exclusive")
        .alias("tax_behavior"),
        F.col("l_returnflag").alias("return_flag"),
    )
    melted = li.unpivot([], ["period_end", "tax_behavior", "return_flag"], "col", "v")
    return melted.groupBy("col").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("v").isNull().cast("bigint")).cast("bigint").alias("n_null"),
    )


from stripe_data_pipeline_spark.operators.layout import zorder_key_sql as _zsql

_ZKEY_ORACLE = _zsql(
    "(o_custkey % 65536)",
    "(date_diff('day', DATE '1992-01-01', o_orderdate) % 65536)",
)


@register(
    "zorder_key_check",
    oracle=f"""
SELECT o_orderkey,
       {_ZKEY_ORACLE} AS z_key
FROM orders
""",
    doc="Z-order (Morton) clustering key over (customer, order-day): "
    "16-bit magic-number bit interleaving as a pure JVM expression "
    "tree (shiftleft/and/or inside whole-stage codegen, no UDF), "
    "bit-exact vs DuckDB computing the same arithmetic. Range-sorting "
    "files on this key gives every file a tight min/max box in BOTH "
    "columns, so stats-based skipping prunes on either predicate — "
    "the multi-dimensional layout a 100 TB fact table needs "
    "(operators/layout.py; file-box tightness pytest-measured).",
)
def q_zorder_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.layout import zorder_key

    orders = read_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    return orders.select(
        "o_orderkey",
        zorder_key(F.col("o_custkey") % 65536, day % 65536).alias("z_key"),
    )


_SCD2_MART_CACHE: dict[str, str] = {}


def _cleanup_scd2_cache() -> None:
    import shutil

    for p in _SCD2_MART_CACHE.values():
        shutil.rmtree(p, ignore_errors=True)


_SCD2_DATES = ("1994-01-01", "1996-01-01", "1998-01-01")


def _seg_expr(cnt):
    return (
        F.when(cnt >= 15, "high")
        .when(cnt >= 5, "mid")
        .when(cnt >= 1, "low")
        .otherwise("none")
    )


def _materialized_scd2_mart(spark: SparkSession, sf_dir: str):
    """Three as-of snapshots of a per-customer activity segment folded
    through scd2_apply — the dbt-snapshot history model on the
    crash-atomic sink."""
    import atexit
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT
    from stripe_data_pipeline_spark.operators.scd import scd2_apply

    root = _SCD2_MART_CACHE.get(sf_dir)
    if root is not None:
        return MT.read_table(spark, root)
    if not _SCD2_MART_CACHE:
        atexit.register(_cleanup_scd2_cache)
    root = tempfile.mkdtemp(prefix="scd2_mart_")

    cust = read_table(spark, sf_dir, "customer").select("c_custkey")
    orders = read_table(spark, sf_dir, "orders")
    for ts in _SCD2_DATES:
        cnts = (
            orders.filter(F.col("o_orderdate") < F.lit(ts).cast("date"))
            .groupBy(F.col("o_custkey").alias("c_custkey"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        batch = (
            cust.join(cnts, "c_custkey", "left")
            .select(
                "c_custkey",
                _seg_expr(F.coalesce(F.col("cnt"), F.lit(0))).alias("seg"),
                F.lit(ts).cast("date").alias("ts"),
            )
        )
        scd2_apply(spark, root, batch, keys=["c_custkey"], cursor_col="ts")
    _SCD2_MART_CACHE[sf_dir] = root
    return MT.read_table(spark, root)


@register(
    "scd2_customer_segments",
    oracle=f"""
WITH snap AS (
    SELECT c.c_custkey, d.ts,
           CASE WHEN COUNT(o.o_orderkey) >= 15 THEN 'high'
                WHEN COUNT(o.o_orderkey) >= 5 THEN 'mid'
                WHEN COUNT(o.o_orderkey) >= 1 THEN 'low'
                ELSE 'none' END AS seg
    FROM customer c
    CROSS JOIN (VALUES (DATE '{_SCD2_DATES[0]}'), (DATE '{_SCD2_DATES[1]}'),
                       (DATE '{_SCD2_DATES[2]}')) d(ts)
    LEFT JOIN orders o
      ON o.o_custkey = c.c_custkey AND o.o_orderdate < d.ts
    GROUP BY c.c_custkey, d.ts
),
marked AS (
    SELECT *, lag(seg) OVER (PARTITION BY c_custkey ORDER BY ts) AS prev
    FROM snap
),
hist AS (
    SELECT c_custkey, seg, ts AS valid_from,
           lead(ts) OVER (PARTITION BY c_custkey ORDER BY ts) AS valid_to
    FROM marked
    WHERE prev IS NULL OR seg <> prev
)
SELECT c_custkey, seg, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM hist
""",
    doc="SCD Type 2 history (the dbt-snapshot model of the reference's "
    "'history accumulates in the warehouse' pattern, README.md:102-117): "
    "three as-of snapshots of a per-customer activity segment folded "
    "through scd2_apply — changed keys close their current version "
    "[valid_from, valid_to) and open a new one, all in ONE crash-atomic "
    "merge keyed by (key, valid_from), batch-vs-current join only "
    "(never history-sized). The oracle reconstructs the identical "
    "history declaratively with lag/lead windows over the three "
    "snapshots — bit parity proves the incremental fold equals the "
    "one-shot reconstruction.",
)
def q_scd2_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    mart = _materialized_scd2_mart(spark, sf_dir)
    return mart.select("c_custkey", "seg", "valid_from", "valid_to", "is_current")


_STATS_MART_CACHE: dict[str, str] = {}


def _cleanup_stats_mart_cache() -> None:
    import shutil

    for p in _STATS_MART_CACHE.values():
        shutil.rmtree(p, ignore_errors=True)


@register(
    "stats_pruned_scan_check",
    oracle="""
SELECT CAST(o_orderdate AS VARCHAR)[1:7] AS order_month,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 5e-1) AS BIGINT)) AS BIGINT)
           AS total_cents
FROM orders
WHERE o_orderdate BETWEEN DATE '1995-03-01' AND DATE '1995-09-30'
GROUP BY 1
""",
    doc="Manifest stats skipping proven correct under the driver: "
    "orders land in a month-partitioned manifest table with per-dir "
    "AND per-file [min,max] stats on the order-day integer; the scan "
    "resolves via read_table(stats_filter=...) — untouched months are "
    "dropped from the path list driver-side, range-sorted files "
    "inside surviving months are dropped by footer ranges — and the "
    "remaining exact filter + rollup must bit-match the plain "
    "full-scan SQL oracle. Skipping that changed an answer would "
    "show here first.",
)
def q_stats_pruned_scan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import datetime as dt
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT

    root = _STATS_MART_CACHE.get(sf_dir)
    if root is None:
        if not _STATS_MART_CACHE:
            atexit.register(_cleanup_stats_mart_cache)
        root = tempfile.mkdtemp(prefix="stats_scan_mart_") + "/orders"
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
            F.datediff("o_orderdate", F.lit("1992-01-01").cast("date")).alias(
                "order_day"
            ),
        )
        # range-sort within the write so per-file day ranges are tight
        MT.merge_upsert_atomic(
            spark,
            root,
            orders.repartitionByRange(4, "order_day").sortWithinPartitions(
                "order_day"
            ),
            keys=["o_orderkey"],
            partition_by="order_month",
            stats_cols=["order_day"],
        )
        _STATS_MART_CACHE[sf_dir] = root

    lo = (dt.date(1995, 3, 1) - dt.date(1992, 1, 1)).days
    hi = (dt.date(1995, 9, 30) - dt.date(1992, 1, 1)).days
    pruned = MT.read_table(spark, root, stats_filter={"order_day": (lo, hi)})
    return (
        pruned.filter(F.col("order_day").between(lo, hi))
        .groupBy("order_month")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            ).alias("total_cents"),
        )
    )


_BLOOM_MART_CACHE: dict[str, str] = {}


def _cleanup_bloom_mart_cache() -> None:
    import shutil

    for p in _BLOOM_MART_CACHE.values():
        shutil.rmtree(p, ignore_errors=True)


@register(
    "bloom_pruned_scan_check",
    oracle="""
SELECT o_orderkey,
       md5(CAST(o_orderkey AS VARCHAR)) AS key,
       CAST(FLOOR(o_totalprice * 100 + 5e-1) AS BIGINT) AS total_cents,
       TRUE AS bloom_pruned_strictly,
       TRUE AS absent_key_reads_zero_files
FROM orders
WHERE md5(CAST(o_orderkey AS VARCHAR)) =
      md5(CAST((SELECT MIN(o_orderkey) FROM orders) AS VARCHAR))
""",
    doc="BLOOM FILE-SKIPPING index proven correct under the driver "
    "(VERDICT r11 #7 — the Delta/Iceberg bloom feature): orders land "
    "in a manifest table keyed by an UNSORTED high-cardinality md5 "
    "key across 8 hash-distributed files, so every file's [min,max] "
    "range spans the whole domain and range stats can prune NOTHING. "
    "merge_upsert_atomic(bloom_cols=['key']) records a per-file Bloom "
    "sidecar (_blooms.json inside the immutable dir; md5-60-bit "
    "positions, 62-bit words); read_table resolves a point "
    "stats_filter through it in pure Python — zero Spark jobs. The "
    "returned probe rows must bit-match the full-scan SQL oracle, "
    "and two flag columns pin the physics: the probed scan reads "
    "STRICTLY fewer files than the full scan, and a definitely-"
    "absent key reads ZERO files.",
)
def q_bloom_pruned_scan_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import tempfile

    from stripe_data_pipeline_spark import manifest_table as MT

    root = _BLOOM_MART_CACHE.get(sf_dir)
    if root is None:
        if not _BLOOM_MART_CACHE:
            atexit.register(_cleanup_bloom_mart_cache)
        root = tempfile.mkdtemp(prefix="bloom_scan_mart_") + "/orders"
        orders = read_table(spark, sf_dir, "orders").select(
            "o_orderkey",
            F.md5(F.col("o_orderkey").cast("string")).alias("key"),
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("total_cents"),
        )
        MT.merge_upsert_atomic(
            spark,
            root,
            orders.repartition(8),
            keys=["o_orderkey"],
            bloom_cols=["key"],
        )
        _BLOOM_MART_CACHE[sf_dir] = root

    import hashlib

    min_key = read_table(spark, sf_dir, "orders").agg(
        F.min("o_orderkey")
    ).collect()[0][0]
    probe = hashlib.md5(str(min_key).encode()).hexdigest()
    full = MT.read_table(spark, root)
    pruned = MT.read_table(spark, root, stats_filter={"key": (probe, probe)})
    n_full = len(full.inputFiles())
    n_pruned = len(pruned.inputFiles())
    absent = MT.read_table(
        spark, root, stats_filter={"key": ("not-a-real-key", "not-a-real-key")}
    )
    n_absent = len(absent.inputFiles())
    return pruned.filter(F.col("key") == probe).select(
        "o_orderkey",
        "key",
        "total_cents",
        F.lit(n_pruned < n_full).alias("bloom_pruned_strictly"),
        F.lit(n_absent == 0).alias("absent_key_reads_zero_files"),
    )


@register(
    "nation_presence_full_join",
    oracle="""
WITH a AS (
    SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_rich_customers
    FROM customer WHERE c_acctbal > 9900 GROUP BY 1
),
b AS (
    SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_rich_suppliers
    FROM supplier WHERE s_acctbal > 8000 GROUP BY 1
)
SELECT COALESCE(a.nationkey, b.nationkey) AS nationkey,
       COALESCE(a.n_rich_customers, 0) AS n_rich_customers,
       COALESCE(b.n_rich_suppliers, 0) AS n_rich_suppliers,
       CASE WHEN a.nationkey IS NULL THEN 'supplier_only'
            WHEN b.nationkey IS NULL THEN 'customer_only'
            ELSE 'both' END AS presence
FROM a FULL OUTER JOIN b ON a.nationkey = b.nationkey
""",
    doc="FULL OUTER join (completes the outer-join family beyond "
    "left/semi/anti): high-balance customer nations vs high-balance "
    "supplier nations — the acctbal thresholds are tuned so BOTH "
    "null sides genuinely occur at sf0.01 (customer-only AND "
    "supplier-only nations), so the query proves real full-outer "
    "semantics, not a vacuous left join. Two partial-aggregated "
    "tiny-key inputs; the full-outer runs on nation-sized relations, "
    "never on the fact tables.",
)
def q_nation_presence_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, sf_dir, "customer")
    supp = read_table(spark, sf_dir, "supplier")
    a = (
        cust.filter(F.col("c_acctbal") > 9900)
        .groupBy(F.col("c_nationkey").alias("a_nationkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rich_customers"))
    )
    b = (
        supp.filter(F.col("s_acctbal") > 8000)
        .groupBy(F.col("s_nationkey").alias("b_nationkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rich_suppliers"))
    )
    j = a.join(b, a.a_nationkey == b.b_nationkey, "full_outer")
    return j.select(
        F.coalesce("a_nationkey", "b_nationkey").alias("nationkey"),
        F.coalesce("n_rich_customers", F.lit(0)).cast("bigint").alias(
            "n_rich_customers"
        ),
        F.coalesce("n_rich_suppliers", F.lit(0)).cast("bigint").alias(
            "n_rich_suppliers"
        ),
        F.when(F.col("a_nationkey").isNull(), F.lit("supplier_only"))
        .when(F.col("b_nationkey").isNull(), F.lit("customer_only"))
        .otherwise(F.lit("both"))
        .alias("presence"),
    )


@register(
    "order_value_ntiles",
    oracle="""
WITH t AS (
    SELECT o_orderstatus,
           CAST(FLOOR(o_totalprice * 100 + 5e-1) AS BIGINT) AS cents,
           NTILE(4) OVER (PARTITION BY o_orderstatus
                          ORDER BY o_totalprice, o_orderkey) AS tile
    FROM orders
)
SELECT o_orderstatus, CAST(tile AS INT) AS tile,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(MIN(cents) AS BIGINT) AS min_cents,
       CAST(MAX(cents) AS BIGINT) AS max_cents
FROM t GROUP BY 1, 2
""",
    doc="NTILE quantile bucketing (completes the window family: "
    "ranking/lag/running/range/session + ntile): per-status order-"
    "value quartiles with integer-cents aggregates per bucket. The "
    "tie-break (o_totalprice, o_orderkey) makes NTILE's row "
    "assignment deterministic, so bucket boundaries are bit-exact "
    "cross-engine; one window shuffle on the status key.",
)
def q_order_value_ntiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    t = orders.select(
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        F.ntile(4).over(w).alias("tile"),
    )
    return t.groupBy("o_orderstatus", "tile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.min("cents").cast("bigint").alias("min_cents"),
        F.max("cents").cast("bigint").alias("max_cents"),
    )


@register(
    "grouping_sets_counts",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
       COUNT(*) AS n,
       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 5e-1) AS BIGINT))
            AS BIGINT) AS price_cents
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
""",
    doc="Explicit GROUPING SETS (completes the grouping-analytics "
    "family next to CUBE and ROLLUP): two single-column slices plus "
    "the grand total in ONE pass — Spark's Expand operator emits "
    "each input row once per set, so map-side partial aggregation "
    "still applies and the corpus is scanned once, not three times. "
    "GROUPING() markers disambiguate 'NULL because aggregated away' "
    "from a genuinely NULL key on both engines; money stays in "
    "integer cents for bit-exact totals.",
)
def q_grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("__gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               COUNT(*) AS n,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5D) AS BIGINT))
                    AS BIGINT) AS price_cents
        FROM __gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@register(
    "shipping_priority_q3ish",
    oracle=f"""
SELECT l.l_orderkey AS orderkey,
       {sum_usd_cents_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-07-01'
  AND l.l_shipdate > TIMESTAMP '1998-07-01'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, orderdate, orderkey
LIMIT 10
""",
    doc="TPC-H Q3-shaped shipping-priority query: segment-filtered "
    "customer dim broadcast into the orders->lineitem fact-fact "
    "join, unshipped-revenue aggregate, global top-10 "
    "(TakeOrderedAndProject — no full sort). Both date predicates "
    "push to the parquet scans; the money sum uses the shared "
    "integer-cents contract for bit parity.",
)
def q_shipping_priority_q3ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-07-01"))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-07-01"))
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(
            sum_usd_cents(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("orderkey", "revenue", "orderdate", "orderpriority")
        .orderBy(F.desc("revenue"), "orderdate", "orderkey")
        .limit(10)
    )


@register(
    "returned_top_customers_q10ish",
    oracle=f"""
SELECT c.c_custkey AS custkey,
       c.c_name AS name,
       {sum_usd_cents_sql("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       CAST(FLOOR(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS acctbal_cents,
       n.n_name AS nation
FROM customer c
JOIN orders o ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, custkey
LIMIT 20
""",
    doc="TPC-H Q10-shaped returned-item ranking: one-quarter order "
    "slice joined to returned line items, customer + nation dims "
    "broadcast, revenue per customer, top-20. The acctbal passes "
    "through as integer cents (GROUP BY on a double money column "
    "is bit-safe only in fixed point). Quarter + returnflag "
    "predicates push down; single fact-fact shuffle on orderkey.",
)
def q_returned_top_customers_q10ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("acctbal_cents"),
            F.col("n_name").alias("nation"),
        )
        .agg(
            sum_usd_cents(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            ).alias("revenue")
        )
        .select("custkey", "name", "revenue", "acctbal_cents", "nation")
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


_PR_UNROLLED = """
WITH pairs AS (
    SELECT DISTINCT o.o_custkey * 2 AS c_node, l.l_suppkey * 2 + 1 AS s_node
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
edges AS (
    SELECT c_node AS src, s_node AS dst FROM pairs
    UNION ALL
    SELECT s_node AS src, c_node AS dst FROM pairs
),
nodes AS (
    SELECT DISTINCT src AS node FROM edges
    UNION SELECT DISTINCT dst AS node FROM edges
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src),
sc AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           1000000000000000 // COUNT(*) AS r0,
           (15 * 1000000000000000) // (100 * COUNT(*)) AS base
    FROM nodes
),
{iters}
SELECT node, rank_fp FROM r{k}
"""


def _pr_iter_cte(i: int) -> str:
    prev = (
        "(SELECT node, CAST(r0 AS BIGINT) AS rank_fp FROM nodes, sc)"
        if i == 1
        else f"r{i - 1}"
    )
    return f"""r{i} AS (
    SELECT n.node,
           CAST(s.base + (85 * COALESCE(SUM(p.rank_fp // d.outdeg), 0)) // 100
                AS BIGINT) AS rank_fp
    FROM nodes n
    CROSS JOIN sc s
    LEFT JOIN edges e ON e.dst = n.node
    LEFT JOIN {prev} p ON p.node = e.src
    LEFT JOIN deg d ON d.src = e.src
    GROUP BY n.node, s.base
)"""


@register(
    "pagerank_customer_supplier",
    oracle=_PR_UNROLLED.format(
        iters=",\n".join(_pr_iter_cte(i) for i in range(1, 6)), k=5
    ),
    doc="PageRank power iteration (Page et al. 1999; the Common-Crawl "
    "host-rank shape corpus pipelines weight sources by) over the "
    "customer<->supplier bipartite graph implied by orders x "
    "lineitem, 5 rounds, damping 0.85, ALL-INTEGER fixed point "
    "(contributions floor-divided before the order-invariant BIGINT "
    "sum) so the oracle's 5 unrolled CTE rounds replay bit-for-bit. "
    "Per round: one edges-x-ranks shuffle join + one dst groupBy — "
    "the Pregel message pattern in DataFrame ops, lineage cut per "
    "round with eager localCheckpoints (operators/graph.py).",
)
def q_pagerank_customer_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark.operators.graph import (
        pagerank_fixed_point,
    )

    li = read_table(spark, sf_dir, "lineitem")
    # r15 (guide §3.1 "pick the join strategy deliberately"): at sf1
    # the planner's size estimate auto-broadcast the projected orders
    # side (1.5M rows / ~24 MB) and the per-run driver-side hash-
    # relation build dominated the edge derivation — join+distinct
    # measured 8.1 s broadcast vs 3.2 s shuffled-hash. Both sides of
    # an orders x lineitem edge join are fact tables, so shuffled-hash
    # is also the 100 TB-correct preference; the hint expresses
    # exactly that without forbidding broadcast for genuinely tiny
    # inputs elsewhere.
    o = read_table(spark, sf_dir, "orders").hint("shuffle_hash")
    pairs = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionByName(
        pairs.select(
            F.col("s_node").alias("src"), F.col("c_node").alias("dst")
        )
    )
    # |V| = |customers| + |suppliers| — dim-bounded, so the rank
    # vector broadcasts and the 2x|lineitem|-bounded edge table never
    # reshuffles inside the power iteration.
    return pagerank_fixed_point(edges, iterations=5, broadcast_ranks=True)


@register(
    "hilbert_key_check",
    oracle=(
        lambda: f"""
SELECT o_orderkey,
       {__import__('stripe_data_pipeline_spark.operators.layout', fromlist=['hilbert_key_sql']).hilbert_key_sql(
           "(o_custkey % 256)",
           "(date_diff('day', DATE '1992-01-01', o_orderdate) % 256)")} AS h_key
FROM orders
"""
    )(),
    doc="HILBERT-curve clustering key over (customer, order-day) — "
    "the better-locality sibling of zorder_key_check (a Hilbert walk "
    "has no Morton diagonal jumps, so per-file min/max boxes sort "
    "out tighter; the direction Delta OPTIMIZE and BigQuery "
    "clustering both took). The 4-state machine derived from the "
    "classic xy2d loop runs as a pure JVM expression fold (two "
    "16-entry array-literal lookups per level, 8 levels, no UDF); "
    "DuckDB replays the identical fold as nested list lookups, "
    "bit-exact (operators/layout.py::hilbert_key; table derivation "
    "exhaustively verified in tests).",
)
def q_hilbert_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators.layout import hilbert_key

    orders = read_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
    return orders.select(
        "o_orderkey",
        hilbert_key(F.col("o_custkey") % 256, day % 256).alias("h_key"),
    )


# ---------------------------------------------------------------------------
# Histogram quantile sketch (r9): deterministic mergeable percentiles
# ---------------------------------------------------------------------------

_HIST_WIDTH = 1_000_000  # $10k buckets over o_totalprice cents
_HIST_QS = (2500, 5000, 7500, 9000, 9900)

_HIST_ORACLE = f"""
WITH cents AS (
    SELECT CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
    FROM orders
),
h AS (
    SELECT c // {_HIST_WIDTH} AS bucket, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM cents GROUP BY 1
),
cum AS (
    SELECT bucket, SUM(cnt) OVER (ORDER BY bucket) AS cum FROM h
),
n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM h),
qs AS (SELECT UNNEST([2500, 5000, 7500, 9000, 9900]) AS q_bp),
t AS (
    SELECT CAST(q_bp AS BIGINT) AS q_bp,
           CAST((n.n * q_bp + 9999) // 10000 AS BIGINT) AS target_rank
    FROM qs, n
)
SELECT t.q_bp, t.target_rank,
       CAST(MIN(cum.bucket) AS BIGINT) AS bucket,
       CAST(MIN(cum.bucket) * {_HIST_WIDTH} AS BIGINT) AS lo,
       CAST(MIN(cum.bucket) * {_HIST_WIDTH} + {_HIST_WIDTH} - 1
            AS BIGINT) AS hi
FROM t JOIN cum ON cum.cum >= t.target_rank
GROUP BY t.q_bp, t.target_rank
"""


@register(
    "hist_quantile_prices",
    oracle=_HIST_ORACLE,
    doc="Fixed-grid histogram quantile sketch — the DETERMINISTIC, "
    "mergeable alternative to approx_percentile (whose engine-"
    "private compaction can never bit-match across engines): "
    "order totals bucketed into $10k cells (one partial-combined "
    "groupBy; the grid is domain/width cells regardless of row "
    "count), quantile = first bucket whose running count reaches "
    "ceil(q*N), reported as integer [lo, hi] cent bounds — error "
    "bounded by bucket width BY CONSTRUCTION. The cumulative window "
    "runs over the bounded cell grid, never the input "
    "(operators/sketch.py::hist_quantile_bounds).",
)
def q_hist_quantile_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.operators import sketch as SK

    cents = read_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("c")
    )
    h = SK.hist_build(cents, "c", _HIST_WIDTH)
    return SK.hist_quantile_bounds(h, list(_HIST_QS), _HIST_WIDTH)


@register(
    "hist_quantile_merge_check",
    oracle=_HIST_ORACLE,
    doc="Histogram-sketch MERGEABILITY: orders split into two md5 "
    "hash-range shards, a grid built per shard, shards merged by "
    "cell-wise addition — and the merged quantiles must equal the "
    "single-pass build bit-for-bit (the oracle computes the "
    "unsharded sketch). Counters are counters: the same exact-merge "
    "contract as cms_merge_check/hll_mergeable_user_counts, for "
    "quantiles — the property that lets 100 TB of shards/days "
    "maintain percentile dashboards without re-reading history.",
)
def q_hist_quantile_merge_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark.operators import sketch as SK
    from stripe_data_pipeline_spark.operators.sampling import hash_bucket

    cents = read_table(spark, sf_dir, "orders").select(
        hash_bucket(F.col("o_orderkey").cast("string"), 100).alias("b"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("c"),
    )
    lo = SK.hist_build(cents.filter(F.col("b") < 50), "c", _HIST_WIDTH)
    hi = SK.hist_build(cents.filter(F.col("b") >= 50), "c", _HIST_WIDTH)
    merged = SK.hist_merge(lo, hi)
    return SK.hist_quantile_bounds(merged, list(_HIST_QS), _HIST_WIDTH)


# ---------------------------------------------------------------------------
# TPC-H-shaped relational breadth (r9): Q14 / Q16 / Q18 analogues
# ---------------------------------------------------------------------------


@register(
    "promo_revenue_share_q14ish",
    oracle="""
SELECT CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                * 100.0 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS promo_cents,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                           * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS total_cents,
       CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                THEN CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                                * 100.0 + 0.5) AS BIGINT)
                ELSE 0 END) * 10000
            // SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                              * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS promo_share_bp
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1997-02-01'
""",
    doc="TPC-H Q14-shaped promo revenue share: one ship-month slice "
    "of lineitem (predicate pushed to the scan) joined to the part "
    "dim (broadcast), conditional fixed-point revenue sums, share "
    "in integer basis points (cents floored BEFORE the sums, so the "
    "division is exact integer arithmetic). Single scan, no "
    "fact-fact shuffle.",
)
def q_promo_revenue_share_q14ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-02-01")))
    )
    p = read_table(spark, sf_dir, "part")
    rev = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        * F.lit(100.0)
        + F.lit(0.5)
    ).cast("bigint")
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .agg(
            F.sum(promo).cast("bigint").alias("promo_cents"),
            F.sum(rev).cast("bigint").alias("total_cents"),
        )
        .select(
            "promo_cents",
            "total_cents",
            F.expr("promo_cents * 10000 div total_cents")
            .cast("bigint")
            .alias("promo_share_bp"),
        )
    )


@register(
    "parts_supplier_counts_q16ish",
    oracle="""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#4'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
LIMIT 20
""",
    doc="TPC-H Q16-shaped supplier-count profile: parts outside one "
    "brand/type with an IN-list size filter (all pushed to the part "
    "scan), distinct supplier counts per (brand, type, size) from "
    "the lineitem side. Part dim broadcast into the fact scan; the "
    "only shuffle is the distinct-count agg on the grouped keys; "
    "bounded top-20.",
)
def q_parts_supplier_counts_q16ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    p = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", F.col("p_size").cast("bigint").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@register(
    "large_volume_orders_q18ish",
    oracle="""
WITH big AS (
    SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS total_qty
    FROM lineitem GROUP BY l_orderkey
    HAVING SUM(l_quantity) > 250
)
SELECT c.c_name, CAST(c.c_custkey AS BIGINT) AS custkey,
       CAST(o.o_orderkey AS BIGINT) AS orderkey,
       o.o_orderdate AS orderdate,
       CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
           AS totalprice_cents,
       b.total_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice_cents DESC, orderdate, orderkey
LIMIT 50
""",
    doc="TPC-H Q18-shaped large-volume-order ranking: the classic "
    "HAVING-on-aggregate semi-reduction — lineitem pre-aggregates "
    "to per-order quantity (partial-combined, the fact table's only "
    "shuffle), the >250 filter shrinks it to a sliver, and only "
    "that sliver joins orders (key join) + the customer dim "
    "(broadcast). Money as integer cents; bounded top-50.",
)
def q_large_volume_orders_q18ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").cast("bigint").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        big.join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_name",
            F.col("c_custkey").cast("bigint").alias("custkey"),
            F.col("o_orderkey").cast("bigint").alias("orderkey"),
            F.col("o_orderdate").alias("orderdate"),
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
            .cast("bigint")
            .alias("totalprice_cents"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice_cents"), "orderdate", "orderkey")
        .limit(50)
    )


@register(
    "nation_volume_shipping_q7ish",
    oracle="""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                           * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation sn ON sn.n_nationkey = s.s_nationkey
JOIN nation cn ON cn.n_nationkey = c.c_nationkey
WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
       OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY sn.n_name, cn.n_name, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7-shaped bilateral volume shipping: revenue flowing "
    "between two nations in either direction, per shipping year. "
    "Supplier/customer/nation dims all broadcast; the nation-pair "
    "disjunction applies AFTER the dim joins resolve names, the "
    "ship-date range pushes to the lineitem scan; the only "
    "fact-fact shuffle is lineitem x orders on orderkey. Money "
    "floored to cents per row before the order-invariant sums.",
)
def q_nation_volume_shipping_q7ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    o = read_table(spark, sf_dir, "orders")
    s = read_table(spark, sf_dir, "supplier")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_3")
        & (F.col("cust_nation") == "NATION_7")
    ) | (
        (F.col("supp_nation") == "NATION_7")
        & (F.col("cust_nation") == "NATION_3")
    )
    rev = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        * F.lit(100.0)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(F.sum(rev).cast("bigint").alias("revenue_cents"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "disjunctive_parts_revenue_q19ish",
    oracle="""
SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                           * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19-shaped disjunctive predicate join: three OR-groups "
    "mixing part attributes (brand, size) with lineitem attributes "
    "(quantity). Catalyst derives and PUSHES the per-side residuals "
    "of the disjunction — the part scan keeps only the three brands "
    "(brand IN (...) is implied by the OR), the lineitem scan keeps "
    "quantity <= 30 — before the broadcast join evaluates the full "
    "cross-column condition; the classic constraint-propagation "
    "showcase. Fixed-point money, scalar result.",
)
def q_disjunctive_parts_revenue_q19ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#34")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    rev = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        * F.lit(100.0)
        + F.lit(0.5)
    ).cast("bigint")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(cond)
        .agg(
            F.sum(rev).cast("bigint").alias("revenue_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


@register(
    "idle_rich_customers_q22ish",
    oracle="""
WITH avg_bal AS (
    SELECT CAST(FLOOR(AVG(CAST(FLOOR(c_acctbal * 100.0 + 0.5) AS BIGINT))
                + 0.5) AS BIGINT) AS avg_cents
    FROM customer WHERE c_acctbal > 0.0
)
SELECT SUBSTR(c.c_name, 1, 9) AS name_prefix,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(FLOOR(c.c_acctbal * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents
FROM customer c, avg_bal
WHERE CAST(FLOOR(c.c_acctbal * 100.0 + 0.5) AS BIGINT) > avg_bal.avg_cents
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1
ORDER BY name_prefix
""",
    doc="TPC-H Q22-shaped dormant-account analysis: customers with "
    "above-average balances and NO orders since 2000 — a scalar "
    "subquery (1-row average broadcast into the scan filter) "
    "composed with a left ANTI join against the date-filtered "
    "orders (the NOT EXISTS decorrelation Catalyst performs; the "
    "date predicate pushes into the anti side's scan), grouped by a "
    "name prefix. Money as integer cents, including the average "
    "itself (AVG over already-floored cents, rounded once — "
    "bit-stable cross-engine).",
)
def q_idle_rich_customers_q22ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.to_timestamp(F.lit("2000-01-01"))
    )
    cents = F.floor(F.col("c_acctbal") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > F.lit(0.0))
        .agg(
            F.floor(F.avg(cents) + F.lit(0.5))
            .cast("bigint")
            .alias("avg_cents")
        )
    )
    return (
        c.withColumn("cents", cents)
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("cents") > F.col("avg_cents"))
        .join(o, c["c_custkey"] == o["o_custkey"], "left_anti")
        .groupBy(F.substring("c_name", 1, 9).alias("name_prefix"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_custs"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .orderBy("name_prefix")
    )


@register(
    "priority_order_counts_q4ish",
    oracle="""
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
""",
    doc="TPC-H Q4-shaped priority check: one-quarter order slice "
    "counted per priority, restricted to orders with at least one "
    "returned line item — the EXISTS correlated subquery Catalyst "
    "decorrelates into a LEFT SEMI join (each order counted once no "
    "matter how many lines match). The quarter predicate pushes to "
    "the orders scan, the returnflag predicate to the lineitem "
    "scan; one semi shuffle on orderkey.",
)
def q_priority_order_counts_q4ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .orderBy("o_orderpriority")
    )


@register(
    "top_supplier_revenue_q15ish",
    oracle="""
WITH rev AS (
    SELECT l_suppkey,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount)
                               * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS total_cents
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    GROUP BY l_suppkey
),
mx AS (SELECT MAX(total_cents) AS m FROM rev)
SELECT s.s_suppkey, s.s_name, r.total_cents
FROM rev r
JOIN supplier s ON s.s_suppkey = r.l_suppkey
JOIN mx ON r.total_cents = mx.m
ORDER BY s.s_suppkey
""",
    doc="TPC-H Q15-shaped top supplier: per-supplier revenue over one "
    "ship-quarter (the revenue 'view'), then the supplier(s) hitting "
    "the MAXIMUM — a scalar subquery over the aggregate broadcast "
    "back as an equality filter (the standard argmax-via-scalar "
    "shape; ties all returned, deterministically ordered). Quarter "
    "predicate pushed to the lineitem scan; supplier dim broadcast; "
    "the revenue view is one partial-combined groupBy.",
)
def q_top_supplier_revenue_q15ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    s = read_table(spark, sf_dir, "supplier")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.floor(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
                * F.lit(100.0)
                + F.lit(0.5)
            ).cast("bigint")
        )
        .cast("bigint")
        .alias("total_cents")
    )
    mx = rev.agg(F.max("total_cents").alias("m"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("m"))
        .join(F.broadcast(s), rev["l_suppkey"] == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_cents")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped decorrelation breadth (r9b): Q17 / Q13 / Q2 / Q21 / Q11 / Q8
# ---------------------------------------------------------------------------


@register(
    "small_quantity_revenue_q17ish",
    oracle="""
WITH pb AS (
    SELECT p_partkey FROM part WHERE p_brand = 'Brand#3'
),
pa AS (
    SELECT l.l_partkey,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM lineitem l JOIN pb ON pb.p_partkey = l.l_partkey
    GROUP BY l.l_partkey
)
SELECT CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) // 7
            AS BIGINT) AS avg_weekly_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE 5 * CAST(l.l_quantity AS BIGINT) * pa.cnt < pa.sum_qty
""",
    doc="TPC-H Q17-shaped small-quantity revenue: for one brand's "
    "parts, sum the revenue of line items whose quantity is below "
    "20%% of that part's average quantity — the correlated scalar "
    "AVG subquery Catalyst decorrelates into a per-part aggregate "
    "joined back to the fact. The avg comparison is cross-multiplied "
    "into exact integers (5*qty*cnt < sum_qty <=> qty < 0.2*avg; "
    "quantities are integral by data contract), so no float division "
    "enters the predicate. Brand filter pushed to the part scan; the "
    "per-part agg table is brand-sized and broadcast back.",
)
def q_small_quantity_revenue_q17ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pb = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    li = read_table(spark, sf_dir, "lineitem")
    li_b = li.join(F.broadcast(pb), li["l_partkey"] == pb["p_partkey"]).drop(
        "p_partkey"
    )
    pa = li_b.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("sum_qty"),
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
    )
    cents = F.floor(F.col("l_extendedprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )
    return (
        li_b.alias("l")
        .join(F.broadcast(pa).alias("pa"), F.col("l.l_partkey") == F.col("pa.l_partkey"))
        .filter(
            F.lit(5) * F.col("l.l_quantity").cast("bigint") * F.col("pa.cnt")
            < F.col("pa.sum_qty")
        )
        .agg(
            F.sum(cents).cast("bigint").alias("total_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .select(
            "total_cents",
            F.expr("total_cents div 7").cast("bigint").alias("avg_weekly_cents"),
            "n_lines",
        )
    )


@register(
    "customer_order_distribution_q13ish",
    oracle="""
WITH oc AS (
    SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n
    FROM orders WHERE o_orderpriority <> '1-URGENT'
    GROUP BY o_custkey
),
co AS (
    SELECT c.c_custkey, COALESCE(oc.n, 0) AS c_count
    FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
)
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM co GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13-shaped customer order-count distribution: orders "
    "outside one priority class pre-aggregated per customer (NOT "
    "join-then-count — the pre-agg shuffles |custkey| rows instead "
    "of |orders|), left-joined so order-less customers land in the "
    "c_count=0 bucket, then the distribution histogram. Two "
    "partial-combined aggs + one key join; output cardinality is "
    "max orders-per-customer, independent of fact volume.",
)
def q_customer_order_distribution_q13ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    oc = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.join(oc, c["c_custkey"] == oc["o_custkey"], "left")
        .select(F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "cheapest_part_per_type_q2ish",
    oracle="""
WITH m AS (
    SELECT p_type,
           MIN(CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT))
               AS min_cents
    FROM part WHERE p_size <= 10 GROUP BY p_type
)
SELECT p.p_type, CAST(p.p_partkey AS BIGINT) AS partkey, p.p_name,
       m.min_cents
FROM part p
JOIN m ON m.p_type = p.p_type
      AND CAST(FLOOR(p.p_retailprice * 100.0 + 0.5) AS BIGINT) = m.min_cents
WHERE p.p_size <= 10
ORDER BY p.p_type, partkey
""",
    doc="TPC-H Q2-shaped grouped argmin: within a size slice, the "
    "cheapest part(s) per type — Q2's correlated MIN(ps_supplycost) "
    "subquery decorrelated into a grouped-min aggregate broadcast "
    "back as an equality filter (ties all returned, deterministic "
    "order). The size predicate pushes to both scans; the min table "
    "is |types| rows, broadcast — no self-join shuffle.",
)
def q_cheapest_part_per_type_q2ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    p = read_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    cents = F.floor(F.col("p_retailprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )
    m = p.groupBy(F.col("p_type").alias("m_type")).agg(
        F.min(cents).alias("min_cents")
    )
    return (
        p.withColumn("cents", cents)
        .join(
            F.broadcast(m),
            (F.col("p_type") == F.col("m_type"))
            & (F.col("cents") == F.col("min_cents")),
        )
        .select(
            "p_type",
            F.col("p_partkey").cast("bigint").alias("partkey"),
            "p_name",
            "min_cents",
        )
        .orderBy("p_type", "partkey")
    )


@register(
    "sole_returning_supplier_q21ish",
    oracle="""
SELECT s.s_name, CAST(COUNT(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey AND l1.l_returnflag = 'R'
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 10
""",
    doc="TPC-H Q21-shaped sole-blame analysis: suppliers who were the "
    "ONLY supplier with a returned line on a multi-supplier order. "
    "The oracle states it as the textbook EXISTS + NOT EXISTS "
    "correlated pair; the Spark plan decorrelates BOTH into one "
    "per-order aggregate (countDistinct suppliers, countDistinct "
    "returning suppliers) — n_supp > 1 AND n_ret_supp = 1 is "
    "equivalent and costs ONE shuffle on orderkey instead of two "
    "self-join decorrelations over the fact. Supplier dim broadcast "
    "at the end; bounded top-10 with a name tiebreak.",
)
def q_sole_returning_supplier_q21ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
    )
    ret_pairs = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    s = read_table(spark, sf_dir, "supplier")
    return (
        ret_pairs.join(
            per_order.filter(
                (F.col("n_supp") > 1) & (F.col("n_ret_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
        .join(F.broadcast(s), ret_pairs["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@register(
    "important_nation_balances_q11ish",
    oracle="""
WITH nb AS (
    SELECT n.n_name,
           CAST(SUM(CAST(FLOOR(s.s_acctbal * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS cents
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
    GROUP BY n.n_name
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM nb)
SELECT nb.n_name, nb.cents
FROM nb, tot
WHERE nb.cents * 20 > tot.t
ORDER BY nb.cents DESC, nb.n_name
""",
    doc="TPC-H Q11-shaped important-balance nations: per-nation "
    "supplier balance totals kept only where the nation holds more "
    "than 1/20 of the GLOBAL total — HAVING against an aggregate-of-"
    "aggregates, decorrelated as a 1-row scalar cross join broadcast "
    "into the filter. The share test is cross-multiplied (cents*20 > "
    "total) so it stays exact integer arithmetic; negative balances "
    "flow through both sums identically.",
)
def q_important_nation_balances_q11ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    cents = F.floor(F.col("s_acctbal") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )
    nb = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_name")
        .agg(F.sum(cents).cast("bigint").alias("cents"))
    )
    tot = nb.agg(F.sum("cents").cast("bigint").alias("t"))
    return (
        nb.crossJoin(F.broadcast(tot))
        .filter(F.col("cents") * F.lit(20) > F.col("t"))
        .select("n_name", "cents")
        .orderBy(F.desc("cents"), "n_name")
    )


@register(
    "nation_market_share_q8ish",
    oracle="""
WITH rev AS (
    SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
           n2.n_name AS supp_nation,
           CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100.0
                      + 0.5) AS BIGINT) AS cents
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN cents ELSE 0 END)
            AS BIGINT) AS nation_cents,
       CAST(SUM(cents) AS BIGINT) AS total_cents,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN cents ELSE 0 END)
            * 10000 // SUM(cents) AS BIGINT) AS share_bp
FROM rev GROUP BY o_year ORDER BY o_year
""",
    doc="TPC-H Q8-shaped market share: within one customer region, "
    "the share of yearly revenue supplied by one nation — the "
    "seven-table join chain where every dimension (customer-side "
    "nation/region, supplier-side nation, supplier) broadcasts and "
    "the single fact-fact edge (lineitem->orders) is the only "
    "shuffle; share emitted in exact integer basis points with the "
    "cents floored before both conditional sums.",
)
def q_nation_market_share_q8ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    s = read_table(spark, sf_dir, "supplier")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    cents = F.floor(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
        * F.lit(100.0)
        + F.lit(0.5)
    ).cast("bigint")
    cust_asia = (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey")
    )
    nat = F.when(F.col("supp_nation") == "NATION_7", F.col("cents")).otherwise(
        F.lit(0)
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(cust_asia), o["o_custkey"] == cust_asia["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            cents.alias("cents"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.sum(nat).cast("bigint").alias("nation_cents"),
            F.sum("cents").cast("bigint").alias("total_cents"),
        )
        .select(
            "o_year",
            "nation_cents",
            "total_cents",
            F.expr("nation_cents * 10000 div total_cents")
            .cast("bigint")
            .alias("share_bp"),
        )
        .orderBy("o_year")
    )


@register(
    "discount_revenue_q6ish",
    oracle="""
SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100.0 + 0.5)
                     AS BIGINT)) AS BIGINT) AS forecast_cents,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6-shaped forecast-revenue change: the pure predicate-"
    "pushdown aggregate — every filter (ship-year range, discount "
    "band, quantity cap) lands in PushedFilters on the single "
    "lineitem scan, no join, no shuffle beyond the 1-row partial-"
    "combined sum. The canonical 'is the scan doing the work' probe; "
    "per-row cents floored before the sum.",
)
def q_discount_revenue_q6ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    cents = F.floor(
        F.col("l_extendedprice") * F.col("l_discount") * F.lit(100.0)
        + F.lit(0.5)
    ).cast("bigint")
    return li.agg(
        F.sum(cents).cast("bigint").alias("forecast_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )


@register(
    "nation_profit_q9ish",
    oracle="""
SELECT n.n_name AS nation,
       CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount)
                           * 100.0 + 0.5) AS BIGINT)
                - CAST(FLOOR(p.p_retailprice * 100.0 + 0.5) AS BIGINT)
                  * CAST(l.l_quantity AS BIGINT) // 10)
            AS BIGINT) AS profit_cents
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%gear%'
GROUP BY n.n_name, EXTRACT(YEAR FROM o.o_orderdate)
ORDER BY nation, o_year DESC
""",
    doc="TPC-H Q9-shaped product-line profit: parts selected by an "
    "infix LIKE (no pushdown-able prefix — the residual filter still "
    "prunes before any join), profit = revenue minus a retail-"
    "price-derived unit cost (1/10th retail stands in for "
    "ps_supplycost; the schema has no partsupp), grouped by supplier "
    "nation x order year. Part/supplier/nation broadcast; the only "
    "shuffle is lineitem->orders; all money exact integer cents "
    "(cost floored per unit BEFORE the multiply, integer-divided "
    "once).",
)
def q_nation_profit_q9ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%gear%")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    amount = (
        F.floor(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
            * F.lit(100.0)
            + F.lit(0.5)
        ).cast("bigint")
        - F.expr(
            "CAST(FLOOR(p_retailprice * 100.0 + 0.5) AS BIGINT)"
            " * CAST(l_quantity AS BIGINT) div 10"
        )
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg(F.sum(amount).cast("bigint").alias("profit_cents"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "linestatus_priority_q12ish",
    oracle="""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l.l_linestatus
ORDER BY l.l_linestatus
""",
    doc="TPC-H Q12-shaped shipping-priority profile: one ship-year of "
    "line items joined to their orders (the fact-fact shuffle; the "
    "year predicate pushes to the lineitem scan and prunes BEFORE "
    "the join), urgent-vs-other conditional counts per line status "
    "(l_linestatus stands in for l_shipmode). The classic "
    "conditional-aggregation-after-join shape; output cardinality 2.",
)
def q_linestatus_priority_q12ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    o = read_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "promo_part_suppliers_q20ish",
    oracle="""
WITH promo_ship AS (
    SELECT l.l_suppkey, l.l_partkey,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_type = 'PROMO'
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_suppkey, l.l_partkey
)
SELECT s.s_name, n.n_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE EXISTS (SELECT 1 FROM promo_ship ps
              WHERE ps.l_suppkey = s.s_suppkey AND ps.qty > 60)
ORDER BY s.s_name
""",
    doc="TPC-H Q20-shaped excess-inventory suppliers: suppliers who "
    "shipped more than 60 units of some PROMO part in one ship-year "
    "— Q20's nested IN-subquery chain decorrelated into a grouped "
    "per-(supplier, part) aggregate followed by a LEFT SEMI join "
    "(each supplier surfaces once no matter how many qualifying "
    "parts). Type + year predicates push to their scans; part dim "
    "broadcast into the fact agg; the semi probe side is "
    "|suppliers|-sized. Threshold 60 (not TPC-H's 0.5*avg) keeps "
    "the check non-vacuous at every test SF — this synthetic data "
    "tops out near qty 91 per (supplier, part, year).",
)
def q_promo_part_suppliers_q20ish(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    promo_ship = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("bigint")).alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    return (
        s.join(promo_ship, s["s_suppkey"] == promo_ship["l_suppkey"], "left_semi")
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "triangle_counts_supplier",
    oracle="""
WITH os AS (
    SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
),
edges AS MATERIALIZED (
    SELECT a.s AS src, b.s AS dst
    FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
    GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
tri AS (
    SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
    FROM edges e1
    JOIN edges e2 ON e2.src = e1.dst
    JOIN edges e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
pn AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles
    FROM (SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
    GROUP BY node
),
deg AS (
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT src AS node FROM edges
          UNION ALL SELECT dst AS node FROM edges)
    GROUP BY node
)
SELECT deg.node AS suppkey, deg.degree,
       CAST(COALESCE(pn.triangles, 0) AS BIGINT) AS triangles,
       CAST(CASE WHEN deg.degree >= 2
                 THEN 2 * COALESCE(pn.triangles, 0) * 10000
                      // (deg.degree * (deg.degree - 1))
                 ELSE 0 END AS BIGINT) AS clustering_bp
FROM deg LEFT JOIN pn ON pn.node = deg.node
""",
    doc="Triangle counting + local clustering coefficients (Watts & "
    "Strogatz; the ordered wedge-close join of Suri & Vassilvitskii's "
    "MapReduce scheme) over the SUPPORT-THRESHOLDED co-order supplier "
    "graph: suppliers sharing >= 5 orders are connected — the "
    "market-basket sparsification, because raw co-occurrence "
    "saturates to a complete graph as order volume grows (at sf0.1 "
    "the unthresholded graph is 91%-dense K1000 with ~1.6e8 "
    "triangles — all noise). Edges canonicalized low->high so each "
    "triangle {x<y<z} is enumerated exactly once by two equi-joins — "
    "no double counting, no post-dedup. The corpus-scale work is ONE "
    "distinct + one groupBy over (order, supplier) pairs; the edge "
    "list is dim-bounded so the triangle joins never touch fact-"
    "table volume. Coefficients are exact integer basis points "
    "(operators/graph.py::triangle_counts).",
)
def q_triangle_counts_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark.operators.graph import triangle_counts

    li = read_table(spark, sf_dir, "lineitem")
    os_ = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s")
    ).distinct()
    a, b = os_.alias("a"), os_.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 5)
        .select("src", "dst")
    )
    return triangle_counts(edges).select(
        F.col("node").alias("suppkey"),
        "degree",
        "triangles",
        "clustering_bp",
    )


@register(
    "lateral_topk_per_order",
    oracle="""
SELECT o.o_orderkey, t.l_linenumber, t.rev_cents
FROM orders o, LATERAL (
    SELECT CAST(l_linenumber AS INT) AS l_linenumber,
           CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                AS BIGINT) AS rev_cents
    FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
    ORDER BY rev_cents DESC, l_linenumber ASC
    LIMIT 2
) t
WHERE o.o_orderkey % 10 = 0
""",
    doc="Correlated LATERAL subquery with per-row ORDER BY + LIMIT — "
    "the SQL-surface form of grouped top-k (both engines run the "
    "IDENTICAL SQL text; Spark decorrelates the lateral into a "
    "ranked window + filter, DuckDB into a grouped top-n — same "
    "relation either way, integer-cents revenue with a (rev, "
    "linenumber) total order so ties are deterministic). The "
    "orderkey slice keeps the check focused; the DataFrame-API "
    "equivalent shape is pinned by top3_orders_per_status.",
)
def q_lateral_topk_per_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.io import read_table as _rt

    _rt(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    _rt(spark, sf_dir, "lineitem").createOrReplaceTempView("_lat_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber, t.rev_cents
        FROM _lat_orders o, LATERAL (
            SELECT CAST(l_linenumber AS INT) AS l_linenumber,
                   CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0
                              + 0.5) AS BIGINT) AS rev_cents
            FROM _lat_lineitem l
            WHERE l.l_orderkey = o.o_orderkey
            ORDER BY rev_cents DESC, l_linenumber ASC
            LIMIT 2
        ) t
        WHERE o.o_orderkey % 10 = 0
        """
    )


@register(
    "map_functions_check",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
           AS total_k,
       CAST(SUM((CASE WHEN CAST(json_extract(props, '$.k') AS INT)
                           % 2 = 0 THEN 1 ELSE 0 END)
                + (CASE WHEN user_id % 10 % 2 = 0 THEN 1 ELSE 0 END)
                + (CASE WHEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                             % 100 % 2 = 0 THEN 1 ELSE 0 END))
            AS BIGINT) AS n_even_entries,
       CAST(SUM(2 * (user_id % 10)) AS BIGINT) AS total_u_doubled,
       CAST(SUM(1) AS BIGINT) AS total_extra
FROM events
GROUP BY event_type
""",
    doc="MAP-type scalar family — the one container type the catalog "
    "had not yet exercised end-to-end: each event builds a "
    "map<string,bigint> with create_map, then element_at extraction, "
    "map_filter (keep even values, counted via size), "
    "transform_values (double every value, re-extracted), and "
    "map_concat with a literal map (the added entry re-extracted) "
    "all run JVM-side; the per-type aggregate must bit-match the "
    "oracle's closed-form restatement over the base columns — same "
    "encode→operate→decode proof pattern as variant_shredding_check.",
)
def q_map_functions_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    u = (F.col("user_id") % 10).cast("bigint")
    z = (F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint") % 100)
    m = F.create_map(
        F.lit("k"), k, F.lit("u"), u, F.lit("z"), z
    )
    evens = F.map_filter(m, lambda _, v: v % 2 == 0)
    doubled = F.transform_values(m, lambda _, v: v * 2)
    extra = F.map_concat(m, F.create_map(F.lit("extra"), F.lit(1).cast("bigint")))
    row = ev.select(
        "event_type",
        F.element_at(m, "k").alias("mk"),
        F.size(evens).cast("bigint").alias("n_even"),
        F.element_at(doubled, "u").alias("u2"),
        F.element_at(extra, "extra").alias("ex"),
    )
    return row.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("mk").cast("bigint").alias("total_k"),
        F.sum("n_even").cast("bigint").alias("n_even_entries"),
        F.sum("u2").cast("bigint").alias("total_u_doubled"),
        F.sum("ex").cast("bigint").alias("total_extra"),
    )


@register(
    "array_functions_check",
    oracle="""
WITH t AS (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> x <> '') AS ws
    FROM documents
)
SELECT doc_id,
       CAST(len(ws) AS INT) AS n_words,
       CAST(len(list_distinct(ws)) AS INT) AS n_distinct,
       CAST(COALESCE(list_position(ws, 'table'), 0) AS INT)
           AS first_table_pos,
       list_contains(ws, 'key') AS has_key,
       md5(array_to_string(list_sort(ws), ' ')) AS sorted_fp,
       md5(array_to_string(ws[1:3], ' ')) AS head3_fp,
       md5(array_to_string(list_reverse(ws), ' ')) AS reversed_fp
FROM t
""",
    doc="ARRAY scalar family — rounding out the container-type "
    "families (map_functions_check, variant_shredding_check, "
    "json_extraction): array_distinct cardinality, array_position "
    "1-based lookup (0 when absent on both engines after the "
    "COALESCE), array_contains, and order-SENSITIVE md5 fingerprints "
    "of array_sort / slice / reverse — sorted output is a total "
    "order, so the fingerprints are engine-portable without any "
    "set-comparison slack. All JVM-side, one narrow projection, no "
    "shuffle.",
)
def q_array_functions_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_table(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", " "), lambda t: t != "")
    base = docs.select("doc_id", ws.alias("ws"))
    return base.select(
        "doc_id",
        F.size("ws").alias("n_words"),
        F.size(F.array_distinct("ws")).alias("n_distinct"),
        F.array_position("ws", "table").cast("int").alias("first_table_pos"),
        F.array_contains("ws", "key").alias("has_key"),
        F.md5(F.array_join(F.array_sort("ws"), " ")).alias("sorted_fp"),
        F.md5(F.array_join(F.slice("ws", 1, 3), " ")).alias("head3_fp"),
        F.md5(F.array_join(F.reverse("ws"), " ")).alias("reversed_fp"),
    )


_ORC_CACHE: dict[str, str] = {}


def _cleanup_orc_cache() -> None:
    import shutil

    for p in _ORC_CACHE.values():
        shutil.rmtree(p, ignore_errors=True)


@register(
    "orc_roundtrip_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
           AS total_k
FROM events
GROUP BY event_type
""",
    doc="ORC source/sink round trip — the second columnar format of "
    "the source surface (SURVEY §2.1): the events table is written "
    "as ORC (snappy, engine-native writer) and read back through "
    "spark.read.orc with an explicit schema; the per-type aggregate "
    "over the ORC scan must bit-match plain SQL over the original "
    "parquet (doubles, strings, timestamps and the JSON payload all "
    "survive the format hop losslessly). ORC carries its own "
    "predicate-pushdown/stats machinery, so a lakehouse migrating "
    "between the two formats needs exactly this equivalence check.",
)
def q_orc_roundtrip_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import atexit
    import os
    import tempfile

    orc_dir = _ORC_CACHE.get(sf_dir)
    if orc_dir is None:
        if not _ORC_CACHE:
            atexit.register(_cleanup_orc_cache)
        orc_dir = os.path.join(
            tempfile.mkdtemp(prefix="orc_roundtrip_"), "events_orc"
        )
        read_table(spark, sf_dir, "events").write.mode("overwrite").orc(
            orc_dir
        )
        _ORC_CACHE[sf_dir] = orc_dir
    ev = spark.read.schema(
        read_table(spark, sf_dir, "events").schema
    ).orc(orc_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_usd_cents(F.col("value")).alias("total_value"),
        F.sum(k).cast("bigint").alias("total_k"),
    )


def _lpa_round_sql(i: int) -> str:
    return f"""
m{i} AS (
    SELECT e.dst AS node, l.label, COUNT(*) AS cnt
    FROM sym e JOIN l{i - 1} l ON l.node = e.src
    GROUP BY e.dst, l.label
),
l{i} AS MATERIALIZED (
    SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label ASC) AS rn
        FROM m{i}
    ) WHERE rn = 1
)"""


@register(
    "label_propagation_communities",
    oracle="""
WITH os AS (
    SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
),
edges AS MATERIALIZED (
    SELECT a.s AS src, b.s AS dst
    FROM os a JOIN os b ON a.o = b.o AND a.s < b.s
    GROUP BY 1, 2 HAVING COUNT(*) >= 5
),
sym AS MATERIALIZED (
    SELECT src, dst FROM edges
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges
),
l0 AS MATERIALIZED (
    SELECT DISTINCT src AS node, src AS label FROM sym
),"""
    + ",".join(_lpa_round_sql(i) for i in (1, 2, 3, 4))
    + """
SELECT label AS community,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       MIN(node) AS min_member,
       MAX(node) AS max_member
FROM l4
GROUP BY label
ORDER BY community
""",
    doc="Synchronous label-propagation communities (Raghavan, Albert "
    "& Kumara 2007; the GraphFrames labelPropagation shape) over the "
    "same support-thresholded supplier co-order graph as "
    "triangle_counts_supplier: 4 deterministic rounds — each node "
    "adopts its neighbors' most frequent label, ties to the SMALLEST "
    "label (argmax-with-tiebreak as ONE max(struct(cnt, -label)) "
    "aggregate, a total order both engines replay; the oracle "
    "unrolls the rounds as ROW_NUMBER CTEs). Per round one "
    "edges×labels join + two partial-combined groupBys; per-node "
    "state is a single label, the symmetrized edge list "
    "materializes once (operators/graph.py::label_propagation).",
)
def q_label_propagation_communities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark.operators.graph import label_propagation

    li = read_table(spark, sf_dir, "lineitem")
    os_ = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("s")
    ).distinct()
    a, b = os_.alias("a"), os_.alias("b")
    edges = (
        a.join(
            b,
            (F.col("a.o") == F.col("b.o")) & (F.col("a.s") < F.col("b.s")),
        )
        .groupBy(F.col("a.s").alias("src"), F.col("b.s").alias("dst"))
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 5)
        .select("src", "dst")
    )
    labels = label_propagation(edges, iterations=4, broadcast_labels=True)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min("node").alias("min_member"),
            F.max("node").alias("max_member"),
        )
        .orderBy("community")
    )


@register(
    "bitmap_exact_distinct_check",
    oracle="""
SELECT event_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users_bitmap,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users_merged,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users
FROM events
GROUP BY event_type
""",
    doc="EXACT mergeable distinct counts via bitmap aggregation "
    "(Spark 3.5 bitmap_* family, r11) — the exact counterpart to the "
    "hll_mergeable_user_counts sketch: each user_id maps to "
    "(bitmap_bucket_number, bitmap_bit_position), per-(type,bucket) "
    "bitmaps build with bitmap_construct_agg, and distinct = "
    "SUM(bitmap_count) — then the same counts are REBUILT from "
    "per-slice partial bitmaps folded with bitmap_or_agg, proving "
    "the mergeability law (bitmap-of-union == OR-of-bitmaps) that "
    "lets 100 TB pipelines compute exact distincts from per-day "
    "partials without re-shuffling raw keys. Unlike HLL both paths "
    "are EXACT, so the oracle is plain COUNT(DISTINCT) three ways — "
    "no tolerance flags. Memory is bounded: one 4096-byte bitmap per "
    "(group, 32k-id bucket), dense where HLL is constant — the "
    "documented trade (bitmaps win on exactness and intersections, "
    "HLL on unbounded key domains).",
)
def q_bitmap_exact_distinct_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = read_table(spark, sf_dir, "events").select("event_type", "user_id")
    pos = ev.select(
        "event_type",
        "user_id",
        F.bitmap_bucket_number(F.col("user_id")).alias("b"),
        F.bitmap_bit_position(F.col("user_id")).alias("p"),
    )
    direct = (
        pos.groupBy("event_type", "b")
        .agg(F.bitmap_construct_agg(F.col("p")).alias("bm"))
        .groupBy("event_type")
        .agg(
            F.sum(F.bitmap_count(F.col("bm")))
            .cast("bigint")
            .alias("exact_users_bitmap")
        )
    )
    merged = (
        pos.withColumn("slice", F.col("user_id") % 4)
        .groupBy("event_type", "slice", "b")
        .agg(F.bitmap_construct_agg(F.col("p")).alias("bm"))
        .groupBy("event_type", "b")
        .agg(F.bitmap_or_agg(F.col("bm")).alias("bm"))
        .groupBy("event_type")
        .agg(
            F.sum(F.bitmap_count(F.col("bm")))
            .cast("bigint")
            .alias("exact_users_merged")
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("exact_users")
    )
    return direct.join(merged, "event_type").join(exact, "event_type")


@register(
    "xml_shredding_check",
    oracle="""
SELECT o_orderstatus AS status,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents,
       CAST(SUM(o_custkey) AS BIGINT) AS total_cust,
       CAST(0 AS BIGINT) AS n_missing
FROM orders
GROUP BY o_orderstatus
""",
    doc="XML semi-structured round trip (from_xml, Spark 4 — the "
    "last container format after JSON/VARIANT/MAP/ARRAY): each order "
    "re-serialized as an XML document with an ATTRIBUTE (the _-prefix "
    "attribute convention), nested elements and integer-cents "
    "amounts, parsed back with from_xml under an explicit struct "
    "schema, every field extracted and aggregated per status — must "
    "bit-match plain SQL over the base columns (the encode→shred→"
    "decode lossless-cycle pattern of variant_shredding_check). A "
    "missing element reads NULL (counted, pinned 0). Cents ride as "
    "integers through the XML text so no float formatting ever "
    "enters the document.",
)
def q_xml_shredding_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    xml = F.format_string(
        '<order id="%s"><status>%s</status><cents>%s</cents>'
        "<cust>%s</cust></order>",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        cents.cast("string"),
        F.col("o_custkey").cast("string"),
    )
    parsed = o.select(
        F.from_xml(
            xml,
            "_id BIGINT, status STRING, cents BIGINT, cust BIGINT, "
            "missing BIGINT",
        ).alias("x")
    )
    return parsed.groupBy(F.col("x.status").alias("status")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("x.cents").cast("bigint").alias("total_cents"),
        F.sum("x.cust").cast("bigint").alias("total_cust"),
        F.count("x.missing").cast("bigint").alias("n_missing"),
    )


@register(
    "url_functions_check",
    oracle="""
SELECT 'shop.example.com' AS host,
       '/orders/' || CAST(o_orderkey AS VARCHAR) AS path,
       o_orderstatus AS status_param,
       'clerk ' || CAST(o_custkey % 100 AS VARCHAR) AS clerk_decoded,
       CAST(o_orderkey AS BIGINT) AS o_orderkey
FROM orders
WHERE o_orderkey % 20 = 0
""",
    doc="URL scalar family (parse_url + url_encode/url_decode, r11): "
    "synthesize a URL per order (host, per-key path, query string "
    "with a url_encoded space-bearing value), then extract HOST, "
    "PATH, a named QUERY parameter, and url_decode the encoded one "
    "back — the log-ingest parsing shape every clickstream pipeline "
    "needs. The oracle restates every extraction in closed form from "
    "the base columns, so any drift in parsing or percent-encoding "
    "(space -> +/%20) hash-fails. Deterministic 1-in-20 key slice "
    "keeps the check scan-light; all JVM-side, zero UDFs.",
)
def q_url_functions_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") % 20 == 0
    )
    clerk = F.concat(
        F.lit("clerk "), (F.col("o_custkey") % 100).cast("string")
    )
    url = F.concat(
        F.lit("https://shop.example.com/orders/"),
        F.col("o_orderkey").cast("string"),
        F.lit("?status="),
        F.col("o_orderstatus"),
        F.lit("&clerk="),
        F.url_encode(clerk),
    )
    return o.select(
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("status")).alias(
            "status_param"
        ),
        F.url_decode(
            F.parse_url(url, F.lit("QUERY"), F.lit("clerk"))
        ).alias("clerk_decoded"),
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
    )


@register(
    "crypto_functions_check",
    oracle="""
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) AS BIGINT) AS n_roundtrip_ok,
       CAST(0 AS BIGINT) AS n_wrong_key_decrypts,
       CAST(SUM(c_custkey) AS BIGINT) AS custkey_sum
FROM customer
GROUP BY c_mktsegment
""",
    doc="Column-encryption round trip (aes_encrypt/aes_decrypt/"
    "try_aes_decrypt, r11 — the at-rest PII pattern for fields like "
    "customer names): every c_name encrypts under AES-ECB (the "
    "deterministic mode; GCM's random IV would defeat a bit-exact "
    "check), decrypts back, and the round-trip-equal count is pinned "
    "to the row count; try_aes_decrypt under the WRONG key must "
    "yield NULL (never garbage, never throw) — its success count is "
    "pinned 0. custkey_sum anchors the slice. All JVM-side "
    "expressions; keys are 16-byte literals, not data.",
)
def q_crypto_functions_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = F.lit("0123456789abcdef")
    wrong = F.lit("fedcba9876543210")
    c = read_table(spark, sf_dir, "customer")
    enc = F.aes_encrypt(F.col("c_name"), key, F.lit("ECB"))
    out = c.select(
        "c_mktsegment",
        "c_custkey",
        (
            F.aes_decrypt(enc, key, F.lit("ECB")).cast("string")
            == F.col("c_name")
        ).alias("rt_ok"),
        F.try_aes_decrypt(enc, wrong, F.lit("ECB")).alias("wrong_dec"),
    )
    return out.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("rt_ok").cast("bigint")).cast("bigint").alias(
            "n_roundtrip_ok"
        ),
        F.count("wrong_dec").cast("bigint").alias("n_wrong_key_decrypts"),
        F.sum("c_custkey").cast("bigint").alias("custkey_sum"),
    )


@register(
    "gap_filled_hourly_values",
    oracle="""
WITH hourly AS (
    SELECT user_id, date_trunc('hour', ts) AS h,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
    FROM events
    WHERE user_id % 50 = 0
    GROUP BY user_id, date_trunc('hour', ts)
),
spans AS (
    SELECT user_id, MIN(h) AS h_lo, MAX(h) AS h_hi FROM hourly
    GROUP BY user_id
),
spine AS (
    SELECT user_id, UNNEST(generate_series(h_lo, h_hi,
                                           INTERVAL 1 HOUR)) AS h
    FROM spans
),
joined AS (
    SELECT s.user_id, s.h, hourly.cents,
           CASE WHEN hourly.cents IS NULL THEN 1 ELSE 0 END AS is_filled
    FROM spine s LEFT JOIN hourly USING (user_id, h)
)
SELECT user_id, h,
       LAST_VALUE(cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS cents_ffill,
       CAST(is_filled AS BIGINT) AS is_filled
FROM joined
""",
    doc="Time-series RESAMPLE + forward fill (r11 — the ops-metrics "
    "gap-fill every monitoring pipeline needs): per-user hourly cents "
    "re-gridded onto a dense hour spine between each user's first and "
    "last active hour (explode(sequence) — a Generate, no join blowup) "
    "and missing hours carried forward with last_value(ignoreNulls) "
    "over an ordered per-user frame. Deterministic 1-in-50 user slice "
    "bounds the spine size; is_filled marks synthesized rows. The "
    "oracle replays spine + LAST_VALUE IGNORE NULLS exactly; "
    "fixed-point cents keep the fill values bit-comparable. Plan: one "
    "partial-combined hourly agg, a per-user MIN/MAX, the spine "
    "Generate, one left join and one per-user window — every stage "
    "keyed on user_id, so the whole pipeline is one shuffle family at "
    "any scale.",
)
def q_gap_filled_hourly_values(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    ev = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") % 50 == 0
    )
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("h_lo"), F.max("h").alias("h_hi")
    )
    spine = spans.select(
        "user_id",
        F.explode(
            F.sequence("h_lo", "h_hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("h"),
    )
    joined = spine.join(hourly, ["user_id", "h"], "left").select(
        "user_id",
        "h",
        "cents",
        F.when(F.col("cents").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("is_filled"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("h").cast("timestamp_ntz").alias("h"),
        F.last("cents", ignorenulls=True).over(w).alias("cents_ffill"),
        "is_filled",
    )


@register(
    "sql_pipe_syntax_check",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0 + 0.5)
                     AS BIGINT)) AS DOUBLE) / 100.0 AS disc_revenue,
       SUM(l_quantity) / COUNT(l_quantity) AS avg_qty
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
HAVING COUNT(*) > 10
""",
    doc="SQL pipe syntax (r12 — Spark 4's |> operator chain, the "
    "SQL:2023-adjacent linear composition surface): the pricing-"
    "summary shape written as FROM |> WHERE |> AGGREGATE..GROUP BY "
    "|> WHERE(having) |> SELECT, proving the pipe parser "
    "lowers to the identical Catalyst plan the ANSI oracle text "
    "describes (same partial/final HashAggregate pair, same pushed "
    "shipdate filter). avg_qty stays bit-exact cross-engine because "
    "l_quantity is integral-valued: the partial sums are exact in "
    "binary64 under any partitioning/accumulation order, so only the "
    "final single division rounds. Money goes through integer cents "
    "as everywhere (functions/money.py convention).",
)
def q_sql_pipe_syntax_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM lineitem
        |> WHERE l_shipdate <= DATE '1998-09-02'
        |> AGGREGATE
             COUNT(*) AS n_rows,
             CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100.0
                                 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
               AS disc_revenue,
             AVG(l_quantity) AS avg_qty
           GROUP BY l_returnflag, l_linestatus
        |> WHERE n_rows > 10
        |> SELECT l_returnflag, l_linestatus, n_rows, disc_revenue, avg_qty
        """
    )


@register(
    "sql_udf_check",
    oracle="""
SELECT CASE WHEN o_totalprice >= 200000 THEN 'large'
            WHEN o_totalprice >= 50000 THEN 'mid'
            ELSE 'small' END AS tier,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 100.0 AS total_value
FROM orders
GROUP BY 1
""",
    doc="SQL scalar UDFs (r12 — CREATE TEMPORARY FUNCTION .. RETURN "
    "expr, the Spark 4 SQL-UDF surface): a to_cents money helper and "
    "an order_tier CASE classifier defined as catalog functions and "
    "used in grouping + aggregation. Unlike Python UDFs these are "
    "CATALYST-INLINED: the physical plan shows the CASE/FLOOR "
    "expressions substituted into the Project inside WholeStageCodegen "
    "— zero serialization boundary, identical cost to writing the "
    "expression inline, so the abstraction is free at 100 TB. The "
    "oracle inlines the same expressions textually (DuckDB macros "
    "would be the dialect twin). Registration is idempotent "
    "(CREATE OR REPLACE) so repeated catalog sweeps share a session.",
)
def q_sql_udf_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.io import register_views

    register_views(spark, sf_dir)
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION to_cents(x DOUBLE) "
        "RETURNS BIGINT RETURN CAST(FLOOR(x * 100.0 + 0.5) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION order_tier(total DOUBLE) "
        "RETURNS STRING RETURN CASE WHEN total >= 200000 THEN 'large' "
        "WHEN total >= 50000 THEN 'mid' ELSE 'small' END"
    )
    return spark.sql(
        """
        SELECT order_tier(o_totalprice) AS tier,
               COUNT(*) AS n_orders,
               CAST(SUM(to_cents(o_totalprice)) AS DOUBLE) / 100.0
                 AS total_value
        FROM orders
        GROUP BY order_tier(o_totalprice)
        """
    )


@register(
    "sql_scripting_check",
    oracle="""
WITH c AS (SELECT MAX(o_totalprice) / 16.0 AS cutoff FROM orders)
SELECT CASE WHEN c.cutoff > 10000 THEN 'high' ELSE 'low' END AS regime,
       o.o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 100.0 AS total_value
FROM orders o, c
WHERE o.o_totalprice >= c.cutoff
GROUP BY 1, 2
""",
    doc="SQL scripting (r13, VERDICT r12 #4 — the Spark 4 "
    "BEGIN...END compound-statement surface, completing the SQL "
    "surface trio with pipe syntax and SQL UDFs): DECLARE session "
    "variables, SET from a scalar subquery, a WHILE loop (four "
    "halvings — exact power-of-two double arithmetic, so the oracle "
    "can restate the loop as /16.0 with bit-identical results), an "
    "IF/ELSE branch, and a final multi-row SELECT whose result IS "
    "the script's value. Control flow runs DRIVER-SIDE over scalar "
    "variables only (org.apache.spark.sql.scripting interprets the "
    "compound EAGERLY at spark.sql() time); every data-touching "
    "statement runs as its own ordinary Catalyst plan during "
    "interpretation and the returned relation is the LAST "
    "statement's materialized result (a LocalTableScan bounded by "
    "the GROUP count — pinned in test_plans), so at 100 TB the "
    "script costs exactly its constituent queries — the scalar probe "
    "aggregate and the final grouped scan — with zero per-row "
    "interpretation; keep final SELECTs aggregated, as here. The "
    "oracle inlines the loop+branch algebraically (MAX/16, CASE).",
)
def q_sql_scripting_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    from stripe_data_pipeline_spark.io import register_views

    register_views(spark, sf_dir)
    try:  # default-on in this Spark 4.1 build; set defensively
        spark.conf.set("spark.sql.scripting.enabled", "true")
    except Exception:  # noqa: BLE001 — conf may be static on a cluster
        pass
    return spark.sql(
        """
        BEGIN
          DECLARE cutoff DOUBLE DEFAULT 0.0;
          DECLARE i INT DEFAULT 0;
          DECLARE regime STRING DEFAULT 'none';
          SET cutoff = (SELECT MAX(o_totalprice) FROM orders);
          WHILE i < 4 DO
            SET cutoff = cutoff / 2.0;
            SET i = i + 1;
          END WHILE;
          IF cutoff > 10000 THEN
            SET regime = 'high';
          ELSE
            SET regime = 'low';
          END IF;
          SELECT regime AS regime, o_orderpriority,
                 COUNT(*) AS n_orders,
                 CAST(SUM(CAST(FLOOR(o_totalprice * 100.0 + 0.5)
                      AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
          FROM orders
          WHERE o_totalprice >= cutoff
          GROUP BY o_orderpriority;
        END
        """
    )


@register(
    "url_canonical_dedup_check",
    oracle="""
WITH ks AS (
    SELECT CAST(o_orderkey AS BIGINT) AS k,
           CAST(o_orderkey % 4 AS BIGINT) AS va,
           CAST((o_orderkey % 4 + 1 + o_orderkey % 3) % 4 AS BIGINT) AS vb
    FROM orders WHERE o_orderkey % 10 = 0
),
mk AS (
    SELECT k, va, vb,
           'https://shop.example.com/p/' || CAST(k AS VARCHAR) AS canon
    FROM ks
),
raws AS (
    SELECT k, canon,
           CASE va
             WHEN 0 THEN 'HTTPS://Shop.Example.COM:443/p/' || CAST(k AS VARCHAR)
             WHEN 1 THEN 'https://shop.example.com/a/../p/' || CAST(k AS VARCHAR)
             WHEN 2 THEN 'https://shop.example.com/./p/' || CAST(k AS VARCHAR)
                         || '#sec-' || CAST(k AS VARCHAR)
             ELSE 'https://shop.example.com/p/' || CAST(k AS VARCHAR)
                  || '?utm_source=news&utm_campaign=c' || CAST(k AS VARCHAR)
           END AS raw_a,
           CASE vb
             WHEN 0 THEN 'HTTPS://Shop.Example.COM:443/p/' || CAST(k AS VARCHAR)
             WHEN 1 THEN 'https://shop.example.com/a/../p/' || CAST(k AS VARCHAR)
             WHEN 2 THEN 'https://shop.example.com/./p/' || CAST(k AS VARCHAR)
                         || '#sec-' || CAST(k AS VARCHAR)
             ELSE 'https://shop.example.com/p/' || CAST(k AS VARCHAR)
                  || '?utm_source=news&utm_campaign=c' || CAST(k AS VARCHAR)
           END AS raw_b
    FROM mk
)
SELECT canon AS canonical_url,
       CAST(2 AS BIGINT) AS n_raw,
       LEAST(raw_a, raw_b) AS keeper_raw
FROM raws
UNION ALL
SELECT 'http://shop.example.com/q/' || CAST(k AS VARCHAR)
         || '?id=' || CAST(k AS VARCHAR) AS canonical_url,
       CAST(1 AS BIGINT) AS n_raw,
       'HTTP://shop.example.com:80/q/x/../' || CAST(k AS VARCHAR)
         || '?id=' || CAST(k AS VARCHAR) || '&utm_medium=mail&gclid=g'
         || CAST(k AS VARCHAR) AS keeper_raw
FROM ks WHERE k % 20 = 0
""",
    doc="RFC 3986 URL canonicalization + canonical-URL dedup (r13, "
    "VERDICT r12 #5 — the missing crawl-head step between WARC "
    "ingestion and robots filtering; operators/urlnorm.py): per "
    "order key, TWO guaranteed-distinct messy variants of the same "
    "page URL (uppercase scheme/host + default :443 port, /a/../ "
    "dot-segments, /./ + fragment, utm_* tracking params) plus — for "
    "the 1-in-20 slice — a singleton exercising :80, a mid-path "
    "dot-segment, a KEPT real query param and mixed utm/gclid "
    "stripping. canonicalize_url collapses every variant at scan "
    "speed (pure Java-regex projection in the RE2-common subset, "
    "WholeStageCodegen, zero Python); the dedup is one groupBy on "
    "the canonical string keeping min(raw) — at 100 TB this is the "
    "frontier-dedup shuffle keyed by canonical URL, ~linear in "
    "corpus size. The oracle never canonicalizes: it emits the "
    "intended canonical form and the LEAST() keeper in closed form "
    "from the key alone, so every rule is proven char-for-char.",
)
def q_url_canonical_dedup_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark.operators.partitioning import spread_scan
    from stripe_data_pipeline_spark.operators.urlnorm import canonicalize_url

    k = F.col("k")
    ks = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 10 == 0)
        .select(F.col("o_orderkey").cast("bigint").alias("k"))
    )
    kstr = k.cast("string")

    def variant(v):
        return (
            F.when(
                v == 0,
                F.concat(F.lit("HTTPS://Shop.Example.COM:443/p/"), kstr),
            )
            .when(
                v == 1,
                F.concat(F.lit("https://shop.example.com/a/../p/"), kstr),
            )
            .when(
                v == 2,
                F.concat(
                    F.lit("https://shop.example.com/./p/"),
                    kstr,
                    F.lit("#sec-"),
                    kstr,
                ),
            )
            .otherwise(
                F.concat(
                    F.lit("https://shop.example.com/p/"),
                    kstr,
                    F.lit("?utm_source=news&utm_campaign=c"),
                    kstr,
                )
            )
        )

    va = k % 4
    vb = (va + 1 + k % 3) % 4  # 1+(k%3) in {1,2,3}: never equals va
    pairs = ks.select(
        F.explode(F.array(variant(va), variant(vb))).alias("raw_url")
    )
    singles = ks.filter(k % 20 == 0).select(
        F.concat(
            F.lit("HTTP://shop.example.com:80/q/x/../"),
            kstr,
            F.lit("?id="),
            kstr,
            F.lit("&utm_medium=mail&gclid=g"),
            kstr,
        ).alias("raw_url")
    )
    # r14 optimization round (guide §2.5): the canonicalizer's regexp
    # chain evaluates BEFORE the dedup groupBy's exchange, so on the
    # single-file local fixture the whole normalization pass ran on
    # one core (sf1 11.3 s -> 2.9 s after the spread). Spread the
    # union ONCE — spreading `ks` would duplicate the round-robin into
    # both union branches — and a many-file production frontier scan
    # passes through spread_scan untouched, keeping the documented
    # one-keyed-shuffle scale shape.
    return (
        spread_scan(pairs.unionAll(singles))
        .withColumn("canonical_url", canonicalize_url(F.col("raw_url")))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_raw"),
            F.min("raw_url").alias("keeper_raw"),
        )
    )


@register(
    "crawl_frontier_schedule_check",
    oracle="""
WITH u AS (
    SELECT CAST(o_orderkey AS BIGINT) AS k,
           'h' || CAST(o_orderkey % 7 AS VARCHAR) || '.shop.example'
             AS host,
           'https://h' || CAST(o_orderkey % 7 AS VARCHAR)
             || '.shop.example/item/' || CAST(o_orderkey AS VARCHAR)
             || '?ref=' || CAST(o_orderkey AS VARCHAR) AS url,
           CAST(o_orderkey % 97 AS BIGINT) AS priority
    FROM orders WHERE o_orderkey % 5 = 0
),
r AS (
    SELECT host, url, priority,
           ROW_NUMBER() OVER (
               PARTITION BY host ORDER BY priority DESC, url ASC
           ) AS rk
    FROM u
)
SELECT host,
       CAST(FLOOR((rk - 1) / 20) AS BIGINT) AS fetch_cycle,
       COUNT(*) AS n_urls,
       MIN(priority) AS min_priority,
       MAX(priority) AS max_priority,
       MIN(url) AS first_url
FROM r
GROUP BY host, CAST(FLOOR((rk - 1) / 20) AS BIGINT)
""",
    doc="Crawl-frontier politeness scheduling (r14 — the last crawl-"
    "head step after WARC ingest, HTML extraction, RFC 3986 "
    "canonicalization/dedup and robots filtering; "
    "operators/frontier.py): candidate URLs (messy odd-key variants "
    "carry utm_ tracking params that canonicalize_url strips "
    "in-chain) are partitioned by HOST, ranked by priority with a "
    "deterministic URL tiebreak, and striped into fetch cycles of at "
    "most 20 URLs per host — the Mercator-style per-host budget "
    "(Heydon & Najork 1999) every production crawler enforces beside "
    "robots crawl-delay. ONE window over ONE hash exchange on host — "
    "at 100 TB that exchange is the host-locality partitioning the "
    "fetch fleet needs anyway, and the cap itself bounds per-host "
    "skew (a pathological host schedules <= cap URLs per cycle "
    "however large its frontier share). The oracle restates the "
    "canonical URL in closed form from the key (never "
    "canonicalizes) and replays the schedule with plain ROW_NUMBER, "
    "so budget arithmetic and rank determinism are proven "
    "char-for-char.",
)
def q_crawl_frontier_schedule_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from stripe_data_pipeline_spark.operators.frontier import (
        schedule_frontier,
    )
    from stripe_data_pipeline_spark.operators.urlnorm import canonicalize_url

    k = F.col("k")
    kstr = k.cast("string")
    host = F.concat(F.lit("h"), (k % 7).cast("string"), F.lit(".shop.example"))
    # odd keys arrive messy (tracking param + uppercase scheme the
    # canonicalizer must fix); even keys arrive clean — both collapse
    # to the same closed form the oracle emits
    raw = F.when(
        k % 2 == 1,
        F.concat(
            F.lit("HTTPS://"), host, F.lit("/item/"), kstr,
            F.lit("?utm_source=feed&ref="), kstr,
        ),
    ).otherwise(
        F.concat(
            F.lit("https://"), host, F.lit("/item/"), kstr,
            F.lit("?ref="), kstr,
        )
    )
    frontier = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 5 == 0)
        .select(F.col("o_orderkey").cast("bigint").alias("k"))
        .select(
            canonicalize_url(raw).alias("url"),
            (k % 97).alias("priority"),
        )
    )
    return (
        schedule_frontier(
            frontier, url_col="url", priority_col="priority",
            per_host_per_cycle=20,
        )
        .groupBy("host", "fetch_cycle")
        .agg(
            F.count(F.lit(1)).alias("n_urls"),
            F.min("priority").alias("min_priority"),
            F.max("priority").alias("max_priority"),
            F.min("url").alias("first_url"),
        )
    )


_AVRO_CACHE: dict[str, str] = {}



@register(
    "avro_roundtrip_check",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       {sum_usd_cents_sql("value")} AS total_value,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
           AS total_k,
       MIN(ts) AS first_ts
FROM events
GROUP BY event_type
""",
    doc="Avro Object Container File round trip (r14 — closes the last "
    "interchange gap beside parquet/ORC/CSV/NDJSON/XML/WARC; this "
    "container lacks the spark-avro CONNECTOR and any python avro "
    "lib, so sources/avro_source.py implements the PUBLIC Avro 1.12 "
    "spec as a Spark 4 Python DataSource — the warc_source "
    "precedent): the events table is written as deflate-compressed "
    "OCF shards (one per task, staged-tmp two-phase commit) and read "
    "back with the schema INFERRED from the file header "
    "(long/string/double/local-timestamp-micros + nullable unions, "
    "zigzag varints, block/sync framing all from spec); the per-type "
    "aggregate over the Avro scan — including MIN(ts) through the "
    "timestamp logical type — must bit-match plain SQL over the "
    "original parquet. One input partition per container file, "
    "Arrow-batched across the Python boundary; the full type-matrix "
    "roundtrip (arrays, bytes, dates, nulls, both codecs) is "
    "pytest-pinned in tests/test_avro.py.",
)
def q_avro_roundtrip_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from stripe_data_pipeline_spark.catalog.artifacts import cached_artifact
    from stripe_data_pipeline_spark.sources.avro_source import (
        register_avro_source,
    )

    register_avro_source(spark)

    def build(work: str) -> str:
        avro_dir = os.path.join(work, "events_avro")
        read_table(spark, sf_dir, "events").write.format("avroocf").mode(
            "overwrite"
        ).save(avro_dir)
        return avro_dir

    avro_dir = cached_artifact(_AVRO_CACHE, sf_dir, "avro_roundtrip_", build)
    ev = spark.read.format("avroocf").load(avro_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        sum_usd_cents(F.col("value")).alias("total_value"),
        F.sum(k).cast("bigint").alias("total_k"),
        F.min("ts").alias("first_ts"),
    )


_TFRECORD_CACHE: dict[str, str] = {}



@register(
    "tfrecord_roundtrip_check",
    oracle="""
SELECT d.lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT d.doc_id) AS n_ids,
       CAST(SUM(length(d.text)) AS BIGINT) AS total_chars,
       CAST(SUM(COALESCE(len(e.embedding), 0)) AS BIGINT) AS total_dims,
       CAST(MIN(e.embedding[1]) AS DOUBLE) AS min_first_dim,
       CAST(SUM(e.label) AS BIGINT) AS total_label
FROM documents d
LEFT JOIN embeddings e ON d.doc_id = e.vec_id
GROUP BY d.lang
""",
    doc="TFRecord + tf.train.Example round trip (r14 — the canonical "
    "training-data interchange format, from the PUBLIC specs since "
    "this container has no tensorflow/protobuf-stub/crc32c lib; "
    "sources/tfrecord_source.py implements the TFRecord framing "
    "(uint64le length + masked-CRC32C per RFC 3720's Castagnoli "
    "table + TensorFlow's documented mask) and the Example proto "
    "over the protobuf wire format as a Spark 4 Python DataSource — "
    "the avro_source/warc_source precedent): documents LEFT JOIN "
    "embeddings is written as one Example per doc (text/lang/source "
    "-> BytesList, doc_id/n_chars/label -> Int64List, the "
    "array<float> embedding -> FloatList, NULL -> absent key) into "
    "per-task .tfrecord shards (staged-tmp two-phase commit), read "
    "back under an explicit schema with CRC verification ON, and "
    "profiled per lang — counts, exact char totals, embedding "
    "dimension totals and a float32-exact MIN(embedding[1]) must "
    "bit-match plain SQL over the original parquet. One partition "
    "per shard (the format has no sync markers — unsplittable by "
    "design, TensorFlow parallelizes by shard too), Arrow-batched; "
    "the full type matrix, golden wire bytes, packed+unpacked "
    "decode, CRC corruption refusal and schema inference are "
    "pytest-pinned in tests/test_tfrecord.py.",
)
def q_tfrecord_roundtrip_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from pyspark.sql import types as T

    from stripe_data_pipeline_spark.catalog.artifacts import cached_artifact
    from stripe_data_pipeline_spark.sources.tfrecord_source import (
        register_tfrecord_source,
    )

    register_tfrecord_source(spark)

    def build(work: str) -> str:
        tf_dir = os.path.join(work, "docs_tfrecord")
        docs = read_table(spark, sf_dir, "documents")
        emb = read_table(spark, sf_dir, "embeddings")
        (
            docs.join(emb, docs.doc_id == emb.vec_id, "left")
            .select(
                "doc_id", "text", "lang", "source", "n_chars", "embedding",
                F.col("label").cast("long").alias("label"),
            )
            .write.format("tfrecord")
            .mode("overwrite")
            .save(tf_dir)
        )
        return tf_dir

    tf_dir = cached_artifact(
        _TFRECORD_CACHE, sf_dir, "tfrecord_roundtrip_", build
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("n_chars", T.LongType()),
            T.StructField(
                "embedding", T.ArrayType(T.FloatType(), containsNull=False)
            ),
            T.StructField("label", T.LongType()),
        ]
    )
    back = spark.read.format("tfrecord").schema(schema).load(tf_dir)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("doc_id").alias("n_ids"),
        F.sum(F.length("text")).cast("bigint").alias("total_chars"),
        F.sum(F.coalesce(F.size("embedding"), F.lit(0)))
        .cast("bigint")
        .alias("total_dims"),
        F.min(F.element_at("embedding", 1))
        .cast("double")
        .alias("min_first_dim"),
        F.sum("label").cast("bigint").alias("total_label"),
    )


_ARROW_IPC_CACHE: dict[str, str] = {}



@register(
    "arrow_ipc_roundtrip_check",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
       {sum_usd_cents_sql("l_extendedprice")} AS sum_price_usd,
       MIN(l_shipdate) AS first_ship,
       CAST(MAX(l_discount) AS DOUBLE) AS max_disc
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    doc="Arrow IPC file (Feather V2) round trip (r14 — the "
    "training-data ecosystem's native interchange format: HF "
    "``datasets`` shards, Arrow-native tools; completes the "
    "interchange set alongside parquet/ORC/CSV/NDJSON/XML/WARC/Avro/"
    "TFRecord): lineitem is written to ``.arrow`` shards by the "
    "sources/arrow_ipc_source.py Spark 4 Python DataSource "
    "(DataSourceArrowWriter — the plan's output streams shard-ward "
    "as Arrow batches with NO row materialization; staged-tmp "
    "two-phase commit), read back with footer-inferred schema, and "
    "profiled Q1-style per (returnflag, linestatus) — counts, exact "
    "bigint quantity sums, integer-cents price sums, MIN(shipdate) "
    "timestamp fidelity and MAX(discount) must bit-match plain SQL "
    "over the original parquet. The read path is zero-copy: each "
    "task memory-maps its batch RANGE (the IPC footer addresses "
    "every record batch, so a single huge shard SPLITS at batch "
    "granularity — partitions() is footer-only metadata I/O), and "
    "stored batches pass straight into Spark's Arrow ingestion. "
    "Type matrix, splitting, pruning, dictionary decode, "
    "foreign-writer interop, compression codecs and crash "
    "invisibility are pytest-pinned in tests/test_arrow_ipc.py.",
)
def q_arrow_ipc_roundtrip_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    from stripe_data_pipeline_spark.catalog.artifacts import cached_artifact
    from stripe_data_pipeline_spark.sources.arrow_ipc_source import (
        register_arrow_ipc_source,
    )

    register_arrow_ipc_source(spark)

    def build(work: str) -> str:
        arrow_dir = os.path.join(work, "lineitem_arrow")
        read_table(spark, sf_dir, "lineitem").write.format("arrowipc").mode(
            "overwrite"
        ).save(arrow_dir)
        return arrow_dir

    arrow_dir = cached_artifact(
        _ARROW_IPC_CACHE, sf_dir, "arrow_ipc_roundtrip_", build
    )
    back = spark.read.format("arrowipc").load(arrow_dir)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.col("l_quantity").cast("bigint"))
        .cast("bigint")
        .alias("sum_qty"),
        sum_usd_cents(F.col("l_extendedprice")).alias("sum_price_usd"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_discount").cast("double").alias("max_disc"),
    )
