"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``stripe_data_pipeline_spark``; this module
only adapts the catalog registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from stripe_data_pipeline_spark.catalog import QUERIES  # noqa: E402

# Runtime-settable confs the engine depends on, applied defensively in
# case the driver's session was built without them:
# - UTC: all epoch<->date math assumes it (SURVEY.md §7 determinism).
# - nanosAsLong: the testdata events table is parquet TIMESTAMP(NANOS),
#   which Spark's reader rejects natively; io.read_table converts the
#   resulting longs to microsecond timestamps.
_REQUIRED_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def _apply_conf(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # noqa: BLE001 — never fail the harness on a conf
            pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2.9 daily revenue recognition) on sf0.001."""
    _apply_conf(spark)
    fn = QUERIES["revenue_trend_daily"].fn
    return fn(spark, "/root/testdata/sf0.001")


# The driver's CORRECTNESS run checks the first 50 entries of queries().
# Order the registry so every *component family* lands a driver verdict:
# the LLM-pipeline operators (dedup / similarity / multimodal / text) and
# this round's additions go first, then the flagship revenue marts, then
# one representative per relational operator family. Redundant relational
# demos (all locally oracle-green, see tools/check_oracle.py) sort last.
_PRIORITY = [
    # LLM-data-pipeline north-star operators (VERDICT r01 #1).
    "dedup_exact_summary",
    "dedup_exact_keepers",
    "near_dup_jaccard_pairs",
    "dedup_clusters",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "cosine_topk_bruteforce",
    "embedding_near_dup_pairs",
    "label_centroids_applyinpandas",
    "ivf_topk",
    "media_metadata",
    "media_features",
    "doc_text_stats",
    "doc_lang_id",
    "doc_regex_tokens",
    "doc_quality_scores",
    "doc_fingerprints",
    "doc_first_last_token",
    "pandas_udf_normalize",
    "rollup_counts",
    "array_agg_sorted",
    # Round-2 additions (registered below if present).
    "jaccard_verify_lsh",
    "approx_percentile_prices",
    "recognized_revenue_mart_check",
    "ivf_topk_persisted",
    # Flagship revenue recognition (SURVEY.md §2.9) + marts.
    "revenue_trend_daily",
    "deferred_total_asof",
    "deferred_by_customer_asof",
    "recognized_quarter_calendar",
    "recognized_monthly_halfopen",
    "active_periods_per_month_start",
    "curated_line_items",
    "calendar_dim",
    "fx_literal_dim",
    "missing_period_end_threshold",
    # One representative per relational operator family.
    "max_cursor",
    "orders_high_watermark",
    "orders_status_filter",
    "orders_rename_cast",
    "dim_chain_join",
    "orders_lineitem_join",
    "customer_orders_left_join",
    "customers_with_open_orders_semi",
    "customers_without_orders_anti",
    "doc_words_exploded_top20",
    "pricing_summary",
    "latest_event_per_user",
    "top3_orders_per_status",
    "event_gaps",
    "top20_orders",
    "asof_join_events_orders",
    "sessionized_events",
    "salted_skew_join",
    "events_hourly_windows",
    "json_extraction",
]


def _ordered_names() -> list[str]:
    prioritized = [n for n in _PRIORITY if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(prioritized)]
    return prioritized + rest


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _apply_conf(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(QUERIES[name].fn) for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for non-SQL-expressible ops)."""
    return {
        name: QUERIES[name].oracle
        for name in _ordered_names()
        if QUERIES[name].oracle is not None
    }
