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
    _ship_package(spark)


_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make the engine importable on PYTHON WORKERS regardless of the
    driver's cwd/PYTHONPATH: the Arrow-batched stages (mapInPandas /
    applyInPandas / pandas_udf) pickle their closures BY REFERENCE to
    module globals, so the worker process must be able to import
    ``stripe_data_pipeline_spark`` itself. Shipping a zip via
    ``addPyFile`` works after session start and on real clusters
    (sys.path hacks in the driver process don't propagate)."""
    try:
        app_id = spark.sparkContext.applicationId
        if app_id in _SHIPPED:
            return
        import shutil
        import tempfile

        zip_base = os.path.join(
            tempfile.mkdtemp(prefix="sdps_pkg_"), "stripe_data_pipeline_spark"
        )
        archive = shutil.make_archive(
            zip_base,
            "zip",
            root_dir=_REPO_ROOT,
            base_dir="stripe_data_pipeline_spark",
        )
        spark.sparkContext.addPyFile(archive)
        _SHIPPED.add(app_id)
    except Exception:  # noqa: BLE001 — never fail the harness on shipping
        pass


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY.md §2.9 daily revenue recognition) on sf0.001."""
    _apply_conf(spark)
    fn = QUERIES["revenue_trend_daily"].fn
    return fn(spark, "/root/testdata/sf0.001")


# The driver's CORRECTNESS run checks the first 50 entries of queries().
# Round-8 rotation: the 5 brand-new queries plus the 12 whose code
# paths this round's reworks touch lead the window, then the
# oldest-verdict rows (the r5-green media/atomic/LSH block) fill it
# to 50. Demoted past the cutoff: the r6- and r7-green rows — all
# stay CI-covered (tests/test_oracle_catalog.py full catalog at
# sf0.001; tools/check_oracle.py 0/174 at sf0.01 this round).
# tests/test_driver_contract.py enforces that nothing without any
# driver verdict sits outside the window.
_PRIORITY = [
    # --- ROUND-8 WINDOW (first 50; the driver checks these) ---
    # Ordering policy (VERDICT r5 #5, r7 #8): new/changed this round
    # first, then OLDEST driver verdict first. Newest r8 batch: the
    # unigram tokenizer family (train/segment/encode/fertility), the
    # CMS sketch pair, dHash image near-dups, PageRank, CCNet
    # buckets, UniMax budgets, normalization dedup, and the Q3/Q10
    # relational shapes. Earlier r8 batch below (persisted PQ/IVFPQ,
    # sa scrub, session windows, suffix sf1 slice), then the
    # word-level BPE / numpy-PQ / checkpoint-suffix reworks.
    "unigram_vocab_costs",
    "unigram_word_segments",
    "unigram_encoded_docs",
    "tokenizer_fertility_compare",
    "cms_token_estimates",
    "cms_merge_check",
    "media_dhash_near_dups",
    "pagerank_customer_supplier",
    "ccnet_perplexity_buckets",
    "unimax_lang_budgets",
    "normalized_dedup_keepers",
    "shipping_priority_q3ish",
    "returned_top_customers_q10ish",
    "pq_adc_topk_persisted",
    "ivfpq_topk_persisted",
    "sa_scrubbed_docs",
    "streaming_session_windows_mart_check",
    "suffix_array_ranks_scaled",
    "dsir_importance_weights",
    "gopher_quality_flags",
    "hamming_topk_signbit",
    "ivfpq_residual_topk",
    "grouping_sets_counts",
    "lsh_quality_keepers",
    "streaming_static_join_mart_check",
    "bpe_encoded_docs",
    "bpe_subword_vocab",
    "bpe_token_id_sequences",
    "packed_subword_sequences",
    "subword_sequences_mart_check",
    "subword_chunks",
    "pq_codes_profile",
    "pq_adc_topk",
    "ivfpq_topk",
    "suffix_array_ranks_check",
    "longest_repeat_spans_check",
    "span_scrubbed_docs",
    # last driver verdict: round 5 (oldest remaining) — leads the
    # window per the rotation rule; the first 33 rows fit, the rest
    # queue for r9
    "media_ulaw_decode_check",
    "media_adpcm_decode_check",
    "media_png_decode_check",
    "bloom_blocklist_filter",
    "atomic_recognized_mart_check",
    "batch_ivf_topk",
    "media_gif_decode_check",
    "atomic_dml_mart_check",
    "approx_distinct_parts",
    "hll_mergeable_user_counts",
    "media_features",
    "media_frame_samples",
    "minhash_lsh_candidates",
    "simhash_signatures",
    "jaccard_verify_lsh",
    "embedding_lsh_near_dups",
    "streaming_atomic_merge_mart_check",
    "scd2_customer_segments",
    "atomic_merge_mart_check",
    "incremental_agg_mart_check",
    "atomic_mart_change_feed",
    "stats_pruned_scan_check",
    "near_dup_jaccard_pairs",
    "dedup_clusters",
    "label_centroids_applyinpandas",
    "asof_join_events_orders",
    "orders_lineitem_join",
    "doc_text_stats",
    "doc_lang_id",
    "doc_quality_scores",
    "media_metadata",
    "doc_fingerprints",
    "dedup_exact_summary",
    "orders_rename_cast",
    "orders_status_filter",
    "orders_high_watermark",
    "dim_chain_join",
    "customer_orders_left_join",
    "customers_with_open_orders_semi",
    "customers_without_orders_anti",
    "doc_words_exploded_top20",
    "max_cursor",
    "pricing_summary",
    "latest_event_per_user",
    "top3_orders_per_status",
    "event_gaps",
    "top20_orders",
    # last driver verdict: round 6
    "streaming_stripe_source_mart_check",
    "media_rle_bmp_decode_check",
    "media_alaw_decode_check",
    "atomic_schema_evolution_mart_check",
    "atomic_time_travel_check",
    "atomic_partition_evolution_check",
    "kmeans_cluster_profile",
    "atomic_history_audit_check",
    "bm25_top_docs",
    "edit_distance_near_dups",
    "media_jpeg_decode_check",
    "media_mjpeg_decode_check",
    "doc_regex_tokens",
    "doc_first_last_token",
    "rollup_counts",
    "sessionized_events",
    "regional_revenue_q5ish",
    "sql_api_segment_revenue",
    "key_skew_report_events",
    "domain_capped_docs",
    "cross_doc_novelty",
    "cross_doc_novelty_hashed",
    "token_length_histogram",
    "array_agg_sorted",
    "embedding_near_dup_pairs",
    "approx_percentile_prices",
    "recognized_revenue_mart_check",
    "ivf_topk_persisted",
    "streaming_merge_mart_check",
    "dataset_split_assign",
    "deterministic_sample_docs",
    "per_group_sample_docs",
    "doc_tfidf_top_terms",
    "doc_chunks",
    "heldout_contamination",
    "pii_scrub",
    "embedding_quantize",
    "doc_repetition_metrics",
    "decontaminated_train_docs",
    "lang_rebalanced_sample",
    "quantized_topk",
    "corpus_curation_funnel",
    "streaming_dedup_mart_check",
    "boilerplate_ngrams",
    "heldout_contamination_hashed",
    "incremental_doc_mart_check",
    "token_rarity_scores",
    "semantic_dedup_keepers",
    "training_sequences_mart_check",
    "source_mix_plan",
    "streaming_windowed_counts_mart_check",
    "user_rfm_features",
    "semantic_split_leakage",
    "event_funnel_conversion",
    "weekly_retention_cohorts",
    "daily_value_anomalies",
    "column_null_audit",
    # last driver verdict: round 7 (newest — checked again last)
    "media_jpeg_ac_decode_check",
    "media_jpeg_420_decode_check",
    "bloom_blocklist_filter_persisted",
    "near_dup_quality_keepers",
    "quality_filtered_docs",
    "nation_presence_full_join",
    "order_value_ntiles",
    "lm_perplexity_scores",
    "streaming_interval_join_mart_check",
    "containment_near_dups",
    "bpe_merges_learned",
    "packed_sequences",
    "duplicate_span_stats",
    "duplicate_span_stats_hashed",
    "dataset_split_counts",
    "corpus_mix_summary",
    "media_bmp_decode_check",
    "vocab_overlap_hll_check",
    "media_wav_decode_check",
    "heavy_hitter_tokens",
    "media_resize_check",
    "zorder_key_check",
    "media_avi_decode_check",
    "price_percentiles",
    "events_rolling_hour_count",
    "grouped_stats",
    "conditional_functions",
    "orders_star_plus",
    "salted_skew_join",
    "events_hourly_windows",
    "running_value_per_user",
    "date_functions",
    "pivot_qty_by_status",
    "events_in_list",
    "json_extraction",
    "union_all_slices",
    "custkey_set_ops",
    "string_functions",
    "cube_counts",
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
    "pandas_udf_normalize",
    "dedup_exact_keepers",
    "cosine_topk_bruteforce",
    "ivf_topk",
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
