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
# Round-14 rotation (policy per VERDICT r5 #5 / r11 #1 / r12 #1 / r13
# #1, enforced by tests/test_driver_contract.py): after r13 the stale
# backlog is EXACTLY one window — the 50 queries whose latest driver
# verdict is round 8 fill slots 1-42 plus the displaced leaders, with
# the eight new r14 catalog rows (arrow_ipc_roundtrip_check,
# avro_roundtrip_check, crawl_frontier_schedule_check,
# incremental_dedup_check, nb_quality_scores,
# quarantine_lifecycle_check, streaming_incremental_dedup_check,
# tfrecord_roundtrip_check — never verified, must sit inside the
# window) taking slots 43-50 and displacing the youngest r8 entries
# (subword_sequences_mart_check, suffix_array_ranks_check,
# suffix_array_ranks_scaled, tokenizer_fertility_compare,
# unigram_encoded_docs, unigram_vocab_costs, unigram_word_segments,
# unimax_lang_budgets) to the top of the continuation, where they
# LEAD the r15 window. Below the window the
# list continues strictly oldest-verdict-first (r9, r10, r11, r12,
# r13), so future rotations stay mechanical: move the just-verified
# window to the bottom, keep new queries inside the first 50. Every
# query is additionally re-verified each round by the full-catalog
# DuckDB sweep inside pytest.
_PRIORITY = [
    # --- latest driver verdict: round 8 ---
    "approx_distinct_parts",
    "atomic_dml_mart_check",
    "atomic_recognized_mart_check",
    "batch_ivf_topk",
    "bloom_blocklist_filter",
    "bpe_encoded_docs",
    "bpe_subword_vocab",
    "bpe_token_id_sequences",
    "ccnet_perplexity_buckets",
    "cms_merge_check",
    "cms_token_estimates",
    "dsir_importance_weights",
    "gopher_quality_flags",
    "grouping_sets_counts",
    "hamming_topk_signbit",
    "hll_mergeable_user_counts",
    "ivfpq_residual_topk",
    "ivfpq_topk",
    "ivfpq_topk_persisted",
    "longest_repeat_spans_check",
    "lsh_quality_keepers",
    "media_adpcm_decode_check",
    "media_dhash_near_dups",
    "media_features",
    "media_frame_samples",
    "media_gif_decode_check",
    "media_png_decode_check",
    "media_ulaw_decode_check",
    "minhash_lsh_candidates",
    "normalized_dedup_keepers",
    "packed_subword_sequences",
    "pagerank_customer_supplier",
    "pq_adc_topk",
    "pq_adc_topk_persisted",
    "pq_codes_profile",
    "returned_top_customers_q10ish",
    "sa_scrubbed_docs",
    "shipping_priority_q3ish",
    "span_scrubbed_docs",
    "streaming_session_windows_mart_check",
    "streaming_static_join_mart_check",
    "subword_chunks",
    # --- slots 43-50: the new r14 catalog rows (never-verified rows
    # must sit inside the window; the contract test enforces it) ---
    "arrow_ipc_roundtrip_check",
    "avro_roundtrip_check",
    "crawl_frontier_schedule_check",
    "incremental_dedup_check",
    "nb_quality_scores",
    "quarantine_lifecycle_check",
    "streaming_incremental_dedup_check",
    "tfrecord_roundtrip_check",
    # --- below the 50-query window: displaced r8 leaders, then the
    # oldest-first continuation ---
    "subword_sequences_mart_check",
    "suffix_array_ranks_check",
    "suffix_array_ranks_scaled",
    "tokenizer_fertility_compare",
    "unigram_encoded_docs",
    "unigram_vocab_costs",
    "unigram_word_segments",
    "unimax_lang_budgets",
    # --- latest driver verdict: round 9 ---
    "ann_recall_check",
    "bleu_pair_scores",
    "bpe_roundtrip_check",
    "char_entropy_scores",
    "cheapest_part_per_type_q2ish",
    "customer_order_distribution_q13ish",
    "discount_revenue_q6ish",
    "disjunctive_parts_revenue_q19ish",
    "hist_quantile_merge_check",
    "hist_quantile_prices",
    "idle_rich_customers_q22ish",
    "important_nation_balances_q11ish",
    "incremental_hist_mart_check",
    "kmv_distinct_sketch_check",
    "large_volume_orders_q18ish",
    "linestatus_priority_q12ish",
    "maxsim_late_interaction_topk",
    "media_audio_features_check",
    "media_spectral_hash_near_dups",
    "nation_market_share_q8ish",
    "nation_profit_q9ish",
    "nation_volume_shipping_q7ish",
    "parts_supplier_counts_q16ish",
    "pmi_collocations",
    "preference_pair_prep",
    "priority_order_counts_q4ish",
    "promo_part_suppliers_q20ish",
    "promo_revenue_share_q14ish",
    "rrf_hybrid_topk",
    "segment_dedup_docs",
    "semdedup_keepers",
    "small_quantity_revenue_q17ish",
    "sole_returning_supplier_q21ish",
    "span_corruption_pairs",
    "streaming_outer_join_mart_check",
    "streaming_stateful_latest_mart_check",
    "stupid_backoff_scores",
    "top_supplier_revenue_q15ish",
    "triangle_counts_supplier",
    "weighted_sample_docs",
    "wordpiece_encoded_docs",
    "wordpiece_merges_learned",
    "wordpiece_unk_stats",
    "zipf_fit_tokens",
    # --- latest driver verdict: round 10 ---
    "active_periods_per_month_start",
    "array_functions_check",
    "atomic_clone_check",
    "atomic_constraint_mart_check",
    "atomic_mart_change_feed",
    "atomic_merge_mart_check",
    "atomic_mor_cdf_check",
    "atomic_mor_delete_check",
    "bm25_top_docs",
    "bytebpe_encoded_docs",
    "bytebpe_roundtrip_check",
    "calendar_dim",
    "column_null_audit",
    "cosine_topk_bruteforce",
    "cube_counts",
    "curated_line_items",
    "daily_value_anomalies",
    "dedup_exact_keepers",
    "deferred_by_customer_asof",
    "deferred_total_asof",
    "event_funnel_conversion",
    "fx_literal_dim",
    "hard_negatives_inbatch",
    "hilbert_key_check",
    "incremental_cms_mart_check",
    "incremental_join_mart_check",
    "incremental_kmv_mart_check",
    "ivf_topk",
    "label_propagation_communities",
    "lateral_topk_per_order",
    "map_functions_check",
    "missing_period_end_threshold",
    "orc_roundtrip_check",
    "semantic_dedup_keepers",
    "semantic_split_leakage",
    "source_mix_plan",
    "streaming_atomic_merge_mart_check",
    "streaming_full_outer_join_mart_check",
    "streaming_mor_delete_mart_check",
    "streaming_windowed_counts_mart_check",
    "streaming_wm_dedup_mart_check",
    "textrank_keywords",
    "token_rarity_scores",
    "training_sequences_mart_check",
    "user_rfm_features",
    "variant_shredding_check",
    "weekly_retention_cohorts",
    "winnowing_fingerprints",
    "winnowing_shared_pairs",
    # --- latest driver verdict: round 11 ---
    "asof_join_events_orders",
    "atomic_column_rename_check",
    "atomic_two_mart_txn_check",
    "bitmap_exact_distinct_check",
    "crypto_functions_check",
    "customer_orders_left_join",
    "customers_with_open_orders_semi",
    "customers_without_orders_anti",
    "dedup_clusters",
    "dedup_exact_summary",
    "dim_chain_join",
    "doc_fingerprints",
    "doc_lang_id",
    "doc_quality_scores",
    "doc_text_stats",
    "doc_words_exploded_top20",
    "embedding_lsh_near_dups",
    "event_gaps",
    "fim_transform_pairs",
    "gap_filled_hourly_values",
    "incremental_agg_mart_check",
    "interleaved_training_order",
    "jaccard_verify_lsh",
    "kneser_ney_scores",
    "label_centroids_applyinpandas",
    "latest_event_per_user",
    "matryoshka_topk_check",
    "max_cursor",
    "media_metadata",
    "near_dup_jaccard_pairs",
    "orders_high_watermark",
    "orders_lineitem_join",
    "orders_rename_cast",
    "orders_status_filter",
    "pandas_udf_normalize",
    "pricing_summary",
    "recognized_monthly_halfopen",
    "recognized_quarter_calendar",
    "revenue_trend_daily",
    "scd2_customer_segments",
    "simhash_signatures",
    "sorted_neighborhood_pairs",
    "stats_pruned_scan_check",
    "streaming_tws_latest_mart_check",
    "top20_orders",
    "top3_orders_per_status",
    "udtf_doc_chunks",
    "url_functions_check",
    "winnowing_fingerprints_fast",
    "xml_shredding_check",
    # --- latest driver verdict: round 12 ---
    "approx_percentile_prices",
    "array_agg_sorted",
    "atomic_partition_evolution_check",
    "atomic_schema_evolution_mart_check",
    "atomic_time_travel_check",
    "bloom_pruned_scan_check",
    "boilerplate_ngrams",
    "corpus_curation_funnel",
    "cross_doc_novelty",
    "dataset_split_assign",
    "datasketches_hll_check",
    "decontaminated_train_docs",
    "deterministic_sample_docs",
    "doc_chunks",
    "doc_regex_tokens",
    "doc_repetition_metrics",
    "doc_tfidf_top_terms",
    "domain_capped_docs",
    "edit_distance_near_dups",
    "embedding_near_dup_pairs",
    "generated_column_check",
    "heldout_contamination",
    "html_extracted_text_check",
    "incremental_doc_mart_check",
    "ivf_topk_persisted",
    "key_skew_report_events",
    "kmeans_cluster_profile",
    "lang_rebalanced_sample",
    "media_jpeg_decode_check",
    "media_rle_bmp_decode_check",
    "per_group_sample_docs",
    "pii_scrub",
    "pos_delete_check",
    "quantized_topk",
    "recognized_revenue_mart_check",
    "recursive_cte_components_check",
    "regional_revenue_q5ish",
    "robots_filtered_crawl_check",
    "rollup_counts",
    "sessionized_events",
    "sql_api_segment_revenue",
    "sql_pipe_syntax_check",
    "sql_udf_check",
    "statestore_reader_check",
    "streaming_cdf_source_mart_check",
    "streaming_dedup_mart_check",
    "streaming_stripe_source_mart_check",
    "streaming_tws_bootstrap_mart_check",
    "token_length_histogram",
    "warc_html_pipeline_check",
    # --- latest driver verdict: round 13 ---
    "atomic_history_audit_check",
    "cross_doc_novelty_hashed",
    "doc_first_last_token",
    "embedding_quantize",
    "heldout_contamination_hashed",
    "media_alaw_decode_check",
    "media_mjpeg_decode_check",
    "streaming_merge_mart_check",
    "bloom_blocklist_filter_persisted",
    "bpe_merges_learned",
    "conditional_functions",
    "containment_near_dups",
    "corpus_mix_summary",
    "custkey_set_ops",
    "dataset_split_counts",
    "date_functions",
    "duplicate_span_stats",
    "duplicate_span_stats_hashed",
    "events_hourly_windows",
    "events_in_list",
    "events_rolling_hour_count",
    "grouped_stats",
    "heavy_hitter_tokens",
    "json_extraction",
    "lm_perplexity_scores",
    "media_avi_decode_check",
    "media_bmp_decode_check",
    "media_jpeg_420_decode_check",
    "media_jpeg_ac_decode_check",
    "media_resize_check",
    "media_wav_decode_check",
    "nation_presence_full_join",
    "near_dup_quality_keepers",
    "order_value_ntiles",
    "orders_star_plus",
    "packed_sequences",
    "pivot_qty_by_status",
    "price_percentiles",
    "quality_filtered_docs",
    "running_value_per_user",
    "salted_skew_join",
    "streaming_interval_join_mart_check",
    "string_functions",
    "union_all_slices",
    "vocab_overlap_hll_check",
    "zorder_key_check",
    "expectation_quarantine_check",
    "sql_scripting_check",
    "url_canonical_dedup_check",
    "streaming_expectation_mart_check",
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
