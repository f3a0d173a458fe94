"""Physical-plan audits: the plan *shape* is part of the contract.

Each assertion pins a scale property from ARCHITECTURE.md: filters
reach the parquet scan, small dims broadcast, calendar expansion never
becomes a nested-loop join, top-k never global-sorts, and the Python
boundary stays out of JVM-only pipelines.
"""

from __future__ import annotations


from stripe_data_pipeline_spark.catalog import QUERIES


def plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushed_to_scan(spark, sf_dir):
    p = plan(spark, sf_dir, "orders_status_filter")
    assert "PushedFilters: [" in p
    assert "EqualTo(o_orderstatus,F)" in p


def test_projection_prunes_scan_columns(spark, sf_dir):
    p = plan(spark, sf_dir, "top20_orders")
    # ReadSchema carries only the 3 projected columns
    assert "ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>" in p


def test_dim_joins_broadcast(spark, sf_dir):
    p = plan(spark, sf_dir, "dim_chain_join")
    assert p.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in p


def test_flagship_no_nested_loop_join(spark, sf_dir):
    p = plan(spark, sf_dir, "revenue_trend_daily")
    assert "BroadcastNestedLoopJoin" not in p  # sequence+explode, not cross join
    assert "CartesianProduct" not in p
    assert "Generate explode(sequence" in p  # the linear expansion
    assert "BroadcastHashJoin" in p  # FX dim
    assert "Scan ExistingRDD" not in p  # no Python-RDD dims
    assert "BatchEvalPython" not in p  # no row-at-a-time Python


def test_topk_uses_take_ordered(spark, sf_dir):
    p = plan(spark, sf_dir, "top20_orders")
    assert "TakeOrderedAndProject" in p
    assert "Sort [" not in p  # no global sort materialized


def test_asof_closed_form_has_no_generate(spark, sf_dir):
    p = plan(spark, sf_dir, "deferred_total_asof")
    assert "Generate" not in p  # closed-form: no per-day explode


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    p = plan(spark, sf_dir, "pricing_summary")
    assert "partial_sum" in p  # map-side combine
    assert p.count("Exchange") <= 2  # agg shuffle (+ order) only


def test_text_pipeline_stays_jvm(spark, sf_dir):
    for name in ("doc_text_stats", "doc_fingerprints", "near_dup_jaccard_pairs",
                 "minhash_lsh_candidates", "simhash_signatures"):
        p = plan(spark, sf_dir, name)
        assert "BatchEvalPython" not in p, name
        assert "ArrowEvalPython" not in p, name


def test_multimodal_is_arrow_not_row_python(spark, sf_dir):
    p = plan(spark, sf_dir, "media_features")
    assert "MapInPandas" in p  # Arrow-batched
    assert "BatchEvalPython" not in p  # never row-at-a-time


def test_asof_join_is_not_nested_loop(spark, sf_dir):
    p = plan(spark, sf_dir, "asof_join_events_orders")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    assert "Window" in p  # the union+window composition


def test_range_join_is_hash_join_not_bnlj(spark, sf_dir):
    p = plan(spark, sf_dir, "active_periods_per_month_start")
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # bucket equi-join resolved as a hash join
    assert "HashJoin" in p


def test_corpus_projections_have_no_exchange(spark, sf_dir):
    """Chunking / scrubbing / quantization are scan-fused narrow
    stages: zero shuffles at any scale."""
    for name in ("doc_chunks", "pii_scrub", "embedding_quantize"):
        p = plan(spark, sf_dir, name)
        assert "Exchange" not in p, name
        assert "BatchEvalPython" not in p, name
    # chunking is a Generate (linear expansion), not a join
    assert "Generate explode(sequence" in plan(spark, sf_dir, "doc_chunks")


def test_packed_sequences_single_group_exchange(spark, sf_dir):
    """Packing shuffles exactly once — the window exchange on the
    pack-group key (the parallelism knob at 100 TB)."""
    p = plan(spark, sf_dir, "packed_sequences")
    assert p.count("Exchange hashpartitioning(pack_group") == 1
    assert p.count("Exchange") == 1


def test_repetition_metrics_partial_aggregates(spark, sf_dir):
    """Both aggs partial-combine before their exchange, and the n-gram
    explode is a Generate, not a join."""
    p = plan(spark, sf_dir, "doc_repetition_metrics")
    assert "partial_count" in p or "partial_max" in p or "partial_sum" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_quantized_topk_take_ordered_both_stages(spark, sf_dir):
    """ADC candidates and the exact refine both keep top-k per
    partition (TakeOrderedAndProject) — the corpus is never globally
    sorted, and the candidate id set joins back via broadcast."""
    p = plan(spark, sf_dir, "quantized_topk")
    assert p.count("TakeOrderedAndProject") == 2
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_runtime_bloom_filter_reaches_fact_scan(spark, sf_dir):
    """Runtime bloom-filter join pruning (the 100 TB shuffle-join
    guard): with a selective dim filter and a non-broadcast join, the
    optimizer injects a might_contain(bloom) pre-filter on the FACT
    side, so most fact rows die at the scan instead of shuffling.
    Size thresholds are production-scale by default (10 GB application
    side) — lowered here only to let the tiny fixture trigger the same
    rewrite a real cluster sees."""
    import pyspark.sql.functions as F

    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_th = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy("o_orderpriority")
            .count()
        )
        p = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in p
        # the bloom probe sits on the lineitem (fact) branch
        fact_branch = p.split("lineitem.parquet")[0]
        assert "might_contain" in fact_branch
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_th,
        )


def test_domain_cap_windows_only_bucket_slivers(spark, sf_dir):
    """cap_per_group's skew guarantee: every corpus-row window is
    partitioned by (group, md5-prefix bucket), never by the group
    alone — a hot domain must not collapse into one window task."""
    import re

    p = plan(spark, sf_dir, "domain_capped_docs")
    # the corpus-row window (row_number) partitions by BOTH the group
    # and the md5-prefix bucket...
    rn_windows = [
        ln for ln in p.splitlines() if "row_number() windowspecdefinition" in ln
    ]
    assert rn_windows, "no row_number Window node found in the plan"
    for ln in rn_windows:
        assert re.search(r"windowspecdefinition\(source#\d+, __b#\d+", ln), ln
    # ...and the corpus exchange feeding it shuffles on (group, bucket),
    # so a hot domain spreads across 256 partitions instead of one task
    assert re.search(r"hashpartitioning\(source#\d+, __b#\d+", p), p


def test_duplicate_span_stats_linear_plan(spark, sf_dir):
    # span dedup must stay linear: gram agg partial-combines before
    # its exchange, no quadratic join surface, no Python.
    for name in ("duplicate_span_stats", "duplicate_span_stats_hashed"):
        p = plan(spark, sf_dir, name)
        assert "CartesianProduct" not in p, name
        assert "BatchEvalPython" not in p, name
        assert "partial_min" in p and "partial_max" in p, name
        assert "partial_sum" in p, name  # coverage agg combines map-side


def test_token_rarity_tf_branch_prunes_to_text(spark, sf_dir):
    # the term-frequency branch must not drag doc_id through the
    # token explode — Catalyst prunes its scan to the text column.
    p = plan(spark, sf_dir, "token_rarity_scores")
    assert "struct<text:string>" in p
    assert "BatchEvalPython" not in p


def test_semantic_dedup_keepers_no_cartesian(spark, sf_dir):
    p = plan(spark, sf_dir, "semantic_dedup_keepers")
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p


def test_spread_skips_exchange_on_already_parallel_input(spark, sf_dir):
    # _spread must round-robin a single-file scan but pass an
    # already-parallel source through untouched (at 100 TB the scan is
    # many files and the exchange would be a full-corpus shuffle).
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.corpus import _spread

    docs = read_table(spark, sf_dir, "documents")
    spread_plan = _spread(docs)._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in spread_plan  # single file -> spread

    wide = docs.repartition(64)
    assert _spread(wide) is wide  # no second exchange added


def test_bloom_blocklist_stays_jvm_and_broadcasts_refine(spark, sf_dir):
    """The bloom prefilter is pure codegen arithmetic in a scan-side
    Filter (no UDF, no shuffle for the definite-non-member branch);
    the exact refine joins only candidates against the BROADCAST
    blocklist — the corpus never shuffles."""
    p = plan(spark, sf_dir, "bloom_blocklist_filter")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastHashJoin" in p  # candidate refine vs tiny blocklist
    assert "SortMergeJoin" not in p
    # exactly ONE hash exchange: the blocklist's distinct (blocklist-
    # sized by assumption). The corpus branch itself never shuffles —
    # definite non-members flow filter-only from the scan.
    assert p.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(fingerprint" in p


def test_batch_ivf_has_no_cartesian_and_broadcasts_queries(spark, sf_dir):
    """Batched ANN stays equi-join shaped: probe selection and the
    candidate stage are hash joins (query side broadcast), never a
    nested-loop/cartesian product over the corpus."""
    p = plan(spark, sf_dir, "batch_ivf_topk")
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "BroadcastHashJoin" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_kmeans_assignment_is_map_side(spark, sf_dir):
    """The Lloyd assignment stage must be pure map-side — K fixed-point
    distance expressions + argmin evaluated in the scan's stage, with
    NO Exchange and NO Python boundary; the only shuffle in an
    iteration is the bounded (cluster,pos) centroid update."""
    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.kmeans import assign_clusters

    emb = read_table(spark, sf_dir, "embeddings")
    seeds = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    p = (
        assign_clusters(emb, seeds)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "FileScan parquet" in p


def test_bpe_encode_is_a_narrow_jvm_projection(spark, sf_dir):
    """The encode pass must be shuffle-free pure-JVM codegen: the
    merge list is plan literals applied via chained replace(), so the
    plan is Scan -> Filter/Project with NO Exchange, NO join, NO
    Python stage (ARCHITECTURE.md 'BPE encode pass')."""
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.bpe import encode_documents

    docs = read_table(spark, sf_dir, "documents")
    enc = encode_documents(docs, [("a", "b"), ("ab", "c")])
    p = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
                    "BroadcastNestedLoopJoin", "CartesianProduct"):
        assert join_op not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    # single narrow stage: scan -> filter -> project (higher-order
    # fns are interpreted JVM expressions, still no Python boundary)
    assert "FileScan parquet" in p and p.count("Scan") == 1


def test_bpe_id_lookup_is_a_map_literal_projection(spark, sf_dir):
    """Token-id assignment bakes the bounded vocab into the plan as a
    map literal: transform(subwords, t -> element_at(map, t)) — NO
    join, NO explode, NO regroup shuffle; the corpus never shuffles
    on the token key."""
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.bpe import (
        encode_documents,
        encode_documents_ids,
        subword_vocabulary,
    )

    docs = read_table(spark, sf_dir, "documents")
    enc = encode_documents(docs, [("a", "b")])
    ids = encode_documents_ids(enc, subword_vocabulary(enc))
    p = ids._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in p
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join_op not in p
    assert "Generate" not in p  # no posexplode of the token stream
    assert "keys:" in p or "map_from" in p or "element_at" in p


def test_bpe_word_level_encode_plan_shape(spark, sf_dir):
    """The r8 word-level encode (the shared plan under the whole
    encode family): the distinct-word table reaches the occurrence
    stream via a BROADCAST hash join (never a sort-merge — the
    Zipf-small vocabulary must not shuffle the corpus on the word
    key), and the only corpus-sized Exchanges are the word distinct
    and the one doc regroup. No Python anywhere."""
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.bpe import (
        encode_documents_by_word,
    )

    docs = read_table(spark, sf_dir, "documents")
    p = (
        encode_documents_by_word(docs, [("a", "b")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "ShuffledHashJoin" not in p
    # word-distinct + doc-regroup hash Exchanges plus the broadcast —
    # nothing else may shuffle
    assert p.count("Exchange hashpartitioning") == 2
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_span_scrub_rebuild_confined_to_trim_subset(spark, sf_dir):
    """span_scrubbed_docs: the union's keep branch must stay scan-side
    (no Generate/posexplode on the verbatim path) and the whole plan
    stays JVM-only."""
    p = plan(spark, sf_dir, "span_scrubbed_docs")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p
    assert "Union" in p  # keep-branch ∪ trim-branch


def test_persisted_bloom_plan_is_single_scan_broadcast_anti(spark, sf_dir):
    """The persisted-blocklist variant is the production shape: ONE
    corpus scan into a broadcast anti-join (no bloom union, no second
    fingerprint scan); the derive-inline variant keeps the bloom
    union shape for the non-broadcastable-blocklist regime."""
    p = plan(spark, sf_dir, "bloom_blocklist_filter_persisted")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p and "Union" not in p
    assert p.count("Scan parquet") == 2  # corpus once + blocklist artifact
    assert "BatchEvalPython" not in p
    p2 = plan(spark, sf_dir, "bloom_blocklist_filter")
    assert "xxhash64" in p2  # bloom probe in the filter expression
    assert "BroadcastHashJoin" in p2 and "LeftAnti" in p2
    assert "SortMergeJoin" not in p2


def test_pq_adc_scan_is_shuffle_free_takeordered(spark, sf_dir):
    """The ADC search plan: still narrow end to end — no Exchange,
    no join, top-k via TakeOrderedAndProject. The in-flight encode is
    the ONE Arrow-batched numpy stage (r8, VERDICT r7 #7 — the
    interpreted HOF argmins it replaced were 11x slower; measured
    2.42s -> 0.21s at sf0.1), never row-at-a-time Python; the
    persisted-index path below has no Python at all."""
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.pq import pq_topk, train_pq
    from stripe_data_pipeline_spark.operators.similarity import query_vector

    emb = read_table(spark, sf_dir, "embeddings")
    books = train_pq(emb, m=8, ks=8, iters=2)
    qv = query_vector(emb, 0)
    p = (
        pq_topk(emb, books, qv, k=10, exclude_id=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p
    for join_op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin"):
        assert join_op not in p
    assert "BatchEvalPython" not in p  # Arrow-batched encode only
    assert p.count("MapInPandas") == 1


def test_pq_persisted_search_plan_is_pure_jvm(spark, sf_dir, tmp_path):
    """pq_topk_from_index: the production search path reads the codes
    artifact and folds the literal ADC table — no Python of any kind,
    no Exchange, no join; scan projects ONLY (vec_id, codes)."""
    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.pq import (
        build_pq_index,
        pq_topk_from_index,
    )
    from stripe_data_pipeline_spark.operators.similarity import query_vector

    emb = read_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "pq_index")
    build_pq_index(emb, path)
    qv = query_vector(emb, 0)
    p = (
        pq_topk_from_index(spark, path, qv, k=10, exclude_id=0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p
    for py_op in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_op not in p
    assert "embedding" not in p  # 32x-smaller codes column only


def test_lm_scoring_plan_stays_jvm(spark, sf_dir):
    """lm_perplexity_scores: linear count+join plan, no per-row
    Python, no cartesian blowup (the only nested-loop join is the
    broadcast 1-row (N,V) singleton)."""
    p = plan(spark, sf_dir, "lm_perplexity_scores")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "CartesianProduct" not in p


def test_sorted_neighborhood_has_no_global_window(spark, sf_dir):
    """The global sort order must come from the exact offset-rank
    (range partition + per-partition row_number), never a
    single-partition global window — and the neighborhood join stays
    a Generate + equi-join."""
    p = plan(spark, sf_dir, "sorted_neighborhood_pairs")
    assert "Window [row_number()" not in p.replace(
        "Window [row_number() windowspecdefinition(__pid", ""
    )  # only the per-__pid local window survives (checkpointed away)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Generate explode(sequence" in p  # w-1 neighbor ranks


def test_udtf_plan_is_arrow_batched(spark, sf_dir):
    p = plan(spark, sf_dir, "udtf_doc_chunks")
    assert "ArrowEvalPythonUDTF" in p
    assert "BatchEvalPythonUDTF" not in p  # never row-pickled


def test_bitmap_distinct_has_partial_aggregation(spark, sf_dir):
    """The bitmap build must partial-combine below the exchange: the
    per-(type,bucket) bitmap_construct_agg appears in partial form so
    raw rows never shuffle as individual positions."""
    p = plan(spark, sf_dir, "bitmap_exact_distinct_check")
    assert "partial_bitmap_construct_agg" in p
    assert "CartesianProduct" not in p


def test_gap_fill_generates_spine_without_join_blowup(spark, sf_dir):
    p = plan(spark, sf_dir, "gap_filled_hourly_values")
    assert "Generate explode(sequence" in p  # the hour spine
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_interleave_has_no_global_sort(spark, sf_dir):
    """The round-robin position is a closed-form literal fold, so no
    stage may globally sort the corpus or funnel it through one
    partition (the only windows are per-__pid local ranks)."""
    p = plan(spark, sf_dir, "interleaved_training_order")
    assert "Exchange SinglePartition" not in p
    assert "TakeOrderedAndProject" not in p
    assert "aggregate(" in p  # the literal-array position fold


def test_recursive_cte_uses_union_loop(spark, sf_dir):
    """The recursive CTE must plan as Spark 4's native UnionLoop
    (semi-naive iteration inside the engine), not some driver-side
    unrolling — and the loop body must stay JVM-only."""
    p = plan(spark, sf_dir, "recursive_cte_components_check")
    assert "UnionLoop" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_html_extraction_is_single_projection(spark, sf_dir):
    """Main-content extraction must fuse into the scan: no KEYED
    shuffle, no Python boundary — one narrow projection at any scale.
    The r14 spread_scan adds a round-robin exchange on the
    single-file fixture only (a many-file crawl passes through), so
    the pin forbids hash/range exchanges rather than all exchanges."""
    p = plan(spark, sf_dir, "html_extracted_text_check")
    assert "Exchange hashpartitioning" not in p
    assert "Exchange rangepartitioning" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_warc_pipeline_no_shuffle_past_the_source(spark, sf_dir):
    """WARC -> HTML -> text must stay one projection pipeline over the
    per-file DataSource scan: no Exchange anywhere (the parallelism
    unit is the WARC file itself)."""
    p = plan(spark, sf_dir, "warc_html_pipeline_check")
    assert "Exchange" not in p


def test_sql_udf_is_catalyst_inlined(spark, sf_dir):
    """CREATE FUNCTION .. RETURN expr must inline into the JVM plan:
    the CASE/FLOOR bodies appear as plain expressions (partial agg
    over the substituted FLOOR, grouping on the substituted CASE) and
    no Python evaluation node exists — the SQL-UDF abstraction costs
    nothing at 100 TB, unlike a Python UDF doing the same math."""
    p = plan(spark, sf_dir, "sql_udf_check")
    assert "BatchEvalPython" not in p
    assert "ArrowEvalPython" not in p
    assert "CASE WHEN" in p  # order_tier body substituted
    assert "FLOOR" in p  # to_cents body substituted
    assert "partial_count" in p or "partial_sum" in p  # map-side combine


def test_pipe_syntax_lowers_to_the_ansi_plan(spark, sf_dir):
    """The |> chain is surface syntax only: the executed plan has the
    same shape as the ANSI text — shipdate filter pushed to the scan,
    partial+final HashAggregate pair, no extra exchanges or
    materialization between pipe stages."""
    p = plan(spark, sf_dir, "sql_pipe_syntax_check")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p
    assert "partial_count" in p or "partial_sum" in p
    assert p.count("Exchange") == 1  # one shuffle: the group-by


def test_sql_scripting_result_is_eager_local_relation(spark, sf_dir):
    """BEGIN..END executes EAGERLY at spark.sql() time: each
    statement (the scalar probe, the final grouped SELECT) runs as
    its own ordinary Catalyst plan during interpretation, and the
    returned relation is the LAST statement's materialized result —
    a LocalTableScan bounded by the GROUP count, never raw rows.
    Pin exactly that: local result, zero Python nodes, zero scans in
    the returned plan (the data work already happened JVM-side)."""
    p = plan(spark, sf_dir, "sql_scripting_check")
    assert "LocalTableScan" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "FileScan" not in p and "Exchange" not in p


def test_url_canonicalize_is_jvm_projection_plus_one_exchange(
    spark, sf_dir
):
    """The crawl-frontier dedup shape: canonicalization must fuse into
    the scan as a regexp projection (zero Python), and the dedup is
    exactly one shuffle on the canonical key with map-side partial
    aggregation — linear in corpus size, no pairwise anything."""
    p = plan(spark, sf_dir, "url_canonical_dedup_check")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "regexp_replace" in p  # the normalizer inlined, not opaque
    assert "partial_count" in p or "partial_min" in p
    # exactly ONE hash exchange (the canonical-key group-by); the
    # r14 spread_scan adds at most one round-robin exchange of the
    # raw urls on the single-file fixture only (a many-file frontier
    # scan passes through with no extra exchange), so pin the keyed
    # exchange counts instead of the raw count.
    assert p.count("Exchange hashpartitioning") == 1
    assert p.count("Exchange rangepartitioning") == 0
    assert p.count("Exchange RoundRobinPartitioning") <= 1
    assert "CartesianProduct" not in p


def test_expectation_check_reads_have_no_python_and_no_bnlj(
    spark, sf_dir
):
    """The quarantine-mart read-back: two manifest scans + grouped
    profiles. No Python boundary, no nested-loop join — the gate's
    cost lives at WRITE time (one flag-count aggregate per merge),
    the read path is ordinary scans."""
    p = plan(spark, sf_dir, "expectation_quarantine_check")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p


def test_quarantine_lifecycle_reads_have_no_python_and_no_bnlj(
    spark, sf_dir
):
    """The lifecycle check's read path (r14): main + surviving-capture
    manifest scans with grouped profiles, plus a 1-row LOCAL audit
    relation from history() — metadata, zero Spark jobs. The clear
    itself is a metadata-only commit, so nothing here may introduce a
    Python boundary or a nested-loop join."""
    p = plan(spark, sf_dir, "quarantine_lifecycle_check")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "CartesianProduct" not in p
    # the audit row rides as metadata: a folded literal relation
    # (OneRowRelation or LocalTableScan), never a Python RDD scan
    assert "OneRowRelation" in p or "LocalTableScan" in p
    assert "ExistingRDD" not in p


def test_frontier_schedule_single_host_exchange(spark, sf_dir):
    """The politeness scheduler (r14): canonicalization fuses into the
    scan as a regexp projection (zero Python), the host window is the
    ONLY shuffle, and the grouped profile reuses its partitioning
    (host is a prefix of the grouping key) — one exchange total, the
    host-locality layout a fetch fleet wants at 100 TB."""
    p = plan(spark, sf_dir, "crawl_frontier_schedule_check")
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "regexp_replace" in p  # canonicalizer inlined
    assert "RunningWindowFunction" in p or "Window" in p
    assert p.count("Exchange") == 1  # the host partition, reused
    assert "CartesianProduct" not in p
