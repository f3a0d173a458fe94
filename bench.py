"""Benchmark harness — driver contract.

Times the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints TWO JSON
lines: first a detail line {"detail": "per_query_sec", "queries":
{name: sec}, "sf1_spot": ...}, then a compact (<1 KB) final summary
line {"metric": ..., "value": total_sec, "unit": "sec", "sf": ...,
"regressions": [...], "n_queries": N} — the driver captures only the
last 2000 chars of stdout and parses the final line, so the summary
must stay small (BENCH_r05 lost its parse to a 2.9 KB single line).

Each query is fully executed via the noop sink (computes every output
column, unlike count() which lets Catalyst prune the projection), and
timed as the min of $SPARK_GRAFT_BENCH_RUNS (default 3) runs —
steady-state plan cost, not cold-JIT/external-load noise.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from stripe_data_pipeline_spark.catalog import QUERIES  # noqa: E402
from stripe_data_pipeline_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "revenue_trend_daily",
    "deferred_total_asof",
    "recognized_monthly_halfopen",
    "curated_line_items",
    "pricing_summary",
    "orders_lineitem_join",
    "regional_revenue_q5ish",
    "latest_event_per_user",
    "sessionized_events",
    "top20_orders",
    "doc_text_stats",
    "dedup_exact_keepers",
    "near_dup_jaccard_pairs",
    "minhash_lsh_candidates",
    "cosine_topk_bruteforce",
    "ivf_topk",
    "embedding_near_dup_pairs",
    "approx_percentile_prices",
    # corpus-prep family (added round 3; unpinned until BENCH_r03)
    "doc_chunks",
    "packed_sequences",
    "heldout_contamination",
    "doc_repetition_metrics",
    "quantized_topk",
    # round-3 additions (unpinned until the next baseline refresh);
    # heldout_contamination_hashed (the 8-byte-key scale twin of
    # heldout_contamination) was DEMOTED to pytest-only coverage in
    # r13 (VERDICT r12 #7): the hash-swap win it demonstrated has been
    # on record since r3, both variants share every stage but the key
    # projection, and the base variant keeps its pin.
    "domain_capped_docs",
    "cross_doc_novelty_hashed",
    "token_length_histogram",
    # the production ANN path: run 1 builds+caches the centroid index,
    # run 2 is probe-only — min-of-N reports the steady-state probe
    "ivf_topk_persisted",
    # round-3 second batch: exact-substring span metric + unigram-LM
    # rarity signal (both linear, shingle/token-keyed shuffles)
    "duplicate_span_stats",
    "token_rarity_scores",
    # round-4 additions (VERDICT r3 task #7): the r3 second-wave
    # analytics family — oracle-green since r3 but previously unpinned,
    # so a plan regression would have gone unnoticed
    "event_funnel_conversion",
    "weekly_retention_cohorts",
    "daily_value_anomalies",
    "column_null_audit",
    "user_rfm_features",
    "semantic_split_leakage",
    # round-4 additions: sketch-algebra overlap estimation (one corpus
    # pass, three constant-size sketches) and the real-BMP decode path
    # (mapInPandas encode->decode under a checksum oracle)
    "vocab_overlap_hll_check",
    "media_bmp_decode_check",
    # no-vocabulary-shuffle exact frequent items + the WAV decode path
    "heavy_hitter_tokens",
    "media_wav_decode_check",
    # Morton-interleave clustering key (pure codegen expression tree)
    "zorder_key_check",
    # round-5 additions: the compressed-codec decode path (PNG encode ->
    # zlib inflate + scanline unfiltering inside mapInPandas) and the
    # bloom-prefiltered blocklist anti-join (corpus-shuffle-free)
    "media_png_decode_check",
    "bloom_blocklist_filter",
    # batched ANN: many queries, one distributed plan, no per-query
    # driver round trips
    "batch_ivf_topk",
    # the second compressed codec: real greedy LZW encode -> decode
    "media_gif_decode_check",
    # the third compressed codec, first DCT one: baseline JPEG
    # Huffman+IDCT encode -> decode under the exact DC-only oracle
    "media_jpeg_decode_check",
    # compressed audio (G.711 mu-law closed-form-oracled expansion;
    # IMA ADPCM predictive state machine) and compressed video
    # (Motion-JPEG container walk + frame decode)
    "media_ulaw_decode_check",
    "media_adpcm_decode_check",
    "media_mjpeg_decode_check",
    # round-6 additions: the fourth compressed image codec (BI_RLE8
    # palettized run-length encode -> byte-pair escape-walk decode)
    # and the A-law sibling of the mu-law check (format 6, closed-form
    # compand->expand oracle)
    "media_rle_bmp_decode_check",
    "media_alaw_decode_check",
    # distributed k-means: two Lloyd iterations, map-side fixed-point
    # argmin + one bounded (cluster,pos) groupBy per iteration
    "kmeans_cluster_profile",
    # Okapi BM25 ranking: one explode scan -> TF/DF/dl aggs, broadcast
    # query terms, bounded global top-k
    "bm25_top_docs",
    # edit-distance dedup: capped (lang, first-token) blocks, JVM
    # levenshtein pairs
    "edit_distance_near_dups",
    # round-7 additions (VERDICT r6): the BPE encode pass (train ->
    # narrow replace-chain projection; the ids variant folds a cached
    # vocab map literal, no join), subword-count packing, the
    # span-REMOVAL transform, the exact-AC/ZRL/restart JPEG check, and
    # the persisted-blocklist bloom path
    "bpe_encoded_docs",
    "bpe_token_id_sequences",
    "packed_subword_sequences",
    "span_scrubbed_docs",
    "media_jpeg_ac_decode_check",
    "bloom_blocklist_filter_persisted",
    # round-7 second batch: the 4:2:0 color JPEG path, quality-aware
    # near-dup keeper selection, percentile-adaptive quality filtering,
    # and NTILE bucketing
    "media_jpeg_420_decode_check",
    "near_dup_quality_keepers",
    "quality_filtered_docs",
    "order_value_ntiles",
    # round-7 third batch: product quantization — fused-subspace
    # k-means training/encode profile and the ADC lookup-table search
    "pq_codes_profile",
    "pq_adc_topk",
    # bigram-LM perplexity scoring (the CCNet filter signal)
    "lm_perplexity_scores",
    # IVFPQ: coarse label probe + PQ ADC over candidates only
    "ivfpq_topk",
    # context windows in tokenizer space (encode -> explode(sequence))
    "subword_chunks",
    # round-8 additions (VERDICT r7 #2): the persisted-PQ serving
    # shapes — codebooks + label-partitioned codes built once, query
    # time is a codes-column scan + literal ADC fold (no training,
    # no encode, no Python)
    "pq_adc_topk_persisted",
    "ivfpq_topk_persisted",
    # r8: the LSH-verified near-dup pipeline (the documented scale
    # default; near_dup_jaccard_pairs stays benched as the
    # capped-block demo), the corpus-fraction suffix-array slice, and
    # the suffix-array-driven span scrub
    "jaccard_verify_lsh",
    "suffix_array_ranks_scaled",
    "sa_scrubbed_docs",
    # r8 second batch: DSIR importance weights (Xie et al. 2023 -
    # target-vs-raw unigram log-ratio selection) and the Gopher
    # rule-based quality pre-filter (Rae et al. 2021)
    "dsir_importance_weights",
    "gopher_quality_flags",
    # r8 third batch: sign-bit Hamming first-pass retrieval and the
    # residual-encoding IVFPQ (the actual FAISS IndexIVFPQ recipe)
    "hamming_topk_signbit",
    "ivfpq_residual_topk",
    # explicit GROUPING SETS: one Expand-operator pass for two slices
    # + grand total
    "grouping_sets_counts",
    # the COMPLETE production dedup pipeline: LSH-verified edges ->
    # components -> quality keeper (near_dup_quality_keepers is the
    # same keeper over the capped-block demo edges)
    "lsh_quality_keepers",
    # r8 fourth batch: the unigram-tokenizer encode (train cached per
    # corpus like the BPE merges — min-of-N reports the steady
    # word-level join-back encode), the CMS sketch build+probe (one
    # corpus pass into a fixed 4x256 grid), the dHash image near-dup
    # path (real BMP decode + guaranteed-recall banding), 5-round
    # fixed-point PageRank, CCNet per-lang perplexity tertiles, and
    # the two classic TPC-H join shapes
    "unigram_encoded_docs",
    "cms_token_estimates",
    "media_dhash_near_dups",
    "pagerank_customer_supplier",
    "ccnet_perplexity_buckets",
    "shipping_priority_q3ish",
    "returned_top_customers_q10ish",
    # round-9 additions: SemDeDup (kmeans clusters + within-cluster
    # cosine domination prune), reciprocal-rank hybrid fusion (two
    # bounded top-100 retrieval stages + a 100-row fuse), the
    # deterministic fixed-grid quantile sketch, winnowing MOSS
    # fingerprints (w-bounded explode + one (doc,window) groupBy) and
    # their capped overlap pairs, and two more TPC-H join shapes.
    # winnowing_fingerprints (the md5 variant, 3.8s/bench) was DEMOTED
    # to pytest-only coverage in r13 (VERDICT r12 #7): the xxhash64
    # path winnowing_fingerprints_fast keeps both the sf0.1 and sf1
    # pins, the md5-vs-xxhash win it existed to demonstrate has held
    # for three straight rounds (35.9 vs 25.0 at sf1), and the plan
    # shapes are identical per PLANS.md.
    "semdedup_keepers",
    "rrf_hybrid_topk",
    "hist_quantile_prices",
    "winnowing_shared_pairs",
    "promo_revenue_share_q14ish",
    "large_volume_orders_q18ish",
    # round-9 second batch: the remaining TPC-H decorrelation shapes
    # (correlated-AVG Q17, left-join-histogram Q13, grouped-argmin Q2,
    # double-EXISTS Q21 folded to one per-order agg, global-scalar
    # HAVING Q11, market-share Q8), CCNet segment-level dedup (one
    # shuffle on the segment key), T5 span corruption (three window
    # passes over one sort), the BPE decode round-trip (narrow fold
    # over the cached-tokenizer encode), and the WHT spectral pHash
    # (banded pigeonhole pairs, same plan family as dHash)
    "small_quantity_revenue_q17ish",
    "customer_order_distribution_q13ish",
    "cheapest_part_per_type_q2ish",
    "sole_returning_supplier_q21ish",
    "important_nation_balances_q11ish",
    "nation_market_share_q8ish",
    "segment_dedup_docs",
    "span_corruption_pairs",
    "bpe_roundtrip_check",
    "media_spectral_hash_near_dups",
    # round-9 third batch: the four shapes completing ALL 22 TPC-H
    # query patterns (pure-pushdown Q6, LIKE-filtered profit Q9,
    # conditional-count Q12, nested-semi Q20) and the DPO preference-
    # pair construction (cluster argmax/argmin over the shared cached
    # kmeans partitioning). Streaming marts stay out by convention.
    "discount_revenue_q6ish",
    "nation_profit_q9ish",
    "linestatus_priority_q12ish",
    "promo_part_suppliers_q20ish",
    "preference_pair_prep",
    # round-9 fourth batch: WordPiece — the tokenizer-trio completion
    # (BPE + unigram + WordPiece). Training is one corpus groupBy +
    # the bounded-vocab fixpoint; the encode is 16 unrolled JVM
    # MaxMatch projections over DISTINCT words + a broadcast join-back
    # (the word-level shape). The three queries share one cached
    # tokenizer artifact per corpus dir, like the BPE family.
    # wordpiece_unk_stats (2.6s/bench) was DEMOTED to pytest-only
    # coverage in r13 (VERDICT r12 #7): it is a grouped profile over
    # the SAME cached-tokenizer encode that wordpiece_encoded_docs
    # times (which also carries the family's sf1 pin) — the bench
    # learned nothing from timing the projection twice.
    "wordpiece_merges_learned",
    "wordpiece_encoded_docs",
    # round-9 fifth batch: graph depth (exactly-once wedge-close
    # triangle enumeration over the dim-bounded co-order supplier
    # graph; TextRank = the pagerank power iteration over the word
    # co-occurrence graph, rank vector broadcast per round), KMV
    # theta-sketch distinct/union/intersection estimates (one
    # distinct shuffle, k-row state per set), and ColBERT MaxSim
    # late interaction (8 literal query folds on one scan + one
    # groupBy(label) of fixed-point maxes).
    "triangle_counts_supplier",
    "textrank_keywords",
    "kmv_distinct_sketch_check",
    "maxsim_late_interaction_topk",
    # ... plus BLEU-2 over the LSH candidate pairs (clipped-count
    # gram joins on (doc, gram), never all-pairs) and the audio
    # signal features over the real WAV decode path (Arrow-batched,
    # one pass, no shuffle).
    "bleu_pair_scores",
    "media_audio_features_check",
    # round-10 additions: the xxhash64 winnowing path (must bench
    # BELOW the md5 variant — the hash constant was the heaviest sf1
    # query's dominant cost), Spark-4 VARIANT shredding round trip,
    # synchronous label-propagation communities (one edges×labels
    # broadcast join + two partial-combined groupBys per round over
    # the dim-bounded supplier graph), and in-batch hard-negative
    # mining (batch_size²-bounded pair work, one max(struct) argmax).
    # The streamed-CDC MOR mart and the change-feed check stay out of
    # HEADLINE by the streaming/atomic-mart convention.
    "winnowing_fingerprints_fast",
    "variant_shredding_check",
    "label_propagation_communities",
    "hard_negatives_inbatch",
    # round-10 second batch: byte-level BPE (the GPT-2 tokenizer
    # family — one corpus shuffle to the pretoken-frequency table,
    # driver fixpoint under the bounded-vocab threshold, DISTINCT-
    # pretoken encode broadcast-joined back) + its decode law.
    "bytebpe_encoded_docs",
    "bytebpe_roundtrip_check",
    # round-10 third batch: the ORC source/sink equivalence check
    # (the incremental KMV mart stays out per the mart convention).
    "orc_roundtrip_check",
    # round-10 fourth batch: the correlated-LATERAL top-k SQL shape
    # and the MAP-type scalar family.
    "lateral_topk_per_order",
    "map_functions_check",
    "array_functions_check",
    # round-11 addition: the Python UDTF chunker — benched so the
    # Arrow-batched lateral stage's cost stays visible next to the
    # JVM Generate it mirrors (doc_chunks). The rename / group-txn /
    # transformWithState marts stay out per the atomic/streaming-mart
    # convention; winnowing_fingerprints_fast keeps its pin with the
    # invariant-emitting body (re-measured 3.27 standalone vs 3.9 pin).
    "udtf_doc_chunks",
    # round-11 second batch: sorted-neighborhood blocking (exact-rank
    # sort + integer-keyed neighborhood join + Jaccard verify), the
    # bitmap exact-distinct family (the exact counterpart to the HLL
    # sketch — mergeability law included), and the XML / URL / AES
    # scalar families. The rename/group-txn/TWS marts stay out per
    # the atomic/streaming-mart convention.
    "sorted_neighborhood_pairs",
    "bitmap_exact_distinct_check",
    "xml_shredding_check",
    "url_functions_check",
    "crypto_functions_check",
    # round-11 third batch: the hourly forward-fill resample (dense
    # spine Generate + per-user last(ignoreNulls) frame) and the
    # round-robin domain interleave (exact offset ranks + closed-form
    # position fold — no global sort).
    "gap_filled_hourly_values",
    "interleaved_training_order",
    # round-11 fourth batch: the FIM pretraining transform (narrow
    # slice/concat projection), Kneser-Ney bigram smoothing (one
    # bigram groupBy feeding all four count relations), and the
    # matryoshka-truncation retrieval check (two exact folds + two
    # bounded top-10s).
    "fim_transform_pairs",
    "kneser_ney_scores",
    "matryoshka_topk_check",
    # round-12: the raw-web -> text pipeline head (single fused
    # projection — its cost IS the regex engine), the SQL-surface
    # recursive CTE (UnionLoop iteration), the built-in Datasketches
    # row (two scans + constant-size buffer algebra), and the Bloom
    # file-skipping probe (mart cached; the probe path is pure-Python
    # file pruning + a one-file scan). The state-store reader and the
    # TWS bootstrap stay out per the streaming-mart convention.
    "html_extracted_text_check",
    # ...and the bytes-on-disk layer beneath it: WARC shards written
    # once by the executors (fixture cached), then the per-file-
    # partitioned Python DataSource read + HTTP parse + extraction
    "warc_html_pipeline_check",
    "recursive_cte_components_check",
    "datasketches_hll_check",
    "bloom_pruned_scan_check",
    # round-12 second batch: the two Spark-4 SQL-surface rows — pipe
    # syntax (one-exchange aggregate, same plan as the ANSI text) and
    # Catalyst-inlined SQL UDFs (one scan + one exchange) — plus the
    # positional deletion-vector mart read (marts cached; the timed
    # path is two manifest scans, one with the (file,row_idx)
    # anti-join, and the grouped profile).
    "sql_pipe_syntax_check",
    "sql_udf_check",
    "pos_delete_check",
    # ...and the generated-column mart read (mart cached; the timed
    # path is one manifest scan + the grouped profile)
    "generated_column_check",
    # robots.txt crawl filter: JVM robots parse (5 bodies) + the
    # broadcast longest-match decision over every corpus URL
    "robots_filtered_crawl_check",
    # round-13: the expectations/quarantine ingest gate (marts cached
    # via ARTIFACT_WARM; the timed path is the main-relation manifest
    # scan, the quarantine-capture scan, and the two grouped profiles)
    "expectation_quarantine_check",
    # round-13 second batch: the SQL scripting surface (driver-side
    # compound interpreter around two ordinary Catalyst plans) and the
    # crawl-head URL canonicalizer (pure regex projection + one
    # canonical-key groupBy)
    "sql_scripting_check",
    "url_canonical_dedup_check",
    # ...and the STREAMING-gated expectations mart (mart + checkpoint
    # cached via ARTIFACT_WARM; timed path = the same two manifest
    # scans + grouped profiles as the batch variant)
    "streaming_expectation_mart_check",
    # round-14: the quarantine retention lifecycle (mart cached via
    # ARTIFACT_WARM; timed path = main + surviving-capture manifest
    # scans, two grouped profiles, and the metadata-only history read)
    "quarantine_lifecycle_check",
    # ...and the crawl-frontier politeness scheduler (canonicalize
    # projection + ONE host-partitioned window + the grouped profile)
    "crawl_frontier_schedule_check",
    # ...and the from-spec Avro OCF roundtrip (shards cached via
    # ARTIFACT_WARM; the timed path is the Python-DataSource scan —
    # one task per container file, Arrow-batched — plus the profile)
    "avro_roundtrip_check",
    # ...and the from-spec TFRecord/tf.train.Example roundtrip (shards
    # cached via ARTIFACT_WARM; the timed path is the Python-
    # DataSource scan with CRC verification ON — one task per shard,
    # the format has no sync markers — plus the grouped profile)
    "tfrecord_roundtrip_check",
    # ...and incremental dedup against the persisted MinHash-LSH index
    # (two-batch run + planted dups built untimed via ARTIFACT_WARM;
    # the timed path is the decisions-mart read — at production scale
    # the decision cost itself is the batch-sized probe, not a rescan)
    "incremental_dedup_check",
    # ...and its streaming composition (index + two foreachBatch
    # drains + redelivery proof built untimed via ARTIFACT_WARM; the
    # timed path is the group-pinned decisions-table read — the same
    # deliberate convention break as streaming_expectation_mart_check:
    # the stream runs once in the warm, so the pin times the READ)
    "streaming_incremental_dedup_check",
    # ...and the Arrow IPC roundtrip (shards cached via ARTIFACT_WARM;
    # the timed path is the zero-copy memory-mapped batch-range scan —
    # footer-only planning, batches straight into Spark's Arrow
    # ingestion — plus the Q1-style grouped profile)
    "arrow_ipc_roundtrip_check",
    # ...and the seed-supervised NB quality classifier (closed-form
    # train = one token explode + one vocab groupBy; score = broadcast
    # weight join + one per-doc integer-sum aggregate)
    "nb_quality_scores",
]

BASELINE_PATH = os.path.join(REPO, "bench_baseline.json")

# sf1 linearity spot check (VERDICT r4 #7): five linear-shape headline
# queries run ONCE against a deterministic 10x replication of sf0.1
# (stripe_data_pipeline_spark/sf_scale.py) — the first empirical
# datapoint that the plans scale ~linearly past the driver's largest
# testdata. The blocked Jaccard self-join is quadratic-by-design WITHIN
# a block; since round 6 it is included anyway because max_block caps
# the block size, so its corpus-level growth should stay ~linear — the
# cap, not the quadratic core, is what the ratio certifies. Single-run
# (not min-of-N): at 10x volume the compute dominates warmup noise,
# and the block reports a RATIO against the same round's min-of-N
# sf0.1 time, so the criterion is "ratio stays O(copies)", not an
# absolute pin. Disable with SPARK_GRAFT_SF1_SPOT=0.
SF1_SPOT = [
    "revenue_trend_daily",
    "regional_revenue_q5ish",
    "pricing_summary",
    "minhash_lsh_candidates",
    "ivf_topk",
    # the pigeonhole heavy-hitter pattern: its whole point is the
    # shuffle volume staying vocabulary-capped as the corpus grows
    "heavy_hitter_tokens",
    # round-6 widening (VERDICT r5 #4): the four most expensive headline
    # queries not yet under a linearity pin — the bloom bitmap build +
    # anti-join, the capped-block quadratic-by-design Jaccard (its CAP is
    # what the ratio certifies), and the two shingle-keyed span/novelty
    # passes whose shuffle volume tracks corpus tokens
    "bloom_blocklist_filter",
    # near_dup_jaccard_pairs was DROPPED from the sf1 spot list in r12
    # (VERDICT r11 #6): it is the documented exact all-pairs-within-
    # block path (12.2x at 10x, quadratic-within-cap BY DESIGN) whose
    # scale route is jaccard_verify_lsh below (1.9x) — paying 14 s per
    # bench for a shape the docs already mark non-scale bought nothing
    "duplicate_span_stats",
    "cross_doc_novelty_hashed",
    # round-6: two corpus scans + bounded KxD collects per iteration —
    # the ratio certifies the no-corpus-shuffle iteration shape
    "kmeans_cluster_profile",
    # round-7 (VERDICT r6 #4): the persisted-blocklist path must hold
    # its ratio where the derive-inline variant grew 5.3x — the pinned
    # proof that materializing the blocklist removes the corpus-scan
    # amplification
    "bloom_blocklist_filter_persisted",
    # round-7: the encode pass is training (2 bounded corpus passes) +
    # a narrow projection — the ratio certifies nothing superlinear
    # hides in the replace chain
    "bpe_encoded_docs",
    # round-7 ANN: codebook training amortizes its bounded collects
    # (measured 2.3x at 10x) and IVFPQ scans only probed lists (2.4x)
    "pq_codes_profile",
    "ivfpq_topk",
    # round-8 (VERDICT r7 #2): the persisted serving pair must stay
    # near-FLAT in corpus size — a probe reads nprobe/K of a
    # 32x-compressed codes table; the ratio certifies that nothing
    # corpus-scaled crept back into the query path
    "pq_adc_topk_persisted",
    "ivfpq_topk_persisted",
    # r8 (VERDICT r7 #4): the LSH-verified Jaccard pipeline takes the
    # near-dup sf1 slot — banding keeps candidate volume ~linear where
    # the naive blocked self-join (near_dup_jaccard_pairs, 9.0x at
    # 10x) is quadratic-within-cap by design and stays demo-only
    "jaccard_verify_lsh",
    # r8 (VERDICT r7 #5): prefix doubling is log-n rounds of shuffles,
    # the highest structural superlinear risk in the repo; the scaled
    # slice (1% of the corpus at every sf) pins it — measured 3.1x at
    # 10x data (rounds grow log-linearly, each round linearly)
    "suffix_array_ranks_scaled",
    # r11: the sorted-neighborhood rank is the repo's newest
    # global-order structure (range-partition + offsets, no
    # single-partition window) — measured 8.1x at 10x; KN smoothing's
    # bigram shuffle tracks corpus tokens (4.4x at 10x)
    "sorted_neighborhood_pairs",
    "kneser_ney_scores",
    # r12: the pipeline head must scan at corpus speed — the fused
    # regex projection measured 7.5x at 10x data (pure scan growth)
    "html_extracted_text_check",
    # r11 second batch (events now in the replication — sf_scale
    # builds newly-listed tables incrementally): the bitmap distinct
    # fold (4.2x at 10x — buckets grow with users), the hour-spine
    # forward fill (2.5x), the closed-form interleave (2.9x), the FIM
    # projection (2.6x), and the Arrow lateral UDTF (8.0x — the
    # Python stage scales with rows, exactly what the pin watches)
    "bitmap_exact_distinct_check",
    "gap_filled_hourly_values",
    "interleaved_training_order",
    "fim_transform_pairs",
    "udtf_doc_chunks",
    # r8: the end-to-end LSH dedup composition must scale like its
    # edge stage (~linear banding), not like the quadratic demo
    "lsh_quality_keepers",
    # r8 fourth batch: the unigram encode's word-level join-back must
    # stay linear (training is bounded-word-table work), the CMS pass
    # certifies the fixed-grid sketch contract (shuffle volume is
    # d*w-capped), PageRank is 5 linear join+agg rounds, and the
    # CCNet bucketing adds one per-lang sort to the linear LM scoring
    # (media_dhash_near_dups stays OUT of this gate on purpose: its
    # demo-width 8-bit bands saturate at corpus scale by design — the
    # documented knob is band width ~ log2(n_docs), and the banded
    # join would read as quadratic here without that widening)
    "unigram_encoded_docs",
    "cms_token_estimates",
    "pagerank_customer_supplier",
    "ccnet_perplexity_buckets",
    # r9: winnowing is the textbook corpus-linear shape (constant
    # w-factor explode + partial-combined groupBy) — the ratio
    # certifies exactly that; since r13 the xxhash64 variant below
    # carries the family's gate alone (the md5 variant was demoted
    # from HEADLINE per VERDICT r12 #7, and this list may only name
    # HEADLINE queries — the ratio denominator is the sf0.1 timing).
    # semdedup_keepers stays OUT of this gate on purpose: at FIXED k
    # its within-cluster pair work is quadratic in cluster size by
    # design — the documented knob is K ~ corpus size (the paper runs
    # 50k clusters for LAION), which the 10x replication can't
    # exercise without retuning k.
    # r9 second batch: segment dedup's one-shuffle-on-the-segment-key
    # contract and span corruption's single-sort window stack are the
    # two new corpus-linear shapes — their ratios certify that the
    # dedup exchange and the window pass both track corpus tokens
    "segment_dedup_docs",
    "span_corruption_pairs",
    # r9 fourth/fifth batch corpus-linear shapes: WordPiece encode
    # certifies the unrolled-MaxMatch projection + join-back tracks
    # corpus tokens; TextRank certifies the explode + distinct edge
    # build (the 5 power-iteration rounds run on the vocabulary-
    # bounded graph, so the ratio isolates the corpus-scale stages).
    "wordpiece_encoded_docs",
    "textrank_keywords",
    # r10 (VERDICT r9 #5): the xxhash64 winnowing path must beat the
    # md5 variant at sf1 — same plan, cheaper hash constant; keeping
    # BOTH in the gate makes the win (and any drift) measurable
    "winnowing_fingerprints_fast",
    # r12 second batch: the robots decision must scale like a
    # broadcast-filtered scan of the URL list — the rule relation is
    # host-bounded, the verdict folds map-side, so the ratio
    # certifies no URL-pair blowup hides in the regexp match
    "robots_filtered_crawl_check",
    # r13: the crawl-frontier dedup must scale like a scan + one
    # canonical-key groupBy — the ratio certifies the regex
    # projection stays linear and no pairwise shape creeps in
    # (unpinned until its first sf1 measurement lands)
    "url_canonical_dedup_check",
]

# Queries whose FIRST run builds a persisted artifact (an on-disk
# index/blocklist/mart or a session-cached fixture) that every later
# run reuses. They get ONE untimed warm run before the timed min-of-N
# (VERDICT r12 #2): min-of-N alone cannot amortize a 10-19s artifact
# build when external box load stretches all N runs — the r12 driver
# bench flagged exactly these shapes (bloom_blocklist_filter_persisted
# at sf0.1; pq_adc/ivfpq_topk_persisted at sf1) while standalone
# re-measures cleared every pin. The warm run moves the build out of
# the measurement entirely, so the pins time what they claim to time:
# the steady-state probe/read path. Tokenizer-cached families (bpe_*,
# unigram_*, wordpiece_*) stay OUT: their per-corpus train cost is
# seconds, amortizes fine inside min-of-3, and has never flagged.
ARTIFACT_WARM = {
    "ivf_topk_persisted",  # centroid index build
    "bloom_blocklist_filter_persisted",  # blocklist parquet build
    "pq_adc_topk_persisted",  # PQ codebooks + codes build
    "ivfpq_topk_persisted",  # IVF+PQ index build
    "bloom_pruned_scan_check",  # bloom-indexed mart build
    "pos_delete_check",  # positional-delete mart builds
    "generated_column_check",  # generated-column mart build
    "expectation_quarantine_check",  # quarantine mart builds
    "streaming_expectation_mart_check",  # streamed gated-mart build
    "quarantine_lifecycle_check",  # lifecycle mart build (r14)
    "avro_roundtrip_check",  # avro shard write (r14)
    "tfrecord_roundtrip_check",  # tfrecord shard write (r14)
    "incremental_dedup_check",  # index build + two ingests (r14)
    "streaming_incremental_dedup_check",  # streamed index build (r14)
    "arrow_ipc_roundtrip_check",  # arrow shard write (r14)
    "warc_html_pipeline_check",  # WARC shard fixture write
    "html_extracted_text_check",  # shares the WARC fixture
}


def measure_query_runs(
    spark, name: str, sf_dir: str, runs: int
) -> list[float]:
    """THE measurement protocol — shared by the bench sweep (sf0.1
    and the sf1 spot) and the standalone pin-adjudication tool
    (tools/measure_quiet.py), so a pin re-measure is provably the
    same procedure that produced the pin (r14 review): one UNTIMED
    warm run for ARTIFACT_WARM queries (builds the persisted
    artifact; VERDICT r12 #2), then ``runs`` timed full executions
    via the noop sink — computes every output column, unlike count()
    — with a System.gc() after each run to isolate queries from each
    other's weak-ref-driven broadcast/shuffle cleanup debt. Returns
    the per-run seconds; callers take the min (steady-state plan
    cost, not cold-JIT/external-load noise)."""
    fn = QUERIES[name].fn
    if name in ARTIFACT_WARM:
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        spark.sparkContext._jvm.System.gc()
    out: list[float] = []
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        out.append(time.time() - t0)
        spark.sparkContext._jvm.System.gc()
    return out


def load_baseline(path: str = BASELINE_PATH) -> dict | None:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _cpu_scale(baseline: dict, cpus: int | None) -> float:
    """Pin headroom multiplier for core-count-varying runs (VERDICT
    r14 #2): every pin was measured at ``pinned_cpus`` (32); the
    driver ALSO probes at a lower core count, where a genuinely
    parallel query is legitimately up to pinned_cpus/cpus slower —
    r14's 8-core probe tripped url_canonical's sf1 pin (9.34s vs a
    4.0 pin set at 32 cores) for exactly that reason. Scale the
    allowed threshold by the core ratio instead of skipping the gate
    outright, so a low-core probe still catches order-of-magnitude
    plan regressions. Never shrinks the headroom when run with MORE
    cores than the pin (pins stay honest floors)."""
    pinned_cpus = baseline.get("pinned_cpus")
    if not pinned_cpus or not cpus:
        return 1.0
    return max(1.0, float(pinned_cpus) / float(cpus))


def check_regressions(
    timings: dict[str, float], baseline: dict | None, cpus: int | None = None
) -> list[str]:
    """Regression guard: names of queries slower than
    ``regression_factor`` x their pinned baseline seconds (scaled by
    the core ratio when the run uses fewer cpus than the pins were
    measured at — see _cpu_scale). Queries without a pinned number
    (new this round) are skipped. Pure function so tests can fire it
    with fabricated timings."""
    if not baseline:
        return []
    factor = float(baseline.get("regression_factor", 2.0))
    factor *= _cpu_scale(baseline, cpus)
    pinned = baseline.get("queries", {})
    return [
        name
        for name, sec in timings.items()
        if name in pinned and sec > factor * float(pinned[name])
    ]


def check_sf1_regressions(
    sf1_spot: dict | None, baseline: dict | None, cpus: int | None = None
) -> list[str]:
    """sf1 linearity gate (VERDICT r6 #6): the sf1 spot used to be
    informational only, so superlinear drift at 10x data would never
    flag. Spot queries with a pinned sf1 seconds value now fire the
    same 2x-style guard as the sf0.1 pins. Pure function; single-run
    sf1 numbers are noisier than min-of-3, so pins carry generous
    headroom and a flag means 're-run standalone', not 'certainly
    regressed'."""
    if not baseline or not sf1_spot or "queries" not in sf1_spot:
        return []
    factor = float(
        baseline.get(
            "sf1_regression_factor", baseline.get("regression_factor", 2.0)
        )
    )
    factor *= _cpu_scale(baseline, cpus)
    pinned = baseline.get("sf1_queries", {})
    return [
        name
        for name, rec in sf1_spot["queries"].items()
        if name in pinned and float(rec["sec"]) > factor * float(pinned[name])
    ]


def detail_artifact_path(repo: str = REPO) -> str:
    """bench_detail_r{N}.json with N = (largest existing BENCH_r*.json
    round) + 1 — the round whose driver artifact THIS bench run will
    feed. The driver's stdout tail keeps only 2000 chars, which
    truncated 21/54 per-query timings out of BENCH_r06; the full
    detail map ships as a committed file instead (VERDICT r6 #5)."""
    import glob
    import re

    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    n = (max(rounds) + 1) if rounds else 1
    return os.path.join(repo, f"bench_detail_r{n:02d}.json")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")

    # Warm the JVM/codegen paths so the first timed query isn't paying
    # session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

    # Steady-state measurement: each query runs N times and the MIN is
    # reported. First-run times mix in codegen/JIT compilation, shuffle
    # service warmup, and this box's transient external load — measured
    # r3 cold-vs-warm spread on near_dup_jaccard_pairs was 8.0s -> 1.6s
    # with an identical plan, and back-to-back full-bench totals swung
    # 45s -> 35s with zero plan changes. Min-of-3 measures the plan,
    # not the noise, and keeps the regression guard from flapping (a
    # min-of-2 run still caught two loaded runs in a row on this box).
    runs_per_query = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(
            min(measure_query_runs(spark, name, sf_dir, runs_per_query)), 3
        )

    sf1_spot = None
    if (
        os.environ.get("SPARK_GRAFT_SF1_SPOT", "1") != "0"
        and sf_dir.rstrip("/").endswith("sf0.1")
    ):
        try:
            from stripe_data_pipeline_spark.sf_scale import ensure_scaled_dir

            sf1_dir = ensure_scaled_dir(spark, base_dir=sf_dir)
            spot: dict[str, dict] = {}
            for name in SF1_SPOT:
                # min-of-2: one warm pass absorbs the 10x-scan
                # codegen/readahead cold start without paying full
                # min-of-N at this volume (ARTIFACT_WARM queries get
                # their untimed build run first — at 10x data the
                # index build is 10-19s, which min-of-2 cannot
                # amortize under load; the two r12 sf1 flags)
                sec = round(
                    min(measure_query_runs(spark, name, sf1_dir, 2)), 3
                )
                spot[name] = {
                    "sec": sec,
                    "ratio_vs_sf0.1": round(sec / max(timings[name], 1e-3), 1),
                }
            sf1_spot = {"copies": 10, "method": "min_of_2", "queries": spot}
        except Exception as e:  # noqa: BLE001 — the spot check must never
            # take down the driver's bench contract
            sf1_spot = {"error": str(e)[:200]}

    total = round(sum(timings.values()), 3)
    # BENCH_r01's 47.36s baseline covered only the first 17 queries;
    # report that subset's subtotal so cross-round totals compare
    # like-for-like as the headline set grows.
    r1_subset = round(sum(timings[n] for n in HEADLINE[:17] if n in timings), 3)
    baseline = load_baseline()
    # defaultParallelism == the local[$SPARK_GRAFT_CPUS] core count —
    # the same number the pins' _cpu_scale headroom is keyed on.
    cpus = spark.sparkContext.defaultParallelism
    regressions = check_regressions(timings, baseline, cpus)
    if regressions:
        factor = (baseline or {}).get("regression_factor", 2.0)
        print(
            f"bench REGRESSION (> {factor}x pinned baseline): {regressions}",
            file=sys.stderr,
        )
    sf1_regressions = check_sf1_regressions(sf1_spot, baseline, cpus)
    if sf1_regressions:
        print(
            f"bench sf1 REGRESSION (superlinear drift at 10x): "
            f"{sf1_regressions}",
            file=sys.stderr,
        )
    detail_line, summary_line = build_report(
        timings=timings,
        total=total,
        sf=sf,
        regressions=regressions,
        method=f"min_of_{runs_per_query}_runs",
        r1_subset=r1_subset,
        sf1_spot=sf1_spot,
        sf1_regressions=sf1_regressions,
    )
    try:  # the file artifact must never take down the driver contract
        path = detail_artifact_path()
        with open(path, "w") as f:
            f.write(detail_line + "\n")
    except OSError as e:  # noqa: PERF203
        print(f"bench detail artifact write failed: {e}", file=sys.stderr)
    print(detail_line)
    print(summary_line)


def build_report(
    *,
    timings: dict[str, float],
    total: float,
    sf: str,
    regressions: list[str],
    method: str,
    r1_subset: float,
    sf1_spot: dict | None,
    sf1_regressions: list[str] | None = None,
) -> tuple[str, str]:
    """Two-line output (VERDICT r5 #1): the driver captures only the
    LAST 2000 chars of stdout and parses the final JSON line. With 49+
    per-query timings the single-line form grew past 2.9 KB and the
    truncated head broke the parse (BENCH_r05 ``parsed: null``). So the
    bulky per-query detail goes on its own earlier line (for humans and
    the judge reading the full file), and the LAST line is a compact
    summary guaranteed well under 1 KB. Pure function; pinned by
    tests/test_bench_guard.py."""
    detail_line = json.dumps(
        {
            "detail": "per_query_sec",
            "queries": timings,
            "sf1_spot": sf1_spot,
        }
    )
    summary = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # cap the name list so a pathological many-regression round still
        # fits the tail budget; n_regressions carries the true count
        "regressions": regressions[:10],
        "n_regressions": len(regressions),
        "sf1_regressions": (sf1_regressions or [])[:5],
        "n_sf1_regressions": len(sf1_regressions or []),
        "method": method,
        "r1_subset_total_sec": r1_subset,
        "n_queries": len(timings),
    }
    summary_line = json.dumps(summary)
    assert len(summary_line) < 1000, (
        f"summary line {len(summary_line)}B breaches the driver's "
        "2000-char tail budget"
    )
    return detail_line, summary_line


if __name__ == "__main__":
    main()
