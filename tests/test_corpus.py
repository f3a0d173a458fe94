"""Corpus-prep operators: the properties that make chunking, packing,
decontamination, scrubbing and quantization usable at 100 TB —
coverage/invertibility, bounded bins, layout independence, and
reconstruction-error bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.io import read_table
from stripe_data_pipeline_spark.operators import corpus as C
from stripe_data_pipeline_spark.operators.sampling import assign_split


def test_chunks_cover_every_token_and_overlap(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(200)
    chunks = C.chunk_documents(docs, size=32, stride=24)
    rows = chunks.collect()
    toks = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in docs.collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, ts in toks.items():
        if not ts:
            assert doc_id not in by_doc
            continue
        got = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        # chunk k starts at k*stride; its text is exactly that token window
        for k, r in enumerate(got):
            assert r["chunk_id"] == k
            window = ts[k * 24 : k * 24 + 32]
            assert r["chunk_text"] == " ".join(window)
            assert r["chunk_tokens"] == len(window)
        # windows cover every token index
        assert (len(got) - 1) * 24 < len(ts)
        assert (len(got) - 1) * 24 + 32 >= len(ts)


def test_pack_offsets_bounded_and_layout_independent(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    packed = C.pack_sequences(docs, budget=1024, n_groups=8)
    bad = packed.filter(
        (F.col("seq_offset") < 0) | (F.col("seq_offset") >= 1024)
    ).count()
    assert bad == 0
    # same assignment regardless of input partitioning
    a = {r["doc_id"]: (r["pack_group"], r["seq_id"], r["seq_offset"])
         for r in packed.collect()}
    b = {
        r["doc_id"]: (r["pack_group"], r["seq_id"], r["seq_offset"])
        for r in C.pack_sequences(
            docs.repartition(13), budget=1024, n_groups=8
        ).collect()
    }
    assert a == b


def test_pack_sequences_are_dense_prefixes(spark, sf_dir):
    """Within a pack group, doc start offsets in md5 order are exactly
    the running token sum — no gaps, no overlaps."""
    docs = read_table(spark, sf_dir, "documents").limit(500)
    packed = C.pack_sequences(docs, budget=1024, n_groups=4).collect()
    import hashlib

    def md5key(doc_id):
        return hashlib.md5(str(doc_id).encode()).hexdigest()

    by_group: dict[int, list] = {}
    for r in packed:
        by_group.setdefault(r["pack_group"], []).append(r)
    for rows in by_group.values():
        rows.sort(key=lambda r: (md5key(r["doc_id"]), r["doc_id"]))
        cum = 0
        for r in rows:
            assert r["seq_id"] * 1024 + r["seq_offset"] == cum
            cum += r["n_tokens"]


def test_contamination_matches_bruteforce(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(300)
    got = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in C.ngram_contamination(docs, n=8).collect()
    }
    rows = assign_split(docs, "doc_id").select(
        "doc_id", "split", "text"
    ).collect()

    def sh(text, n=8):
        ts = text.split(" ")
        k = max(len(ts) - (n - 1), 1)
        return {" ".join(ts[i : i + n]) for i in range(k)}

    train = set()
    for r in rows:
        if r["split"] == "train":
            train |= sh(r["text"])
    want = {}
    for r in rows:
        if r["split"] == "test":
            shared = sh(r["text"]) & train
            if shared:
                want[r["doc_id"]] = len(shared)
    assert got == want


def test_scrub_pii_redacts_and_preserves(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at alice.smith+x@corp.example.org today"),
            (2, "call +1 (555) 010-0199 after five"),
            (3, "no personal data in this row at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in C.scrub_pii(df).collect()}
    assert got[1]["clean_text"] == "mail me at <EMAIL> today"
    assert got[2]["clean_text"] == "call <PHONE> after five"
    assert got[3]["clean_text"] == "no personal data in this row at all"
    assert got[3]["n_redacted_chars"] == 0


def test_quantize_roundtrip_error_bounded(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings").limit(100)
    out = {r["vec_id"]: r for r in C.quantize_embeddings(emb).collect()}
    for r in emb.collect():
        q = out[r["vec_id"]]
        scale = q["scale_fp"] / 1e9
        codes = [int(c) for c in q["codes"].split(",")]
        assert len(codes) == len(r["embedding"])
        assert all(-127 <= c <= 127 for c in codes)
        for x, c in zip(r["embedding"], codes):
            # |x - c*scale| <= scale/2 plus fixed-point slack on scale
            assert abs(x - c * scale) <= scale / 2 + 1e-6


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    row = C.quantize_embeddings(df).collect()[0]
    assert row["scale_fp"] == 0
    assert row["codes"] == "0,0,0"


def test_decontaminate_train_drops_exactly_contaminated_docs(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents").limit(300)
    kept = {r["doc_id"] for r in C.decontaminate_train(docs, n=8).collect()}
    rows = assign_split(docs, "doc_id").select("doc_id", "split", "text").collect()

    def sh(text, n=8):
        ts = text.split(" ")
        k = max(len(ts) - (n - 1), 1)
        return {" ".join(ts[i : i + n]) for i in range(k)}

    heldout = set()
    for r in rows:
        if r["split"] != "train":
            heldout |= sh(r["text"])
    want = {
        r["doc_id"]
        for r in rows
        if r["split"] == "train" and not (sh(r["text"]) & heldout)
    }
    assert kept == want
    # sanity: the operator actually dropped something AND kept something
    n_train = sum(1 for r in rows if r["split"] == "train")
    assert 0 < len(kept) < n_train


def test_repetition_metrics_flags_repetitive_docs(spark):
    from stripe_data_pipeline_spark.operators.text import repetition_metrics

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam spam spam"),
            (2, "one two three four five six seven eight nine ten"),
            (3, "a b a b a b a b a b a b"),
            (4, "x"),  # below the n-gram minimum -> excluded
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_metrics(df, n=2).collect()}
    assert 4 not in got
    assert not got[1]["keep"]  # one token repeated: distinct_bp = 1000
    assert got[1]["distinct_bp"] == 1000
    assert got[1]["top_ngram_bp"] == 10000
    assert got[2]["keep"]  # all-distinct doc passes every threshold
    assert got[2]["distinct_bp"] == 10000
    assert got[2]["dup_ngram_bp"] == 0
    assert not got[3]["keep"]  # alternating bigram: huge dup fraction
    assert got[3]["dup_ngram_bp"] == 10000


def test_repetition_metrics_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from stripe_data_pipeline_spark.operators.text import repetition_metrics

    docs = read_table(spark, sf_dir, "documents").limit(200)
    got = {r["doc_id"]: r for r in repetition_metrics(docs, n=2).collect()}
    for r in docs.collect():
        ts = [t for t in r["text"].split(" ") if t]
        if len(ts) < 2:
            assert r["doc_id"] not in got
            continue
        grams = Counter(" ".join(ts[i : i + 2]) for i in range(len(ts) - 1))
        total = sum(grams.values())
        g = got[r["doc_id"]]
        assert g["distinct_bp"] == len(set(ts)) * 10000 // len(ts)
        assert g["top_ngram_bp"] == max(grams.values()) * 10000 // total
        assert g["dup_ngram_bp"] == (
            sum(c for c in grams.values() if c >= 2) * 10000 // total
        )


def test_curation_funnel_monotonic_and_consistent(spark, sf_dir):
    """Funnel counts are monotone per stage and agree with the
    individual operators they audit."""
    docs = read_table(spark, sf_dir, "documents")
    rows = {r["lang"]: r for r in C.curation_funnel(docs).collect()}
    assert rows
    for lang, r in rows.items():
        assert (
            r["n_total"]
            >= r["n_dedup"]
            >= r["n_quality"]
            >= r["n_clean_train"]
            >= r["n_final"]
            >= 0
        )
    # stage-1 totals match the raw per-lang counts
    raw = {
        r["lang"]: r["c"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    assert {k: v["n_total"] for k, v in rows.items()} == raw
    # stage-2 totals match the dedup operator (keepers per lang)
    from stripe_data_pipeline_spark.operators.dedup import exact_dedup_keepers

    keep = exact_dedup_keepers(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    per_lang = {
        r["lang"]: r["c"]
        for r in docs.join(keep, "doc_id", "left_semi")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert {k: v["n_dedup"] for k, v in rows.items()} == per_lang
    # the funnel actually narrows somewhere (corpus has dups/low-quality)
    assert any(v["n_final"] < v["n_total"] for v in rows.values())


def test_hashed_contamination_identical_to_string_keyed(spark, sf_dir):
    """The 8-byte xxhash64 scale path must produce the exact report
    the oracle-checkable string-keyed path produces."""
    docs = read_table(spark, sf_dir, "documents")
    a = {(r["doc_id"], r["n_shared_ngrams"])
         for r in C.ngram_contamination(docs, n=8).collect()}
    b = {(r["doc_id"], r["n_shared_ngrams"])
         for r in C.ngram_contamination(docs, n=8, hash_keys=True).collect()}
    assert a == b and a


def test_cap_per_group_equals_naive_window_rank(spark, sf_dir):
    """The bucket-decomposed rank must equal the naive global
    row_number() over (partition by group order by md5(key), key) —
    including on a planted hot group 10x the others."""
    docs = read_table(spark, sf_dir, "documents").drop("text")
    hot = docs.limit(150).withColumn("source", F.lit("hot_src"))
    df = docs.unionByName(hot.withColumn("doc_id", F.col("doc_id") + 1_000_000))
    got = {
        r["doc_id"]: r["domain_rank"]
        for r in C.cap_per_group(df, "source", "doc_id", k=7).collect()
    }
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    naive = {
        r["doc_id"]: r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .collect()
    }
    assert got == naive


def test_cap_per_group_prunes_hot_group_before_window(spark):
    """Scale guard: with k much smaller than a hot group, the rows
    reaching the window stage (the post-join relation) stay bounded by
    ~k + group/256 per group — not the hot group's full size."""
    df = spark.range(5000).select(
        F.col("id").alias("doc_id"), F.lit("hot").alias("source")
    )
    capped = C.cap_per_group(df, "source", "doc_id", k=10, prefix_len=2)
    assert capped.count() == 10
    # the boundary relation keeps only buckets with cum-before < k:
    # the corpus-side join input is a tiny fraction of the hot group
    boundary_buckets = (
        df.withColumn("__b", F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2))
        .groupBy("__b")
        .count()
        .count()
    )
    assert boundary_buckets > 50  # hot group spans many buckets...
    # ...but rank<=10 can touch at most a handful of them
    survivors = capped.select("__rank") if "__rank" in capped.columns else None
    assert survivors is None  # internal columns are dropped from output


def test_cross_doc_novelty_planted_exact_dup(spark):
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (3, "one two three four five six seven eight nine ten"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r for r in C.cross_doc_novelty(df, n=8).collect()}
    # doc 1 owns every shingle it has; doc 2 is an exact dup of it
    assert got[1]["novel_bp"] == 10000 and got[1]["keep"]
    assert got[2]["novel_bp"] == 0 and not got[2]["keep"]
    assert got[3]["novel_bp"] == 10000 and got[3]["keep"]
    assert got[2]["n_shingles"] == got[1]["n_shingles"]


def test_token_length_histogram_conserves_docs_and_tokens(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    hist = C.token_length_histogram(docs, width=32)
    agg = hist.agg(
        F.sum("n_docs").alias("d"), F.sum("sum_tokens").alias("t")
    ).collect()[0]
    n_docs = docs.count()
    n_tokens = docs.select(
        F.sum(
            F.size(F.filter(F.split("text", " "), lambda t: t != ""))
        ).alias("t")
    ).collect()[0]["t"]
    assert agg["d"] == n_docs
    assert agg["t"] == n_tokens
    # bucket invariant: every bucket_start is a multiple of the width
    assert hist.filter(F.col("bucket_start") % 32 != 0).count() == 0


def test_duplicate_span_stats_planted_spans(spark):
    # doc 1 and 2 share an 8-gram block; doc 3 is all-novel.
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    rows = [
        (1, shared + " a1 a2 a3 a4 a5 a6 a7 a8"),
        (2, "b1 b2 b3 b4 " + shared + " b5 b6 b7 b8"),
        (3, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in C.duplicate_span_stats(df, n=8).collect()}
    # only the planted 8-token span is shared: exactly 8 covered tokens
    assert got[1]["dup_tokens"] == 8 and got[1]["n_tokens"] == 16
    assert got[1]["dup_fraction"] == 8 / 16
    assert got[2]["dup_tokens"] == 8 and got[2]["n_tokens"] == 16
    assert 3 not in got  # no cross-doc gram -> no row


def test_duplicate_span_stats_interval_union_overlap(spark):
    # two docs identical for 10 tokens -> 3 overlapping dup 8-grams
    # (starts 0,1,2) whose union is the whole 10-token prefix.
    pre = " ".join(f"p{i}" for i in range(10))
    rows = [(1, pre + " x1"), (2, pre + " y1")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in C.duplicate_span_stats(df, n=8).collect()}
    assert got[1]["dup_tokens"] == 10  # union, not 3*8
    assert got[2]["dup_tokens"] == 10


def test_span_scrub_planted_actions(spark):
    # doc 1/2 share an 8-gram (fraction 0.5 -> trim, boundary
    # inclusive); doc 3 is novel (keep verbatim, original spacing
    # preserved); docs 4/5 are identical (fraction 1.0 -> drop).
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    dup_doc = "z1 z2 z3 z4 z5 z6 z7 z8 z9"
    rows = [
        (1, shared + " a1 a2 a3 a4 a5 a6 a7 a8"),
        (2, "b1 b2 b3 b4 " + shared + " b5 b6 b7 b8"),
        (3, "c1 c2  c3"),  # double space: verbatim passthrough check
        (4, dup_doc),
        (5, dup_doc),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in C.span_scrub_documents(df, n=8).collect()}
    assert set(got) == {1, 2, 3}  # 4/5 dropped
    assert got[1]["action"] == "trim"
    assert got[1]["text"] == "a1 a2 a3 a4 a5 a6 a7 a8"
    assert got[1]["dup_tokens"] == 8 and got[1]["n_tokens"] == 16
    assert got[2]["action"] == "trim"
    assert got[2]["text"] == "b1 b2 b3 b4 b5 b6 b7 b8"
    assert got[3]["action"] == "keep"
    assert got[3]["text"] == "c1 c2  c3"  # untouched docs keep raw text
    assert got[3]["dup_tokens"] == 0 and got[3]["n_tokens"] == 3


def test_span_scrub_overlapping_spans_trim_union(spark):
    # identical 10-token prefix -> overlapping dup grams; the trim
    # must remove the UNION of covered positions, not 3x8 tokens.
    pre = " ".join(f"p{i}" for i in range(10))
    rows = [(1, pre + " x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
            (2, pre + " y1 y2 y3 y4 y5 y6 y7 y8 y9 y10")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in C.span_scrub_documents(df, n=8).collect()}
    assert got[1]["action"] == "trim" and got[1]["dup_tokens"] == 10
    assert got[1]["text"] == " ".join(f"x{i}" for i in range(1, 11))
    assert got[2]["text"] == " ".join(f"y{i}" for i in range(1, 11))


def test_span_scrub_fully_covered_doc_survives_at_threshold_one(spark):
    """ADVICE r7 edge: with drop_threshold >= 1.0 a doc whose every
    token is duplicated classifies 'trim' (1.0 <= 1.0) and must emit
    an EMPTY-text row — the old inner join on the rebuilt subset
    silently vanished it, contradicting the policy's own verdict."""
    dup_doc = "z1 z2 z3 z4 z5 z6 z7 z8"
    rows = [(1, dup_doc), (2, dup_doc), (3, "n1 n2 n3")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r
        for r in C.span_scrub_documents(df, n=8, drop_threshold=1.0).collect()
    }
    assert set(got) == {1, 2, 3}
    for d in (1, 2):
        assert got[d]["action"] == "trim"
        assert got[d]["text"] == ""
        assert got[d]["dup_tokens"] == 8 and got[d]["n_tokens"] == 8
    assert got[3]["action"] == "keep" and got[3]["text"] == "n1 n2 n3"


def test_span_scrub_consistent_with_stats(spark, sf_dir):
    """On the real corpus: every stats row above the threshold is
    absent, every row at/below it is trimmed with the same dup_tokens,
    and every doc without a stats row passes through verbatim."""
    docs = read_table(spark, sf_dir, "documents")
    stats = {r["doc_id"]: r
             for r in C.duplicate_span_stats(docs, n=8).collect()}
    got = {r["doc_id"]: r for r in C.span_scrub_documents(docs, n=8).collect()}
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    for doc_id, r in stats.items():
        if r["dup_fraction"] > 0.5:
            assert doc_id not in got
        else:
            assert got[doc_id]["action"] == "trim"
            assert got[doc_id]["dup_tokens"] == r["dup_tokens"]
            # trimmed text really lost dup_tokens tokens
            kept = [t for t in got[doc_id]["text"].split(" ") if t]
            assert len(kept) == r["n_tokens"] - r["dup_tokens"]
    for doc_id in raw:
        if doc_id not in stats:
            assert got[doc_id]["action"] == "keep"
            assert got[doc_id]["text"] == raw[doc_id]


def test_token_rarity_matches_bruteforce(spark, sf_dir):
    from collections import Counter

    from stripe_data_pipeline_spark.operators.text import token_rarity_scores

    docs = read_table(spark, sf_dir, "documents").limit(120).cache()
    toks = {
        r["doc_id"]: [t for t in r["text"].split(" ") if t]
        for r in docs.collect()
    }
    tf = Counter(t for ts in toks.values() for t in ts)
    got = {r["doc_id"]: r for r in token_rarity_scores(docs).collect()}
    for doc_id, ts in toks.items():
        if not ts:
            assert doc_id not in got
            continue
        r = got[doc_id]
        assert r["n_tokens"] == len(ts)
        assert r["sum_tf"] == sum(tf[t] for t in ts)
        assert r["rarest_tf"] == min(tf[t] for t in ts)
        assert r["mean_tf"] == sum(tf[t] for t in ts) / len(ts)
    docs.unpersist()


def test_hashed_span_stats_identical_to_string_keyed(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    a = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_fraction"])
         for r in C.duplicate_span_stats(docs, n=8).collect()}
    b = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["dup_fraction"])
         for r in C.duplicate_span_stats(docs, n=8, hash_keys=True).collect()}
    assert a == b


def test_training_sequences_mart_layout(spark, sf_dir):
    import glob
    import os

    import pandas as pd

    from stripe_data_pipeline_spark.catalog.corpus_queries import (
        _materialized_training_sequences,
        _TRAIN_MART_CACHE,
    )

    _materialized_training_sequences(spark, sf_dir)
    path = _TRAIN_MART_CACHE[sf_dir]
    part_dirs = sorted(
        d for d in os.listdir(path) if d.startswith("pack_group=")
    )
    assert part_dirs  # hive-partitioned by pack_group
    # clustering contract: every data file is internally sorted by
    # (seq_id, seq_offset) so a seq range scan prunes row groups
    for d in part_dirs[:3]:
        for f in glob.glob(os.path.join(path, d, "*.parquet")):
            pdf = pd.read_parquet(f)[["seq_id", "seq_offset"]]
            assert (
                pdf.sort_values(["seq_id", "seq_offset"])
                .reset_index(drop=True)
                .equals(pdf.reset_index(drop=True))
            ), f


def test_lm_doc_scores_matches_reference(spark):
    """Bigram-LM scoring vs a pure-Python reference: identical count
    tables, identical smoothing, identical fixed-point per-token
    floors (Python libm ln == JVM StrictMath-compatible ln on these
    inputs — the BM25 parity assumption, asserted exactly)."""
    import math
    from collections import Counter

    from stripe_data_pipeline_spark.operators.text import lm_doc_scores

    texts = ["a b a b c", "a a a", "c b a", "b"]
    toksets = [t.split() for t in texts]
    uni = Counter(w for ts in toksets for w in ts)
    N = sum(uni.values())
    V = len(uni)
    bi = Counter(
        (ts[i], ts[i + 1]) for ts in toksets for i in range(len(ts) - 1)
    )
    want = {}
    for d, ts in enumerate(toksets):
        terms = [
            math.floor(-math.log((uni[ts[0]] + 1) / (N + V)) * 1e9 + 0.5)
        ]
        for i in range(len(ts) - 1):
            terms.append(
                math.floor(
                    -math.log(
                        (bi[(ts[i], ts[i + 1])] + 1) / (uni[ts[i]] + V)
                    )
                    * 1e9
                    + 0.5
                )
            )
        want[d] = (len(terms), sum(terms))
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_scored"], r["nll_fp"])
        for r in lm_doc_scores(df).collect()
    }
    assert got == want
    # sanity: the repetitive doc ("a a a") is the most predictable
    avg = {d: got[d][1] / got[d][0] for d in got}
    assert avg[1] == min(avg.values())


def test_dsir_weights_match_python_reference(spark):
    """dsir_importance_weights == a direct python replay of the two
    add-one unigram models on a planted bilingual corpus (target =
    lang 'en'): per-token fixed-point log-ratio floors, shared raw
    vocabulary, docs without tokens dropped."""
    import math

    from stripe_data_pipeline_spark.operators.text import (
        dsir_importance_weights,
    )

    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog sat"),
        (3, "de", "der hund sass auf der matte"),
        (4, "de", "the der cat hund"),  # mixed vocab
        (5, "en", ""),  # dropped: no tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logratio_fp"])
        for r in dsir_importance_weights(df).collect()
    }

    docs = {i: t.split() for i, _l, t in [(r[0], r[1], r[2]) for r in rows]}
    docs = {i: [w for w in ws if w] for i, ws in docs.items()}
    cr: dict[str, int] = {}
    ct: dict[str, int] = {}
    for i, _lang, text in rows:
        for w in [x for x in text.split(" ") if x]:
            cr[w] = cr.get(w, 0) + 1
            if _lang == "en":
                ct[w] = ct.get(w, 0) + 1
    nr = sum(cr.values())
    nt = sum(ct.values())
    v = len(cr)
    want = {}
    for i, _lang, text in rows:
        toks = [x for x in text.split(" ") if x]
        if not toks:
            continue
        total = 0
        for w in toks:
            lt = math.log((ct.get(w, 0) + 1) / (nt + v))
            lr = math.log((cr[w] + 1) / (nr + v))
            total += int(math.floor((lt - lr) * 1e9 + 0.5))
        want[i] = (len(toks), total)
    assert got == want
    # direction sanity: the pure-German doc scores LOWER under the
    # 'en' target than a pure-English doc of equal length class
    assert got[3][1] < got[1][1]


def test_gopher_flags_match_python_reference(spark):
    """gopher_quality_flags columns + composite pass vs direct
    computation on planted docs hitting every rule boundary."""
    from stripe_data_pipeline_spark.catalog.text_queries import (
        q_gopher_quality_flags,
    )

    rows = [
        # passes everything: >= 10 words, mean len in [3,10], alpha,
        # stop words
        (1, "the quick brown foxes jumped over the lazy sleeping dogs"),
        # too few words
        (2, "the cat sat"),
        # mean word length too small (all 1-2 chars)
        (3, "a a a a a a a a a a of the to in"),
        # symbol-heavy (### and ...)
        (4, "the ### x1 ... ### ... the of ### ... and to in word"),
        # no stop words
        (5, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # run the registered query against the planted frame by swapping
    # read_table for the duration of the call
    from stripe_data_pipeline_spark.catalog import text_queries as TQ

    real_read = TQ.read_table
    TQ.read_table = lambda spark_, sf_dir_, name_: df
    try:
        got = {r["doc_id"]: r.asDict() for r in
               q_gopher_quality_flags(spark, "ignored").collect()}
    finally:
        TQ.read_table = real_read

    stop = {"the", "a", "of", "and", "to", "in"}
    for i, text in rows:
        toks = [t for t in text.split(" ") if t]
        n = len(toks)
        mean_len = sum(len(t) for t in toks) / n
        alpha = sum(1 for t in toks if any(c.isalpha() and c.isascii() for c in t)) / n
        sym = sum(1 for t in toks if "#" in t or "..." in t) / n
        n_stop = sum(1 for t in toks if t in stop)
        r = got[i]
        assert r["n_words"] == n
        assert abs(r["mean_word_len"] - mean_len) < 1e-12
        assert abs(r["alpha_frac"] - alpha) < 1e-12
        assert abs(r["symbol_ratio"] - sym) < 1e-12
        assert r["n_stop"] == n_stop
        want_pass = (
            10 <= n <= 100000
            and 3.0 <= mean_len <= 10.0
            and alpha >= 0.8
            and sym <= 0.1
            and n_stop >= 2
        )
        assert r["passes"] == want_pass, (i, r)
    assert got[1]["passes"] is True
    for i in (2, 3, 4, 5):
        assert got[i]["passes"] is False, i
