"""Incremental near-dup dedup against a PERSISTED MinHash-LSH index
(r14) — the shape that survives 100 TB ingest.

Every near-dup operator in operators/dedup.py compares a corpus
against itself: fine for a one-shot sweep, but a production ingest
pipeline receives a few GB of new documents into a multi-TB corpus
every hour, and re-LSH-ing the whole corpus per batch is O(corpus)
work for O(batch) new data. The incremental shape inverts it:

* the corpus is represented ONCE as a persisted signature index — a
  transaction GROUP (table_group.py) of two manifest tables,
  ``sigs`` (doc_id, mh_0..mh_{n-1}) and ``bands`` (doc_id, band,
  key) — so lookups never touch corpus text again;
* a new batch computes its own signatures (O(batch), the JVM-side
  md5-affine family of operators/dedup.py:181), probes the index by
  band-key equi-join, estimates Jaccard as the matching fraction of
  the two signatures, and marks docs whose best estimate clears the
  threshold as duplicates of the earliest matching corpus doc;
* the survivors' signatures + band rows are APPENDED to the index in
  one atomic multi-table group commit — so the next batch dedups
  against base+batch1 without either rescan or torn index state
  (a crash mid-append leaves the group pointer on the old run).

Scale shape: the probe restricts the index scan to the BATCH's band
keys first — one broadcast semi-join of a batch-sized key set — so
every downstream step (the hot-bucket occupancy count, the candidate
join, the signature compare) works on batch-proportional rows, never
a full-index aggregate (r14 review fix). The index side additionally
carries per-file min/max stats on ``key`` (stats_cols), so
point-lookup consumers using ``read_group_table(stats_filter=...)``
file-prune the bands table the same way bloom_pruned_scan/zorder do.
The lookup-time hot-bucket cap (index band keys held by more than
``max_bucket`` docs are skipped) bounds candidate fan-out exactly
like minhash_lsh_candidates' cap, evaluated against CURRENT index
occupancy of the probed keys so it keeps holding as the index grows.

Semantics (documented, mirrored closed-form by the driver oracle):

* est_jaccard = |{i : mh_i(batch) == mh_i(index)}| / num_hashes — the
  standard unbiased MinHash estimate, an exact k/num_hashes rational
  so the DuckDB oracle matches bit-for-bit;
* a batch doc is a DUPLICATE iff some band-key collision partner in
  the index has est_jaccard >= threshold; ``dup_of`` is the smallest
  qualifying corpus doc_id, ``best_est`` the largest qualifying
  estimate;
* batch-INTERNAL near-dups are out of scope by design — run the
  intra-batch operators (exact_dedup_keepers / lsh_quality_keepers)
  first; two mutually-duplicate batch docs with no index match are
  both admitted;
* re-delivered docs (doc_id already in the index) estimate 1.0
  against themselves and are NOT re-admitted — redelivery is
  idempotent by construction.

No reference-repo counterpart (the reference delegates dedup to
BigQuery full rescans); the incremental design follows the public
BigCode/the-stack dedup writeups and standard LSH practice.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import table_group as TG
from stripe_data_pipeline_spark.operators.dedup import (
    band_rows,
    minhash_signatures,
)

SIGS, BANDS, DECISIONS = "sigs", "bands", "decisions"


def _index_parts(
    df: DataFrame, id_col: str, num_hashes: int, k: int, band_size: int
) -> tuple[DataFrame, DataFrame]:
    sigs = minhash_signatures(df, id_col, num_hashes, k)
    # both group members consume the signature pipeline; materialize
    # it once (the in-session analogue of the staging table a real
    # ingest DAG would land)
    sigs = sigs.localCheckpoint(eager=True)
    return sigs, band_rows(sigs, id_col, num_hashes, band_size)


def build_dedup_index(
    spark: SparkSession,
    root: str,
    corpus: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 3,
    band_size: int = 4,
    with_decisions: bool = False,
) -> None:
    """Create the index group at ``root`` and commit the corpus'
    signatures + band rows as its first atomic run.

    ``with_decisions=True`` registers a third group member,
    ``decisions`` — the per-doc admit/duplicate ledger that
    ``ingest_batch(record_decisions=True)`` commits ATOMICALLY with
    each batch's index append (the streaming ingest shape: the
    decision a batch's consumers act on and the index state the next
    batch probes become visible together, and a redelivered epoch
    skips BOTH through the same txn ledger)."""
    sigs, bands = _index_parts(corpus, id_col, num_hashes, k, band_size)
    tables = {
        SIGS: os.path.join(root, SIGS),
        BANDS: os.path.join(root, BANDS),
    }
    if with_decisions:
        tables[DECISIONS] = os.path.join(root, DECISIONS)
    TG.create_group(root, tables)
    TG.group_merge_atomic(
        spark,
        root,
        {
            SIGS: {"updates": sigs, "keys": [id_col]},
            BANDS: {
                "updates": bands,
                "keys": [id_col, "band"],
                "partition_by": "band",
                "stats_cols": ["key"],
            },
        },
    )


def dedup_against_index(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 16,
    k: int = 3,
    band_size: int = 4,
    max_bucket: int = 200,
) -> DataFrame:
    """Pure lookup (no index mutation): per-batch-doc decisions
    ``(id, is_dup, n_dup_matches, dup_of, best_est)`` against the
    index group's CURRENT pinned run."""
    decisions, _ = _decide(
        spark, root, batch, id_col, threshold,
        num_hashes, k, band_size, max_bucket,
    )
    return decisions


def _decide(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    id_col: str,
    threshold: float,
    num_hashes: int,
    k: int,
    band_size: int,
    max_bucket: int,
) -> tuple[DataFrame, DataFrame]:
    """(decisions, batch signature frame) — the sigs come back so
    ingest_batch appends them without re-running the signature
    pipeline over the batch text."""
    sigs_b, bands_b = _index_parts(batch, id_col, num_hashes, k, band_size)
    sigs_i = TG.read_group_table(spark, root, SIGS)
    bands_i = TG.read_group_table(spark, root, BANDS)
    # Restrict the index scan to the BATCH's band keys FIRST (one
    # broadcast semi of a batch-sized key set), then evaluate the
    # hot-bucket cap on that slice only. Occupancy per surviving key
    # is identical to a global count — every index row for a key is in
    # the slice — but the probe's aggregate is now O(batch-keyed index
    # rows), not a full-index shuffle per batch (r14 review: the
    # previous global groupBy re-aggregated the whole bands table on
    # every lookup, exactly the O(corpus)-per-batch regime this module
    # exists to avoid, and scanned it twice at full width).
    batch_keys = bands_b.select("band", "key").distinct()
    hit = bands_i.join(
        F.broadcast(batch_keys), ["band", "key"], "inner"
    ).localCheckpoint(eager=True)  # two consumers: occupancy + join
    kept = (
        hit.groupBy("band", "key")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") <= max_bucket)
        .drop("bucket_n")
    )
    bands_hit = hit.join(kept, ["band", "key"], "inner")
    cand = (
        bands_b.alias("b")
        .join(
            bands_hit.alias("i"),
            (F.col("b.band") == F.col("i.band"))
            & (F.col("b.key") == F.col("i.key")),
        )
        .select(
            F.col(f"b.{id_col}").alias("bid"),
            F.col(f"i.{id_col}").alias("iid"),
        )
        .distinct()
    )
    eq = None
    for i in range(num_hashes):
        term = (F.col(f"sb.mh_{i}") == F.col(f"si.mh_{i}")).cast("int")
        eq = term if eq is None else eq + term
    est = (
        cand.join(
            sigs_b.alias("sb"), F.col("bid") == F.col(f"sb.{id_col}")
        )
        .join(sigs_i.alias("si"), F.col("iid") == F.col(f"si.{id_col}"))
        .select(
            "bid",
            "iid",
            (eq / F.lit(float(num_hashes))).alias("est"),
        )
    )
    hits = (
        est.filter(F.col("est") >= F.lit(threshold))
        .groupBy("bid")
        .agg(
            F.count(F.lit(1)).alias("n_dup_matches"),
            F.min("iid").alias("dup_of"),
            F.max("est").alias("best_est"),
        )
    )
    decisions = (
        sigs_b.select(F.col(id_col))
        .join(hits, F.col(id_col) == F.col("bid"), "left")
        .select(
            id_col,
            F.col("n_dup_matches").isNotNull().alias("is_dup"),
            F.coalesce("n_dup_matches", F.lit(0))
            .cast("bigint")
            .alias("n_dup_matches"),
            F.col("dup_of").cast("bigint").alias("dup_of"),
            F.col("best_est").cast("double").alias("best_est"),
        )
    )
    return decisions, sigs_b


def ingest_batch(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 16,
    k: int = 3,
    band_size: int = 4,
    max_bucket: int = 200,
    record_decisions: bool = False,
    txn_app: str | None = None,
    txn_version: int | None = None,
) -> DataFrame:
    """Decide, then atomically append the survivors' signatures +
    band rows to the index (one group commit — the next batch sees
    base+keepers or neither). Returns the decisions, MATERIALIZED
    before the append so the returned frame can never observe the
    index state its own keepers created (pinned in
    tests/test_incdedup.py).

    ``record_decisions=True`` lands the decisions as a third table of
    the SAME group commit (requires ``build_dedup_index(...,
    with_decisions=True)``). ``txn_app``/``txn_version`` pass through
    to the group's per-table txn ledger — the foreachBatch epoch id,
    so a crashed micro-batch's redelivery skips the already-committed
    append instead of double-inserting (exactly-once; the decision
    rows a redelivery RECOMPUTES would differ — its own keepers are
    in the index by then, estimating 1.0 against themselves — which
    is exactly why the STORED decisions are the batch's truth and the
    ledger must skip them too; pinned in tests/test_incdedup.py)."""
    decisions, sigs_b = _decide(
        spark, root, batch, id_col, threshold,
        num_hashes, k, band_size, max_bucket,
    )
    decisions = decisions.localCheckpoint(eager=True)
    keeper_ids = decisions.filter(~F.col("is_dup")).select(id_col)
    sigs_k = sigs_b.join(keeper_ids, id_col, "semi")
    bands_k = band_rows(sigs_k, id_col, num_hashes, band_size)
    batches = {
        SIGS: {"updates": sigs_k, "keys": [id_col]},
        BANDS: {
            "updates": bands_k,
            "keys": [id_col, "band"],
            "partition_by": "band",
            "stats_cols": ["key"],
        },
    }
    if record_decisions:
        batches[DECISIONS] = {"updates": decisions, "keys": [id_col]}
    TG.group_merge_atomic(
        spark, root, batches, txn_app=txn_app, txn_version=txn_version
    )
    return decisions
