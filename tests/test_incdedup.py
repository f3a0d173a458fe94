"""Incremental MinHash-LSH dedup index pins (operators/incdedup.py,
r14) — what the driver-oracle query (incremental_dedup_check) does
not isolate: exact estimate values, the lookup-time hot-bucket cap,
keeper-append/group atomicity, redelivery idempotence, and the
decisions-materialized-before-append rule."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import table_group as TG
from stripe_data_pipeline_spark.operators import incdedup as I


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


_BASE_TEXT = "the quick brown fox jumps over the lazy dog again and again"


@pytest.fixture()
def index_root(spark, tmp_path):
    root = str(tmp_path / "idx")
    base = _docs(
        spark,
        [
            (1, _BASE_TEXT),
            (2, "completely different words about spark shuffles here"),
            (3, "a third unrelated document mentioning parquet files only"),
        ],
    )
    I.build_dedup_index(spark, root, base)
    return root


def test_exact_duplicate_estimates_one(spark, index_root):
    dec = I.dedup_against_index(
        spark, index_root, _docs(spark, [(100, _BASE_TEXT)])
    ).collect()[0]
    assert dec.is_dup and dec.dup_of == 1 and dec.best_est == 1.0


def test_near_dup_estimate_is_exact_rational(spark, index_root):
    # appending one token perturbs a k-1 suffix of shingles; the
    # estimate is some exact k/16 rational >= 0.5, never a fuzzy float
    dec = I.dedup_against_index(
        spark, index_root, _docs(spark, [(100, _BASE_TEXT + " zz")])
    ).collect()[0]
    assert dec.is_dup and dec.dup_of == 1
    assert dec.best_est * 16 == int(dec.best_est * 16)
    assert dec.best_est >= 0.5


def test_non_dup_admitted_and_visible_to_next_batch(spark, index_root):
    d1 = I.ingest_batch(
        spark, index_root,
        _docs(spark, [(10, "fresh novel content nothing shared at all")]),
    ).collect()[0]
    assert not d1.is_dup and d1.n_dup_matches == 0 and d1.dup_of is None
    # the NEXT batch must see doc 10 through the appended index
    d2 = I.dedup_against_index(
        spark, index_root,
        _docs(spark, [(20, "fresh novel content nothing shared at all")]),
    ).collect()[0]
    assert d2.is_dup and d2.dup_of == 10 and d2.best_est == 1.0


def test_duplicate_not_appended(spark, index_root):
    before = TG.read_group_table(spark, index_root, I.SIGS).count()
    I.ingest_batch(spark, index_root, _docs(spark, [(100, _BASE_TEXT)]))
    assert TG.read_group_table(spark, index_root, I.SIGS).count() == before


def test_redelivery_is_idempotent(spark, index_root):
    batch = _docs(spark, [(50, "some new content for the redelivery pin")])
    d_first = I.ingest_batch(spark, index_root, batch).collect()[0]
    assert not d_first.is_dup
    n = TG.read_group_table(spark, index_root, I.SIGS).count()
    # redelivered: doc 50 estimates 1.0 against itself, not re-admitted
    d_again = I.ingest_batch(spark, index_root, batch).collect()[0]
    assert d_again.is_dup and d_again.dup_of == 50 and d_again.best_est == 1.0
    assert TG.read_group_table(spark, index_root, I.SIGS).count() == n


def test_hot_bucket_cap_skips_degenerate_keys(spark, tmp_path):
    root = str(tmp_path / "hot")
    # 5 identical docs -> every band key has occupancy 5
    base = _docs(spark, [(i, _BASE_TEXT) for i in range(5)])
    I.build_dedup_index(spark, root, base)
    probe = _docs(spark, [(100, _BASE_TEXT)])
    capped = I.dedup_against_index(
        spark, root, probe, max_bucket=4
    ).collect()[0]
    assert not capped.is_dup and capped.n_dup_matches == 0
    uncapped = I.dedup_against_index(
        spark, root, probe, max_bucket=5
    ).collect()[0]
    assert uncapped.is_dup and uncapped.n_dup_matches == 5


def test_decisions_materialized_before_append(spark, index_root):
    """The frame ingest_batch returns reflects the PRE-append index:
    collecting it after the append must not turn its own keepers
    into self-duplicates."""
    batch = _docs(
        spark,
        [(60, "materialization pin content alpha beta gamma")],
    )
    decisions = I.ingest_batch(spark, index_root, batch)
    # the append has happened; a FRESH lookup sees a self-match...
    fresh = I.dedup_against_index(spark, index_root, batch).collect()[0]
    assert fresh.is_dup and fresh.dup_of == 60
    # ...but the returned decisions still say "admitted"
    got = decisions.collect()[0]
    assert not got.is_dup and got.dup_of is None


def test_group_pointer_advances_atomically(spark, index_root):
    g0 = TG.read_group(index_root)
    I.ingest_batch(
        spark, index_root, _docs(spark, [(70, "atomic pointer pin text")])
    )
    g1 = TG.read_group(index_root)
    assert g1["version"] == g0["version"] + 1
    # both member tables advanced together
    assert (
        g1["tables"][I.SIGS]["version"] > g0["tables"][I.SIGS]["version"]
    )
    assert (
        g1["tables"][I.BANDS]["version"] > g0["tables"][I.BANDS]["version"]
    )


def test_bands_table_partitioned_by_band(spark, index_root):
    # the scale layout: band rows land partitioned by band so the
    # probe's exchange co-locates, and key stats enable file pruning
    parts = os.listdir(os.path.join(index_root, I.BANDS, "parts"))
    assert any(p.startswith("0-") for p in parts)
    bands = TG.read_group_table(spark, index_root, I.BANDS)
    assert set(bands.columns) == {"doc_id", "band", "key"}
    assert bands.select("band").distinct().count() == 4


def test_redelivery_with_changed_text_updates_in_place(spark, index_root):
    """A redelivered doc_id whose text CHANGED enough to miss itself
    is 'admitted' again — the group merge upserts on doc_id, so its
    signature row and band rows are REPLACED, never duplicated (the
    index holds exactly one signature + n_bands band rows per doc)."""
    I.ingest_batch(
        spark, index_root,
        _docs(spark, [(80, "first version content words here")]),
    )
    I.ingest_batch(
        spark, index_root,
        _docs(spark, [(80, "totally rewritten second iteration text")]),
    )
    sigs = TG.read_group_table(spark, index_root, I.SIGS)
    assert sigs.filter(F.col("doc_id") == 80).count() == 1
    bands = TG.read_group_table(spark, index_root, I.BANDS)
    assert bands.filter(F.col("doc_id") == 80).count() == 4
    # and the CURRENT text is what the index now answers with
    d = I.dedup_against_index(
        spark, index_root,
        _docs(spark, [(90, "totally rewritten second iteration text")]),
    ).collect()[0]
    assert d.is_dup and d.dup_of == 80 and d.best_est == 1.0


@pytest.fixture()
def index_root3(spark, tmp_path):
    """A 3-member group (sigs + bands + decisions) — the streaming
    ingest shape."""
    root = str(tmp_path / "idx3")
    base = _docs(
        spark,
        [
            (1, _BASE_TEXT),
            (2, "completely different words about spark shuffles here"),
        ],
    )
    I.build_dedup_index(spark, root, base, with_decisions=True)
    return root


def test_decisions_table_committed_in_same_group_version(spark, index_root3):
    g0 = TG.read_group(index_root3)
    dec = I.ingest_batch(
        spark, index_root3,
        _docs(spark, [(10, "novel decision-ledger pin content"),
                      (11, _BASE_TEXT)]),
        record_decisions=True,
    )
    g1 = TG.read_group(index_root3)
    assert g1["version"] == g0["version"] + 1
    stored = {
        r.doc_id: r
        for r in TG.read_group_table(spark, index_root3, I.DECISIONS).collect()
    }
    assert set(stored) == {10, 11}
    assert not stored[10].is_dup and stored[11].is_dup
    assert stored[11].dup_of == 1
    # stored decisions == returned decisions, column for column
    assert sorted(map(tuple, dec.collect())) == sorted(
        map(tuple, stored.values())
    )


def test_txn_ledger_skips_redelivered_epoch_for_all_three_tables(
    spark, index_root3
):
    batch = _docs(spark, [(20, "exactly once epoch pin content")])
    I.ingest_batch(
        spark, index_root3, batch, record_decisions=True,
        txn_app="t", txn_version=7,
    )
    counts = lambda: (  # noqa: E731
        TG.read_group_table(spark, index_root3, I.SIGS).count(),
        TG.read_group_table(spark, index_root3, I.BANDS).count(),
        TG.read_group_table(spark, index_root3, I.DECISIONS).count(),
    )
    before = counts()
    dec_stored = TG.read_group_table(spark, index_root3, I.DECISIONS).collect()
    # redelivery of epoch 7: every member table skips via its ledger —
    # crucially INCLUDING decisions, because the recomputed decision
    # for doc 20 would now (wrongly, for the original batch) say dup
    I.ingest_batch(
        spark, index_root3, batch, record_decisions=True,
        txn_app="t", txn_version=7,
    )
    assert counts() == before
    assert (
        TG.read_group_table(spark, index_root3, I.DECISIONS).collect()
        == dec_stored
    )
    # the NEXT epoch commits normally
    I.ingest_batch(
        spark, index_root3,
        _docs(spark, [(21, "next epoch fresh content pin")]),
        record_decisions=True, txn_app="t", txn_version=8,
    )
    assert counts() == (before[0] + 1, before[1] + 4, before[2] + 1)


def test_record_decisions_without_member_refuses(spark, index_root):
    with pytest.raises(KeyError, match="decisions"):
        I.ingest_batch(
            spark, index_root,
            _docs(spark, [(30, "no decisions member in this group")]),
            record_decisions=True,
        )
