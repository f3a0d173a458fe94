"""Invariants for the xxhash64 winnowing variant (VERDICT r9 #5).

The fast path has no DuckDB oracle — the hash VALUES shape the
selection and DuckDB cannot replay Spark's xxhash64 — so the
algorithmic guarantees are pinned here instead: the paper's k+w-1
locality theorem on planted overlaps, the every-window-coverage
property the selection rule implies, and density parity with the
oracle-checked md5 variant (the selection rule keeps ~2/(w+1) of
the k-gram stream regardless of which well-mixed hash ranks them).
"""

from __future__ import annotations

import pytest

from stripe_data_pipeline_spark.operators.winnow import (
    winnow_profile,
    winnow_select,
)

K, W = 8, 4


@pytest.mark.parametrize("fast", [False, True])
def test_locality_guarantee_planted_overlap(spark, fast):
    """Any shared substring of length >= k+w-1 (= 11) must surface as
    at least one shared fingerprint — for BOTH hash functions (the
    winnowing proof only needs a total order over k-gram hashes)."""
    shared = "QWERTYUIOPA"  # 11 chars
    df = spark.createDataFrame(
        [
            (1, "xqzkvwpm" + shared + "rtldnbgshjfy"),
            (2, "mfjdkwlsnvbc" + shared + "pzqoxhtu"),
            (3, "thequickbrownfoxjumpsoverthelazy"),
        ],
        "doc_id long, text string",
    )
    sel = winnow_select(df, k=K, w=W, fast=fast).collect()
    by_doc: dict = {}
    for r in sel:
        by_doc.setdefault(r["doc_id"], set()).add(r["h"])
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[1] & by_doc[3])


@pytest.mark.parametrize("fast", [False, True])
def test_every_window_contains_a_selection(spark, fast):
    """Selection must cover every w-window of the k-gram stream: for
    each window start p in [1, L-w+1] some selected pos lies in
    [p, p+w-1]. This is the structural property the rightmost-min
    rule guarantees independent of hash choice."""
    import random

    rng = random.Random(7)
    text = "".join(rng.choice("abcdefghij") for _ in range(120))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    sel_pos = sorted(
        r["pos"] for r in winnow_select(df, k=K, w=W, fast=fast).collect()
    )
    L = len(text) - K + 1
    for p in range(1, L - W + 2):
        assert any(p <= s <= p + W - 1 for s in sel_pos), (
            f"window at {p} has no selected fingerprint"
        )


def test_density_parity_with_md5_variant(spark, sf_dir):
    """Selection density (n_selected / n_kgrams) is a property of the
    RULE, not the hash: on real corpus data the xxhash64 variant must
    keep essentially the same fraction (~2/(w+1)) as the md5 one."""
    from stripe_data_pipeline_spark.io import read_table

    docs = read_table(spark, sf_dir, "documents").limit(200)
    out = {}
    for fast in (False, True):
        rows = winnow_profile(docs, k=K, w=W, fast=fast).collect()
        out[fast] = sum(r["n_selected"] for r in rows) / max(
            1, sum(r["n_kgrams"] for r in rows)
        )
    # same docs, same rule: densities agree within 5% relative
    assert abs(out[True] - out[False]) / out[False] < 0.05
    # and both sit near the paper's expected 2/(w+1) = 0.4
    assert 0.25 < out[True] < 0.55


def test_fast_variant_same_doc_set_and_counts_shape(spark):
    """Both variants must select fingerprints for exactly the same
    documents (the L >= w precondition is hash-independent) and obey
    the per-doc bounds: 1 <= n_selected <= n_windows."""
    df = spark.createDataFrame(
        [
            (1, "abcdefghijklmnopqrstuvwxyz"),
            (2, "short"),  # below k+w-1: skipped by both
            (3, "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz"),
        ],
        "doc_id long, text string",
    )
    prof_md5 = {r["doc_id"]: r for r in winnow_profile(df, k=K, w=W).collect()}
    prof_fast = {
        r["doc_id"]: r
        for r in winnow_profile(df, k=K, w=W, fast=True).collect()
    }
    assert set(prof_md5) == set(prof_fast) == {1, 3}
    for d, r in prof_fast.items():
        n_windows = r["n_kgrams"] - W + 1
        assert 1 <= r["n_selected"] <= n_windows
        assert r["fingerprint"] is not None


def test_invariants_all_flags_true_on_corpus(spark, sf_dir):
    """winnow_invariants (the driver-checked proof obligations of the
    xxhash64 path) must hold on real corpus data: every doc row has
    density_in_bounds, coverage_ok and corpus_density_in_band TRUE,
    and the exact counts replay from text lengths."""
    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.io import read_table
    from stripe_data_pipeline_spark.operators.winnow import winnow_invariants

    docs = read_table(spark, sf_dir, "documents").limit(300)
    inv = winnow_invariants(docs, k=K, w=W, fast=True)
    bad = inv.filter(
        ~F.col("density_in_bounds")
        | ~F.col("coverage_ok")
        | ~F.col("corpus_density_in_band")
        | (F.col("n_windows") != F.col("n_kgrams") - (W - 1))
    ).count()
    assert bad == 0
    # every eligible doc (L >= w) appears exactly once
    eligible = docs.filter(F.length("text") - K + 1 >= W).count()
    assert inv.count() == eligible


def test_invariants_catch_a_broken_selection(spark, monkeypatch):
    """The flags are not vacuous: a deliberately broken selection rule
    (drop every selected fingerprint at an even position — gaps can
    then exceed w and density can fall below n_windows/w) must fail
    coverage and/or density on a doc where the correct rule passes."""
    from pyspark.sql import functions as F

    import stripe_data_pipeline_spark.operators.winnow as wmod

    df = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz0123456789abcdefghij")],
        "doc_id long, text string",
    )
    ok = wmod.winnow_invariants(df, k=K, w=W, fast=True).collect()[0]
    assert ok["density_in_bounds"] and ok["coverage_ok"]

    real_select = wmod.winnow_select

    def broken_select(*a, **kw):
        return real_select(*a, **kw).filter(F.col("pos") % 2 == 1)

    monkeypatch.setattr(wmod, "winnow_select", broken_select)
    broken = wmod.winnow_invariants(df, k=K, w=W, fast=True).collect()[0]
    assert not (broken["density_in_bounds"] and broken["coverage_ok"])


# --- property test: the driver-checked invariants hold on ANY text ---

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def test_select_output_is_duplicate_free_without_distinct(spark):
    """r14 optimization pin: winnow_select dedups the per-window
    argmins with an adjacency lag filter instead of a distinct (the
    windows selecting one fingerprint are contiguous, so duplicates
    are adjacent). A long repeated run — where one minimal k-gram wins
    MANY consecutive windows — must still yield exactly one row per
    selected (doc, pos, h), and the set must match a plain distinct of
    itself."""
    from stripe_data_pipeline_spark.operators.winnow import winnow_select

    texts = [
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",  # maximal tie pressure
        "abcabcabcabcabcabcabcabc zzz abcabcabc",
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for fast in (False, True):
        rows = winnow_select(df, k=K, w=W, fast=fast).collect()
        tups = [(r["doc_id"], r["pos"], r["h"]) for r in rows]
        assert len(tups) == len(set(tups)), "lag dedup left duplicates"


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.text(alphabet="abcdefgh ", min_size=K + W - 1, max_size=80),
        min_size=1,
        max_size=5,
    )
)
def test_invariant_flags_hold_on_arbitrary_texts(spark, texts):
    """density_in_bounds and coverage_ok are THEOREMS of the selection
    rule — they must hold for any input, not just the corpus the
    driver happens to check (low-entropy alphabets maximize hash ties,
    the hardest case for the rightmost-min tie-break)."""
    from pyspark.sql import functions as F

    from stripe_data_pipeline_spark.operators.winnow import winnow_invariants

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    inv = winnow_invariants(
        df, k=K, w=W, fast=True, density_band_bp=(0, 10000)
    )
    bad = inv.filter(
        ~F.col("density_in_bounds") | ~F.col("coverage_ok")
    ).count()
    assert bad == 0
