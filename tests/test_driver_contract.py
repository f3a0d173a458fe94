"""Driver-contract invariants that don't need a SparkSession: the
priority ordering must (a) name only registered queries, (b) contain
every registered query exactly once, and (c) put every query that
lacks a prior-round driver verdict inside the 50-query window the
driver actually checks (VERDICT r02 #4 — the rotation rule)."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "entry_under_test", os.path.join(REPO, "__spark_entry__.py")
)
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)

WINDOW = 50


def _latest_correctness() -> set[str]:
    names: set[str] = set()
    rounds = sorted(
        f for f in os.listdir(REPO)
        if f.startswith("CORRECTNESS_r") and f.endswith(".json")
    )
    for f in rounds:
        with open(os.path.join(REPO, f)) as fh:
            names |= set(json.load(fh))
    return names


def test_ordering_covers_the_registry_exactly_once():
    from stripe_data_pipeline_spark.catalog import QUERIES

    prio = entry._PRIORITY
    assert len(prio) == len(set(prio)), "duplicate names in _PRIORITY"
    assert set(prio) <= set(QUERIES), sorted(set(prio) - set(QUERIES))
    ordered = list(entry.queries())
    assert len(ordered) == len(set(ordered))
    assert set(ordered) == set(QUERIES)


def test_window_covers_every_query_without_a_driver_verdict():
    """When the never-checked set fits the window, all of it must be
    inside; when a round adds MORE than 50 new queries (round 9 did),
    full same-round coverage is impossible — the strongest achievable
    invariant is that no window slot is WASTED on an already-verified
    query, and the spill-over (window-sized backlog minus window)
    must lead the next round's rotation."""
    from stripe_data_pipeline_spark.catalog import QUERIES

    checked = _latest_correctness()
    window = set(list(entry.queries())[:WINDOW])
    unchecked = set(QUERIES) - checked
    if len(unchecked) <= WINDOW:
        assert unchecked <= window, (
            "queries with no driver verdict are outside the next check "
            f"window: {sorted(unchecked - window)}"
        )
    else:
        assert window <= unchecked, (
            "window slots wasted on already-verified queries while "
            f"unchecked ones spill: {sorted(window - unchecked)}"
        )


def test_every_oracle_names_a_registered_query():
    from stripe_data_pipeline_spark.catalog import QUERIES

    oracles = set(entry.oracle_sql())
    assert oracles <= set(entry.queries())
    # rows-only stays a small, deliberate set (engine-specific ops)
    rows_only = set(entry.queries()) - oracles
    assert len(rows_only) <= 10, sorted(rows_only)
