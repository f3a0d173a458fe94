"""Bench regression guard (VERDICT r02 #6): the pinned per-query
baseline must exist, and the guard must fire on a deliberately slowed
query without running the full bench."""

from __future__ import annotations

import bench


def test_baseline_artifact_pins_headline_queries():
    baseline = bench.load_baseline()
    assert baseline is not None, "bench_baseline.json missing/unparseable"
    pinned = baseline["queries"]
    # every pinned query is still a registered headline query
    assert set(pinned) <= set(bench.HEADLINE)
    assert all(sec > 0 for sec in pinned.values())
    assert baseline["regression_factor"] == 2.0


def test_guard_fires_on_deliberately_slowed_query():
    baseline = {
        "regression_factor": 2.0,
        "queries": {"q_fast": 1.0, "q_slow": 1.0},
    }
    timings = {"q_fast": 1.5, "q_slow": 2.5, "q_new_this_round": 99.0}
    flagged = bench.check_regressions(timings, baseline)
    assert flagged == ["q_slow"]  # slowed query fires; unpinned is skipped


def test_guard_quiet_without_baseline():
    assert bench.check_regressions({"q": 100.0}, None) == []
