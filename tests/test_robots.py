"""robots.txt operator (operators/robots.py): RFC 9309 / Googlebot REP
subset — group parsing, exact-agent replacement of '*', longest-match
with Allow winning ties, wildcard and end-anchor patterns, and the
broadcast decision plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.robots import (
    parse_robots,
    robots_filter,
    select_agent_rules,
)

BODY = """# comment line
User-agent: *
Disallow: /tmp/
Allow: /tmp/keep
Disallow:

User-Agent: trainbot
User-agent: otherbot
disallow: /blocked/
ALLOW: /blocked/ok$
Disallow: /wild*card/
"""


def _rules(spark, agent):
    robots = spark.createDataFrame([("h.example", BODY)], "host string, body string")
    return select_agent_rules(parse_robots(robots), agent)


def _decide(spark, agent, paths):
    urls = spark.createDataFrame(
        [(i, "h.example", p) for i, p in enumerate(paths)],
        "uid long, host string, path string",
    )
    out = robots_filter(urls, _rules(spark, agent))
    return {r["path"]: r["allowed"] for r in out.collect()}


def test_parse_groups_comments_case_and_empty_disallow(spark):
    robots = spark.createDataFrame([("h", BODY)], "host string, body string")
    rules = parse_robots(robots)
    rows = {(r["agent"], r["rule"], r["path"]) for r in rules.collect()}
    # the empty Disallow line parses to NO rule (allow-all no-op)
    assert ("*", "disallow", "/tmp/") in rows
    assert ("*", "allow", "/tmp/keep") in rows
    # multi-agent run: both agents get the group's rules,
    # case-insensitive field names normalized
    assert ("trainbot", "disallow", "/blocked/") in rows
    assert ("otherbot", "disallow", "/blocked/") in rows
    assert ("trainbot", "allow", "/blocked/ok$") in rows
    assert not any(p == "" for (_a, _r, p) in rows)


def test_exact_agent_group_replaces_star(spark):
    star = {(r["rule"], r["path"]) for r in _rules(spark, "somebody").collect()}
    bot = {(r["rule"], r["path"]) for r in _rules(spark, "TrainBot").collect()}
    assert ("disallow", "/tmp/") in star and ("disallow", "/blocked/") not in star
    # replacement, not merge: trainbot sees ONLY its own group
    assert ("disallow", "/blocked/") in bot and ("disallow", "/tmp/") not in bot


def test_longest_match_allow_ties_and_wildcards(spark):
    got = _decide(
        spark,
        "somebody",
        ["/tmp/x", "/tmp/keep/file", "/elsewhere", "/tmp"],
    )
    assert got == {
        "/tmp/x": False,  # Disallow /tmp/
        "/tmp/keep/file": True,  # longer Allow wins
        "/elsewhere": True,  # no matching rule
        "/tmp": True,  # /tmp does not match /tmp/ prefix
    }
    got = _decide(
        spark,
        "trainbot",
        ["/blocked/ok", "/blocked/okno", "/blocked/z", "/wildXYZcard/a", "/tmp/x"],
    )
    assert got == {
        "/blocked/ok": True,  # $-anchored Allow, exact
        "/blocked/okno": False,  # anchor does NOT match a longer path
        "/blocked/z": False,
        "/wildXYZcard/a": False,  # * wildcard inside the pattern
        "/tmp/x": True,  # star group replaced: /tmp/ not blocked
    }


def test_regex_metachars_in_patterns_are_literal(spark):
    body = "User-agent: *\nDisallow: /a.b(c)/\n"
    robots = spark.createDataFrame([("h", body)], "host string, body string")
    rules = select_agent_rules(parse_robots(robots), "x")
    urls = spark.createDataFrame(
        [(1, "h", "/a.b(c)/z"), (2, "h", "/aXb(c)/z")],
        "uid long, host string, path string",
    )
    got = {r["uid"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
    assert got == {1: False, 2: True}  # '.' must not match 'X'


def test_decision_plan_broadcasts_rules(spark, sf_dir):
    from stripe_data_pipeline_spark.catalog import QUERIES

    df = QUERIES["robots_filtered_crawl_check"].fn(spark, sf_dir)
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "SortMergeJoin" not in p
    assert "partial_max" in p  # verdict folds map-side
