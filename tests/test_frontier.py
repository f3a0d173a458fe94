"""Unit pins for the crawl-frontier politeness scheduler
(operators/frontier.py, r14) — the edge cases the driver-oracle query
(crawl_frontier_schedule_check) does not synthesize: host extraction
through userinfo/ports/IPv6, budget arithmetic at the cycle
boundaries, rank determinism under priority ties, and the cap
validation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from stripe_data_pipeline_spark.operators.frontier import (
    schedule_frontier,
    url_host,
)


def test_url_host_component_isolation(spark):
    cases = {
        "https://Host.Example/x": "host.example",
        # userinfo dropped; ANY port dropped (the politeness key is
        # the host itself — one server, one budget, whatever the port)
        "https://u:p@host.example:8443/x": "host.example",
        "http://[2001:DB8::1]:8080/x": "[2001:db8::1]",
        "http://[2001:db8::1]/x": "[2001:db8::1]",
        "https://a.example/path@with/at?u=b@c": "a.example",
    }
    df = spark.createDataFrame([(u,) for u in cases], "raw string")
    got = [
        r.h for r in df.select(url_host(F.col("raw")).alias("h")).collect()
    ]
    for (raw, want), g in zip(cases.items(), got):
        assert g == want, f"{raw!r}: {g!r} != {want!r}"


def test_schedule_budget_and_determinism(spark):
    # one host, 7 URLs, cap 3 -> cycles 0,0,0,1,1,1,2; priority ties
    # broken by URL ascending (deterministic schedule)
    rows = [(f"https://h.example/p{i}", 5 if i < 4 else 1) for i in range(7)]
    df = spark.createDataFrame(rows, "url string, priority int")
    out = schedule_frontier(df, per_host_per_cycle=3).orderBy("host_rank")
    got = [(r.url, r.host_rank, r.fetch_cycle) for r in out.collect()]
    # priority-5 URLs (p0..p3) rank 1-4 in URL order, then p4..p6
    assert [g[0] for g in got] == [
        f"https://h.example/p{i}" for i in range(7)
    ]
    assert [g[2] for g in got] == [0, 0, 0, 1, 1, 1, 2]
    # a second run produces the identical schedule
    again = [
        (r.url, r.host_rank, r.fetch_cycle)
        for r in schedule_frontier(df, per_host_per_cycle=3)
        .orderBy("host_rank")
        .collect()
    ]
    assert again == got


def test_schedule_hosts_are_independent(spark):
    rows = [
        (f"https://h{i % 2}.example/p{i}", i) for i in range(10)
    ]  # 5 URLs each on two hosts
    df = spark.createDataFrame(rows, "url string, priority int")
    out = schedule_frontier(df, per_host_per_cycle=2)
    cyc = {
        (r.host, r.fetch_cycle): 1
        for r in out.groupBy("host", "fetch_cycle").count().collect()
    }
    # each host independently needs ceil(5/2) = 3 cycles
    assert sorted(cyc) == [
        ("h0.example", 0), ("h0.example", 1), ("h0.example", 2),
        ("h1.example", 0), ("h1.example", 1), ("h1.example", 2),
    ]


def test_schedule_rejects_bad_cap(spark):
    df = spark.createDataFrame(
        [("https://h.example/p", 1)], "url string, priority int"
    )
    with pytest.raises(ValueError, match="per_host_per_cycle"):
        schedule_frontier(df, per_host_per_cycle=0)
