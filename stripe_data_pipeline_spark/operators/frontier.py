"""Crawl-frontier politeness scheduler (r14) — the last missing step
of the crawl head (WARC ingest -> HTML extraction -> URL
canonicalization/dedup -> robots filtering -> THIS): a distributed
fetcher must bound requests per HOST per scheduling cycle (the
politeness budget every production crawler enforces alongside
robots.txt crawl-delay), so the frontier is partitioned by host,
ranked by priority inside each host, and striped into fetch cycles of
at most ``per_host_per_cycle`` URLs.

Spark shape: ONE window (row_number over host, ordered by priority
then URL for full determinism) — a single hash exchange on host. At
100 TB of frontier this is exactly the partitioning the fetch fleet
wants anyway (host-locality: one executor owns a host's queue, DNS
and connection reuse come free), and the per-host cap is itself the
skew bound — a pathological host contributes at most
``per_host_per_cycle`` URLs per cycle regardless of its frontier
share, so no salting is needed where it matters.

Parity anchor: the reference pipeline has no crawl scheduler (it is a
Stripe-API ELT); this extends the repo's crawl head
(sources/warc_source.py, operators/urlnorm.py, operators/robots.py)
with the standard frontier semantics from the public crawler
literature (Mercator-style per-host queues; Heydon & Najork 1999).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def url_host(url: Column) -> Column:
    """The lowercased HOST of a URL (userinfo and port stripped) —
    the politeness key. Pure JVM regexp chain in the RE2-common
    subset, same component-isolation discipline as
    operators/urlnorm.py: authority first ('#' and '?' terminate
    it), then drop userinfo at the first '@', then the trailing
    ':port' digits (a bracketed IPv6 literal keeps its brackets and
    loses only a real port)."""
    authority = F.regexp_extract(url, "^[^:/?#]+://([^/?#]*)", 1)
    hostport = F.regexp_replace(authority, "^[^@]*@", "")
    return F.lower(F.regexp_replace(hostport, ":[0-9]+$", ""))


def schedule_frontier(
    frontier: DataFrame,
    url_col: str = "url",
    priority_col: str = "priority",
    per_host_per_cycle: int = 20,
) -> DataFrame:
    """Assign each frontier URL its host, in-host rank and fetch
    cycle: rank = row_number over (host, priority DESC, url ASC —
    the URL tiebreak makes the schedule fully deterministic),
    fetch_cycle = (rank-1) // per_host_per_cycle. Cycle 0 is the next
    polite batch; a host with N queued URLs needs ceil(N / cap)
    cycles however hot it is — the budget, not the data, bounds
    per-host work."""
    if per_host_per_cycle < 1:
        raise ValueError(
            f"per_host_per_cycle must be >= 1, got {per_host_per_cycle}"
        )
    w = Window.partitionBy("host").orderBy(
        F.col(priority_col).desc(), F.col(url_col).asc()
    )
    return (
        frontier.withColumn("host", url_host(F.col(url_col)))
        .withColumn("host_rank", F.row_number().over(w))
        .withColumn(
            "fetch_cycle",
            ((F.col("host_rank") - 1) / per_host_per_cycle).cast("bigint"),
        )
    )
