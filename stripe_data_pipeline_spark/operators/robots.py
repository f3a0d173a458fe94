"""robots.txt parsing and URL filtering — the crawl-politeness head of
the raw-web pipeline (RFC 9309 / the Googlebot REP subset every
production crawler implements). Reference scope: the reference
pipeline (mhd-adam/stripe-data-pipeline) has no crawl stage; this is
part of the LLM-training extension surface beside the WARC source and
the HTML extractor.

Everything is built from JVM-side DataFrame ops (split / posexplode /
window / regexp) — no Python UDF touches the hot path, so the decision
join scales to a full CommonCrawl URL list:

- :func:`parse_robots` turns raw robots.txt BODIES into a rule
  relation, reproducing the line-oriented group semantics: a rule
  belongs to the nearest preceding RUN of ``User-agent:`` lines (a run
  may name several agents — its rules apply to each), comments and
  blank lines are ignored, field names are case-insensitive, and an
  empty ``Disallow:`` is a no-op (allow-all marker).
- :func:`select_agent_rules` applies RFC group precedence: the group
  exactly matching the agent REPLACES the ``*`` group (they do not
  merge).
- :func:`robots_filter` decides per URL by LONGEST-MATCH specificity
  with Allow winning specificity ties (the Google rule); ``*`` and
  ``$`` pattern wildcards are translated to an anchored regex. A URL
  with no matching rule is allowed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def parse_robots(
    df: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """robots.txt text -> (host, agent, rule, path, spec) relation.

    One input row per host. Line association uses two windows over the
    per-host line index: run starts are ``User-agent`` lines whose
    previous line is not one; rules attach to the last run above them.
    """
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("idx", "line"),
    ).select(
        "host",
        "idx",
        # strip comments and whitespace; robots fields are
        # case-insensitive so normalize the field name only
        F.trim(F.regexp_replace("line", "#.*$", "")).alias("line"),
    ).filter(F.col("line") != "")
    parsed = lines.select(
        "host",
        "idx",
        F.lower(F.regexp_extract("line", r"^([A-Za-z-]+)\s*:", 1)).alias(
            "field"
        ),
        F.trim(F.regexp_extract("line", r"^[A-Za-z-]+\s*:(.*)$", 1)).alias(
            "value"
        ),
    ).filter(F.col("field").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("idx")
    runs = parsed.withColumn(
        "run_start",
        (
            (F.col("field") == "user-agent")
            & (
                F.coalesce(F.lag("field").over(w), F.lit(""))
                != "user-agent"
            )
        ).cast("int"),
    ).withColumn(
        "run_id",
        F.sum("run_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    agents = (
        runs.filter(F.col("field") == "user-agent")
        .groupBy("host", "run_id")
        .agg(F.collect_set(F.lower(F.col("value"))).alias("agents"))
    )
    rules = runs.filter(
        (F.col("field") != "user-agent") & (F.col("value") != "")
    ).select(
        "host", "run_id", F.col("field").alias("rule"), F.col("value").alias("path")
    )
    return (
        rules.join(agents, ["host", "run_id"])
        .select(
            "host",
            F.explode("agents").alias("agent"),
            "rule",
            "path",
            F.length("path").alias("spec"),
        )
    )


def select_agent_rules(rules: DataFrame, agent: str) -> DataFrame:
    """RFC 9309 group precedence: the group exactly matching ``agent``
    REPLACES the ``*`` group per host (no merging)."""
    agent = agent.lower()
    mine = rules.filter(F.col("agent").isin(agent, "*")).withColumn(
        "exact", (F.col("agent") == agent).cast("int")
    )
    best = mine.groupBy("host").agg(F.max("exact").alias("best"))
    return (
        mine.join(best, "host")
        .filter(F.col("exact") == F.col("best"))
        .select("host", "rule", "path", "spec")
    )


def _pattern_to_regex(path_col):
    """Translate a robots path pattern (literal prefix with ``*``
    wildcards and an optional ``$`` end anchor) into an anchored Java
    regex, escaping everything else."""
    escaped = F.regexp_replace(path_col, r"([.^$+?(){}\[\]\\|])", r"\\$1")
    wildcards = F.regexp_replace(escaped, r"\*", ".*")
    # Java replacement strings treat '$' as a group ref — escape it
    anchored = F.regexp_replace(wildcards, r"\\\$$", "\\$")
    return F.concat(F.lit("^"), anchored)


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Per-URL allow/deny by longest-match specificity, Allow winning
    ties; URLs with no matching rule are allowed. The rule relation is
    tiny next to a crawl URL list, so the join BROADCASTS and the
    verdict folds map-side (max of a (spec, is_allow) struct under
    partial aggregation — no window, no second shuffle)."""
    r = rules.select(
        F.col("host").alias("__r_host"),
        F.col("rule").alias("__r_rule"),
        F.col("path").alias("__r_path"),
        F.col("spec").alias("__r_spec"),
    )
    matched = (
        urls.join(
            F.broadcast(r), urls[host_col] == r["__r_host"], "left"
        )
        .withColumn(
            "hit",
            F.regexp_like(
                F.col(path_col), _pattern_to_regex(F.col("__r_path"))
            ),
        )
        .select(
            *[urls[c] for c in urls.columns],
            F.when(
                F.col("hit"),
                F.struct(
                    F.col("__r_spec").alias("spec"),
                    (F.col("__r_rule") == "allow")
                    .cast("int")
                    .alias("is_allow"),
                ),
            ).alias("verdict"),
        )
    )
    decided = matched.groupBy(*[F.col(c) for c in urls.columns]).agg(
        F.max("verdict").alias("verdict")
    )
    return decided.select(
        *urls.columns,
        F.coalesce(F.col("verdict.is_allow") == 1, F.lit(True)).alias(
            "allowed"
        ),
    )
