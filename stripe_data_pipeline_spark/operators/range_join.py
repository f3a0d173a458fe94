"""Bucketized range join: point-in-interval without a nested-loop join.

Catalyst executes a non-equi join (``p.d BETWEEN i.start AND i.end``)
as BroadcastNestedLoopJoin — O(|points| × |intervals|) predicate
evaluations, the one physical plan SURVEY.md §4 calls out as
unacceptable at scale (fine only when one side is tiny).

The scalable rewrite: coarsen time into buckets (e.g. months),
explode each interval into the buckets it covers, equi-join points to
intervals on the bucket, then re-apply the exact range predicate.
Join cost becomes O(output + false-positives-within-bucket) with an
ordinary shuffled/broadcast hash join — and the bucket key is
partition-prunable storage layout at rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def point_in_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    how: str = "inner",
) -> DataFrame:
    """Join each point date to every interval [start, end] (closed)
    containing it, via month-bucket equi-join with the exact range
    predicate inside the join condition.

    Keeping the range predicate in the condition (not a post-filter)
    makes outer joins correct: a left join keeps unmatched points as
    NULL-padded rows instead of dropping them through the filter.
    Only inner and left are meaningful here.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"unsupported join type for range join: {how!r}")
    p = points.withColumn("__pb", F.trunc(F.col(point_col), "month"))
    i = intervals.withColumn(
        "__ib",
        F.explode(
            F.sequence(
                F.trunc(F.col(start_col), "month"),
                F.trunc(F.col(end_col), "month"),
                F.expr("interval 1 month"),
            )
        ),
    )
    cond = (
        (p["__pb"] == i["__ib"])
        & (p[point_col] >= i[start_col])
        & (p[point_col] <= i[end_col])
    )
    return p.join(i, cond, how).drop("__pb", "__ib")
