"""As-of (backward) join — an operator Spark's DataFrame API lacks.

Semantics (matching DuckDB/kdb/pandas ``merge_asof`` backward): for
each left row, attach the right row with the greatest right_ts such
that right_ts <= left_ts within the same key.

Spark-first composition (no nested-loop range join, no UDF):

    union(left-tagged, right-tagged)
      -> window per key ordered by (ts, right-first)
      -> last non-null right payload over UNBOUNDED PRECEDING
      -> keep left rows

One shuffle on the key — the same cost as a plain equi-join — versus
the naive range-join formulation that Catalyst would execute as a
BroadcastNestedLoopJoin over every (left, right) pair.

Right rows sort before left rows at equal timestamps, so the match is
inclusive (right_ts == left_ts matches), as DuckDB's ``ON l.ts >=
r.ts``. Right side must be unique per (key, ts) — pre-compact with a
deterministic tiebreak if not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
) -> DataFrame:
    """Backward as-of join; returns all left columns + ``payload``
    columns from the latest right row at-or-before the left timestamp
    (NULL when no such row)."""
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*left.columns).alias("__left"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__p_{c}") for c in payload],
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(
            l_tag.schema["__left"].dataType
        ).alias("__left"),
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    merged = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = merged.select(
        "__is_left",
        "__left",
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"__p_{c}")
            for c in payload
        ],
    )
    out = filled.filter(F.col("__is_left") == 1).select(
        "__left.*", *[F.col(f"__p_{c}").alias(c) for c in payload]
    )
    return out
