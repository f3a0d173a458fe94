"""SCD Type 2 (slowly changing dimension) on the crash-atomic sink.

The reference's history model is "overwrite the lake snapshot,
accumulate history in the warehouse via incremental MERGE"
(README.md:102-117; SURVEY.md §1.4) — the dbt ecosystem's standard
tool for the same need is the snapshot (SCD2): each key keeps a row
per version with [valid_from, valid_to) validity, the current version
open-ended. This module implements that contract Spark-first.

Plan shape per batch: one equi-join of the batch against the CURRENT
version slice (|keys|-bounded, not history-bounded), a column-compare
to find real changes, then ONE crash-atomic merge keyed by
(key, valid_from) that simultaneously closes the superseded versions
(same composite key -> replaced with valid_to set) and inserts the new
ones. No window over history, no full-table rewrite. The state table
is rewritten WHOLE per batch unless ``partition_by`` names a stable
key-derived column (e.g. an entity hash bucket) — then the merge
rewrites only the touched partitions, which is the shape to use at
100 TB (ADVICE r4: the default unpartitioned path is fine for
dimension-sized state, not fact-sized state).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stripe_data_pipeline_spark import manifest_table as MT


def scd2_apply(
    spark: SparkSession,
    root: str,
    batch: DataFrame,
    keys: list[str],
    cursor_col: str,
    tracked: list[str] | None = None,
    partition_by: str | None = None,
) -> int:
    """Fold one as-of batch (key cols + attribute cols + ``cursor_col``
    = effective time) into the SCD2 state at ``root``. Returns the
    number of new versions written (changed + brand-new keys);
    unchanged keys cost nothing. Idempotent: re-delivering the same
    batch writes 0 versions. ``partition_by`` (a key-derived column
    present in the batch, e.g. a hash bucket of the business key)
    partitions the state table so each merge rewrites only touched
    partitions instead of the whole table — required hygiene once the
    state outgrows a dimension."""
    attrs = tracked or [
        c for c in batch.columns if c not in keys and c != cursor_col
    ]
    incoming = batch.select(
        *keys,
        *attrs,
        F.col(cursor_col).alias("valid_from"),
    )
    try:
        state = MT.read_table(spark, root)
        current = state.filter(F.col("is_current"))
    except FileNotFoundError:
        current = None

    if current is None:
        new_rows = incoming.select(
            *keys,
            *attrs,
            "valid_from",
            F.lit(None).cast(incoming.schema["valid_from"].dataType).alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        n = new_rows.count()
        MT.merge_upsert_atomic(
            spark, root, new_rows, keys=[*keys, "valid_from"],
            partition_by=partition_by,
        )
        return n

    cur = current.select(
        *keys,
        *[F.col(c).alias(f"__cur_{c}") for c in attrs],
        F.col("valid_from").alias("__cur_from"),
    )
    joined = incoming.join(cur, keys, "left")
    differs = F.lit(False)
    for c in attrs:
        differs = differs | ~F.col(c).eqNullSafe(F.col(f"__cur_{c}"))
    changed = joined.filter(F.col("__cur_from").isNull() | differs)

    null_to = F.lit(None).cast(incoming.schema["valid_from"].dataType)
    new_rows = changed.select(
        *keys,
        *attrs,
        "valid_from",
        null_to.alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # Close the superseded current versions: same (key, valid_from)
    # composite key as the stored row -> the merge REPLACES it in place.
    closed = (
        changed.filter(F.col("__cur_from").isNotNull())
        .select(
            *keys,
            *[F.col(f"__cur_{c}").alias(c) for c in attrs],
            F.col("__cur_from").alias("valid_from"),
            F.col("valid_from").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    delta = closed.unionByName(new_rows)
    n = new_rows.count()
    if n:
        MT.merge_upsert_atomic(
            spark, root, delta, keys=[*keys, "valid_from"],
            partition_by=partition_by,
        )
    return n
