"""Partition-layout helpers shared by the operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Spread a narrow (e.g. single-file) scan across cores before a
    CPU-heavy projection; pass an already-parallel source through
    untouched. A real many-file corpus scan has >= defaultParallelism
    partitions, so at scale this adds NO exchange — while the local
    one-file fixture would otherwise pin hash/shingle stages to one
    task (measured 3x on the shingle stage).

    LEAF SCANS ONLY (ADVICE r3): ``df.rdd.getNumPartitions()`` reports
    the PRE-AQE partition count and forces an extra physical-plan
    compile. On a post-shuffle input under adaptive coalescing the
    count reads >= defaultParallelism even when AQE will execute far
    fewer tasks, so the spread is skipped exactly when it is needed —
    and when a genuine barrier is the goal (e.g. pinning one
    evaluation of an expensive expression, see jaccard_verify; the
    cosine pair stages moved to groupBy+applyInPandas in r14 and no
    longer need one) use an unconditional ``repartition`` instead.
    For file-source leaves the count is the real split count and the
    decision is sound.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)


# r14 optimization round: a stats-PRESERVING materialization helper
# (write the multi-consumer relation to a temp parquet, read it back —
# keeps file-size statistics where localCheckpoint erases them, so
# downstream auto-broadcasts survive) was prototyped here and measured
# on both candidates from the round's backlog. It LOST both times at
# bench scale — jaccard block relation 1.26 s plain vs 1.56 s
# materialized (alternating same-session min-of-4), bleu cands
# 3.42 -> 3.83 A/B min-of-5 — because the write + read-back jobs cost
# more than the duplicated subtree they deduplicate. Not kept; the
# in-code notes at those two sites record the numbers so the next
# round doesn't re-try it blind.
