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
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= p:
        return df
    return df.repartition(p)
