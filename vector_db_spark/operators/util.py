"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input has fewer partitions than
    the cluster has slots.

    CPU-heavy narrow operators (MinHash signatures, SimHash votes, shingle
    explosion) inherit the scan's partitioning; a corpus that arrives as a
    few small files would otherwise run single-threaded no matter how many
    cores exist. At real scale the input already has >= slots partitions and
    this is a no-op — the extra shuffle is only ever paid on inputs small
    enough for it to be free.
    """
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
