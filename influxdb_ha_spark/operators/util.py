"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame,
                           min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition iff the plan is under-partitioned.

    Parquet can't split below a row group, so a source written as one fat
    row group (or a handful of files) pins every downstream map stage —
    shingling, hashing, Pandas UDF batches — to that many cores no matter
    how wide the cluster is. AQE can coalesce partitions but never split
    them, so this is the one case where an explicit exchange buys linear
    speedup. On a well-partitioned source (the 100 TB layout: thousands of
    files × row groups > cores) the condition is false and this is a
    no-op, costing nothing.
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
