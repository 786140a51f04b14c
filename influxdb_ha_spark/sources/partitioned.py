"""Partitioned measurement storage: `CREATE PARTITION KEY` made physical.

The reference's whole value proposition is routing series to nodes by
hashing partition-key tag values (cluster/partitioner.go:83-107, FNV ring
cluster/partition.go) so queries with tag-equality predicates touch only
the owning nodes (coordinator.go:304-362 — equality-only, `<`/`>`
unsupported). The Spark-native equivalent is hive-style partition columns:
writing a measurement `partitionBy(partition-key tags)` gives Catalyst
partition PRUNING for `=`, IN, ranges and dynamic pruning — strictly more
than the reference's equality-only routing, with zero engine code at read
time.

At 100 TB the write layout matters: `maybe_repartition` shuffles on the
partition tags before the write so each physical partition is produced by
few tasks (avoiding the small-files explosion of 1000 executors × T tag
values), and high-cardinality keys should be bucketed instead — validated
in `choose_layout`.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model import Catalog, Measurement, TIME_COL

# Above this distinct-value count a tag is a bad hive-partition column
# (file-count explosion); below it, partition pruning is the win.
MAX_PARTITION_CARDINALITY = 10_000


def choose_layout(df: DataFrame, tags: list[str]) -> dict:
    """Partition-column sanity check: returns {'partition_by': [...],
    'too_wide': [...]} splitting tags by observed cardinality."""
    ok, wide = [], []
    for t in tags:
        n = df.select(t).distinct().limit(MAX_PARTITION_CARDINALITY + 1).count()
        (ok if n <= MAX_PARTITION_CARDINALITY else wide).append(t)
    return {"partition_by": ok, "too_wide": wide}


def write_partitioned(m: Measurement, path: str,
                      partition_tags: list[str] | None = None,
                      mode: str = "overwrite") -> list[str]:
    """Write a measurement as hive-partitioned parquet on its partition-key
    tags. Returns the partition columns used."""
    tags = partition_tags if partition_tags is not None else list(m.tags)
    layout = choose_layout(m.df, tags)
    cols = layout["partition_by"]
    writer = m.df.repartition(*[F.col(c) for c in cols]) if cols else m.df
    (writer.write.mode(mode).partitionBy(*cols).parquet(path))
    return cols


def load_partitioned(catalog: Catalog, database: str, name: str, path: str,
                     tags: list[str], fields: list[str] | None = None,
                     time_col: str = TIME_COL) -> Measurement:
    """Register a hive-partitioned measurement table; tag-equality WHERE
    clauses now prune at the file-listing level (PartitionFilters)."""
    df = catalog.spark.read.parquet(path)
    return catalog.register_dataframe(database, name, df, time_col=time_col,
                                      tags=tags, fields=fields)
