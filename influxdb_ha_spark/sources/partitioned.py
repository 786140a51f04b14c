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
    m = catalog.register_dataframe(database, name, df, time_col=time_col,
                                   tags=tags, fields=fields)
    m.path = path
    return m


def rebalance_measurement(catalog: Catalog, database: str, name: str,
                          new_partition_tags: list[str],
                          path: str | None = None) -> list[str]:
    """Physically re-layout a measurement onto a new partition key.

    The reference moves series between nodes when the ring changes —
    REMOVE NODE / partition-key changes trigger a full read→route→write
    pass per affected token (syncing/importer.go:236-289; node join:
    cmd/handle/launcher/join.go:45-124). The Spark-native equivalent is a
    one-off batch job: read the current layout, shuffle on the new key,
    rewrite hive-partitioned, swap directories, re-register. At 100 TB
    this is exactly the repartition job you'd run — the shuffle routes
    every row to its new owner in one pass instead of the reference's
    per-token re-import loop.

    Returns the partition columns of the new layout.
    """
    import shutil

    m = catalog.get(database, name)
    target = path or m.path
    if not target:
        raise ValueError(
            f"measurement {database}.{name} has no physical path to "
            "rebalance; write it with write_partitioned first")
    tmp = target.rstrip("/") + ".rebalance-tmp"
    old = target.rstrip("/") + ".rebalance-old"
    # materialize the full current dataset into the new layout
    cols = write_partitioned(m, tmp, partition_tags=new_partition_tags)
    # swap: old layout survives until the new one is fully written (the
    # recovery story a real deployment needs; object stores would use a
    # manifest flip instead of directory renames)
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(target, old)
    os.rename(tmp, target)
    shutil.rmtree(old)
    # re-register on the new layout + update the catalog's partition key
    load_partitioned(catalog, database, name, target,
                     tags=m.tags, fields=m.fields)
    for pk in catalog.partition_keys:
        if pk.database == database and pk.measurement == name:
            pk.tags = list(new_partition_tags)
    return cols
