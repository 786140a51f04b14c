"""Retention enforcement: the RP duration made operational.

The reference stores RP definitions and copies them between nodes
(syncing/models.go:3-9, importer.go:555-577) but relies on InfluxDB itself
to expire shards. Spark-side, expiry is a maintenance pass: drop rows (or,
for partitioned storage, whole partitions/files) older than now − duration.

At 100 TB the in-place filter is the wrong shape — `enforce_retention`
operates on the catalog view immediately (queries stop seeing expired
rows), and `expired_partition_predicate` gives the storage-level predicate
a compaction/VACUUM job would push down to delete whole time partitions
without rewriting live data.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .model import Catalog, Measurement, TIME_COL
from .timeutil import parse_duration_ns


def enforce_retention(catalog: Catalog, database: str, now_ns: int) -> dict:
    """Apply the database's default RP duration to every measurement.

    Returns {measurement: cutoff_ns} for measurements that were trimmed.
    Duration "0s"/absent means keep-forever (InfluxDB semantics).
    """
    rps = catalog.retention_policies.get(database, [])
    default = next((r for r in rps if r.get("default")), None)
    if not default:
        return {}
    dur = parse_duration_ns(default.get("duration") or "0s")
    if dur <= 0:
        return {}
    cutoff = now_ns - dur
    out = {}
    for name, m in list(catalog.databases.get(database, {}).items()):
        if m is None:
            continue
        m.df = m.df.where(F.col(TIME_COL) >= F.lit(cutoff))
        out[name] = cutoff
    return out


def expired_partition_predicate(duration_ns: int, now_ns: int) -> str:
    """SQL predicate selecting expired rows — push to `DELETE WHERE` on a
    transactional table or a partition-drop job on hive layout."""
    return f"{TIME_COL} < {now_ns - duration_ns}"
