"""Partition-key → hive partitioning → Catalyst pruning (the Spark-native
form of the reference's hash routing, cluster/partitioner.go)."""

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.model import Catalog
from influxdb_ha_spark.planner import influxql_df
from influxdb_ha_spark.sources import load_partitioned, write_partitioned


@pytest.fixture(scope="module")
def partitioned_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_part"))
    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cat = Catalog(spark)
    m = cat.register_dataframe("default", "events_src", src,
                               time_col="ts", tags=["event_type"])
    cols = write_partitioned(m, path)
    assert cols == ["event_type"]
    m2 = load_partitioned(cat, "default", "events", path, tags=["event_type"])
    return cat, m2, path


def test_partition_pruning_in_plan(partitioned_events):
    """WHERE event_type='click' must reach the scan as a PartitionFilter —
    the engine-level analog of the reference routing the query to only the
    nodes owning the 'click' hash (coordinator.go:194-259)."""
    cat, m2, path = partitioned_events
    df = influxql_df(cat, "SELECT count(value) AS n FROM events "
                          "WHERE event_type = 'click'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters", 1)[1][:200]
    # and the count matches the unpartitioned source
    n = df.collect()[0]["n"]
    src = cat.get("default", "events_src").df
    assert n == src.where(F.col("event_type") == "click").count()


def test_pruning_covers_in_and_ranges(partitioned_events):
    """The reference only routes on `=` (coordinator.go:348-356 — '<'/'>'
    unsupported); Catalyst prunes OR/IN too."""
    cat, _, _ = partitioned_events
    df = influxql_df(cat, "SELECT count(value) AS n FROM events "
                          "WHERE event_type = 'click' OR event_type = 'view'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    tail = plan.split("PartitionFilters", 1)[1][:300]
    assert "click" in tail and "view" in tail


def test_cardinality_guard(spark):
    cat = Catalog(spark)
    src = spark.range(0, 20000).select(
        F.col("id").alias("time"),
        F.col("id").cast("string").alias("session_id"),
        F.lit(1.0).alias("value"))
    m = cat.register_dataframe("default", "wide", src,
                               time_col="time", tags=["session_id"])
    from influxdb_ha_spark.sources import choose_layout
    layout = choose_layout(m.df, ["session_id"])
    assert layout["too_wide"] == ["session_id"]


def test_rebalance_measurement(spark, tmp_path):
    """Partition-key change triggers a physical re-layout (the Spark analog
    of the reference's post-ring-change data movement,
    syncing/importer.go:236-289 + cmd/handle/launcher/join.go:45-124):
    data lands in the new hive dirs, the old layout is gone, row-level
    content survives, and the new key prunes."""
    import os

    from influxdb_ha_spark.admin import AdminHandler
    from influxdb_ha_spark.model import PartitionKey
    from influxdb_ha_spark.sources import (load_partitioned,
                                           rebalance_measurement,
                                           write_partitioned)

    path = str(tmp_path / "m")
    src = spark.createDataFrame(
        [(i, ["a", "b"][i % 2], ["x", "y", "z"][i % 3], float(i))
         for i in range(30)],
        "time long, type string, region string, value double")
    cat = Catalog(spark)
    m = cat.register_dataframe("db", "m", src, time_col="time",
                               tags=["type", "region"])
    write_partitioned(m, path, partition_tags=["type"])
    load_partitioned(cat, "db", "m", path, tags=["type", "region"])
    cat.partition_keys.append(PartitionKey("db", "m", ["type"]))
    assert os.path.isdir(os.path.join(path, "type=a"))

    cols = rebalance_measurement(cat, "db", "m", ["region"])
    assert cols == ["region"]
    assert os.path.isdir(os.path.join(path, "region=x"))
    assert not os.path.isdir(os.path.join(path, "type=a"))  # old layout gone
    assert not os.path.exists(path + ".rebalance-tmp")
    m2 = cat.get("db", "m")
    assert m2.df.count() == 30
    assert {r["value"] for r in m2.df.collect()} == {float(i) for i in range(30)}
    # catalog partition key updated in place
    pk = [k for k in cat.partition_keys
          if k.database == "db" and k.measurement == "m"][0]
    assert pk.tags == ["region"]
    # new key prunes at the file-listing level
    plan = (m2.df.where(F.col("region") == "x")
            ._jdf.queryExecution().executedPlan().toString())
    assert "PartitionFilters" in plan

    # the clusterql route drives the same job (CREATE PARTITION KEY on a
    # measurement with a physical layout)
    cat.partition_keys = [k for k in cat.partition_keys
                          if not (k.database == "db" and k.measurement == "m")]
    AdminHandler(cat).handle("CREATE PARTITION KEY type ON db.m")
    assert os.path.isdir(os.path.join(path, "type=a"))
    assert not os.path.isdir(os.path.join(path, "region=x"))
    assert cat.get("db", "m").df.count() == 30
