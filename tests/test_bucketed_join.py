"""Bucketed (pre-partitioned) co-located joins: the Spark-native form of the
reference's 'series co-located by partition-key hash' (cluster/partition.go
ring placement). Two tables bucketed on the same key join WITHOUT a
shuffle — the plan must contain no Exchange above either scan."""

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def bucketed(spark):
    # managed tables land in the session warehouse dir; DROP TABLE below
    # removes the files (warehouse.dir is a static conf — cannot be set
    # per-test)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    (ev.write.bucketBy(8, "user_id").sortBy("user_id")
       .mode("overwrite").saveAsTable("ev_bucketed"))
    users = (ev.groupBy("user_id")
             .agg(F.count("*").alias("n_events")))
    (users.write.bucketBy(8, "user_id").sortBy("user_id")
          .mode("overwrite").saveAsTable("users_bucketed"))
    yield spark
    spark.sql("DROP TABLE IF EXISTS ev_bucketed")
    spark.sql("DROP TABLE IF EXISTS users_bucketed")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table("ev_bucketed")
             .join(spark.table("users_bucketed"), "user_id")
             .groupBy("user_id").agg(F.count("*").alias("n"),
                                     F.first("n_events").alias("ne")))
        plan = j._jdf.queryExecution().executedPlan().toString()
        m = re.search(r"SortMergeJoin|ShuffledHashJoin", plan)
        assert m, plan[:500]
        # no Exchange between the join and the bucketed scans
        join_down = plan[m.start():]
        scan_section = join_down.split("Scan")[0]
        assert "Exchange" not in scan_section, scan_section
        # the post-join groupBy on the same key also reuses the partitioning
        pre_join = plan[:m.start()]
        assert "Exchange" not in pre_join, pre_join
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
