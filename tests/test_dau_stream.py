"""Streaming DAU twin: the chained dedup→window-count pipeline must
finalize exactly one (day, dau) row per closed day, dedup repeat
entity-days across micro-batches, and match the batch active_users DAU
on the shared fixture (the m4/funnel twin equivalence convention)."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.timeseries import active_users
from influxdb_ha_spark.streaming.dau_stream import dau_stream

DAY = 86_400_000_000_000
# 2024-01-01T00:00Z in ns
BASE = 1_704_067_200_000_000_000


def test_dau_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    rows = [
        # day 0: u1 (three events -> dedup), u2
        {"user_id": 1, "time": BASE + 10},
        {"user_id": 1, "time": BASE + 20},
        {"user_id": 1, "time": BASE + 7_200_000_000_000},
        {"user_id": 2, "time": BASE + 30},
        # day 1: u1 only
        {"user_id": 1, "time": BASE + DAY + 5},
        # sentinel far in the future: pushes the watermark past both
        # days so append mode emits them finalized; its own day never
        # closes and is excluded from the comparison
        {"user_id": 9, "time": BASE + 100 * DAY},
    ]
    _write(src, "b0.json", rows)

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema("user_id long, time long").json(src)
    out = dau_stream(stream, entity_col="user_id", time_col="time",
                     watermark_delay="1 hour")
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    got = {r["bucket_start"].isoformat(): r["dau"] for r in collected}
    assert got == {"2024-01-01T00:00:00": 2, "2024-01-02T00:00:00": 1}

    # batch equivalence on the closed days
    batch_df = spark.createDataFrame(
        [(r["user_id"], r["time"]) for r in rows], "user_id long, time long")
    expect = {r["bucket"]: r["dau"]
              for r in active_users(batch_df, by=["user_id"], on="time",
                                    bucket_ns=DAY).collect()}
    assert expect[BASE] == 2 and expect[BASE + DAY] == 1
