"""Streaming funnel twin: per-entity reach state must survive
micro-batch boundaries, transitions must be first-touch/strictly-after
like the batch operator, and the committed reach times must equal the
batch `funnel`'s on an in-time-order shared fixture (the cusum/deadman
structural-equivalence precedent)."""

import json
import os
import time
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.timeseries import funnel
from influxdb_ha_spark.streaming.funnel_stream import funnel_stream


def test_funnel_stream_matches_batch_on_ordered_fixture(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "user_id long, event_type string, time long"
    steps = ["signup", "view", "purchase"]

    rows = [
        # u1 completes, but the chain SPANS the batch boundary at t=50:
        # signup in b0, view+purchase in b1 (state must carry)
        (1, "signup", 10), (1, "view", 60), (1, "purchase", 70),
        # u2 views before signing up -> stalls at signup
        (2, "view", 5), (2, "signup", 20),
        # u3 same-timestamp view does not count (strictly after)
        (3, "signup", 30), (3, "view", 30),
        # u4 two views: FIRST-touch wins (t=40, not 65)
        (4, "signup", 35), (4, "view", 40), (4, "view", 65),
    ]
    b0 = [{"user_id": u, "event_type": e, "time": t}
          for u, e, t in rows if t < 50]
    b1 = [{"user_id": u, "event_type": e, "time": t}
          for u, e, t in rows if t >= 50]

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    _write(src, "b0.json", b0)
    stream = spark.readStream.schema(schema).json(src)
    out = funnel_stream(stream, steps, entity_col="user_id",
                        time_col="time")
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(processingTime="200 milliseconds").start())
    try:
        deadline = time.time() + 90
        # b0 yields 5 transitions: u1/u2/u3/u4 signups + u4's first view
        while len(collected) < 5 and time.time() < deadline:
            time.sleep(0.1)
        _write(src, "b1.json", b1)   # only after b0 consumed
        while len(collected) < 8 and time.time() < deadline:
            time.sleep(0.1)
    finally:
        q.stop()

    got = {(r["entity"], r["step"]): r["reach_time"] for r in collected}
    # exact reach times, incl. the cross-batch chain and first-touch
    assert got == {("1", 0): 10, ("1", 1): 60, ("1", 2): 70,
                   ("2", 0): 20, ("3", 0): 30,
                   ("4", 0): 35, ("4", 1): 40}
    # per-step entity counts == the batch operator's on the full fixture
    batch_df = spark.createDataFrame(rows, schema)
    expect = {r["step"]: r["entities"]
              for r in funnel(batch_df, steps, by=["user_id"],
                              on="time").collect()}
    stream_counts = {i: len({e for (e, s) in got if s == i})
                     for i in range(len(steps))}
    assert stream_counts == expect == {0: 4, 1: 2, 2: 1}


def test_funnel_stream_conversion_window(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "user_id long, event_type string, time long"

    _write(src, "b0.json", [
        {"user_id": 1, "event_type": "signup", "time": 0},
        {"user_id": 1, "event_type": "view", "time": 100},   # in window
        {"user_id": 2, "event_type": "signup", "time": 0},
        {"user_id": 2, "event_type": "view", "time": 500},   # outside
        # malformed: no time field — must be skipped like the batch
        # operator's null-guarded windows, not crash the query
        {"user_id": 2, "event_type": "purchase"},
    ])
    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(schema).json(src)
    out = funnel_stream(stream, ["signup", "view"], entity_col="user_id",
                        time_col="time", within_ns=100)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    got = {(r["entity"], r["step"]) for r in collected}
    # boundary-inclusive window: u1's view at exactly +100 counts
    assert got == {("1", 0), ("1", 1), ("2", 0)}
