"""Streaming transitions twin: the carried (time, type) state must
bridge micro-batch boundaries and the aggregated edge multiset must
equal the batch operator (operators/timeseries.type_transitions) on
identical data."""

import json
import os
from collections import Counter
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.timeseries import type_transitions
from influxdb_ha_spark.streaming.transitions_stream import (
    transitions_stream)


def test_transitions_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "entity string, etype string, time long"

    # u1: a(0) -> b(10) in batch 0, then -> a(40) in batch 1 — the
    # b->a edge needs the carried (10, b) state; u2 has a TIED
    # timestamp (a@5, b@5) resolving lexicographically a->b, matching
    # the batch lag order; u3's single event emits nothing; one
    # NULL-typed event must vanish
    rows = [
        {"entity": "u1", "etype": "a", "time": 0},
        {"entity": "u1", "etype": "b", "time": 10},
        {"entity": "u2", "etype": "b", "time": 5},
        {"entity": "u2", "etype": "a", "time": 5},
        {"entity": "u3", "etype": "x", "time": 7},
        {"entity": "u2", "etype": None, "time": 8},
        # --- second micro-batch ---
        {"entity": "u1", "etype": "a", "time": 40},
        {"entity": "u2", "etype": "c", "time": 9},
    ]
    _write(src, "b0.json", rows[:6], 1_000_000_000)
    _write(src, "b1.json", rows[6:], 1_000_000_100)

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(schema).json(src)
    q = (transitions_stream(stream).writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    got = Counter((r["entity"], r["from_type"], r["to_type"])
                  for r in collected)
    assert got == Counter({("u1", "a", "b"): 1, ("u1", "b", "a"): 1,
                           ("u2", "a", "b"): 1, ("u2", "b", "c"): 1})

    # batch reference: aggregate the stream edges and compare counts
    bdf = spark.createDataFrame(
        [(r["entity"], r["time"], r["etype"]) for r in rows],
        "user_id string, time long, event_type string")
    want = {(r["from_type"], r["to_type"]): r["n_transitions"]
            for r in type_transitions(bdf, by=["user_id"]).collect()}
    stream_agg = Counter()
    for (e, f, t), c in got.items():
        stream_agg[(f, t)] += c
    assert dict(stream_agg) == want
