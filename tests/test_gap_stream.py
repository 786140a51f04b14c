"""Streaming gap twin: state must survive micro-batch boundaries and
the emitted gap rows must equal the batch front stage
(operators/timeseries.inter_event_gaps) on identical data."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.timeseries import inter_event_gaps
from influxdb_ha_spark.streaming.gap_stream import gap_stream


def test_gap_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "entity string, etype string, time long"

    # u1/a spans the batch boundary (gaps 10, 30 — the 30 requires the
    # carried last_t=10 state); u2/a has a tie (gap 0); u1/b is a
    # single event (gap NULL); one NULL-typed event must vanish
    rows = [
        {"entity": "u1", "etype": "a", "time": 0},
        {"entity": "u1", "etype": "a", "time": 10},
        {"entity": "u2", "etype": "a", "time": 5},
        {"entity": "u2", "etype": "a", "time": 5},
        {"entity": "u1", "etype": "b", "time": 7},
        {"entity": "u2", "etype": None, "time": 8},
        # --- second micro-batch ---
        {"entity": "u1", "etype": "a", "time": 40},
        {"entity": "u2", "etype": "a", "time": 9},
    ]
    _write(src, "b0.json", rows[:6], 1_000_000_000)
    _write(src, "b1.json", rows[6:], 1_000_000_100)

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(schema).json(src)
    q = (gap_stream(stream).writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    # NOTE: batch b1's u2/a event at t=9 arrives AFTER t=5 was consumed,
    # so the stream emits gap 9-5=4 — the batch window over the full
    # data would also order 5,5,9 and emit 0 then 4. Multiset equality.
    batch_df = spark.createDataFrame(
        [(r["entity"], r["etype"], r["time"]) for r in rows], schema)
    k = lambda t: (t[0], t[1], t[2], -1 if t[3] is None else t[3])
    expect = sorted(
        ((r["entity"], r["event_type"], r["time"], r["__gap"])
         for r in inter_event_gaps(
             batch_df, by=["entity"], on="time",
             type_col="etype").withColumnRenamed("etype", "event_type")
         .collect()), key=k)
    got = sorted(((r["entity"], r["etype"], r["time"], r["gap"])
                  for r in collected), key=k)
    assert got == expect
    # the NULL-typed event never surfaced
    assert all(t is not None for (_, t, _, _) in got)
    # the cross-boundary gap was computed from carried state
    assert ("u1", "a", 40, 30) in got
