"""Streaming attribution twin: carried-touch state must survive
micro-batch boundaries, tie-breaks must match the batch window's
(time, kind, event_id) order, and on an in-time-order shared fixture
the per-channel totals must equal the batch `attribution`'s (the
funnel/cusum structural-equivalence precedent)."""

import json
import os
import time
from .conftest import write_json_batch as _write

import pytest

from influxdb_ha_spark.operators.timeseries import attribution
from influxdb_ha_spark.streaming.attribution_stream import attribution_stream

SCHEMA = ("user_id long, event_type string, time long, value double, "
          "event_id long")


def _run_stream(spark, tmp_path, b0, b1, n0, n_total, **kw):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    _write(src, "b0.json", b0)
    stream = spark.readStream.schema(SCHEMA).json(src)
    out = attribution_stream(stream, **kw)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(processingTime="200 milliseconds").start())
    try:
        deadline = time.time() + 90
        while len(collected) < n0 and time.time() < deadline:
            time.sleep(0.1)
        _write(src, "b1.json", b1)   # only after b0 consumed
        while len(collected) < n_total and time.time() < deadline:
            time.sleep(0.1)
    finally:
        q.stop()
    return collected


def _rows(*tuples):
    return [{"user_id": u, "event_type": e, "time": t, "value": v,
             "event_id": i}
            for u, e, t, v, i in tuples]


def test_attribution_stream_matches_batch(spark, tmp_path):
    rows = [
        # u1: touch in b0, conversion in b1 (state must carry)
        (1, "view", 10, None, 1), (1, "purchase", 60, 10.0, 2),
        # u2: conversion with no touch at all -> (none)
        (2, "purchase", 20, 5.0, 3),
        # u3: same-timestamp touches — max event_id (click) wins, and a
        # touch AT the conversion time attributes
        (3, "view", 30, None, 4), (3, "click", 30, None, 5),
        (3, "purchase", 30, 2.0, 6),
        # u4: touch too old for the 60-tick window -> (none)
        (4, "view", 0, None, 7), (4, "purchase", 70, 4.0, 8),
    ]
    b0 = _rows(*[r for r in rows if r[2] < 50])
    b1 = _rows(*[r for r in rows if r[2] >= 50])
    got = _run_stream(spark, tmp_path, b0, b1, n0=2, n_total=4,
                      window_ns=60)
    per_conv = {r["conv_id"]: (r["channel"], r["value"]) for r in got}
    assert per_conv == {2: ("view", 10.0), 3: ("(none)", 5.0),
                        6: ("click", 2.0), 8: ("(none)", 4.0)}
    # per-channel totals == the batch operator's on the full fixture
    batch_df = spark.createDataFrame(
        [(u, e, t, v, i) for u, e, t, v, i in rows], SCHEMA)
    expect = {r["channel"]: (r["conversions"], r["revenue"])
              for r in attribution(batch_df, window_ns=60).collect()}
    stream_agg = {}
    for r in got:
        c, n = stream_agg.get(r["channel"], (0, 0.0))
        stream_agg[r["channel"]] = (c + 1, n + (r["value"] or 0.0))
    assert set(stream_agg) == set(expect)
    for ch in expect:
        assert stream_agg[ch][0] == expect[ch][0]
        assert stream_agg[ch][1] == pytest.approx(expect[ch][1])


def test_attribution_stream_first_touch_carries(spark, tmp_path):
    b0 = _rows((1, "signup", 5, None, 1), (1, "view", 10, None, 2))
    b1 = _rows((1, "purchase", 60, 8.0, 3))
    got = _run_stream(spark, tmp_path, b0, b1, n0=0, n_total=1,
                      model="first")
    assert [(r["channel"], r["value"]) for r in got] == [("signup", 8.0)]


def test_attribution_stream_rejects_bad_model(spark):
    df = spark.createDataFrame([], SCHEMA)
    with pytest.raises(ValueError):
        attribution_stream(df, model="linear")
