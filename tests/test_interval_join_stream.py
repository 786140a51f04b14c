"""Stream-stream interval-join twin: matches must come out of two-sided
join state when the point and its containing interval arrive in
DIFFERENT micro-batches, and the emitted multiset must equal the batch
operator (operators/timeseries.interval_join, keyed plan) on identical
data."""

import json
import os
from .conftest import write_json_batch as _write

import pytest

from influxdb_ha_spark.operators.timeseries import interval_join
from influxdb_ha_spark.streaming.interval_join_stream import (
    interval_join_stream)

S = 1_000_000_000  # 1 s in ns
# all event times ride on a nonzero base: Spark's streaming join
# drops rows whose event time equals the INITIAL watermark (epoch
# 0) as late — an edge real ns-epoch data never hits, documented in
# the operator module
B0 = 1000 * S


def test_interval_join_stream_matches_batch(spark, tmp_path):
    psrc, isrc = str(tmp_path / "p"), str(tmp_path / "i")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(psrc)
    os.makedirs(isrc)

    # k1: interval [10s, 20s]; points at 10s (boundary), 15s, 25s (out)
    #     the 15s point arrives in batch 0, the interval in batch 1 —
    #     the match must be produced from buffered point state
    # k2: two OVERLAPPING intervals [0, 30s] and [5s, 40s]; the point
    #     at 6s matches both (k=2 fan-out)
    # k3: interval longer than max_len (cap 60s) — end clamps, a point
    #     past the clamp does NOT match
    points = [
        {"key": "k1", "time": B0 + 15 * S},
        {"key": "k2", "time": B0 + 6 * S},
        # --- second micro-batch ---
        {"key": "k1", "time": B0 + 10 * S},
        {"key": "k1", "time": B0 + 25 * S},
        {"key": "k3", "time": B0 + 70 * S},
        {"key": "k3", "time": B0 + 50 * S},
    ]
    intervals = [
        {"key": "k2", "t_start": B0, "t_end": B0 + 30 * S},
        {"key": "k3", "t_start": B0, "t_end": B0 + 100 * S},
        # --- second micro-batch ---
        {"key": "k1", "t_start": B0 + 10 * S, "t_end": B0 + 20 * S},
        {"key": "k2", "t_start": B0 + 5 * S, "t_end": B0 + 40 * S},
    ]
    _write(psrc, "b0.json", points[:2], 1_000_000_000)
    _write(psrc, "b1.json", points[2:], 1_000_000_100)
    _write(isrc, "b0.json", intervals[:2], 1_000_000_000)
    _write(isrc, "b1.json", intervals[2:], 1_000_000_100)

    pstream = spark.readStream.schema("key string, time long").json(psrc)
    istream = spark.readStream.schema(
        "key string, t_start long, t_end long").json(isrc)

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    q = (interval_join_stream(pstream, istream, by=["key"],
                              max_len_ns=60 * S)
         .writeStream.foreachBatch(sink).outputMode("append")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    got = sorted((r["key"], r["time"], r["t_start"], r["t_end"])
                 for r in collected)

    # batch reference on the same data, with t_end clamped to the cap
    # (the stream's documented truncation semantics)
    pdf = spark.createDataFrame([(p["key"], p["time"]) for p in points],
                                "key string, time long")
    idf = spark.createDataFrame(
        [(i["key"], i["t_start"], min(i["t_end"], i["t_start"] + 60 * S))
         for i in intervals],
        "key string, t_start long, t_end long")
    want = sorted((r["key"], r["time"], r["t_start"], r["t_end"])
                  for r in interval_join(pdf, idf, by=["key"]).collect())

    assert got == want
    # the hand-expected multiset, to keep the twin test honest even if
    # the batch operator regressed: k1 boundary + state match, k2
    # double fan-out, k3 only the pre-clamp point
    assert got == sorted([
        ("k1", B0 + 10 * S, B0 + 10 * S, B0 + 20 * S),
        ("k1", B0 + 15 * S, B0 + 10 * S, B0 + 20 * S),
        ("k2", B0 + 6 * S, B0, B0 + 30 * S),
        ("k2", B0 + 6 * S, B0 + 5 * S, B0 + 40 * S),
        ("k3", B0 + 50 * S, B0, B0 + 60 * S),
    ])


def test_interval_join_stream_validation(spark):
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="join keys"):
        interval_join_stream(df, df, by=[])
    with pytest.raises(ValueError, match="max_len_ns"):
        interval_join_stream(df, df, by=["key"], max_len_ns=0)
