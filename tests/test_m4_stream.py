"""Streaming M4 downsampling: min/max/first/last per tumbling hour bucket,
emitted once per finalized bucket in append mode."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.streaming.m4_stream import m4_stream

H = 3_600_000_000_000  # 1h in ns
BASE = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z (hour-aligned)


def test_m4_stream_finalizes_buckets(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    # series s: four points in hour 0 (first=5, min=1, max=9, last=2),
    # one point in hour 1; a far-future point pushes the watermark past
    # both buckets so append mode emits them finalized.
    _write(src, "b0.json", [
        {"s": "a", "time": BASE + 10, "value": 5.0},
        {"s": "a", "time": BASE + 20, "value": 1.0},
        {"s": "a", "time": BASE + 30, "value": 9.0},
        {"s": "a", "time": BASE + 40, "value": 2.0},
        {"s": "a", "time": BASE + H + 5, "value": 7.0},
        {"s": "z", "time": BASE + 100 * H, "value": 0.0},
    ])

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(
        "s string, time long, value double").json(src)
    out = m4_stream(stream, by=["s"], window="1 hour",
                    watermark_delay="30 minutes")
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    got = {(r["s"], r["bucket_start"].isoformat()): r
           for r in collected if r["s"] == "a"}
    assert len(got) == 2
    h0 = got[("a", "2024-01-01T00:00:00")]
    assert (h0["n"], h0["v_min"], h0["v_max"], h0["v_first"], h0["v_last"]) \
        == (4, 1.0, 9.0, 5.0, 2.0)
    h1 = got[("a", "2024-01-01T01:00:00")]
    assert (h1["n"], h1["v_first"], h1["v_last"]) == (1, 7.0, 7.0)
