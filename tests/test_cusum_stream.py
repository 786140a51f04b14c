"""Streaming CUSUM twin: state must survive micro-batch boundaries and
the scored rows must equal the batch operator's on identical data."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.timeseries import cusum
from influxdb_ha_spark.streaming.cusum_stream import cusum_stream


def test_cusum_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "series string, time long, value double"
    mu, k, h = 10.0, 2.0, 50.0

    # shift starts at t=8; the batch boundary at t=12 cuts the excursion
    # in half, so equality requires state carried across batches
    rows = ([{"series": "a", "time": t, "value": 10.0} for t in range(8)]
            + [{"series": "a", "time": t, "value": 22.0}
               for t in range(8, 16)]
            + [{"series": "b", "time": t, "value": 9.5} for t in range(16)])
    _write(src, "b0.json", [r for r in rows if r["time"] < 12])
    _write(src, "b1.json", [r for r in rows if r["time"] >= 12])

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(schema).json(src)
    out = cusum_stream(stream, target=mu, slack=k, threshold=h)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    batch_df = spark.createDataFrame(
        [(r["series"], r["time"], r["value"]) for r in rows], schema)
    expect = {(r["tag"] if "tag" in r else r["series"], r["time"]):
              (r["s_pos"], r["s_neg"], r["alarm"])
              for r in cusum(batch_df, by=["series"], value_col="value",
                             slack=k, threshold=h, target=mu).collect()}
    got = {(r["series"], r["time"]): (r["s_pos"], r["s_neg"], r["alarm"])
           for r in collected}
    assert got == expect
    # and the alarm actually fired mid-excursion
    assert any(a for (_, _, a) in got.values())
