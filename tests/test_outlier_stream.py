"""Streaming robust outliers: batch-trained median/MAD profile applied
to a live stream (stream-static join) must flag exactly what the batch
operator flags on the same data; unprofiled series pass through."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.timeseries import mad_outliers
from influxdb_ha_spark.streaming.outlier_stream import (mad_profile,
                                                        outlier_stream)

BASE = 1_704_067_200_000_000_000


def test_outlier_stream_matches_batch(spark, tmp_path):
    rows = [{"event_type": "s", "time": BASE + i, "value": v}
            for i, v in enumerate(
                [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.5, 9.0, 10.0, 500.0])]
    batch = spark.createDataFrame(
        [(r["event_type"], r["time"], r["value"]) for r in rows],
        "event_type string, time long, value double")

    want = {r["time"]: (r["robust_z"], r["is_outlier"])
            for r in mad_outliers(batch, by=["event_type"]).collect()}

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    # an unprofiled series rides along: must pass through unflagged
    _write(src, "b0.json", rows + [
        {"event_type": "new", "time": BASE + 99, "value": 1e9}])

    profile = mad_profile(batch, by=["event_type"])
    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(
        "event_type string, time long, value double").json(src)
    out = outlier_stream(stream, profile, by=["event_type"])
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    got = {r["time"]: (r["robust_z"], r["is_outlier"]) for r in collected}
    for t, (z, flag) in want.items():
        assert got[t] == (z, flag), t
    assert got[BASE + 99] == (None, False)   # unprofiled series
    assert sum(1 for _, f in got.values() if f) == 1
