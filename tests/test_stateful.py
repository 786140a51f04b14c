"""applyInPandasWithState running-stats operator: state must persist across
micro-batches (two file-source batches -> cumulative counts)."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.streaming.stateful import series_running_stats


def _write_batch(d, name, rows):
    with open(os.path.join(d, name + ".tmp"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    os.rename(os.path.join(d, name + ".tmp"), os.path.join(d, name))


def test_running_stats_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "series string, time long, value double"

    _write_batch(src, "b0.json", [
        {"series": "gold", "time": 1, "value": 10.0},
        {"series": "gold", "time": 2, "value": 20.0},
        {"series": "trash", "time": 1, "value": 1.0}])

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(schema).json(src)
    out = series_running_stats(stream)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["series"]: r for r in collected}
    assert got["gold"]["n"] == 2 and got["gold"]["sum"] == 30.0
    assert got["gold"]["min"] == 10.0 and got["gold"]["max"] == 20.0

    # second batch: state must accumulate, not reset
    _write_batch(src, "b1.json", [
        {"series": "gold", "time": 5, "value": 5.0}])
    collected.clear()
    stream2 = spark.readStream.schema(schema).json(src)
    out2 = series_running_stats(stream2)
    q2 = (out2.writeStream.foreachBatch(sink)
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    q2.awaitTermination(120)
    gold = [r for r in collected if r["series"] == "gold"][-1]
    assert gold["n"] == 3 and gold["sum"] == 35.0
    assert gold["min"] == 5.0 and gold["last_time"] == 5
