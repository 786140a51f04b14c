"""applyInPandasWithState running-stats operator: state must persist across
micro-batches (two file-source batches -> cumulative counts)."""

import json
import os
import time
from .conftest import write_json_batch as _write

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.streaming.stateful import series_running_stats


def test_running_stats_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "series string, time long, value double"

    _write(src, "b0.json", [
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
    assert q.awaitTermination(600), "stream drain timed out"

    got = {r["series"]: r for r in collected}
    assert got["gold"]["n"] == 2 and got["gold"]["sum"] == 30.0
    assert got["gold"]["min"] == 10.0 and got["gold"]["max"] == 20.0

    # second batch: state must accumulate, not reset
    _write(src, "b1.json", [
        {"series": "gold", "time": 5, "value": 5.0}])
    collected.clear()
    stream2 = spark.readStream.schema(schema).json(src)
    out2 = series_running_stats(stream2)
    q2 = (out2.writeStream.foreachBatch(sink)
          .outputMode("update").option("checkpointLocation", ckpt)
          .trigger(availableNow=True).start())
    assert q2.awaitTermination(600), "stream drain timed out"
    gold = [r for r in collected if r["series"] == "gold"][-1]
    assert gold["n"] == 3 and gold["sum"] == 35.0
    assert gold["min"] == 5.0 and gold["last_time"] == 5


def test_cq_stream_end_to_end(spark, tmp_path):
    """CQ as a live streaming aggregation: file stream of points →
    stream_plan (window + watermark) → foreachBatch → windowed counts match
    the batch GROUP BY time() result for the same data."""
    import json as _json
    from influxdb_ha_spark.model import Catalog
    from influxdb_ha_spark.streaming.cq import ContinuousQuery, CQRunner

    src = str(tmp_path / "pts")
    os.makedirs(src)
    base = 1_700_002_800_000_000_000  # hour-aligned (472223 * 3600 s)
    HOUR = 3_600_000_000_000
    rows = [{"time": base + i * HOUR // 2, "tag": "a", "value": float(i)}
            for i in range(8)]  # 4 hourly windows x 2 points
    _write(src, "b0.json", rows)

    cat = Catalog(spark)
    schema = "time long, tag string, value double"
    cat.register_dataframe("db", "m",
                           spark.createDataFrame([], schema),
                           time_col="time", tags=["tag"])
    runner = CQRunner(cat)
    runner.create(ContinuousQuery(
        name="hourly", database="db",
        query="SELECT count(value) AS n, sum(value) AS s INTO m_hourly "
              "FROM m GROUP BY time(1h), tag"))

    stream = spark.readStream.schema(schema).json(src)
    plan = runner.stream_plan("hourly", stream, watermark="10 minutes")
    collected = []
    q = (plan.writeStream.foreachBatch(
            lambda df, _id: collected.extend(df.collect()))
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    got = {(r["time"], r["tag"]): (r["n"], r["s"]) for r in collected}
    assert len(got) == 4
    for i in range(4):
        w = base + i * HOUR
        assert got[(w, "a")] == (2, float(2 * i) + float(2 * i + 1))


def test_dedup_stream(spark, tmp_path):
    """Streaming exact dedup: repeated texts within the watermark are
    dropped across micro-batches; state is keyed on the content digest."""
    import json

    from influxdb_ha_spark.streaming.dedup_stream import dedup_stream

    src = str(tmp_path / "docs")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    hour = 3_600_000_000_000
    base = 1_700_000_000_000_000_000
    with open(os.path.join(src, "b1.json"), "w") as f:
        for i, txt in enumerate(["alpha doc", "beta doc", "alpha doc"]):
            f.write(json.dumps({"doc_id": i, "time": base + i * hour,
                                "text": txt}) + "\n")
    with open(os.path.join(src, "b2.json"), "w") as f:
        # duplicate of batch-1 content + one new doc, inside the watermark
        f.write(json.dumps({"doc_id": 10, "time": base + 3 * hour,
                            "text": "beta doc"}) + "\n")
        f.write(json.dumps({"doc_id": 11, "time": base + 4 * hour,
                            "text": "gamma doc"}) + "\n")

    got = []

    def sink(df, _bid):
        got.extend((r["doc_id"], r["text"]) for r in df.collect())

    stream = spark.readStream.schema(
        "doc_id long, time long, text string").json(src)
    q = (dedup_stream(stream, watermark_delay="2 days")
         .writeStream.foreachBatch(sink)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    texts = sorted(t for _, t in got)
    assert texts == ["alpha doc", "beta doc", "gamma doc"]
    assert (0, "alpha doc") in got and (1, "beta doc") in got
