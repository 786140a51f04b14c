"""Streaming HLL-rollup twin vs batch hll_rollup: the final streamed
row must equal the batch rollup over the union of all micro-batches
EXACTLY — per-bucket partials in state, register-wise max merge, same
single-sourced fold — including when a LATE event lands in an old
bucket (mergeable states need no watermark contract)."""

import os

import pytest

from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.sketch import hll_rollup
from influxdb_ha_spark.streaming.hll_rollup_stream import hll_rollup_stream

DAY = 86_400_000_000_000


def _drain(spark, src, ckpt, **kw):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("g string, time long, v long") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = hll_rollup_stream(stream, group_col="g", value_col="v",
                            time_col="time", **kw)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final[r["g"]] = (r["n_buckets"], r["n_buckets_used"],
                             r["n_empty"], r["est_distinct"])
    return final


def test_hll_rollup_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # group a: 3 days of values, split mid-day across batches, with
    # re-delivered duplicates AND a late event for day 0 arriving in
    # the last batch; group b: one tiny day (linear counting)
    b0 = [{"g": "a", "time": 0 * DAY + i, "v": v}
          for i, v in enumerate(range(0, 900))] + \
         [{"g": "b", "time": 0, "v": v} for v in range(6)]
    b1 = [{"g": "a", "time": 1 * DAY + i, "v": v}
          for i, v in enumerate(range(800, 1900))]      # 100 repeats
    b2 = [{"g": "a", "time": 2 * DAY + i, "v": v}
          for i, v in enumerate(range(1900, 2600))] + \
         [{"g": "a", "time": 0 * DAY + 5, "v": 123_456}]   # late, day 0
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    final = _drain(spark, src, str(tmp_path / "ck"))
    union = sorted({(r["g"], r["time"], r["v"]) for r in b0 + b1 + b2})
    batch_df = spark.createDataFrame(union, "g string, time long, v long")
    batch = {r.g: (r.n_buckets, r.n_buckets_used, r.n_empty,
                   r.est_distinct)
             for r in hll_rollup(batch_df, value_col="v",
                                 time_col="time", by=["g"]).collect()}
    assert final == batch
    assert final["a"][0] == 3 and final["b"][0] == 1
    assert 2601 * 0.8 < final["a"][3] < 2601 * 1.2


def test_hll_rollup_stream_bucket_cap_and_validation(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, "b0.json",
           [{"g": "a", "time": d * DAY, "v": d} for d in range(3)])

    with pytest.raises(ValueError, match="max_buckets"):
        hll_rollup_stream(
            spark.readStream.schema("g string, time long, v long")
            .json(src), "g", "v", max_buckets=0)
    with pytest.raises(ValueError, match="bucket_ns"):
        hll_rollup_stream(
            spark.readStream.schema("g string, time long, v long")
            .json(src), "g", "v", bucket_ns=0)

    # breaching the live-bucket cap fails LOUDLY, not by silent growth
    from pyspark.errors.exceptions.captured import StreamingQueryException
    stream = spark.readStream.schema("g string, time long, v long") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = hll_rollup_stream(stream, "g", "v", max_buckets=2)
    q = (out.writeStream.format("noop").outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    with pytest.raises(StreamingQueryException, match="max_buckets"):
        assert q.awaitTermination(600), "stream drain timed out"
