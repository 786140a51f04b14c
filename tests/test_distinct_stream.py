"""Streaming KMV twin vs batch kmv_distinct: the final streamed state
must equal the batch sketch on the union of all micro-batches EXACTLY
(k smallest of a union is associative — batch boundaries cannot matter),
estimate arithmetic included; state stays bounded at k hashes."""

import json
import os
from .conftest import write_json_batch as _write

from pyspark.sql import functions as F

from influxdb_ha_spark.operators.sketch import kmv_distinct
from influxdb_ha_spark.streaming.distinct_stream import kmv_distinct_stream


def _drain(spark, src, ckpt, k):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("g string, v long") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = kmv_distinct_stream(stream, group_col="g", value_col="v", k=k)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final[r["g"]] = (r["k_used"], r["kth_hash"], r["est_distinct"])
    return final


def test_kmv_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # group a: 300 distinct values split unevenly across 3 batches with
    # overlap (the stream must dedup across batches); group b stays
    # below k (exact branch)
    b0 = [{"g": "a", "v": v} for v in range(0, 120)] + \
         [{"g": "b", "v": v} for v in range(5)]
    b1 = [{"g": "a", "v": v} for v in range(100, 240)]     # 20 repeats
    b2 = [{"g": "a", "v": v} for v in range(240, 300)] + \
         [{"g": "b", "v": v} for v in range(3, 8)]         # 2 repeats
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    k = 64
    final = _drain(spark, src, str(tmp_path / "ck"), k=k)
    # batch reference on the union of every micro-batch
    allrows = [(r["g"], r["v"]) for r in b0 + b1 + b2]
    batch = {r.g: (r.k_used, r.kth_hash, r.est_distinct)
             for r in kmv_distinct(
                 spark.createDataFrame(allrows, "g string, v long"),
                 "v", by=["g"], k=k).collect()}
    assert final == batch
    # group a saturated the sketch (bounded state); b stayed exact
    assert final["a"][0] == k
    assert final["b"] == (8, batch["b"][1], 8.0)


def test_kmv_stream_null_values_ignored(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, "b0.json",
           [{"g": "a", "v": 1}, {"g": "a", "v": None}, {"g": "a", "v": 2}])
    final = _drain(spark, src, str(tmp_path / "ck"), k=16)
    assert final["a"][0] == 2 and final["a"][2] == 2.0
