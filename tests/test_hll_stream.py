"""Streaming HLL twin vs batch hll_distinct: the final streamed state
must equal the batch sketch on the union of all micro-batches EXACTLY
(register-wise max is associative, commutative and IDEMPOTENT — batch
boundaries and re-delivered duplicates cannot matter), estimate
arithmetic included; state stays bounded at m = 256 registers."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.sketch import hll_distinct
from influxdb_ha_spark.streaming.hll_stream import hll_distinct_stream


def _drain(spark, src, ckpt):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("g string, v long") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = hll_distinct_stream(stream, group_col="g", value_col="v")
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final[r["g"]] = (r["n_buckets_used"], r["n_empty"],
                             r["est_distinct"])
    return final


def test_hll_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # group a: 3000 distinct values split across 3 batches with overlap
    # AND re-delivered duplicates (idempotent max absorbs them); group b
    # stays tiny (linear-counting branch)
    b0 = [{"g": "a", "v": v} for v in range(0, 1200)] + \
         [{"g": "b", "v": v} for v in range(5)]
    b1 = [{"g": "a", "v": v} for v in range(1000, 2400)]   # 200 repeats
    b2 = [{"g": "a", "v": v} for v in range(2400, 3000)] + \
         [{"g": "a", "v": v} for v in range(0, 50)] + \
         [{"g": "b", "v": v} for v in range(3, 8)]
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    final = _drain(spark, src, str(tmp_path / "ck"))
    allrows = sorted({(r["g"], r["v"]) for r in b0 + b1 + b2})
    batch_df = spark.createDataFrame(list(allrows), "g string, v long")
    batch = {r.g: (r.n_buckets_used, r.n_empty, r.est_distinct)
             for r in hll_distinct(batch_df, "v", by=["g"]).collect()}
    assert final == batch
    # sanity: the big group's estimate is in the 3-sigma band, the tiny
    # group's linear counting is near-exact
    assert 3000 * 0.8 < final["a"][2] < 3000 * 1.2
    assert 8 * 0.8 < final["b"][2] < 8 * 1.2


def test_hll_stream_null_values_dropped(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, "b0.json", [{"g": "a", "v": 1}, {"g": "a", "v": None},
                            {"g": "a", "v": 2}])
    final = _drain(spark, src, str(tmp_path / "ck"))
    assert final["a"][0] == 2  # two used registers, null never hashed
