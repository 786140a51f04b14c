"""Streaming zone-map twin vs batch zone_map: the final streamed state
must equal the batch map on the concatenation of all micro-batches
exactly (counts additive, extrema idempotent — batch boundaries cannot
matter), including all-null buckets; and the batch prunability verdict
derived from the streamed columns matches the batch operator's."""

import os

from pyspark.sql import functions as F

from influxdb_ha_spark.operators.diagnostics import zone_map
from influxdb_ha_spark.streaming.zonemap_stream import zone_map_stream

from .conftest import write_json_batch as _write

D = 86_400_000_000_000


def _drain(spark, src, ckpt):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("time long, value double") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = zone_map_stream(stream, "value")
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final[r["bucket"]] = (r["n_rows"], r["n_null"],
                                  r["v_min"], r["v_max"])
    return final


def test_zonemap_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = [{"time": 0 * D + i, "value": float(i)} for i in range(1, 9)]
    b1 = [{"time": 0 * D + 50, "value": 100.0},      # moves day-0 max
          {"time": 1 * D + 5, "value": None},
          {"time": 1 * D + 6, "value": None}]        # all-null day 1
    b2 = [{"time": 0 * D + 60, "value": -5.0},       # moves day-0 min
          {"time": 2 * D + 1, "value": 7.0}]
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    final = _drain(spark, src, str(tmp_path / "ck"))
    rows = [(r["time"], r["value"]) for r in b0 + b1 + b2]
    batch_df = spark.createDataFrame(rows, "time long, value double")
    batch = {r.bucket: (r.n_rows, r.n_null, r.v_min, r.v_max)
             for r in zone_map(batch_df, "value").collect()}
    assert final == batch
    assert final[1 * D] == (2, 2, None, None)        # all-null bucket
    assert final[0 * D][2] == -5.0 and final[0 * D][3] == 100.0
    # the skip verdict derived from streamed columns == batch prunable
    pruned = {r.bucket: r.prunable for r in
              zone_map(batch_df, "value",
                       pred_lo=200.0, pred_hi=300.0).collect()}
    derived = {b: (mx is None or mx < 200.0 or mn >= 300.0)
               for b, (_, _, mn, mx) in final.items()}
    assert derived == pruned
