"""Streaming quantile-bands twin: a bucket's values must accumulate in
state across micro-batch boundaries, rows emit on arrival-order bucket
closure, late events count into n_late, and the emitted rows must
equal the batch operator (operators/timeseries.quantile_bands)
restricted to closed buckets."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.timeseries import quantile_bands
from influxdb_ha_spark.streaming.quantile_bands_stream import (
    quantile_bands_stream)

H = 3_600_000_000_000  # 1 h in ns


def test_quantile_bands_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "series string, time long, value double"

    # series s: hour-0 values 1..100 SPLIT across micro-batches 0/1
    # (the state must carry the first 60); an hour-1 event in batch 1
    # closes hour 0. Batch 2 brings an hour-0 event — LATE, because
    # within a micro-batch events process in time order, so lateness
    # exists only ACROSS batch boundaries (the twins convention) — and
    # an hour-2 event that closes hour 1, whose row carries n_late=1.
    rows = ([{"series": "s", "time": i * (H // 200), "value": float(i)}
             for i in range(1, 61)]
            + [{"series": "s", "time": i * (H // 200), "value": float(i)}
               for i in range(61, 101)]
            + [{"series": "s", "time": H + 5, "value": 7.0}]
            + [{"series": "s", "time": 10, "value": 999.0},  # late
               {"series": "s", "time": 2 * H, "value": 1.0}])
    _write(src, "b0.json", rows[:60], 1_000_000_000)
    _write(src, "b1.json", rows[60:101], 1_000_000_100)
    _write(src, "b2.json", rows[101:], 1_000_000_200)

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    # one file per micro-batch — availableNow otherwise folds every
    # file into a single batch and the cross-batch late path never runs
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).json(src))
    q = (quantile_bands_stream(stream).writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    got = {r["bucket"]: r for r in collected}
    # hour-0 closed with exactly values 1..100 (the late 999 arrived
    # after closure); hour-1 closed with the single 7.0 and n_late 1
    assert set(got) == {0, H}
    assert got[0]["n"] == 100 and got[0]["n_late"] == 0
    assert got[H]["n"] == 1 and got[H]["n_late"] == 1

    # batch reference on the same CLOSED data
    bdf = spark.createDataFrame(
        [("s", r["time"], r["value"]) for r in rows
         if r["time"] < 2 * H and r["value"] != 999.0],
        "tag string, time long, value double")
    want = {r["bucket"]: r for r in
            quantile_bands(bdf, by=["tag"], value_col="value",
                           bucket_ns=H).collect()}
    for b in (0, H):
        for c in ("n", "p50", "p95", "p99", "v_max"):
            assert got[b][c] == want[b][c], (b, c, got[b][c], want[b][c])
