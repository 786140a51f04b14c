"""Streaming theta-sketch set-ops twin vs batch kmv_setops: the final
streamed emission must equal the batch operator on the union of all
micro-batches EXACTLY ("k smallest of a union" is associative; theta,
survivor counts and the three estimators replay the same IEEE ops);
state stays at 2·k hashes total."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.sketch import kmv_setops
from influxdb_ha_spark.streaming.setops_stream import setops_stream


def _drain(spark, src, ckpt, k):
    collected = []
    stream = spark.readStream.schema("g string, v long") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = setops_stream(stream, group_col="g", value_col="v",
                        group_a="A", group_b="B", k=k)
    q = (out.writeStream
         .foreachBatch(lambda df, bid: collected.append((bid, df.collect())))
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    last = None
    for _, rows in sorted(collected):
        for r in rows:
            last = r
    return last


def test_setops_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # A = 1..1000, B = 501..1500, split with overlap and re-delivery
    # across 3 batches; k=128 keeps both sides non-exhaustive
    b0 = ([{"g": "A", "v": v} for v in range(1, 600)]
          + [{"g": "B", "v": v} for v in range(501, 900)])
    b1 = ([{"g": "A", "v": v} for v in range(550, 1001)]     # 50 repeats
          + [{"g": "B", "v": v} for v in range(850, 1300)])
    b2 = ([{"g": "B", "v": v} for v in range(1300, 1501)]
          + [{"g": "A", "v": v} for v in range(1, 50)]       # re-delivered
          + [{"g": "C", "v": 1}])                            # outside pair
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    last = _drain(spark, src, str(tmp_path / "ck"), k=128)
    allrows = sorted({(r["g"], r["v"]) for r in b0 + b1 + b2})
    batch = kmv_setops(
        spark.createDataFrame(allrows, "g string, v long"),
        "v", "g", "A", "B", k=128).collect()[0]
    assert (last["theta"], last["n_a"], last["n_b"], last["n_common"]) \
        == (batch.theta, batch.n_a, batch.n_b, batch.n_common)
    assert (last["est_union"], last["est_intersection"],
            last["jaccard_est"]) == (batch.est_union,
                                     batch.est_intersection,
                                     batch.jaccard_est)
    # planted truth: |A∪B|=1500, |A∩B|=500 within sketch error
    assert 1500 * 0.7 < last["est_union"] < 1500 * 1.3
    assert 500 * 0.6 < last["est_intersection"] < 500 * 1.4


def test_setops_stream_exhaustive_exact(spark, tmp_path):
    # both sides below k: theta = full space, estimates exact
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, "b0.json", [{"g": "A", "v": v} for v in range(1, 51)])
    _write(src, "b1.json", [{"g": "B", "v": v} for v in range(26, 76)])
    last = _drain(spark, src, str(tmp_path / "ck"), k=256)
    assert last["theta"] == 1 << 60
    assert last["est_union"] == 75.0
    assert last["est_intersection"] == 25.0
    assert abs(last["jaccard_est"] - 25.0 / 75.0) < 1e-6
