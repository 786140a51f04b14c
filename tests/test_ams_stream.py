"""Streaming AMS F2 twin vs batch ams_f2: the final streamed state must
equal the batch sketch on the concatenation of all micro-batches EXACTLY
(component-wise integer sums — batch boundaries cannot matter; unlike
HLL the merge is NOT idempotent, so the test concatenates rather than
unions), and state stays bounded at d + 1 counters."""

import os

from influxdb_ha_spark.operators.sketch import ams_f2
from influxdb_ha_spark.streaming.ams_stream import ams_f2_stream

from .conftest import write_json_batch as _write


def _drain(spark, src, ckpt):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("g string, v string") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = ams_f2_stream(stream, group_col="g", item_col="v")
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final[r["g"]] = (r["n_rows"], r["f2_est"])
    return final


def test_ams_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # skewed group a (hot item u0), uniform group b; duplicates WITHIN
    # and ACROSS batches are real rows for F2 (multiset semantics —
    # that is the point of a frequency moment)
    b0 = [{"g": "a", "v": f"u{i % 3}"} for i in range(300)] + \
         [{"g": "b", "v": f"w{i}"} for i in range(40)]
    b1 = [{"g": "a", "v": "u0"} for _ in range(200)]
    b2 = [{"g": "a", "v": f"u{i % 7}"} for i in range(70)] + \
         [{"g": "b", "v": f"w{i}"} for i in range(40)]
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    final = _drain(spark, src, str(tmp_path / "ck"))
    rows = [(r["g"], r["v"]) for r in b0 + b1 + b2]
    batch_df = spark.createDataFrame(rows, "g string, v string")
    batch = {r.g: (r.n_rows, r.f2_est)
             for r in ams_f2(batch_df, "v", by=["g"], d=32).collect()}
    assert final == batch
    # skew sanity: group a's F2 dwarfs uniform b's at similar n
    assert final["a"][1] > final["b"][1]


def test_ams_stream_state_bounded(spark, tmp_path):
    """State schema is d+1 int64s — emissions per batch show running
    totals, not per-item rows."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, "b0.json", [{"g": "x", "v": str(i)} for i in range(500)])
    _write(src, "b1.json", [{"g": "x", "v": str(i)} for i in range(500)])
    final = _drain(spark, src, str(tmp_path / "ck"))
    assert final["x"][0] == 1000
