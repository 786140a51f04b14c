"""Streaming column-profiler twin vs batch column_profile: the final
streamed profile must equal the batch profile on the concatenation of
all micro-batches exactly — counts, min/max, and the HLL estimate
(shared register mapping + hll_fold_py) included; an all-null column
stays NULL-estimated in both."""

import os

from influxdb_ha_spark.operators.diagnostics import column_profile
from influxdb_ha_spark.streaming.profile_stream import column_profile_stream

from .conftest import write_json_batch as _write


def _drain(spark, src, ckpt, cols):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("k long, s string, dead string") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = column_profile_stream(stream, cols)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final[r["col_name"]] = (r["n_rows"], r["n_null"],
                                    r["est_distinct"], r["min_s"],
                                    r["max_s"])
    return final


def test_profile_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = [{"k": i, "s": f"w{i % 7}", "dead": None} for i in range(60)]
    b1 = [{"k": i + 60, "s": None if i % 5 == 0 else f"w{i % 11}",
           "dead": None} for i in range(40)]
    b2 = [{"k": None, "s": "aaa", "dead": None} for _ in range(5)]
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    _write(src, "b2.json", b2)
    cols = ["k", "s", "dead"]
    final = _drain(spark, src, str(tmp_path / "ck"), cols)
    rows = [(r["k"], r["s"], r["dead"]) for r in b0 + b1 + b2]
    batch_df = spark.createDataFrame(rows, "k long, s string, dead string")
    batch = {r.col_name: (r.n_rows, r.n_null, r.est_distinct,
                          r.min_s, r.max_s)
             for r in column_profile(batch_df, cols).collect()}
    assert final == batch
    # structure sanity: null column stayed unsketched, counts add up
    assert final["dead"][2] is None and final["dead"][1] == 105
    assert final["k"][0] == 105 and final["k"][1] == 5
