"""Streaming A/B twin vs batch ab_test: the live per-value count table
must equal the batch count table on the concatenation of all
micro-batches EXACTLY (cell-wise integer sums — batch boundaries cannot
matter), and ab_from_counts over the streamed snapshot must reproduce
batch ab_test's one-row statistics bit-for-bit (shared fold helpers —
equality by construction, pinned here anyway)."""

import os

from pyspark.sql import functions as F

from influxdb_ha_spark.operators.timeseries import ab_from_counts, ab_test
from influxdb_ha_spark.streaming.ab_stream import ab_counts_stream

from .conftest import write_json_batch as _write


def _drain(spark, src, ckpt, bucket_width=None):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("g string, v double") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = ab_counts_stream(stream, group_col="g", value_col="v",
                           group_a="t", group_b="c",
                           bucket_width=bucket_width)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final[r["v"]] = (r["ca"], r["cb"])
    return final


def _batches():
    # treatment sits higher than control; duplicates within and across
    # batches are real rows (count semantics); an off-group and a NULL
    # metric must drop
    b0 = ([{"g": "t", "v": 3.0 + i % 4} for i in range(40)]
          + [{"g": "c", "v": 1.0 + i % 3} for i in range(35)]
          + [{"g": "x", "v": 9.0}, {"g": "t", "v": None}])
    b1 = [{"g": "t", "v": 4.0}] * 25 + [{"g": "c", "v": 2.0}] * 20
    b2 = ([{"g": "t", "v": 2.0 + i % 5} for i in range(30)]
          + [{"g": "c", "v": 0.0 + i % 6} for i in range(30)])
    return b0, b1, b2


def test_ab_stream_counts_equal_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0, b1, b2 = _batches()
    for i, b in enumerate((b0, b1, b2)):
        _write(src, f"b{i}.json", b)
    final = _drain(spark, src, str(tmp_path / "ck"))
    rows = [(d["g"], d["v"]) for d in b0 + b1 + b2]
    batch_df = spark.createDataFrame(rows, "g string, v double")
    batch = {r["v"]: (r["ca"], r["cb"]) for r in
             (batch_df.where(F.col("v").isNotNull()
                             & F.col("g").isin(["t", "c"]))
              .groupBy("v")
              .agg(F.sum((F.col("g") == "t").cast("long")).alias("ca"),
                   F.sum((F.col("g") == "c").cast("long")).alias("cb"))
              ).collect()}
    assert final == batch


def test_ab_stream_readout_equals_batch_ab_test(spark, tmp_path):
    """ab_from_counts(streamed snapshot) == ab_test(raw concat),
    every column, including the float statistics."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0, b1, b2 = _batches()
    for i, b in enumerate((b0, b1, b2)):
        _write(src, f"b{i}.json", b)
    final = _drain(spark, src, str(tmp_path / "ck"), bucket_width=2.0)
    snap = spark.createDataFrame(
        [(v, c[0], c[1]) for v, c in final.items()],
        "v double, ca long, cb long")
    got = ab_from_counts(snap, value_col="v", count_a="ca",
                         count_b="cb").collect()[0]
    rows = [(d["g"], d["v"]) for d in b0 + b1 + b2]
    batch_df = spark.createDataFrame(rows, "g string, v double")
    want = ab_test(batch_df, "g", "v", "t", "c",
                   bucket_width=2.0).collect()[0]
    assert got.asDict() == want.asDict()
    # sanity: treatment sits higher -> z > 0, and D is non-trivial
    assert want.z > 0 and want.d_stat > 0


def test_ab_stream_validation(spark):
    import pytest
    df = spark.readStream.format("rate").load()
    with pytest.raises(ValueError, match="bucket_width"):
        ab_counts_stream(df, "g", "v", "a", "b", bucket_width=-1.0)
