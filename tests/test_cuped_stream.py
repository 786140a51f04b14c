"""Streaming CUPED twin vs batch cuped: the live per-unit (x, y) table
must equal the batch per-unit sums on the concatenation of all
micro-batches EXACTLY (integer cent sums — batch boundaries cannot
matter), and batch cuped over the streamed snapshot must reproduce
batch cuped over the batch-built table bit-for-bit (the snapshot IS
the operator's input seam — equality by construction, pinned here
anyway)."""

import os

from pyspark.sql import functions as F

from influxdb_ha_spark.operators.timeseries import cuped
from influxdb_ha_spark.streaming.cuped_stream import unit_sums_stream

from .conftest import write_json_batch as _write

_B = 500 * 10 ** 9  # pre/post boundary


def _drain(spark, src, ckpt):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("u long, t long, v double") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = unit_sums_stream(stream, unit_col="u", value_col="v",
                           time_col="t", boundary_ns=_B)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final[r["unit"]] = (r["x"], r["y"])
    return final


def _batches():
    # 6 units across both arms; a unit straddling batches, a unit with
    # pre-only events (x but y = 0), NULL unit and NULL value must drop
    b0 = ([{"u": i % 6, "t": (100 + i) * 10 ** 9,
            "v": round(1.25 * (i % 7) + 0.01 * i, 2)}
           for i in range(40)]
          + [{"u": None, "t": 10 ** 9, "v": 5.0},
             {"u": 1, "t": 10 ** 9, "v": None}])
    b1 = [{"u": i % 5, "t": (600 + i) * 10 ** 9,
           "v": round(2.5 + 0.03 * i, 2)} for i in range(35)]
    b2 = ([{"u": 5, "t": 400 * 10 ** 9, "v": 9.75}]
          + [{"u": i % 6, "t": (700 + i) * 10 ** 9,
              "v": round(0.5 * (i % 11), 2)} for i in range(30)])
    return b0, b1, b2


def _batch_table(spark, rows):
    df = spark.createDataFrame(
        [(d["u"], d["t"], d["v"]) for d in rows],
        "u long, t long, v double")
    return (df.where(F.col("u").isNotNull() & F.col("v").isNotNull())
            .groupBy("u")
            .agg(F.coalesce(
                F.sum(F.when(F.col("t") < _B, F.col("v"))
                      .cast("decimal(28,2)")).cast("double"),
                F.lit(0.0)).alias("x"),
                 F.coalesce(
                F.sum(F.when(F.col("t") >= _B, F.col("v"))
                      .cast("decimal(28,2)")).cast("double"),
                F.lit(0.0)).alias("y")))


def test_cuped_stream_unit_sums_equal_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0, b1, b2 = _batches()
    for i, b in enumerate((b0, b1, b2)):
        _write(src, f"b{i}.json", b)
    final = _drain(spark, src, str(tmp_path / "ck"))
    batch = {r["u"]: (r["x"], r["y"])
             for r in _batch_table(spark, b0 + b1 + b2).collect()}
    assert final == batch


def test_cuped_over_stream_snapshot_equals_batch_readout(spark,
                                                         tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0, b1, b2 = _batches()
    for i, b in enumerate((b0, b1, b2)):
        _write(src, f"b{i}.json", b)
    final = _drain(spark, src, str(tmp_path / "ck"))
    snap = spark.createDataFrame(
        [(u, x, y) for u, (x, y) in sorted(final.items())],
        "u long, x double, y double")
    arm = F.expr("u % 2").alias("g")
    live = cuped(snap.select(arm, "y", "x"), "g", "y", "x", 0, 1,
                 scale=100.0).collect()[0]
    batch = cuped(_batch_table(spark, b0 + b1 + b2)
                  .select(arm, "y", "x"), "g", "y", "x", 0, 1,
                  scale=100.0).collect()[0]
    assert live == batch
    assert live.theta is not None and live.n_a + live.n_b == 6
