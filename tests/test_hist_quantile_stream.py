"""Streaming histogram-quantile twin vs batch histogram_quantiles: the
final streamed estimates must equal the batch operator on the union of
all micro-batches EXACTLY (histograms over shared boundaries merge by
cell-wise +), across any batch boundaries; state stays at `bins` int64s
plus one clamped-row counter per group."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.sketch import histogram_quantiles
from influxdb_ha_spark.streaming.hist_quantile_stream import (
    hist_quantile_stream)


def test_hist_quantile_stream_equals_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # two groups, awkward values (clamped outlier included), split so
    # batch boundaries cut through both groups
    rows = ([{"g": "a", "v": float(v)} for v in range(1, 201)]
            + [{"g": "b", "v": 0.5 * v} for v in range(1, 61)]
            + [{"g": "b", "v": 9999.0}])            # clamps to top bin
    _write(src, "b0.json", rows[0::2])
    _write(src, "b1.json", rows[1::2])
    lo, hi, bins, qs = 0.0, 256.0, 512, (0.5, 0.95, 0.99)
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("g string, v double") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = hist_quantile_stream(stream, group_col="g", value_col="v",
                               lo=lo, hi=hi, bins=bins, qs=qs)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation",
                                      str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, batch in sorted(collected):
        for r in batch:
            final[(r["g"], r["q"])] = (r["n"], r["n_clamped"], r["est"])
    ref_df = spark.createDataFrame([(r["g"], r["v"]) for r in rows],
                                   "g string, v double")
    ref = {(r.g, r.q): (r.n, r.n_clamped, r.est)
           for r in histogram_quantiles(ref_df, "v", by=["g"], lo=lo,
                                        hi=hi, bins=bins, qs=qs).collect()}
    assert final == ref
    # sanity: the batch reference itself is non-degenerate, and the
    # clamped outlier is counted on both paths
    assert ref[("a", 0.5)][0] == 200
    assert ref[("b", 0.99)][1] == 1       # n_clamped: the 9999.0 row
    assert ref[("b", 0.99)][2] >= 255.5   # the clamped outlier's bin
    assert ref[("a", 0.5)][1] == 0


def test_hist_quantile_stream_drops_uncastable_values(spark, tmp_path):
    """A non-null value whose double cast is NULL (non-numeric string)
    must be DROPPED like the batch path drops it — previously it
    reached the stateful update as a NaN bin and killed the query."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write(src, "b0.json", [{"g": "a", "v": "0.25"},
                            {"g": "a", "v": "abc"},
                            {"g": "a", "v": "0.75"}])
    collected = []
    stream = spark.readStream.schema("g string, v string") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = hist_quantile_stream(stream, group_col="g", value_col="v",
                               lo=0.0, hi=1.0, bins=4, qs=(1.0,))
    q = (out.writeStream
         .foreachBatch(lambda df, bid: collected.append(df.collect()))
         .outputMode("update").option("checkpointLocation",
                                      str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    rows = [r for batch in collected for r in batch]
    assert len(rows) == 1 and rows[0]["n"] == 2   # 'abc' dropped
    ref = histogram_quantiles(
        spark.createDataFrame([("a", "0.25"), ("a", "abc"), ("a", "0.75")],
                              "g string, v string"),
        "v", by=["g"], lo=0.0, hi=1.0, bins=4, qs=(1.0,)).collect()[0]
    assert (rows[0]["n"], rows[0]["n_clamped"], rows[0]["est"]) == \
           (ref.n, ref.n_clamped, ref.est)
