"""Streaming CM twin vs batch countmin: the shard-summed probe cells
must reproduce the batch estimate EXACTLY (CM cells merge by cell-wise
+ and the shards partition the stream), across any batch boundaries;
state stays at d*w int64s per shard."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.sketch import countmin
from influxdb_ha_spark.streaming.countmin_stream import (
    countmin_stream, probe_hash)


def test_probe_hash_matches_spark(spark):
    from pyspark.sql import functions as F
    from influxdb_ha_spark.operators.hashing import (
        MERSENNE_P, hash64_expr)
    rows = spark.createDataFrame([("a",), ("42",), ("hot",)], "s string") \
        .select("s", (hash64_expr(F.col("s")) % F.lit(MERSENNE_P))
                .alias("h")).collect()
    for r in rows:
        assert probe_hash(r.s) == r.h


def test_cm_stream_merged_cells_equal_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = ([{"item": "a"}] * 30 + [{"item": "b"}] * 20
            + [{"item": "c"}] * 10
            + [{"item": f"n{i}"} for i in range(20) for _ in range(2)])
    # interleave then split mid-key so batch boundaries cut counts
    _write(src, "b0.json", rows[0::2])
    _write(src, "b1.json", rows[1::2])
    d, w, probes = 3, 8, ["a", "b", "c"]   # tiny w -> real collisions
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("item string") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = countmin_stream(stream, item_col="item", probes=probes,
                          d=d, w=w, n_shards=4)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation",
                                      str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    # final cells per (shard, item) = that shard's LAST emission
    final = {}
    for _, batch in sorted(collected):
        for r in batch:
            final[(r["shard"], r["item"])] = r["cells"]
    merged = {p: [0] * d for p in probes}
    for (_, item), cells in final.items():
        for i, c in enumerate(cells):
            merged[item][i] += c
    live_est = {p: min(cs) for p, cs in merged.items()}
    batch_df = spark.createDataFrame([(r["item"],) for r in rows],
                                     "item string")
    ref = {r.item: (r.exact_cnt, r.cm_est)
           for r in countmin(batch_df, "item", d=d, w=w, top=3).collect()}
    assert set(ref) == set(probes)
    for p in probes:
        exact, est = ref[p]
        assert live_est[p] == est          # merge-exact vs batch sketch
        assert live_est[p] >= exact        # CM one-sided guarantee
