"""Streaming Misra–Gries twin vs exact batch heavy_hitters: the summary
must (1) be EXACT — equal to the batch counts — while distinct keys fit
the k−1 counters, (2) keep the superset guarantee (every true heavy
hitter present, underestimate ≤ n_shard/k) under counter pressure with
state carried across micro-batches, (3) bound memory at k−1 counters
per shard no matter how many distinct keys stream through."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.operators.timeseries import heavy_hitters
from influxdb_ha_spark.streaming.heavy_hitters_stream import (
    heavy_hitters_stream)


def _drain(spark, src, ckpt, k, n_shards):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = spark.readStream.schema("user_id string") \
        .option("maxFilesPerTrigger", 1).json(src)
    out = heavy_hitters_stream(stream, key_col="user_id", k=k,
                               n_shards=n_shards)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    # final summary per shard = that shard's LAST emission
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final.setdefault(r["shard"], {})
            final[r["shard"]] = {x["key"]: x["count_lower"]
                                 for x in rows if x["shard"] == r["shard"]}
    return final


def test_mg_exact_when_keys_fit(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # 3 distinct keys, capacity k-1 = 9 -> no reduction ever: the MG
    # summary IS the exact count table, split across two micro-batches
    b0 = [{"user_id": "a"}] * 5 + [{"user_id": "b"}] * 2
    b1 = [{"user_id": "a"}] * 3 + [{"user_id": "c"}] * 4
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    final = _drain(spark, src, str(tmp_path / "ck"), k=10, n_shards=2)
    merged = {}
    for shard_counts in final.values():
        merged.update(shard_counts)
    assert merged == {"a": 8, "b": 2, "c": 4}


def test_mg_superset_of_exact_heavy_hitters_under_pressure(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # one hot key (40% of stream) + 20 long-tail keys, capacity k-1 = 4
    # with ONE shard so every key fights for the same 4 counters
    hot = [{"user_id": "hot"}] * 40
    tail = [{"user_id": f"t{i}"} for i in range(20) for _ in range(3)]
    rows = []
    for i in range(20):
        rows.extend(hot[2 * i:2 * i + 2])
        rows.extend(tail[3 * i:3 * i + 3])
    _write(src, "b0.json", rows[:50])
    _write(src, "b1.json", rows[50:])
    k = 5
    final = _drain(spark, src, str(tmp_path / "ck"), k=k, n_shards=1)
    summary = final[0] if 0 in final else next(iter(final.values()))
    # bounded memory: never more than k-1 counters
    assert len(summary) <= k - 1
    # batch exact reference on the same rows
    batch = spark.createDataFrame([(r["user_id"],) for r in rows],
                                  "user_id string")
    exact = {r["user_id"]: r["cnt"]
             for r in heavy_hitters(batch, by=["user_id"], k=k).collect()}
    assert exact == {"hot": 40}  # 40*5 > 100 and no tail key qualifies
    n = len(rows)
    for key, true_cnt in exact.items():
        # superset guarantee: present, with the classic underestimate
        assert key in summary
        assert summary[key] <= true_cnt
        assert true_cnt - summary[key] <= n / k
