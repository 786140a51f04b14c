"""Streaming path-ngram twin: the bounded (time, type) multiset state
must bridge micro-batch boundaries — including OUT-OF-ORDER arrival
where a later batch carries an earlier timestamp that displaces a held
pair — and the folded (gram, support) table must equal the batch
operator (operators/timeseries.path_ngrams) on identical data."""

import os
from collections import Counter

from influxdb_ha_spark.operators.timeseries import path_ngrams
from influxdb_ha_spark.streaming.path_ngram_stream import \
    path_ngrams_stream

from .conftest import write_json_batch as _write


def _drain(spark, src, ckpt, n, max_steps):
    collected = []

    def sink(batch_df, batch_id):
        collected.append((batch_id, batch_df.collect()))

    stream = (spark.readStream
              .schema("entity string, etype string, time long")
              .option("maxFilesPerTrigger", 1).json(src))
    out = path_ngrams_stream(stream, n=n, max_steps=max_steps)
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("update").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"
    final = {}
    for _, rows in sorted(collected):
        for r in rows:
            final[r["entity"]] = list(r["grams"])
    return final


def test_path_ngrams_stream_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    # u1's batch-1 event arrives LATE with an EARLIER timestamp (5),
    # displacing nothing at max_steps=8 but reordering the sequence —
    # the state must re-rank, not append; u2 exercises the max_steps
    # cut: its batch-1 early event (time 1) must EVICT the held
    # latest pair; u3 has a lexicographic tie; one NULL type vanishes.
    b0 = [{"entity": "u1", "etype": "a", "time": 0},
          {"entity": "u1", "etype": "b", "time": 10},
          {"entity": "u2", "etype": "x", "time": 2},
          {"entity": "u2", "etype": "y", "time": 3},
          {"entity": "u3", "etype": "b", "time": 7},
          {"entity": "u3", "etype": "a", "time": 7},
          {"entity": "u3", "etype": None, "time": 8}]
    b1 = [{"entity": "u1", "etype": "c", "time": 5},
          {"entity": "u2", "etype": "w", "time": 1}]
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    final = _drain(spark, src, str(tmp_path / "ck"), n=2, max_steps=2)
    # u1 at max_steps=2: smallest pairs (0,a),(5,c) -> gram a>c
    # u2: (1,w),(2,x) -> w>x (the held (3,y) evicted by the late w)
    # u3: tie at 7 orders lexicographically -> a>b
    assert final == {"u1": ["a>c"], "u2": ["w>x"], "u3": ["a>b"]}

    # the folded support table equals the batch operator exactly
    rows = [(r["entity"], r["etype"], r["time"]) for r in b0 + b1]
    batch_df = spark.createDataFrame(
        rows, "entity string, etype string, time long")
    batch = {(r.gram, r.support) for r in
             path_ngrams(batch_df, by=["entity"], on="time",
                         type_col="etype", n=2, max_steps=2,
                         min_support=1).collect()}
    stream_support = Counter(g for grams in final.values() for g in grams)
    assert {(g, c) for g, c in stream_support.items()} == batch


def test_path_ngrams_stream_duplicate_pairs_are_steps(spark, tmp_path):
    """Identical (time, type) duplicates count as separate steps on
    both paths (row_number semantics), split across batches."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    b0 = [{"entity": "u", "etype": "a", "time": 5}]
    b1 = [{"entity": "u", "etype": "a", "time": 5},
          {"entity": "u", "etype": "b", "time": 9}]
    _write(src, "b0.json", b0)
    _write(src, "b1.json", b1)
    final = _drain(spark, src, str(tmp_path / "ck"), n=3, max_steps=8)
    assert final == {"u": ["a>a>b"]}
    rows = [(r["entity"], r["etype"], r["time"]) for r in b0 + b1]
    batch_df = spark.createDataFrame(
        rows, "entity string, etype string, time long")
    batch = {r.gram for r in
             path_ngrams(batch_df, by=["entity"], on="time",
                         type_col="etype", n=3, max_steps=8,
                         min_support=1).collect()}
    assert set(final["u"]) == batch
