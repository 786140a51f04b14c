"""Streaming deadman twin: per-series liveness state must survive
micro-batch boundaries, silent series must raise exactly one dead alert
when their processing-time timeout fires, and returning data must emit
a recovery row."""

import json
import os
import time
from .conftest import write_json_batch as _write

from influxdb_ha_spark.streaming.deadman_stream import deadman_stream


def test_deadman_stream_status_rows_accumulate(spark, tmp_path):
    """Data path (deterministic): status rows carry the running
    (last_time, n_points) across micro-batches, dead=false while data
    flows, and last_time is monotone even when a batch arrives with
    older points."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "series string, time long"
    # batch ordering is pinned by SEQUENCING, not reader options: b1's
    # file is only written after b0's rows have been observed in the
    # sink, so the source cannot fold them into one micro-batch. A
    # periodic trigger (NOT availableNow: armed processing-time
    # timeouts keep that spinning state-cleanup batches) drains both
    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    _write(src, "b0.json",
                 [{"series": "a", "time": t} for t in (10, 30, 20)]
                 + [{"series": "b", "time": 5}])
    stream = spark.readStream.schema(schema).json(src)
    out = deadman_stream(stream, threshold_ms=3_600_000)  # never fires
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(processingTime="200 milliseconds").start())
    try:
        deadline = time.time() + 90
        while len(collected) < 2 and time.time() < deadline:
            time.sleep(0.1)
        # second batch only after the first is consumed — pins the
        # file->micro-batch order the state transition assertions need
        _write(src, "b1.json",
                     [{"series": "a", "time": 25}]    # older than 30
                     + [{"series": "b", "time": 50}])
        while len(collected) < 4 and time.time() < deadline:
            time.sleep(0.1)
    finally:
        q.stop()

    got = {(r["series"], r["n_points"]): (r["last_time"], r["dead"],
                                          r["recovered"])
           for r in collected}
    assert got[("a", 3)] == (30, False, False)
    assert got[("b", 1)] == (5, False, False)
    assert got[("a", 4)] == (30, False, False)      # monotone last_time
    assert got[("b", 2)] == (50, False, False)


def test_deadman_stream_timeout_alert_and_recovery(spark, tmp_path):
    """Timeout path: with a 1 ms threshold, a series absent from the
    next micro-batch (processed >= milliseconds later) raises exactly
    one dead alert; when its data returns, the status row carries
    recovered=true. Series 'b' stays live throughout and never
    alerts."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "series string, time long"

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema(schema).json(src)
    out = deadman_stream(stream, threshold_ms=1)

    _write(src, "b0.json", [{"series": "a", "time": 1},
                                  {"series": "b", "time": 1}])
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(processingTime="300 milliseconds").start())
    try:
        deadline = time.time() + 60
        while not any(r["series"] == "a" and not r["dead"]
                      for r in collected) and time.time() < deadline:
            time.sleep(0.1)
        # batch with only 'b': 'a' has been silent past 1 ms -> alert
        _write(src, "b1.json", [{"series": "b", "time": 2}])
        while not any(r["series"] == "a" and r["dead"]
                      for r in collected) and time.time() < deadline:
            time.sleep(0.1)
        # 'a' returns -> recovery row
        _write(src, "b2.json", [{"series": "a", "time": 3},
                                      {"series": "b", "time": 3}])
        while not any(r["series"] == "a" and r["recovered"]
                      for r in collected) and time.time() < deadline:
            time.sleep(0.1)
    finally:
        q.stop()

    a_rows = [r for r in collected if r["series"] == "a"]
    dead = [r for r in a_rows if r["dead"]]
    assert dead and dead[0]["last_time"] == 1   # alert carries the state
    rec = [r for r in a_rows if r["recovered"]]
    assert rec and rec[0]["last_time"] == 3 and not rec[0]["dead"]
    # alert-ONCE-per-silence, both series (with a 1 ms threshold every
    # inter-batch gap is a silence, so 'b' legitimately dies/recovers
    # too): a dead alert is never followed by another dead alert without
    # a recovery row in between
    for s in ("a", "b"):
        flags = [("D" if r["dead"] else ("R" if r["recovered"] else "L"))
                 for r in collected if r["series"] == s]
        prev = None
        for f in flags:
            if f == "D":
                assert prev != "D", (s, flags)
            if f == "R":                    # recovery only after an alert
                assert prev == "D", (s, flags)
            if f in ("D", "R"):
                prev = f


def test_deadman_stream_matches_batch_on_data_path(spark, tmp_path):
    """Batch/stream structural equivalence on the DATA path (the
    cusum_stream precedent): on a shared fixture split across two
    micro-batches, the stream's final accumulated per-series state
    (last_time, n_points) must equal the batch `deadman` operator's,
    and applying the batch decision rule (age vs threshold anchored at
    the global max) to that state must reproduce the batch `dead`
    flags exactly. The processing-time alert rows are the (documented)
    non-replayable part; the state arithmetic is the shared core."""
    from influxdb_ha_spark.operators.timeseries import deadman

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    schema = "series string, time long"

    S = 10 ** 9  # ns per "second" of fixture time
    rows = ([{"series": "a", "time": t * S} for t in (0, 5, 40, 40, 90)]
            + [{"series": "b", "time": t * S} for t in (1, 2, 3)]      # stops early
            + [{"series": "c", "time": t * S} for t in (60, 88)])
    b0 = [r for r in rows if r["time"] < 40 * S]
    b1 = [r for r in rows if r["time"] >= 40 * S]
    n_series_b0 = len({r["series"] for r in b0})
    threshold_ns = 30 * S

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    _write(src, "b0.json", b0)
    stream = spark.readStream.schema(schema).json(src)
    out = deadman_stream(stream, threshold_ms=3_600_000)  # never fires
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(processingTime="200 milliseconds").start())
    try:
        deadline = time.time() + 90
        while len(collected) < n_series_b0 and time.time() < deadline:
            time.sleep(0.1)
        _write(src, "b1.json", b1)   # only after b0 consumed
        want = n_series_b0 + len({r["series"] for r in b1})
        while len(collected) < want and time.time() < deadline:
            time.sleep(0.1)
    finally:
        q.stop()

    # final accumulated state per series = the last emitted status row
    final = {}
    for r in collected:
        final[r["series"]] = (r["last_time"], r["n_points"])

    batch_df = spark.createDataFrame(
        [(r["series"], r["time"]) for r in rows], schema)
    expect = {r["series"]: r for r in
              deadman(batch_df, by=["series"], on="time",
                      threshold_ns=threshold_ns).collect()}

    assert set(final) == set(expect)
    for s, (lt, n) in final.items():
        assert (lt, n) == (expect[s]["last_time"], expect[s]["n_points"]), s

    # same decision arithmetic: batch rule applied to stream state
    # reproduces the batch dead flags (b dead: age 87s > 30s; a, c live)
    now_ns = max(lt for lt, _ in final.values())
    for s, (lt, _) in final.items():
        assert (now_ns - lt > threshold_ns) == expect[s]["dead"], s
    assert expect["b"]["dead"] and not expect["a"]["dead"]
