"""Streaming session_window aggregation: events with gaps > 1h split into
separate sessions; closed sessions are emitted in append mode."""

import json
import os
from .conftest import write_json_batch as _write

from influxdb_ha_spark.streaming.session_stream import session_stream

H = 3_600_000_000_000  # 1h in ns
BASE = 1_704_067_200_000_000_000  # 2024-01-01T00:00:00Z


def test_session_stream_splits_on_gap(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)
    # user u: 3 events inside one hour-gapped session, then one 5h later
    # (a second session); a far-future event from user v pushes the
    # watermark past both so they close and get emitted in append mode.
    _write(src, "b0.json", [
        {"user": "u", "time": BASE},
        {"user": "u", "time": BASE + H // 2},
        {"user": "u", "time": BASE + H - 1},
        {"user": "u", "time": BASE + 6 * H},
        {"user": "v", "time": BASE + 100 * H},
    ])

    collected = []

    def sink(batch_df, batch_id):
        collected.extend(batch_df.collect())

    stream = spark.readStream.schema("user string, time long").json(src)
    out = session_stream(stream, by=["user"], gap="1 hour",
                         watermark_delay="30 minutes")
    q = (out.writeStream.foreachBatch(sink)
         .outputMode("append").option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(600), "stream drain timed out"

    u_sessions = sorted([r for r in collected if r["user"] == "u"],
                        key=lambda r: r["session_start"])
    assert len(u_sessions) == 2
    assert u_sessions[0]["n_events"] == 3
    assert u_sessions[1]["n_events"] == 1
    # session_window extends `gap` past the last event; event times are
    # µs-truncated (ns_to_timestamp), so the H-1 ns offset reads 3599.999999s
    dur = (u_sessions[0]["session_end"] -
           u_sessions[0]["session_start"]).total_seconds()
    assert dur == 3599.999999 + 3600
