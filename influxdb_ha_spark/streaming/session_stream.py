"""Streaming gap-sessionization: Spark's native `session_window` as the
streaming twin of operators/timeseries.sessionize.

The batch operator answers "what sessions exist in the stored events"; an
ingest pipeline also wants sessions AS events arrive — e.g. emitting a
row per closed user session for downstream feature stores. Structured
Streaming has a first-class answer: `groupBy(session_window(ts, gap))`
merges events into dynamic windows that close when the gap passes, and
the watermark both bounds the state store and decides when a session is
final (append mode emits only closed sessions).

Scale: state is keyed by (user, open session) — O(active sessions), not
O(events); the watermark evicts closed sessions. Same shape the engine's
CQs use (streaming/cq.py), so checkpoints/exactly-once come for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..timeutil import ns_to_timestamp


def session_stream(events: DataFrame, by: Sequence[str] = ("user_id",),
                   time_col: str = "time",
                   gap: str = "1 hour",
                   watermark_delay: str = "30 minutes") -> DataFrame:
    """Streaming events (ns-long `time_col`) → one row per session:
    (by..., session_start, session_end, n_events). With outputMode
    "append", a session row is emitted once, when the watermark passes its
    close — the streaming contract the batch operator can't give."""
    ts = ns_to_timestamp(F.col(time_col))
    return (events
            .withColumn("__event_ts", ts)
            .withWatermark("__event_ts", watermark_delay)
            .groupBy(*by, F.session_window("__event_ts", gap).alias("__sw"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(*by,
                    F.col("__sw.start").alias("session_start"),
                    F.col("__sw.end").alias("session_end"),
                    "n_events"))
