"""Streaming exact dedup: drop repeated documents as they arrive.

The batch dedup family (operators/dedup.py) answers "which docs in the
corpus duplicate each other"; a training-ingest pipeline also needs the
STREAMING form — "drop this incoming doc if its content was already seen
recently" — without re-scanning the corpus per batch.

Spark-native: `dropDuplicatesWithinWatermark` on the content digest. The
digest (md5 — same convention as operators/hashing) keys the dedup state
store; the watermark bounds state size, which is the property that
survives an unbounded stream: state holds only digests newer than
(max event time − delay), so memory is O(arrival rate × watermark), not
O(corpus). Exactly-once across restarts comes from the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..timeutil import ns_to_timestamp


def dedup_stream(docs_stream: DataFrame, text_col: str = "text",
                 time_col: str = "time",
                 watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming DataFrame → stream with exact-duplicate texts dropped.

    `time_col` is ns-long event time (engine convention); a TimestampType
    twin is derived for the watermark. Docs whose md5(text) matches one
    seen within the watermark window are dropped; older duplicates (beyond
    the watermark) can reappear — the documented bounded-state trade-off,
    the same one InfluxDB-style retention makes.
    """
    return (docs_stream
            .withColumn("__digest", F.md5(F.col(text_col)))
            .withColumn("__event_ts", ns_to_timestamp(F.col(time_col)))
            .withWatermark("__event_ts", watermark_delay)
            .dropDuplicatesWithinWatermark(["__digest"])
            .drop("__digest", "__event_ts"))
