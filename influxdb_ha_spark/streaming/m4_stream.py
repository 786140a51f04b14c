"""Streaming M4 downsampling: tumbling-window min/max/first/last as the
streaming twin of operators/timeseries.m4_downsample.

The batch operator reduces stored series for plotting; a live dashboard
wants the same reduction AS points arrive. Structured Streaming's answer
is a watermarked tumbling-window aggregation: `groupBy(series,
window(ts))` with min/max/min_by/max_by — all declarative aggregates, so
they run in the streaming state store with partial aggregation, and
append mode emits each finalized bucket exactly once when the watermark
passes its end.

Scale: state is one row of four scalars per (series, open bucket) —
independent of event volume; the watermark evicts closed buckets. Same
shape the engine's CQs use (streaming/cq.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..timeutil import ns_to_timestamp


def m4_stream(events: DataFrame, by: Sequence[str] = ("event_type",),
              time_col: str = "time", value_col: str = "value",
              window: str = "1 hour",
              watermark_delay: str = "30 minutes") -> DataFrame:
    """Streaming events (ns-long `time_col`) → one finalized M4 row per
    (by..., bucket): (bucket_start, bucket_end, n, v_min, v_max, v_first,
    v_last). Append mode emits a bucket once, when the watermark passes
    its end."""
    ts = ns_to_timestamp(F.col(time_col))
    return (events
            .withColumn("__event_ts", ts)
            .withWatermark("__event_ts", watermark_delay)
            .groupBy(*by, F.window("__event_ts", window).alias("__w"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(value_col).alias("v_min"),
                 F.max(value_col).alias("v_max"),
                 F.min_by(value_col, F.col(time_col)).alias("v_first"),
                 F.max_by(value_col, F.col(time_col)).alias("v_last"))
            .select(*by,
                    F.col("__w.start").alias("bucket_start"),
                    F.col("__w.end").alias("bucket_end"),
                    "n", "v_min", "v_max", "v_first", "v_last"))
