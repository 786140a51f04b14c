"""Streaming robust-outlier flagging: the live twin of
operators/timeseries.mad_outliers.

The batch operator profiles stored series (per-series median + MAD);
production monitoring wants incoming points scored against that profile
AS they arrive. Exact medians aren't incrementally maintainable in a
stream, and they shouldn't be: the standard deployment (Hampel filter
practice) trains the robust location/scale on history and applies it to
live data, retraining on a cadence. So the streaming twin is a
STREAM-STATIC join: the batch profile (2 doubles per series) joins onto
the stream, scoring is a stateless map, and re-running the batch
profiler just swaps the static side at the next micro-batch.

Scale: the profile is |series| rows — broadcast onto every micro-batch,
zero streaming state, zero shuffle of the event stream; series absent
from the profile pass through unflagged (robust_z NULL) rather than
being dropped, so a new series is visible immediately and scored once
the profiler has seen it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_profile(df: DataFrame, by: Sequence[str] = ("event_type",),
                value_col: str = "value") -> DataFrame:
    """Batch profiler: per-series median + MAD (the train half of the
    streaming Hampel filter). Same two tag-keyed aggregations as
    mad_outliers; output is 2 doubles per series."""
    by = list(by)
    med = df.groupBy(*by).agg(F.median(value_col).alias("med"))
    return (df.join(F.broadcast(med), by)
            .groupBy(*by)
            .agg(F.first("med").alias("med"),
                 F.median(F.abs(F.col(value_col) - F.col("med")))
                 .alias("mad")))


def outlier_stream(events: DataFrame, profile: DataFrame,
                   by: Sequence[str] = ("event_type",),
                   value_col: str = "value",
                   threshold: float = 3.5) -> DataFrame:
    """Score a streaming DataFrame against a batch `mad_profile`:
    adds robust_z (Iglewicz–Hoaglin modified z-score, NULL when the
    series is unprofiled or MAD = 0) and is_outlier. Stateless —
    stream-static left join + projection, usable in append mode with
    no watermark requirement."""
    by = list(by)
    z = F.when(F.col("mad") > 0,
               F.round(F.lit(0.6745) * (F.col(value_col) - F.col("med"))
                       / F.col("mad"), 6))
    return (events.join(F.broadcast(profile), by, "left")
            .withColumn("robust_z", z)
            .withColumn("is_outlier",
                        F.coalesce(F.abs(F.col("robust_z")) > threshold,
                                   F.lit(False)))
            .drop("med", "mad"))
