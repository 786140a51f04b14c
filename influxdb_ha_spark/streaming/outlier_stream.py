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

from ..operators.timeseries import mad_profile, mad_score

__all__ = ["mad_profile", "outlier_stream"]


def outlier_stream(events: DataFrame, profile: DataFrame,
                   by: Sequence[str] = ("event_type",),
                   value_col: str = "value",
                   threshold: float = 3.5) -> DataFrame:
    """Score a streaming DataFrame against a batch `mad_profile`
    (operators/timeseries.py — the shared train/score definitions):
    adds robust_z (Iglewicz–Hoaglin modified z-score, NULL when the
    series is unprofiled or MAD = 0) and is_outlier. Stateless —
    stream-static left join + projection, usable in append mode with
    no watermark requirement."""
    by = list(by)
    z, flag = mad_score(F.col(value_col), F.col("med"), F.col("mad"),
                        threshold)
    return (events.join(F.broadcast(profile), by, "left")
            .withColumn("robust_z", z)
            .withColumn("is_outlier", flag)
            .drop("med", "mad"))
