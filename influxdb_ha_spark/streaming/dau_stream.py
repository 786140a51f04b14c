"""Streaming DAU: distinct-entities-per-day as events arrive — the
streaming half of operators/timeseries.active_users (the batch op also
derives trailing WAU/stickiness, which needs the whole window and stays
batch; DAU is the part a live dashboard wants incrementally).

Two chained stateful stages, both watermark-bounded:
  1. `dropDuplicatesWithinWatermark` on (entity, day) — the engine's
     exact-dedup state machine (streaming/dedup_stream.py precedent)
     collapses raw volume to one row per entity-day; state is one key
     per (entity, active day) inside the watermark horizon, evicted as
     the watermark passes.
  2. a watermarked tumbling-window count — the per-day distinct count,
     emitted in APPEND mode exactly once per day when the watermark
     passes its end (the m4_stream/CQ convention).

Equivalence: on a drained in-order fixture the emitted (day, dau) rows
equal the batch `active_users` DAU column exactly (pytest). Late data
beyond the watermark is dropped by contract — the batch operator is the
replayable/backfill form (the deadman/funnel twin convention).

Scale: stage-1 state is |entities|·|days inside watermark| keys —
bounded by the horizon, not the stream; stage-2 state is one count per
open day. One shuffle per micro-batch on the dedup key, one on the day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..timeutil import ns_to_timestamp


def dau_stream(events: DataFrame, entity_col: str = "user_id",
               time_col: str = "time", window: str = "1 day",
               watermark_delay: str = "1 hour") -> DataFrame:
    """Streaming events (ns-long `time_col`) → one finalized
    (bucket_start, bucket_end, dau) row per day, append mode."""
    # day floor in EXACT epoch-ns arithmetic BEFORE the timestamp
    # conversion, not date_trunc('day', ts): date_trunc is
    # session-timezone dependent, while the batch twin buckets by pure
    # epoch arithmetic — on a non-UTC driver the two would disagree
    # near local midnight and break the documented equivalence
    # (r7 review; the vanilla-session hazard class)
    day_ns = F.col(time_col) - F.pmod(F.col(time_col),
                                      F.lit(86_400_000_000_000))
    dedup = (events
             .select(F.col(entity_col).alias("__entity"),
                     ns_to_timestamp(day_ns).alias("__day_ts"))
             .withWatermark("__day_ts", watermark_delay)
             .dropDuplicatesWithinWatermark(["__entity", "__day_ts"]))
    return (dedup
            .groupBy(F.window("__day_ts", window).alias("__w"))
            .agg(F.count(F.lit(1)).alias("dau"))
            .select(F.col("__w.start").alias("bucket_start"),
                    F.col("__w.end").alias("bucket_end"),
                    F.col("dau").cast("long").alias("dau")))
