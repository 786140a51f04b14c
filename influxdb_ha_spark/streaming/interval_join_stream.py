"""Streaming twin of the keyed containment join
(operators/timeseries.interval_join): points stream ⋈ intervals stream,
point.time ∈ [t_start, t_end], as a WATERMARKED STREAM-STREAM JOIN —
the live form of "tag each reading with the maintenance window /
session / experiment it fell inside", where both sides keep arriving.

This twin exercises a Structured Streaming capability class the other
thirteen twins don't: symmetric two-sided join state. Spark buffers
BOTH sides and needs two bounds to evict:

- a WATERMARK on each side's event time (`delay_ns`): how late either
  stream may be;
- a MAXIMUM INTERVAL LENGTH (`max_len_ns`), folded into the join
  condition as p_ts <= s_ts + max_len — without it the range
  condition's upper bound (t_end, a data value) gives the engine no
  static bound, and interval-side state would grow forever. The cap is
  the streaming analog of the batch operator's p99 bucket sizing: both
  make the long-tail interval the explicitly-bounded case. Intervals
  longer than the cap are TRUNCATED at s + max_len (matches a batch
  interval_join whose end_col is clamped — callers choose the cap the
  way they choose the batch bucket).

EXACTNESS — the fake-microsecond timeline: watermarks require a
timestamp type, but a ns→µs conversion would decide containment at
coarser resolution than the engine's canonical int64 ns. Instead the
ns longs are mapped through `timestamp_micros` AS IF they were µs — an
INJECTIVE, order-preserving map (1 ns of real time = 1 µs of engine
time; epoch ns values land ~55,000 AD, far inside timestamp range), so
every range comparison in timestamp space is bit-for-bit the int64 ns
comparison and the emitted pair set matches the batch operator
EXACTLY. The costs are cosmetic: internal timestamps display a far-
future date, and `delay_ns`/`max_len_ns` are supplied in real ns and
converted to fake-µs intervals internally.

Every range leg lives in the JOIN CONDITION in watermark-analyzable
timestamp form. (A first cut kept exact int64 legs beside the ts legs
and applied containment as a post-join filter — Catalyst pushes the
filter back into the join condition, StreamingJoinHelper's constraint
extraction then fails on the long-typed inequalities, and same-batch
matches are silently dropped. The all-timestamp condition is the only
shape the streaming join planner fully analyzes.)

Semantics mirror the batch `by`-keyed plan: an equi-join on the keys
with the containment range as the remaining predicate; a point inside
k overlapping intervals emits k rows. Inner join + append mode: a
match emits as soon as both sides have arrived (possibly in different
micro-batches — the state's whole job); rows never retract.

Batch/stream equivalence is structural:
tests/test_interval_join_stream.py feeds identical point/interval rows
through the batch operator and this stream with the sides split across
micro-batch boundaries (so matches must come out of two-sided join
state) and asserts multiset equality.

State at 100 TB-rate: per key, the points buffered within the
watermark delay + the intervals buffered within delay + max_len —
bounded by ARRIVAL RATE × the two parameters, independent of stream
lifetime.

Edge (inherent to Spark, observed while building the twin): rows whose
event time equals the INITIAL watermark value (epoch 0) are treated as
late and silently dropped by the streaming join. Real ns-epoch event
times never sit at 0, so this is untriggerable in production data —
but synthetic fixtures must ride on a nonzero base (the twin test
does).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(points: DataFrame, intervals: DataFrame,
                         by: Sequence[str] = ("key",),
                         on: str = "time",
                         start_col: str = "t_start",
                         end_col: str = "t_end",
                         max_len_ns: int = 3_600_000_000_000,
                         delay_ns: int = 30_000_000_000) -> DataFrame:
    """Attach the containment join to two STREAMING DataFrames.

    points:    (*by, `on` long ns)
    intervals: (*by, `start_col` long ns, `end_col` long ns)
    Returns (*by, `on`, `start_col`, `end_col`) — one row per
    (point, containing interval) pair, t_end clamped to
    t_start + max_len_ns.
    """
    by = list(by)
    if not by:
        raise ValueError("interval_join_stream requires join keys: the "
                         "keyless batch plan (bucket explode) has no "
                         "bounded-state streaming analog")
    if max_len_ns < 1:
        raise ValueError("interval_join_stream: max_len_ns must be >= 1")
    if delay_ns < 0:
        raise ValueError("interval_join_stream: delay_ns must be >= 0")

    def ts(col):
        # the fake-µs timeline: int64 ns interpreted as µs — injective
        # and order-preserving, so timestamp comparisons ARE the exact
        # ns comparisons (see module docstring)
        return F.timestamp_micros(F.col(col))

    wm = f"{int(delay_ns)} microseconds"
    p = (points
         .select(*by, F.col(on).alias("__pt"))
         .withColumn("__p_ts", ts("__pt"))
         .withWatermark("__p_ts", wm))
    i = (intervals
         .select(*[F.col(k).alias(f"__i_{k}") for k in by],
                 F.col(start_col).alias("__s"),
                 F.least(F.col(end_col),
                         F.col(start_col) + F.lit(int(max_len_ns)))
                 .alias("__e"))
         .withColumn("__s_ts", ts("__s"))
         .withColumn("__e_ts", ts("__e"))
         .withWatermark("__s_ts", wm))
    cond = [F.col(k) == F.col(f"__i_{k}") for k in by] + [
        F.col("__p_ts") >= F.col("__s_ts"),
        F.col("__p_ts") <= F.col("__s_ts")
        + F.expr(f"INTERVAL {int(max_len_ns)} MICROSECONDS"),
        F.col("__p_ts") <= F.col("__e_ts"),
    ]
    joined = p.join(i, cond, "inner")
    return joined.select(*by, F.col("__pt").alias(on),
                         F.col("__s").alias(start_col),
                         F.col("__e").alias(end_col))
