"""Streaming twin of the event-flow transition stage
(operators/timeseries.type_transitions): per-entity (from_type,
to_type) edges emitted live as events arrive, maintained across
micro-batches via `applyInPandasWithState`.

This is the ONLINE form of the Sankey edge list — the live "what do
users do next" feed (session-flow dashboards, next-event anomaly
triggers, the input to an online markov_stationary refresh) that the
batch operator aggregates retrospectively. State per entity is ONE
scalar: the last-seen (time, type) — the theoretical minimum for
transition extraction, so state size is O(|active entities|)
regardless of throughput (the gap_stream bound).

Semantics mirror the batch stage exactly: NULL-typed events are
excluded BEFORE the stateful operator (the type_transitions contract),
each entity's first-ever event emits nothing (no predecessor), and
within a micro-batch events are processed in (time, type) order — the
batch operator's pinned lag order, so tied timestamps break
lexicographically on both paths. Across batches, arrival order stands
in for time order — the standard streaming contract shared by every
twin in this package; late data belongs to a watermarked variant.

This twin emits the EDGE STREAM (one row per transition), not the
aggregated counts: downstream either feeds a windowed groupBy (counts
per minute — a plain streaming aggregation) or a foreachBatch
accumulator. Keeping the stateful operator edge-granular is what makes
the batch/stream equivalence testable row-for-row:
tests/test_transitions_stream.py feeds identical data through
`type_transitions` and this stream (split across micro-batches so the
carried (time, type) state must bridge the boundary) and asserts the
aggregated edge multisets are equal.

Output mode: append — each non-first event emits exactly one edge.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_t long, last_ty string"
OUTPUT_SCHEMA = ("entity string, from_type string, to_type string, "
                 "time long")


def _update(key: Tuple[str, ...],
            pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
            state: GroupState) -> Iterator[Any]:
    import pandas as pd

    last = tuple(state.get) if state.exists else None
    # concat BEFORE sorting (the gap_stream/cusum_stream chunk lesson);
    # (time, etype) order matches the batch lag window's pinned order
    pdf = pd.concat(list(pdfs), ignore_index=True) \
        .sort_values(["time", "etype"])
    rows = []
    for t, ty in zip(pdf["time"], pdf["etype"]):
        t = int(t)
        if last is not None:
            rows.append((key[0], last[1], ty, t))
        last = (t, ty)
    if last is not None:
        state.update(last)
    yield pd.DataFrame(rows, columns=["entity", "from_type", "to_type",
                                      "time"])


def transitions_stream(stream: DataFrame, entity_col: str = "entity",
                       type_col: str = "etype",
                       time_col: str = "time") -> DataFrame:
    """Attach the transition-edge operator to a streaming DataFrame
    with columns (entity string, etype string, time long). One shuffle
    per micro-batch on the entity key; O(1) state per entity;
    NULL-typed events dropped to match the batch contract."""
    from pyspark.sql import functions as F

    src = (stream
           .where(F.col(type_col).isNotNull())
           .select(F.col(entity_col).alias("entity"),
                   F.col(type_col).alias("etype"),
                   F.col(time_col).alias("time")))
    return (src.groupBy("entity")
            .applyInPandasWithState(
                _update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
