"""Streaming twin of operators/timeseries.funnel: ONLINE per-entity
funnel progression via `applyInPandasWithState`.

The batch operator is retrospective ("how many entities reached each
step, given the whole history"); the streaming form answers the
monitoring question ("which entities just converted, and when") by
emitting ONE transition row per (entity, newly-reached step) as data
arrives — the append-mode event feed a conversion dashboard or an
alerting rule consumes.

Semantics vs the batch operator: state per entity is the k reach times
(first-touch). Each micro-batch's events are processed in TIME order;
a step-i event reaches step i iff step i−1 is already reached, the
event is strictly later (and within `within_ns` when set), and step i
is still unreached. When events arrive across batches in non-decreasing
time order per entity — the normal stream — the committed reach times
are EXACTLY the batch operator's t_i (processing in time order makes
each first qualifying event the minimum; the structural-equivalence
pytest pins this on a shared two-batch fixture). A cross-batch
REGRESSION (an event older than an already-committed reach time) cannot
retroactively rewrite the chain — committed transitions are immutable,
the documented monitor semantics (the deadman twin's wall-clock caveat,
applied to order): replay the batch operator for the forensic answer.

State: k longs per entity — O(k), independent of event volume; one
shuffle per micro-batch on the entity key (stateful.py convention).

Reference: added scope like the batch funnel (the reference proxies
InfluxQL only; README.md:190-200 — no analytics ops of its own).
"""

from __future__ import annotations

from typing import Any, Iterator, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "reach array<long>"
OUTPUT_SCHEMA = ("entity string, step long, step_name string, "
                 "reach_time long")


def _make_update(steps: Sequence[str], within_ns: int | None):
    steps = list(steps)
    k = len(steps)

    def update(key: Tuple[str, ...],
               pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator[Any]:
        import pandas as pd

        entity = key[0]
        reach: list = list(state.get[0]) if state.exists else [None] * k
        rows = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # null-time events arrive as NaN (Arrow nullable int64 ->
        # float64); drop them like the batch operator's when()-guarded
        # windows do, instead of crashing astype (r7 review)
        pdf = pdf.dropna(subset=["time", "event_type"])
        pdf = pdf.sort_values(["time", "event_type"], kind="mergesort")
        for t, typ in zip(pdf["time"].astype("int64"), pdf["event_type"]):
            t = int(t)
            for i, s in enumerate(steps):
                if typ != s or reach[i] is not None:
                    continue
                if i == 0:
                    ok = True
                else:
                    prev = reach[i - 1]
                    ok = (prev is not None and t > prev
                          and (within_ns is None or t <= prev + within_ns))
                if ok:
                    reach[i] = t
                    rows.append((entity, i, s, t))
        state.update((reach,))
        yield pd.DataFrame(rows, columns=["entity", "step", "step_name",
                                          "reach_time"])
    return update


def funnel_stream(stream: DataFrame, steps: Sequence[str],
                  entity_col: str = "user_id",
                  time_col: str = "time",
                  type_col: str = "event_type",
                  within_ns: int | None = None) -> DataFrame:
    """Attach the streaming funnel to a DataFrame with columns
    (entity, time long, event_type string). Emits one transition row
    per (entity, newly-reached step): (entity, step, step_name,
    reach_time), append mode. O(k) state per entity."""
    from pyspark.sql import functions as F

    src = stream.select(F.col(entity_col).cast("string").alias("entity"),
                        F.col(time_col).alias("time"),
                        F.col(type_col).alias("event_type"))
    return (src.groupBy("entity")
            .applyInPandasWithState(
                _make_update(steps, within_ns),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
