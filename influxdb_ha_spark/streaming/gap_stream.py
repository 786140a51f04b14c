"""Streaming twin of the inter-event gap stage
(operators/timeseries.inter_event_gaps): per-(entity, type) gap to the
previous event, maintained across micro-batches via
`applyInPandasWithState`.

This is the ONLINE form of the cadence profile — the fraud/real-time
use ("this card just fired two transactions 40 ms apart") that the
batch `ev_inter_event` profile audits retrospectively. State per
(entity, type) series is ONE scalar: the last-seen timestamp — the
theoretical minimum for gap computation, so state size is
O(|active series|) regardless of throughput.

Semantics mirror the batch stage exactly: NULL-typed events are
excluded BEFORE the stateful operator (the type_transitions contract),
each series' first-ever event emits gap NULL, and within a micro-batch
events are processed in time order (ties give gap 0 — the gap multiset
depends only on the sorted time multiset, the batch operator's
documented invariant). Across batches, arrival order stands in for
time order — the standard streaming contract shared by every twin in
this package; late data belongs to a watermarked variant.

Batch/stream equivalence is structural: tests/test_gap_stream.py feeds
identical data through `inter_event_gaps` and this stream (split into
two micro-batches so state must survive the boundary) and asserts
multiset equality of the (entity, type, time, gap) rows.

Output mode: append — each input event emits exactly one gap row.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_t long"
OUTPUT_SCHEMA = "entity string, etype string, time long, gap long"


def _update(key: Tuple[str, ...],
            pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
            state: GroupState) -> Iterator[Any]:
    import pandas as pd

    last_t = state.get[0] if state.exists else None
    # concat BEFORE sorting: a series whose micro-batch exceeds the
    # Arrow chunk size arrives as multiple pdfs, and per-chunk sorts
    # would fold across-chunk rows out of time order (the cusum_stream
    # r5 lesson)
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("time")
    rows = []
    for t in pdf["time"]:
        t = int(t)
        rows.append((key[0], key[1], t,
                     None if last_t is None else t - last_t))
        last_t = t
    if last_t is not None:
        state.update((last_t,))
    yield pd.DataFrame(rows, columns=["entity", "etype", "time", "gap"])


def gap_stream(stream: DataFrame, entity_col: str = "entity",
               type_col: str = "etype",
               time_col: str = "time") -> DataFrame:
    """Attach the gap operator to a streaming DataFrame with columns
    (entity string, etype string, time long). One shuffle per
    micro-batch on the (entity, type) key; O(1) state per series;
    NULL-typed events dropped to match the batch contract."""
    from pyspark.sql import functions as F

    src = (stream
           .where(F.col(type_col).isNotNull())
           .select(F.col(entity_col).alias("entity"),
                   F.col(type_col).alias("etype"),
                   F.col(time_col).alias("time")))
    return (src.groupBy("entity", "etype")
            .applyInPandasWithState(
                _update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
