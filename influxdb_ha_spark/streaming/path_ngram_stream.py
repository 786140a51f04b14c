"""Streaming twin of sequential n-gram mining
(operators/timeseries.path_ngrams): each entity's contiguous event-type
n-gram set maintained LIVE as events arrive, via applyInPandasWithState.

The batch operator mines "which event sequences occur" retrospectively;
the online form keeps every entity's current gram set fresh for
next-action features and live sequence-support dashboards. State per
entity is the theoretical minimum for the first-`max_steps` contract:
the up-to-max_steps SMALLEST (time, type) pairs seen so far — a bounded
multiset, O(max_steps) per active entity regardless of throughput (the
gap_stream bound). Keeping pairs rather than a rolling tail is what
makes the twin EXACT under out-of-order arrival: a late event with an
earlier timestamp displaces the pair it should displace, exactly as the
batch row_number window would have ranked it — no watermark needed for
equivalence, because the state IS the batch window's input.

Semantics mirror the batch operator exactly: NULL types excluded before
the stateful operator, (time, type) ascending order with lexicographic
ties (Python tuple sort == the window's pinned order), duplicates of
identical (time, type) pairs count as separate steps (row_number
semantics), grams are contiguous and DISTINCT per entity.

Output mode: update — one row per entity per micro-batch in which its
state changed: (entity, grams array<string>), the entity's CURRENT
distinct gram set. The final row per entity equals the batch operator's
per-entity grams; tests/test_path_ngrams_stream.py splits events
adversarially across micro-batches (later batches carry earlier
timestamps) and asserts the folded (gram, support) table equals
path_ngrams' output column-for-column.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "ts array<long>, tys array<string>"
OUTPUT_SCHEMA = "entity string, grams array<string>"


def _make_update(n: int, max_steps: int):
    def _update(key: Tuple[str, ...],
                pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
                state: GroupState) -> Iterator[Any]:
        import pandas as pd

        if state.exists:
            held = list(zip(state.get[0], state.get[1]))
        else:
            held = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        fresh = [(int(t), str(ty))
                 for t, ty in zip(pdf["time"], pdf["etype"])]
        merged = sorted(held + fresh)[:max_steps]
        state.update(([t for t, _ in merged], [ty for _, ty in merged]))
        tys = [ty for _, ty in merged]
        grams = sorted({">".join(tys[i:i + n])
                        for i in range(len(tys) - n + 1)})
        yield pd.DataFrame([(key[0], grams)],
                           columns=["entity", "grams"])
    return _update


def path_ngrams_stream(stream: DataFrame, entity_col: str = "entity",
                       type_col: str = "etype", time_col: str = "time",
                       n: int = 3, max_steps: int = 8) -> DataFrame:
    """Attach the live gram-set operator to a streaming DataFrame with
    columns (entity string, etype string, time long). One shuffle per
    micro-batch on the entity key; O(max_steps) state per entity."""
    from pyspark.sql import functions as F

    if n < 1:
        raise ValueError("path_ngrams_stream: n must be >= 1")
    if max_steps < n:
        raise ValueError("path_ngrams_stream: max_steps must be >= n")
    src = (stream
           .where(F.col(type_col).isNotNull())
           .select(F.col(entity_col).alias("entity"),
                   F.col(type_col).alias("etype"),
                   F.col(time_col).alias("time")))
    return (src.groupBy("entity")
            .applyInPandasWithState(
                _make_update(n, max_steps),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
