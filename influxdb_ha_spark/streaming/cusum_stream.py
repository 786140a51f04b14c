"""Streaming twin of operators/timeseries.cusum: per-series two-sided
CUSUM maintained across micro-batches via `applyInPandasWithState`.

This is the op CUSUM was invented for — ONLINE change detection — so the
streaming form takes the in-control `target` mean explicitly (the batch
operator's retrospective per-series-mean default has no incremental
analog: a mean over history-so-far would make early alarms depend on
arrival batching). State per series is exactly the recurrence carry:
(s_pos, s_neg, alarm) — three scalars in the state store, partitioned by
the series key like every other stateful operator here (stateful.py).

The arithmetic is `timeseries._cusum_step`, the SAME function the batch
operator folds with, so batch-vs-streaming equivalence is structural:
tests/test_cusum_stream.py feeds identical data through both paths (in
two micro-batches, state surviving the boundary) and asserts row-level
equality.

Output mode: append — each input point emits exactly one scored row.
Within a micro-batch, points are processed in time order per series;
across batches, arrival order stands in for time order (the standard
streaming contract — late data belongs to a watermarked variant).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "sp double, sn double, alarm boolean"
OUTPUT_SCHEMA = ("series string, time long, s_pos double, s_neg double, "
                 "alarm boolean")


def _make_update(mu: float, k: float, h: float):
    def update(key: Tuple[str, ...],
               pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator[Any]:
        import pandas as pd

        from ..operators.timeseries import _cusum_step

        if state.exists:
            sp, sn, alarm = state.get
        else:
            sp, sn, alarm = 0.0, 0.0, False
        rows = []
        # concat BEFORE sorting: a series whose micro-batch exceeds the
        # Arrow chunk size (arrow.maxRecordsPerBatch, 10k default)
        # arrives as multiple pdfs, and per-chunk sorts would fold
        # across-chunk rows out of time order — silently breaking the
        # batch/stream equivalence this module promises (r5 review)
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # (time, value) sort: same duplicate-timestamp pinning as the
        # batch operator (r5 review)
        pdf = pdf.dropna(subset=["value"]).sort_values(["time", "value"])
        for t, x in zip(pdf["time"], pdf["value"]):
            sp, sn, alarm = _cusum_step(sp, sn, alarm, float(x), mu, k, h)
            rows.append((key[0], int(t), sp, sn, alarm))
        state.update((sp, sn, alarm))
        yield pd.DataFrame(rows, columns=["series", "time", "s_pos",
                                          "s_neg", "alarm"])
    return update


def cusum_stream(stream: DataFrame, target: float, slack: float = 25.0,
                 threshold: float = 250.0, series_col: str = "series",
                 value_col: str = "value",
                 time_col: str = "time") -> DataFrame:
    """Attach the CUSUM stateful operator to a streaming DataFrame with
    columns (series string, time long, value double). One shuffle per
    micro-batch on the series key; O(1) state per series."""
    from pyspark.sql import functions as F

    src = stream.select(F.col(series_col).alias("series"),
                        F.col(time_col).alias("time"),
                        F.col(value_col).alias("value"))
    return (src.groupBy("series")
            .applyInPandasWithState(
                _make_update(float(target), float(slack), float(threshold)),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
