"""Custom stateful streaming operators via `applyInPandasWithState`.

The reference keeps no per-series streaming state (its only state is the
hinted-handoff queue); these operators are the Spark-native extension point
for semantics that windowed aggregation cannot express — running per-series
accumulators that survive across micro-batches. State lives in the state
store (RocksDB/HDFS-backed on a cluster), partitioned by the series key:
per-key state only, no global state, so 100 M series spread across
executors evenly — the same partitioning the batch engine uses.

`series_running_stats` is the canonical example: per (tag-set) running
count / sum / min / max / last-seen-time over an unbounded stream —
a continuously-maintained materialized view of `SELECT count(v), sum(v),
min(v), max(v), last(v) FROM m GROUP BY tags` without re-scanning history.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, s double, mn double, mx double, last_time long"
OUTPUT_SCHEMA = ("series string, n long, sum double, min double, "
                 "max double, last_time long")


def _update_running_stats(key: Tuple[str, ...],
                          pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
                          state: GroupState) -> Iterator[Any]:
    import pandas as pd

    if state.exists:
        n, s, mn, mx, last_t = state.get
    else:
        n, s, mn, mx, last_t = 0, 0.0, None, None, 0
    for pdf in pdfs:
        vals = pdf["value"].dropna()
        if len(vals):
            n += int(len(vals))
            s += float(vals.sum())
            mn = float(vals.min()) if mn is None else min(mn, float(vals.min()))
            mx = float(vals.max()) if mx is None else max(mx, float(vals.max()))
        if len(pdf["time"]):
            last_t = max(last_t, int(pdf["time"].max()))
    state.update((n, s, mn, mx, last_t))
    yield pd.DataFrame([{"series": key[0], "n": n, "sum": s,
                         "min": mn, "max": mx, "last_time": last_t}])


def series_running_stats(stream: DataFrame, series_col: str = "series",
                         value_col: str = "value",
                         time_col: str = "time") -> DataFrame:
    """Attach the running-stats stateful operator to a streaming DataFrame
    with columns (series string, time long, value double).

    Output mode must be `update`; each micro-batch emits one refreshed row
    per series that received data. Shuffles once per batch on the series
    key — identical key partitioning to the batch GROUP BY tags plan.
    """
    from pyspark.sql import functions as F

    src = stream.select(F.col(series_col).alias("series"),
                        F.col(time_col).alias("time"),
                        F.col(value_col).alias("value"))
    return (src.groupBy("series")
            .applyInPandasWithState(_update_running_stats,
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
