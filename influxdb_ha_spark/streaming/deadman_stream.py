"""Streaming twin of operators/timeseries.deadman: ONLINE per-series
liveness via `applyInPandasWithState` with a processing-time timeout.

The batch operator is retrospective — "whose newest point is older than
threshold, anchored at a replayable global max" (timeseries.py deadman).
The streaming form is the op's native habitat (the Kapacitor deadman
alert the reference ecosystem ships): a series is declared DEAD when no
point arrives for `threshold_ms` of processing time, and emits a
recovery row the moment data returns. This is exactly what the state
store's timeout machinery exists for — no polling job, no global scan:

  - data for a series arrives  -> state := (last_time, n_points,
    alive), emit one status row (dead=false, recovered flag when the
    series was previously dead), re-arm the timeout;
  - the timeout fires (a micro-batch ran and the series stayed silent
    past threshold_ms)         -> emit ONE dead-alert row, mark the
    state dead (so the alert does not repeat every batch), re-arm so a
    still-silent series keeps its state pinned.

Timeout basis is PROCESSING time: Spark's GroupStateTimeout.EventTimeTimeout
requires a watermark and fires relative to it, which makes "silence" a
property of other series' progress; the monitoring semantic wanted here
is wall-clock silence (Kapacitor's `deadman(threshold, period)` is also
wall-clock). Consequences: (1) dead alerts are NOT replay-deterministic
— the batch operator is the replayable form, and the pytest therefore
drives the data-path rows deterministically while exercising the
timeout path with generous margins; (2) run this under a periodic
trigger (processingTime) — under Trigger.AvailableNow the engine keeps
scheduling state-cleanup micro-batches while any timeout is armed, so
a drain-and-stop run never terminates before the threshold elapses.

State per series: (last_time long, n_points long, dead boolean) —
three scalars, partitioned by series key like every stateful operator
here (stateful.py). One shuffle per micro-batch on the series key.

Reference: the proxied Kapacitor deadman pattern (the reference repo
routes such queries but has no alerting op — added scope, same
citation as the batch operator's docstring).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_time long, n_points long, dead boolean"
OUTPUT_SCHEMA = ("series string, last_time long, n_points long, "
                 "dead boolean, recovered boolean")


def _make_update(threshold_ms: int):
    def update(key: Tuple[str, ...],
               pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator[Any]:
        import pandas as pd

        series = key[0]
        if state.hasTimedOut:
            last, n, dead = state.get
            rows = []
            if not dead:                    # alert ONCE per silence
                rows.append((series, int(last), int(n), True, False))
            state.update((last, n, True))
            # deliberately NOT re-armed: a dead series has nothing left
            # to time out (the alert already fired; the next data
            # arrival re-arms) — and a perpetual re-arm would keep the
            # engine spinning state-cleanup batches forever under
            # Trigger.AvailableNow
            yield pd.DataFrame(rows, columns=["series", "last_time",
                                              "n_points", "dead",
                                              "recovered"])
            return
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if state.exists:
            last, n, dead = state.get
        else:
            last, n, dead = None, 0, False
        batch_last = int(pdf["time"].max())
        last = batch_last if last is None else max(int(last), batch_last)
        n += len(pdf)
        state.update((last, n, False))
        state.setTimeoutDuration(threshold_ms)
        yield pd.DataFrame(
            [(series, last, n, False, bool(dead))],
            columns=["series", "last_time", "n_points", "dead",
                     "recovered"])
    return update


def deadman_stream(stream: DataFrame, threshold_ms: int = 30 * 60 * 1000,
                   series_col: str = "series",
                   time_col: str = "time") -> DataFrame:
    """Attach the deadman liveness operator to a streaming DataFrame
    with columns (series string, time long). Emits one status row per
    (series, micro-batch-with-data) plus one dead-alert row per silence
    exceeding `threshold_ms`; `recovered=true` marks the first row
    after a silence. O(1) state per series."""
    from pyspark.sql import functions as F

    src = stream.select(F.col(series_col).alias("series"),
                        F.col(time_col).alias("time"))
    return (src.groupBy("series")
            .applyInPandasWithState(
                _make_update(int(threshold_ms)),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.ProcessingTimeTimeout))
