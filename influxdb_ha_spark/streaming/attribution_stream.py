"""Streaming twin of operators/timeseries.attribution: ONLINE per-entity
single-touch attribution via `applyInPandasWithState`.

The batch operator is retrospective (per-channel conversion counts and
revenue over the whole history); the streaming form answers the
monitoring question ("this conversion just landed — which channel gets
the credit?") by emitting ONE attribution row per conversion as it
arrives — the append-mode feed a revenue dashboard aggregates with a
trailing `groupBy(channel)`.

Semantics vs the batch operator: state per entity is the carried touch
under the batch window's pinned (time, kind, event_id) order — for the
'last' model the latest touch seen, for 'first' the earliest. Each
micro-batch's events are processed in that exact order, so a touch at
the conversion's own timestamp attributes (touches sort before
conversions at equal time) and among same-timestamp touches the max
event_id wins — identical tie-breaks to the batch window. On in-order
streams the emitted rows match the batch operator's per-conversion
attribution exactly (structural-equivalence pytest on a shared
two-batch fixture, cross-batch touch carry included). A cross-batch
REGRESSION (a touch older than an already-attributed conversion) cannot
retroactively re-credit it — emitted rows are immutable, the funnel
twin's monitor semantics; replay the batch operator for the forensic
answer.

State: one (long, string, long) triple per entity — O(1), independent
of touch volume (the batch operator's window-carry collapsed to its
running value); one shuffle per micro-batch on the entity key.

Reference: added scope like the batch operator (the reference proxies
InfluxQL only; README.md:190-200).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "touch_time long, touch_channel string, touch_id long"
OUTPUT_SCHEMA = ("entity string, conv_time long, conv_id long, "
                 "channel string, value double")


def _make_update(conversion_type: str, window_ns: int | None, model: str):
    def update(key: Tuple[str, ...],
               pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator[Any]:
        import pandas as pd

        entity = key[0]
        if state.exists:
            t_time, t_ch, t_id = state.get
        else:
            t_time, t_ch, t_id = None, None, None
        rows = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        # null-time rows are unorderable — excluded like the batch
        # operator's isNotNull filter (the funnel twin's NaN guard)
        pdf = pdf.dropna(subset=["time", "event_type"])
        pdf["__k"] = (pdf["event_type"] == conversion_type).astype("int64")
        pdf = pdf.sort_values(["time", "__k", "event_id"], kind="mergesort")
        for t, typ, k, eid, v in zip(pdf["time"].astype("int64"),
                                     pdf["event_type"], pdf["__k"],
                                     pdf["event_id"].astype("int64"),
                                     pdf["value"]):
            t = int(t)
            if k == 0:
                if model == "last" or t_time is None:
                    t_time, t_ch, t_id = t, str(typ), int(eid)
                continue
            in_window = (t_time is not None
                         and (window_ns is None or t - t_time <= window_ns))
            rows.append((entity, t, int(eid),
                         t_ch if in_window else "(none)",
                         None if pd.isna(v) else float(v)))
        state.update((t_time, t_ch, t_id))
        yield pd.DataFrame(rows, columns=["entity", "conv_time", "conv_id",
                                          "channel", "value"])
    return update


def attribution_stream(stream: DataFrame,
                       conversion_type: str = "purchase",
                       entity_col: str = "user_id",
                       time_col: str = "time",
                       type_col: str = "event_type",
                       value_col: str = "value",
                       id_col: str = "event_id",
                       window_ns: int | None = None,
                       model: str = "last") -> DataFrame:
    """Attach the streaming attributor to a DataFrame with columns
    (entity, time long, event_type string, value double, event_id
    long). Emits one row per conversion: (entity, conv_time, conv_id,
    channel, value), append mode. O(1) state per entity."""
    from pyspark.sql import functions as F

    if model not in ("last", "first"):
        raise ValueError(f"unknown attribution model {model!r}; "
                         "expected 'last' or 'first'")
    src = stream.select(F.col(entity_col).cast("string").alias("entity"),
                        F.col(time_col).alias("time"),
                        F.col(type_col).alias("event_type"),
                        F.col(value_col).alias("value"),
                        F.col(id_col).alias("event_id"))
    return (src.groupBy("entity")
            .applyInPandasWithState(
                _make_update(conversion_type, window_ns, model),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
