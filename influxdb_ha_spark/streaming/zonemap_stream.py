"""Streaming twin #26 of operators/diagnostics.zone_map: the live zone
map — per-time-bucket (n_rows, n_null, v_min, v_max) maintained
incrementally via `applyInPandasWithState`, i.e. the min/max statistics
a streaming WRITER keeps per file/row-group so that later readers can
skip I/O. Batch zone_map asks "what could a reader skip"; this twin IS
the maintenance side of that contract.

State per bucket: two counters (+-merged — the additive at-least-once
caveat, as ams_stream) and two extrema (min/max — idempotent, so
re-delivered rows cannot move them). The streamed table equals the
batch zone_map on the concatenation of all micro-batches regardless of
batch boundaries; the structural-equivalence test pins stream == batch
row-for-row, and the prunability verdict for a [lo, hi) predicate is a
pure function of the emitted columns (computed identically by the
batch operator's expression).

Each micro-batch emits the bucket's CURRENT row — update-style; state
is four scalars per bucket no matter how many rows stream through.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n long, n_null long, v_min double, v_max double"
OUTPUT_SCHEMA = ("bucket long, n_rows long, n_null long, "
                 "v_min double, v_max double")


def _update(key: Tuple[Any, ...],
            pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
            state: GroupState) -> Iterator[Any]:
    import pandas as pd

    if state.exists:
        n, n_null = int(state.get[0]), int(state.get[1])
        v_min, v_max = state.get[2], state.get[3]
    else:
        n, n_null, v_min, v_max = 0, 0, None, None
    batch = pd.concat(list(pdfs), ignore_index=True)
    n += len(batch)
    nulls = batch["v"].isna()
    n_null += int(nulls.sum())
    present = batch.loc[~nulls, "v"]
    if len(present):
        bmin, bmax = float(present.min()), float(present.max())
        v_min = bmin if v_min is None else min(v_min, bmin)
        v_max = bmax if v_max is None else max(v_max, bmax)
    state.update((n, n_null, v_min, v_max))
    yield pd.DataFrame({"bucket": [key[0]], "n_rows": [n],
                        "n_null": [n_null], "v_min": [v_min],
                        "v_max": [v_max]})


def zone_map_stream(events: DataFrame, value_col: str,
                    time_col: str = "time",
                    bucket_ns: int = 86_400_000_000_000) -> DataFrame:
    """Streaming rows → live per-bucket zone map, one emission of the
    current (n_rows, n_null, v_min, v_max) per (bucket, micro-batch).
    State is four scalars per bucket."""
    if int(bucket_ns) < 1:
        raise ValueError(f"zone_map_stream: bucket_ns must be >= 1, "
                         f"got {bucket_ns!r}")
    bkt = (F.col(time_col)
           - F.pmod(F.col(time_col), F.lit(int(bucket_ns))))
    keyed = (events.where(F.col(time_col).isNotNull())
             .select(bkt.alias("bucket"),
                     F.col(value_col).cast("double").alias("v")))
    return (keyed.groupBy("bucket")
            .applyInPandasWithState(_update,
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
