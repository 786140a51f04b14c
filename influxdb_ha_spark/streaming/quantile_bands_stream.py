"""Streaming twin of the per-bucket band table
(operators/timeseries.quantile_bands): per-(series, bucket) n/p50/p95/
p99/max emitted as buckets CLOSE, maintained across micro-batches via
`applyInPandasWithState`.

This is the ONLINE form of the SLO dashboard feed — the "last hour's
p99" row materializing the moment the next hour's first event arrives,
instead of on the next batch sweep. Closure is ARRIVAL-ORDER driven
(the package's standard streaming contract: arrival order stands in
for time order; late data belongs to a watermarked variant): a series'
open bucket emits when an event with a STRICTLY LATER bucket arrives,
and an event for an already-closed (earlier) bucket is counted into
`n_late` on the NEXT emitted row rather than silently dropped — the
deadman/mix-drift "never a silent loss" convention. The final
still-open bucket never emits (no later event proves it complete); a
production deployment adds a processing-time timeout flush.

State per series is the OPEN bucket only: (bucket, values) — bounded
by one bucket's event volume, not by stream lifetime; closed buckets
leave state immediately.

Quantiles on close are the same exact interpolating (n−1)·q order
statistics as the batch operator (numpy's linear interpolation IS that
convention), floor-rounded at 6 — so the twin's rows are directly
comparable: tests/test_quantile_bands_stream.py feeds identical
in-order data through `quantile_bands` and this stream (bucket spans
split across micro-batches so values must accumulate in state) and
asserts the emitted rows equal the batch table restricted to closed
buckets.

Output mode: append — one row per closed (series, bucket).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "bucket long, vals array<double>, n_late long"
OUTPUT_SCHEMA = ("series string, bucket long, n long, p50 double, "
                 "p95 double, p99 double, v_max double, n_late long")


def _bands(vals):
    import numpy as np

    a = np.asarray(vals, dtype=np.float64)

    from ..operators.sketch import fr6_py as r6

    q = np.percentile(a, [50, 95, 99], method="linear")
    return r6(float(q[0])), r6(float(q[1])), r6(float(q[2])), \
        r6(float(a.max()))


def _update(key: Tuple[str, ...],
            pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
            state: GroupState) -> Iterator[Any]:
    import pandas as pd

    if state.exists:
        open_b, vals, n_late = state.get
        vals = list(vals)
    else:
        open_b, vals, n_late = None, [], 0
    pdf = pd.concat(list(pdfs), ignore_index=True).sort_values("bucket")
    rows = []
    for b, v in zip(pdf["bucket"], pdf["value"]):
        b, v = int(b), float(v)
        if open_b is None:
            open_b, vals = b, [v]
        elif b == open_b:
            vals.append(v)
        elif b > open_b:
            p50, p95, p99, mx = _bands(vals)
            rows.append((key[0], open_b, len(vals), p50, p95, p99, mx,
                         n_late))
            open_b, vals, n_late = b, [v], 0
        else:  # late: bucket already closed — count, never silent-drop
            n_late += 1
    state.update((open_b, vals, n_late))
    yield pd.DataFrame(rows, columns=["series", "bucket", "n", "p50",
                                      "p95", "p99", "v_max", "n_late"])


def quantile_bands_stream(stream: DataFrame,
                          series_col: str = "series",
                          time_col: str = "time",
                          value_col: str = "value",
                          bucket_ns: int = 3_600_000_000_000) -> DataFrame:
    """Attach the band operator to a streaming DataFrame with columns
    (series string, time long ns, value double). One shuffle per
    micro-batch on the series key; state = the open bucket's values."""
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(series_col).alias("series"),
        (F.col(time_col) - F.pmod(F.col(time_col), F.lit(int(bucket_ns))))
        .alias("bucket"),
        F.col(value_col).cast("double").alias("value"))
    return (src.groupBy("series")
            .applyInPandasWithState(
                _update,
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.NoTimeout))
