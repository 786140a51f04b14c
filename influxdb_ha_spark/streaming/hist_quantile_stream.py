"""Streaming twin of operators/sketch.histogram_quantiles: per-group
fixed-boundary histograms folded across micro-batches via
`applyInPandasWithState`, emitting live whole-history quantile
estimates.

Complements the exact per-bucket SLO bands of quantile_bands_stream
(twin #16): that one closes a time bucket and reports its exact
quantiles; this one answers "p99 over EVERYTHING so far" with state
bounded at `bins` int64s (+ one clamped-row counter, r10) per group —
histograms over shared boundaries
merge by cell-wise +, so the streamed state equals the batch histogram
on the union of all micro-batches regardless of batch boundaries, and
the estimates are bit-identical to the batch operator's (the
equivalence test pins rows exactly; binning runs JVM-side with the
batch operator's own clamp expression, and the Python interpolation
replays the same IEEE ops: r = ceil(q·n), lo + width·(bin +
(r − cum_below)/c), floor-round-6).
"""

from __future__ import annotations

import math
from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketch import _hist_bin_cols, fr6_py

# r10: a `clamped` counter joined the state so the stream exposes
# n_clamped like the batch operator. applyInPandasWithState state
# schemas cannot migrate — a stream checkpointed under the pre-r10
# 'counts array<long>' schema must restart from a FRESH checkpoint
# after upgrading (state-store schema validation rejects the old one).
STATE_SCHEMA = "counts array<long>, clamped long"
OUTPUT_SCHEMA = "g string, q double, n long, n_clamped long, est double"


def _make_update(lo: float, width: float, bins: int, qs: tuple):
    def update(key: Tuple[Any, ...],
               pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        if state.exists:
            counts = np.asarray(state.get[0], dtype=np.int64)
            clamped = int(state.get[1])
        else:
            counts = np.zeros(bins, dtype=np.int64)
            clamped = 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        counts += np.bincount(batch["bin"].to_numpy(dtype=np.int64),
                              minlength=bins).astype(np.int64)
        clamped += int(batch["oob"].to_numpy(dtype=np.int64).sum())
        state.update((counts.tolist(), clamped))
        n = int(counts.sum())
        out_q, out_est = [], []
        cum = np.cumsum(counts)
        for q in qs:
            r = math.ceil(q * float(n))
            b = int(np.searchsorted(cum, r))      # first bin with cum >= r
            cum_below = int(cum[b] - counts[b])
            est = lo + width * (float(b)
                                + (float(r) - float(cum_below))
                                / float(counts[b]))
            out_q.append(float(q))
            out_est.append(fr6_py(est))
        yield pd.DataFrame({"g": [key[0]] * len(qs), "q": out_q,
                            "n": [n] * len(qs),
                            "n_clamped": [clamped] * len(qs),
                            "est": out_est})

    return update


def hist_quantile_stream(events: DataFrame, group_col: str,
                         value_col: str, lo: float = 0.0,
                         hi: float = 1.0, bins: int = 1024,
                         qs=(0.5, 0.95, 0.99)) -> DataFrame:
    """Streaming events → per-group live quantile estimates over the
    whole history so far; state = `bins` int64s + one clamped-row
    counter per group, and the output mirrors the batch operator's
    columns including `n_clamped` (rows outside [lo, hi) folded into
    the edge bins — loud, not silent, in the stream too).

    qs must be in (0, 1] (the ceil(q·n) inverted-CDF convention shared
    with the batch operator): q = 0 would target rank 0, whose covering
    "bin" may be empty — previously a ZeroDivisionError INSIDE the
    stateful update that killed the streaming query, while the batch
    operator silently emitted no row. Both now raise at construction.
    """
    if not qs:
        raise ValueError("hist_quantile_stream: qs must be non-empty")
    for q in qs:
        if not 0.0 < float(q) <= 1.0:
            raise ValueError(
                f"hist_quantile_stream: q must be in (0, 1] under the "
                f"ceil(q*n) inverted-CDF rank convention, got {q!r}")
    width = (hi - lo) / bins
    v = F.col(value_col).cast("double")
    b, oob = _hist_bin_cols(v, F.lit(float(lo)), F.lit(width), bins)
    # filter on the CAST value, like the batch operator: a non-null
    # value whose double cast is NULL (e.g. a non-numeric string) must
    # be dropped here, not arrive as NaN bins that crash the stateful
    # update the batch path would simply have excluded
    keyed = (events
             .where(v.isNotNull())
             .select(F.col(group_col).cast("string").alias("g"),
                     b.cast("long").alias("bin"),
                     oob.cast("long").alias("oob")))
    return (keyed.groupBy("g")
            .applyInPandasWithState(
                _make_update(float(lo), float(width), int(bins),
                             tuple(float(q) for q in qs)),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
