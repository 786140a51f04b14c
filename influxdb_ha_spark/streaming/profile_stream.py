"""Streaming twin #25 of operators/diagnostics.column_profile: a live
data profiler — per-column row/null counts, lexicographic min/max and
the m = 256-register HLL distinct estimate, maintained incrementally
across micro-batches via `applyInPandasWithState`.

State per column: (n, n_null, min_s, max_s, 256 register maxima) —
counts merge by +, min/max by min/max (idempotent), registers by max
(idempotent), so the streamed profile equals the batch `column_profile`
on the concatenation of all micro-batches regardless of batch
boundaries; only the two counters are sensitive to at-least-once
re-delivery (the additive caveat, stated as in ams_stream).

The stacking (one row per (column, value-string)) and the HLL register
mapping ride JVM-side — the SAME array-of-structs explode shape and
`_hll_jrho` register/rank expressions as the batch operator — so the
Python update is one numpy fold per (column, batch) and the estimate
replays `hll_fold_py` (the single Python-side fold every HLL twin
shares). The structural-equivalence test pins stream == batch
row-for-row, estimate included.

Each micro-batch emits the column's CURRENT profile row — update-style;
state is ~260 small values per column no matter how many rows stream
through.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.hashing import hash64_expr
from ..operators.sketch import HLL_M, _hll_jrho, hll_fold_py

STATE_SCHEMA = ("n long, n_null long, min_s string, max_s string, "
                "regs array<long>")
OUTPUT_SCHEMA = ("col_name string, n_rows long, n_null long, "
                 "est_distinct double, min_s string, max_s string")


def _update(key: Tuple[Any, ...],
            pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
            state: GroupState) -> Iterator[Any]:
    import numpy as np
    import pandas as pd

    if state.exists:
        n, n_null, min_s, max_s = (int(state.get[0]), int(state.get[1]),
                                   state.get[2], state.get[3])
        regs = np.asarray(state.get[4], dtype=np.int64)
    else:
        n, n_null, min_s, max_s = 0, 0, None, None
        regs = np.zeros(HLL_M, dtype=np.int64)
    batch = pd.concat(list(pdfs), ignore_index=True)
    n += len(batch)
    nulls = batch["v"].isna()
    n_null += int(nulls.sum())
    present = batch.loc[~nulls, "v"]
    if len(present):
        bmin, bmax = present.min(), present.max()
        min_s = bmin if min_s is None else min(min_s, bmin)
        max_s = bmax if max_s is None else max(max_s, bmax)
    nn = batch.loc[~nulls]
    if len(nn):
        np.maximum.at(regs, nn["j"].to_numpy(dtype=np.int64),
                      nn["rho"].to_numpy(dtype=np.int64))
    state.update((n, n_null, min_s, max_s, regs.tolist()))
    if int((regs > 0).sum()):
        est = hll_fold_py(regs)[2]
    else:
        est = None          # all-null column: nothing to sketch
    yield pd.DataFrame({"col_name": [key[0]], "n_rows": [n],
                        "n_null": [n_null], "est_distinct": [est],
                        "min_s": [min_s], "max_s": [max_s]})


def column_profile_stream(events: DataFrame, cols: list) -> DataFrame:
    """Streaming rows → live per-column profile, one emission of the
    current (n_rows, n_null, est_distinct, min_s, max_s) per (column,
    micro-batch). State ≈ 260 values per column."""
    if not cols:
        raise ValueError("column_profile_stream: cols must be non-empty")
    stacked = events.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("col_name"),
                 F.col(c).cast("string").alias("v"))
        for c in cols])).alias("s")).select("s.col_name", "s.v")
    h = hash64_expr(F.col("v"))
    j, rho = _hll_jrho()
    keyed = (stacked
             .withColumn("__h", h)
             .withColumn("j", F.when(F.col("v").isNotNull(), j))
             .withColumn("rho", F.when(F.col("v").isNotNull(), rho))
             .select("col_name", "v", "j", "rho"))
    return (keyed.groupBy("col_name")
            .applyInPandasWithState(_update,
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
