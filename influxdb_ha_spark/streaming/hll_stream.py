"""Streaming twin #20 of operators/sketch.hll_distinct: live HyperLogLog
cardinality per group, registers folded across micro-batches via
`applyInPandasWithState`.

The HLL state — m = 256 register maxima — merges by register-wise max,
which is associative, commutative AND idempotent, so the streamed state
equals the batch sketch on the union of all micro-batches regardless of
batch boundaries, arrival order, or re-delivery (idempotence makes this
the one sketch that is also immune to at-least-once duplication). This
completes the sketch evidence ladder: batch estimate (sk_hll), explicit
two-level merge proof (sk_merge), live stream (here) — all three share
ONE state definition.

The register index j and rank rho are computed JVM-side with the batch
operator's OWN register mapping (operators/sketch._hll_jrho — one
definition shared by the batch sketch, the merge proof and this twin:
j = hash64 mod m, rho = 53 − bitlength of the remaining 52 hash bits),
so the Python update is one
`np.maximum.at` per (group, batch) and the estimate replays the batch
operator's pinned arithmetic: the harmonic sum carried EXACTLY as the
integer Σ2^(53−M_j) (empty registers contribute 2^53), one IEEE divide
HLL_NUMER / S, and the linear-counting branch m·ln(m/V) computed with
the same `math.log` that built the batch operator's driver-literal ln
map — bit-identical by construction (the structural-equivalence test
pins stream == batch row-for-row, estimate included).

Each micro-batch emits the group's CURRENT (n_buckets_used, n_empty,
est_distinct) — update-style; state is m int64s (kilobytes) per group
no matter how many values stream through.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.hashing import hash64_expr
from ..operators.sketch import HLL_M, _hll_jrho, hll_fold_py

STATE_SCHEMA = "regs array<long>"
OUTPUT_SCHEMA = ("g string, n_buckets_used long, n_empty long, "
                 "est_distinct double")


def _update(key: Tuple[Any, ...],
            pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
            state: GroupState) -> Iterator[Any]:
    import numpy as np
    import pandas as pd

    regs = (np.asarray(state.get[0], dtype=np.int64)
            if state.exists else np.zeros(HLL_M, dtype=np.int64))
    batch = pd.concat(list(pdfs), ignore_index=True)
    np.maximum.at(regs, batch["j"].to_numpy(dtype=np.int64),
                  batch["rho"].to_numpy(dtype=np.int64))
    state.update((regs.tolist(),))
    # single-sourced fold: exact integer harmonic sum + linear counting
    n_used, v_empty, est = hll_fold_py(regs)
    yield pd.DataFrame({"g": [key[0]], "n_buckets_used": [n_used],
                        "n_empty": [v_empty], "est_distinct": [est]})


def hll_distinct_stream(events: DataFrame, group_col: str,
                        value_col: str) -> DataFrame:
    """Streaming events → per-group live HLL cardinality, one emission
    of the current (n_buckets_used, n_empty, est_distinct) per (group,
    micro-batch). State is m = 256 int64s per group."""
    h = hash64_expr(F.col(value_col).cast("string"))
    j, rho = _hll_jrho()   # the batch operator's own register mapping
    keyed = (events
             .where(F.col(value_col).isNotNull())
             .select(F.col(group_col).cast("string").alias("g"),
                     h.alias("__h"))
             .select("g", j.alias("j"), rho.alias("rho")))
    return (keyed.groupBy("g")
            .applyInPandasWithState(_update,
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
