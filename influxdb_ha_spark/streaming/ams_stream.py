"""Streaming twin #23 of operators/sketch.ams_f2: live second-moment
(self-join size) estimate per group, the d signed AMS counters folded
across micro-batches via `applyInPandasWithState`.

The AMS state — d tug-of-war counters Z_i plus the row count — merges by
component-wise + (each Z_i is a plain sum), which is associative and
commutative, so the streamed state equals the batch sketch on the union
of all micro-batches regardless of batch boundaries or arrival order.
It is NOT idempotent (sums are additive, unlike HLL's register max), so
re-delivered duplicates DO shift the estimate — the same at-least-once
caveat as every additive twin (countmin_stream, the distinct-count KMV
twin's exhaustive branch excluded), stated here because hll_stream
documents the opposite guarantee.

The hash ride-along is JVM-side (the batch operator's own md5 hash64
mod p — operators/hashing.hash64_expr, shared convention), and the sign
family replays operators/hashing.minhash_coeffs with the batch
operator's seed, so the Python update is one vectorized
(h·A + B) mod p mod 2 fold per (group, batch) and the estimate is the
batch operator's own integer floor division (Σ Z_i²) div d —
bit-identical by construction; the structural-equivalence test pins
stream == batch on the sketch columns. (The batch operator's
n_items / f2_exact AUDIT columns are deliberately absent here: exact
per-item counts are unbounded state — the audit is a test-scale batch
companion, the sketch is the stream.)

Each micro-batch emits the group's CURRENT (n_rows, f2_est) —
update-style; state is d + 1 int64s per group no matter how many rows
stream through.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.hashing import MERSENNE_P, hash64_expr, minhash_coeffs

AMS_D = 32
AMS_SEED = 11          # the batch operator's default — ONE sign family
STATE_SCHEMA = "zs array<long>, n long"
OUTPUT_SCHEMA = "g string, n_rows long, f2_est long"


def _update(key: Tuple[Any, ...],
            pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
            state: GroupState) -> Iterator[Any]:
    import numpy as np
    import pandas as pd

    coeffs = minhash_coeffs(AMS_D, seed=AMS_SEED)
    a = np.array([c[0] for c in coeffs], dtype=np.int64)
    b = np.array([c[1] for c in coeffs], dtype=np.int64)
    if state.exists:
        zs = np.asarray(state.get[0], dtype=np.int64)
        n = int(state.get[1])
    else:
        zs = np.zeros(AMS_D, dtype=np.int64)
        n = 0
    batch = pd.concat(list(pdfs), ignore_index=True)
    h = batch["h"].to_numpy(dtype=np.int64)
    # h < p = 2^31-1 and a < p, so a*h < 2^62 — int64-safe, the same
    # headroom argument as the batch expression
    signs = 1 - 2 * (((h[:, None] * a[None, :] + b[None, :])
                      % MERSENNE_P) % 2)
    zs = zs + signs.sum(axis=0, dtype=np.int64)
    n += len(h)
    # the batch operator's loud 2^28 headroom guard, mirrored (r10
    # review: numpy int64 wraps silently past it, diverging from the
    # stream==batch contract instead of failing like ams_f2 does)
    if n > 1 << 28:
        raise ValueError(
            "ams_f2_stream: group exceeds 2^28 lifetime rows — sum of "
            "Z_i^2 leaves int64; switch the squares to wider integers "
            "(see operators/sketch.ams_f2)")
    state.update((zs.tolist(), n))
    est = int(np.sum(zs * zs, dtype=np.int64)) // AMS_D
    yield pd.DataFrame({"g": [key[0]], "n_rows": [n], "f2_est": [est]})


def ams_f2_stream(events: DataFrame, group_col: str,
                  item_col: str) -> DataFrame:
    """Streaming events → per-group live AMS F2 estimate, one emission
    of the current (n_rows, f2_est) per (group, micro-batch). State is
    d + 1 = 33 int64s per group."""
    h = hash64_expr(F.col(item_col).cast("string")) % F.lit(MERSENNE_P)
    keyed = (events
             .where(F.col(item_col).isNotNull())
             .select(F.col(group_col).cast("string").alias("g"),
                     h.alias("h")))
    return (keyed.groupBy("g")
            .applyInPandasWithState(_update,
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
