"""Streaming twin of operators/sketch.kmv_distinct: bounded-state
K-Minimum-Values distinct-count sketches per group maintained across
micro-batches via `applyInPandasWithState`.

The KMV state — the k smallest distinct hash values seen so far — is
EXACTLY mergeable: "k smallest of (state ∪ batch)" is associative and
commutative, so the streaming fold reaches the identical state the
batch operator computes on the union of all micro-batches, regardless
of batch boundaries or arrival order (the structural-equivalence test
pins stream == batch row-for-row, estimate included). This is the
live SHOW CARDINALITY: per-group state is k int64s — kilobytes — no
matter how many values stream through.

Hashing happens JVM-side BEFORE the stateful op (the same cross-engine
md5 hash64 column the batch sketch uses), so the Python state update
only merges int64 arrays — one numpy unique per (group, batch) — and
the estimate arithmetic replays the batch operator's exact IEEE ops
((k−1)·2^60 / h_(k), floor-round-6; 255·2^60 has an 8-bit mantissa so
the product is exact in both runtimes).

Each micro-batch emits the group's CURRENT (k_used, kth_hash,
est_distinct) — update-style; the final emission is the batch-equal
summary.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.hashing import hash64_expr
from ..operators.sketch import HASH_SPACE, fr6_py

STATE_SCHEMA = "hs array<long>"
OUTPUT_SCHEMA = ("g string, k_used long, kth_hash long, "
                 "est_distinct double")


def _make_update(k: int):
    def update(key: Tuple[Any, ...],
               pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        prev = (np.asarray(state.get[0], dtype=np.int64)
                if state.exists else np.empty(0, dtype=np.int64))
        batch = pd.concat(list(pdfs), ignore_index=True)
        merged = np.unique(np.concatenate(
            [prev, batch["h"].to_numpy(dtype=np.int64)]))
        kept = merged[:k]
        state.update((kept.tolist(),))
        k_used = int(kept.size)
        kth = int(kept[-1]) if k_used else None
        if k_used < k:
            est = float(k_used)
        else:
            est = float(k - 1) * float(HASH_SPACE) / float(kth)
        est = fr6_py(est)
        yield pd.DataFrame({"g": [key[0]], "k_used": [k_used],
                            "kth_hash": [kth], "est_distinct": [est]})

    return update


def kmv_distinct_stream(events: DataFrame, group_col: str,
                        value_col: str, k: int = 256) -> DataFrame:
    """Streaming events → per-group KMV sketches, one emission of the
    current (k_used, kth_hash, est_distinct) per (group, micro-batch).
    State is bounded at k int64s per group."""
    keyed = (events
             .where(F.col(value_col).isNotNull())
             .select(F.col(group_col).cast("string").alias("g"),
                     hash64_expr(F.col(value_col).cast("string"))
                     .alias("h")))
    return (keyed.groupBy("g")
            .applyInPandasWithState(_make_update(int(k)),
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
