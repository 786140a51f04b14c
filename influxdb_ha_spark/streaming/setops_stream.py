"""Streaming twin #21 of operators/sketch.kmv_setops: LIVE theta-sketch
set operations — |A ∪ B|, |A ∩ B| and Jaccard between two groups' value
sets, re-estimated on every micro-batch from two bounded KMV states.

The audience-overlap question answered continuously ("how many users
did both X and Y, as of now") with state = 2·k int64s TOTAL, no matter
how many values stream through. Both groups route to ONE state key (the
pair is the unit of estimation), so the cross-group math runs inside a
single stateful update with no second aggregation stage.

Semantics replay the batch operator exactly: per-group k smallest
DISTINCT hashes ("k smallest of a union" is associative — batch
boundaries cannot matter), θ = min over groups of (k-th smallest hash,
or 2^60 for an exhaustive sketch — the kmv_setops theta convention),
survivor counts below θ, and the three estimators in the same IEEE op
order with floor-round-6. The structural-equivalence test pins the
final streamed emission equal to batch kmv_setops on the union of all
micro-batches, estimate arithmetic included. Hashing runs JVM-side with
the same cross-engine md5 hash64 column the batch sketch uses.

Like distinct_stream (twin #17), the state keys are the HASHES of
distinct values (the sketch's own state definition): two distinct
values colliding on the 60-bit hash would collapse — the 2^-60 event
the batch sketch's estimator already prices in.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.hashing import hash64_expr
from ..operators.sketch import HASH_SPACE, fr6_py

STATE_SCHEMA = "ha array<long>, hb array<long>"
OUTPUT_SCHEMA = ("pair string, theta long, n_a long, n_b long, "
                 "n_common long, est_union double, "
                 "est_intersection double, jaccard_est double")


def _make_update(k: int):
    def update(key: Tuple[Any, ...],
               pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        if state.exists:
            ha = np.asarray(state.get[0], dtype=np.int64)
            hb = np.asarray(state.get[1], dtype=np.int64)
        else:
            ha = np.empty(0, dtype=np.int64)
            hb = np.empty(0, dtype=np.int64)
        batch = pd.concat(list(pdfs), ignore_index=True)
        side = batch["side"].to_numpy()
        h = batch["h"].to_numpy(dtype=np.int64)
        # k smallest of (state ∪ batch) per side — associative merge
        ha = np.unique(np.concatenate([ha, h[side == 0]]))[:k]
        hb = np.unique(np.concatenate([hb, h[side == 1]]))[:k]
        state.update((ha.tolist(), hb.tolist()))
        # theta: k-th smallest per side, or the FULL space when the
        # side's sketch is exhaustive (the kmv_setops convention)
        ta = int(ha[-1]) if ha.size == k else HASH_SPACE
        tb = int(hb[-1]) if hb.size == k else HASH_SPACE
        theta = min(ta, tb)
        n_a = int((ha <= theta).sum())
        n_b = int((hb <= theta).sum())
        common = np.intersect1d(ha, hb, assume_unique=True)
        n_common = int((common <= theta).sum())
        uni = n_a + n_b - n_common
        est_u = fr6_py(float(uni) * float(HASH_SPACE) / float(theta))
        est_i = fr6_py(float(n_common) * float(HASH_SPACE) / float(theta))
        jac = (fr6_py(float(n_common) / float(uni)) if uni > 0 else None)
        yield pd.DataFrame({
            "pair": [key[0]], "theta": [theta], "n_a": [n_a],
            "n_b": [n_b], "n_common": [n_common], "est_union": [est_u],
            "est_intersection": [est_i], "jaccard_est": [jac]})

    return update


def setops_stream(events: DataFrame, group_col: str, value_col: str,
                  group_a, group_b, k: int = 256) -> DataFrame:
    """Streaming events → one live (theta, n_a, n_b, n_common,
    est_union, est_intersection, jaccard_est) row per micro-batch for
    the (group_a, group_b) pair; rows outside the pair are dropped
    JVM-side before the stateful operator. State = 2·k int64s."""
    g = F.col(group_col)
    keyed = (events
             .where(F.col(value_col).isNotNull()
                    & g.isin([group_a, group_b]))
             .select(F.lit(f"{group_a}|{group_b}").alias("pair"),
                     F.when(g == group_a, F.lit(0)).otherwise(F.lit(1))
                     .alias("side"),
                     hash64_expr(F.col(value_col).cast("string"))
                     .alias("h")))
    return (keyed.groupBy("pair")
            .applyInPandasWithState(_make_update(int(k)),
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
