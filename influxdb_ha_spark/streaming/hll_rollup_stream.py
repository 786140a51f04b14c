"""Streaming twin #22 of operators/sketch.hll_rollup: the live
hypertable — per-(group, time-bucket) HLL register partials held in
state, every micro-batch emitting the group's CURRENT whole-range
rollup (n_buckets, n_buckets_used, n_empty, est_distinct) — exactly
the row batch hll_rollup computes over the same events after the fact.

This is the streaming form of the pattern the batch operator documents
("at 100 TB the partial table is persisted incrementally by the ingest
pipeline and only the merge+fold stages run per query"): here the
ingest pipeline IS this operator, the state IS the partial table, and
the merge+fold runs per micro-batch on ≤ max_buckets · m int64s per
group. Register-wise max is associative, commutative and idempotent,
so batch boundaries, arrival order, re-delivered duplicates, and
late-arriving events for OLD buckets all land exactly where the batch
operator would put them — a late event simply maxes into its bucket's
registers, and the rollup stays correct with no watermark contract
(the quantile-bands twin needs closure semantics because order
statistics are not mergeable; HLL states are, which is the whole
point of rolling up sketches instead of raw values).

State per group = parallel (buckets, registers) arrays, bounded LOUDLY
by `max_buckets` (default 512 — a year and a half of daily buckets at
2 KB each): breaching it raises with the retention fix spelled out
rather than letting state grow silently — the mix-drift/deadman
never-a-silent-loss convention applied to state size.

The register mapping (j, rho) is computed JVM-side with the batch
operator's OWN _hll_jrho, and the fold is the single-sourced
hll_fold_py shared with streaming twin #20 — one definition, four
consumers (batch sketch, merge proof, live cardinality, live rollup).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.hashing import hash64_expr
from ..operators.sketch import HLL_M, _hll_jrho, hll_fold_py

STATE_SCHEMA = "buckets array<long>, regs array<array<long>>"
OUTPUT_SCHEMA = ("g string, n_buckets long, n_buckets_used long, "
                 "n_empty long, est_distinct double")


def _make_update(max_buckets: int):
    def _update(key: Tuple[Any, ...],
                pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
                state: GroupState) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        if state.exists:
            buckets = list(state.get[0])
            regs = [np.asarray(r, dtype=np.int64) for r in state.get[1]]
        else:
            buckets, regs = [], []
        idx = {b: i for i, b in enumerate(buckets)}
        batch = pd.concat(list(pdfs), ignore_index=True)
        for bkt, grp in batch.groupby("bkt", sort=True):
            i = idx.get(int(bkt))
            if i is None:
                if len(buckets) >= max_buckets:
                    raise ValueError(
                        f"hll_rollup_stream: group {key[0]!r} would "
                        f"exceed max_buckets={max_buckets} live "
                        f"time-buckets; raise max_buckets, widen "
                        f"bucket_ns, or retire old buckets upstream "
                        f"(state is max_buckets * {HLL_M} int64s per "
                        f"group by design)")
                buckets.append(int(bkt))
                regs.append(np.zeros(HLL_M, dtype=np.int64))
                i = len(buckets) - 1
                idx[int(bkt)] = i
            np.maximum.at(regs[i], grp["j"].to_numpy(dtype=np.int64),
                          grp["rho"].to_numpy(dtype=np.int64))
        state.update(([int(b) for b in buckets],
                      [r.tolist() for r in regs]))
        merged = np.maximum.reduce(regs)
        n_used, v_empty, est = hll_fold_py(merged)
        yield pd.DataFrame({"g": [key[0]], "n_buckets": [len(buckets)],
                            "n_buckets_used": [n_used],
                            "n_empty": [v_empty], "est_distinct": [est]})
    return _update


def hll_rollup_stream(events: DataFrame, group_col: str, value_col: str,
                      time_col: str = "time",
                      bucket_ns: int = 86_400_000_000_000,
                      max_buckets: int = 512) -> DataFrame:
    """Streaming events → per-group live time-bucketed HLL rollup: one
    emission of the current (n_buckets, n_buckets_used, n_empty,
    est_distinct) per (group, micro-batch), batch-equal to
    sketch.hll_rollup over the union of all micro-batches."""
    if max_buckets < 1:
        raise ValueError("hll_rollup_stream: max_buckets must be >= 1")
    if bucket_ns < 1:
        raise ValueError("hll_rollup_stream: bucket_ns must be >= 1")
    h = hash64_expr(F.col(value_col).cast("string"))
    j, rho = _hll_jrho()   # the batch operator's own register mapping
    t = F.col(time_col)
    keyed = (events
             .where(F.col(value_col).isNotNull() & t.isNotNull())
             .select(F.col(group_col).cast("string").alias("g"),
                     (t - F.pmod(t, F.lit(int(bucket_ns)))).alias("bkt"),
                     h.alias("__h"))
             .select("g", "bkt", j.alias("j"), rho.alias("rho")))
    return (keyed.groupBy("g")
            .applyInPandasWithState(_make_update(int(max_buckets)),
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
