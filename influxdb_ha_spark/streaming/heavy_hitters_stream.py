"""Streaming twin of operators/timeseries.heavy_hitters: bounded-memory
Misra–Gries frequency summaries maintained across micro-batches via
`applyInPandasWithState`.

Misra & Gries 1982 ("Finding repeated elements") — the summary keeps at
most k−1 counters; after processing n items every key with true count
> n/k is IN the summary, and each kept counter underestimates its true
count by at most n/k. The batch operator is the exact reference: the
streaming summary is a guaranteed SUPERSET of its output (the classic
sketch trade — no misses, possible false candidates a second exact pass
over the survivors removes).

Sharding: the stream partitions by shard = pmod(xxhash64(key), n_shards)
— each shard holds an INDEPENDENT MG summary of its slice in the state
store, so state is (k−1)·n_shards counters total regardless of stream
volume, and no single state key funnels the whole stream (the stateful.py
discipline). Per-shard guarantees compose: a key with global count
> n/k has shard-local count > n_shard/k for its shard (all its copies
land in one shard), so the union of shard summaries keeps the superset
property.

Batch reduction is the MERGE form (Berinde et al. 2010's mergeable-
summaries treatment; also Agarwal et al. 2012): fold the micro-batch's
exact value_counts into the carried counters, then if more than k−1
remain subtract the k-th largest count from every counter and keep the
strictly positive — equivalent error bound, order-free WITHIN a batch
(the fold is a dict merge, not per-item decrements), deterministic
given the same batch boundaries.

Each micro-batch invocation emits the shard's CURRENT summary rows
(key, count_lower, n_shard) — update-style; the final emission after
draining is the summary the equivalence test checks against the exact
batch operator.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "ks array<string>, cs array<long>, n long"
OUTPUT_SCHEMA = "shard long, key string, count_lower long, n_shard long"


def _make_update(k: int):
    m = k - 1  # counter capacity

    def update(key: Tuple[Any, ...],
               pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator[Any]:
        import pandas as pd

        if state.exists:
            ks, cs, n = state.get
            counters = dict(zip(list(ks), [int(c) for c in cs]))
        else:
            counters, n = {}, 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        vc = batch["key"].value_counts()
        n += int(vc.sum())
        for key_val, c in vc.items():
            counters[key_val] = counters.get(key_val, 0) + int(c)
        if len(counters) > m:
            # subtract the (m+1)-th largest count from everything and
            # keep strict positives: at most m survive, and the total
            # decrement per key never exceeds (items processed)/k
            sub = sorted(counters.values(), reverse=True)[m]
            counters = {key_val: c - sub for key_val, c in counters.items()
                        if c - sub > 0}
        # sorted emission order: deterministic output for the test
        items = sorted(counters.items())
        state.update(([key_val for key_val, _ in items],
                      [c for _, c in items], n))
        yield pd.DataFrame({
            "shard": [int(key[0])] * len(items),
            "key": [key_val for key_val, _ in items],
            "count_lower": [c for _, c in items],
            "n_shard": [n] * len(items),
        })

    return update


def heavy_hitters_stream(events: DataFrame, key_col: str = "user_id",
                         k: int = 140, n_shards: int = 32) -> DataFrame:
    """Streaming events → per-shard Misra–Gries summaries, one emission
    of the current summary per (shard, micro-batch). `key_col` is cast
    to string (the summary is type-agnostic); n_shards bounds state at
    (k−1)·n_shards counters."""
    keyed = events.select(
        F.col(key_col).cast("string").alias("key"),
        F.pmod(F.xxhash64(F.col(key_col).cast("string")),
               F.lit(int(n_shards))).alias("shard"))
    return (keyed.groupBy("shard")
            .applyInPandasWithState(_make_update(int(k)),
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
