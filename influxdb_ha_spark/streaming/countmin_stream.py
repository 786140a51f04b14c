"""Streaming twin of operators/sketch.countmin: sharded Count–Min
frequency sketches maintained across micro-batches via
`applyInPandasWithState`, answering live point queries for a WATCHED
probe list (the "how often has key X occurred so far" monitor).

Sharding + mergeability: the stream partitions by shard =
pmod(xxhash64(item), n_shards); each shard's state is its OWN d×w cell
table counting only its slice. CM cells merge by cell-wise + (Cormode &
Muthukrishnan 2005 §4.2), and the shards partition the stream, so the
GLOBAL sketch is exactly the cell-wise sum of the shard tables — each
micro-batch every shard emits its d probe-bucket cells per watched
item, and the reader folds min_i(Σ_shards cell_i): bit-identical to the
batch operator's estimate on the union of all micro-batches, regardless
of batch boundaries (the equivalence test pins it). State is d·w int64s
per shard — fixed kilobytes, no matter the stream volume or key
cardinality (the heavy_hitters_stream discipline, with exact merge
instead of MG's bounded-error merge).

Hashing: the same cross-engine md5 hash64 as the batch sketch, computed
JVM-side before the stateful op; the Python update does one numpy
scatter-add per batch. Probe items are hashed on the driver with
hashlib.md5 — verified identical to Spark's md5/conv chain.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.hashing import MERSENNE_P, hash64_expr, minhash_coeffs

STATE_SCHEMA = "cells array<long>, n long"
OUTPUT_SCHEMA = ("shard long, item string, cells array<long>, "
                 "n_shard long")


def probe_hash(item: str) -> int:
    """Driver-side hash64(item) % p — identical to the JVM md5 chain."""
    return int(hashlib.md5(item.encode()).hexdigest()[:15], 16) % MERSENNE_P


def _make_update(d: int, w: int, probes: list, seed: int):
    coeffs = minhash_coeffs(d, seed=seed)
    probe_buckets = {
        p: [((a * probe_hash(p) + b) % MERSENNE_P) % w for a, b in coeffs]
        for p in probes}

    def update(key: Tuple[Any, ...],
               pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
               state: GroupState) -> Iterator[Any]:
        import numpy as np
        import pandas as pd

        if state.exists:
            cells, n = state.get
            cells = np.asarray(cells, dtype=np.int64)
        else:
            cells, n = np.zeros(d * w, dtype=np.int64), 0
        batch = pd.concat(list(pdfs), ignore_index=True)
        h = batch["h"].to_numpy(dtype=np.int64)
        n += int(h.size)
        for i, (a, b) in enumerate(coeffs):
            buckets = ((a * h + b) % MERSENNE_P) % w
            np.add.at(cells, i * w + buckets, 1)
        state.update((cells.tolist(), n))
        yield pd.DataFrame({
            "shard": [int(key[0])] * len(probes),
            "item": list(probes),
            "cells": [[int(cells[i * w + b])
                       for i, b in enumerate(probe_buckets[p])]
                      for p in probes],
            "n_shard": [n] * len(probes),
        })

    return update


def countmin_stream(events: DataFrame, item_col: str, probes: list,
                    d: int = 4, w: int = 1024, n_shards: int = 8,
                    seed: int = 7) -> DataFrame:
    """Streaming events → per-shard CM cell tables; each micro-batch
    every shard emits its d probe-bucket cells per watched item. The
    global live estimate for item X is min over rows i of the
    shard-summed cells: `min_i(Σ_shards cells[i])`."""
    keyed = (events
             .where(F.col(item_col).isNotNull())
             .select(F.col(item_col).cast("string").alias("item"),
                     (hash64_expr(F.col(item_col).cast("string"))
                      % F.lit(MERSENNE_P)).alias("h"))
             .select("h", F.pmod(F.xxhash64(F.col("item")),
                                 F.lit(int(n_shards))).alias("shard")))
    return (keyed.groupBy("shard")
            .applyInPandasWithState(
                _make_update(int(d), int(w), list(probes), int(seed)),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
