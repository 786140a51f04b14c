"""Streaming twin #27 of operators/timeseries.ab_test: the LIVE A/B
experiment readout, split along the operator's own seam.

ab_test is (per-value count table) → (rank-sum + KS folds). The count
table is the only data-sized part, and it is MERGEABLE — per-value
(count_a, count_b) cells combine by cell-wise +, the countmin algebra —
so the streaming half maintains exactly that table: state is keyed by
the (optionally bucketed) metric VALUE, two int64 counters per value,
updated via `applyInPandasWithState`. No single-key funnel exists
anywhere: the stateful operator partitions on the value key, so 100 TB
of events distributes across the cluster the same way the batch count
shuffle does, and state size is bounded by the value vocabulary — the
caller owns the same bucketing contract as ab_test (pass bucket_width;
power-of-two widths are IEEE-exact, the batch note).

Each micro-batch emits the CURRENT (v, ca, cb) for every value that
changed (update mode). The dashboard turns any snapshot into the test
statistics with operators/timeseries.ab_from_counts — literally the
same fold helpers the batch operator runs, so stream-fed statistics are
bit-identical to batch ab_test on the union of all micro-batches
(pytest-pinned). Counters are additive, NOT idempotent: at-least-once
re-delivery shifts counts — the same caveat as every additive twin
(ams_stream, countmin_stream); exactly-once sinks or idempotent
upstream keys are the production answer.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "ca long, cb long"
OUTPUT_SCHEMA = "v double, ca long, cb long"


def _update(key: Tuple[Any, ...],
            pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
            state: GroupState) -> Iterator[Any]:
    import pandas as pd

    ca, cb = (int(state.get[0]), int(state.get[1])) if state.exists \
        else (0, 0)
    batch = pd.concat(list(pdfs), ignore_index=True)
    na = int(batch["ia"].sum())
    ca += na
    cb += len(batch) - na
    state.update((ca, cb))
    yield pd.DataFrame({"v": [key[0]], "ca": [ca], "cb": [cb]})


def ab_counts_stream(events: DataFrame, group_col: str, value_col: str,
                     group_a, group_b,
                     bucket_width: float = None) -> DataFrame:
    """Streaming events → live per-value A/B count table (v, ca, cb).

    The metric is cast double and, when `bucket_width` is given,
    coarsened to its bucket's left edge with the BATCH expression
    (floor(v/w)·w) JVM-side before the stateful update — identical
    bucketing, identical vocabulary bound. Rows outside
    {group_a, group_b} or with a NULL metric drop JVM-side (the batch
    filter). State: 2 int64s per distinct value."""
    v = F.col(value_col).cast("double")
    if bucket_width is not None:
        w = float(bucket_width)
        if not w > 0:
            raise ValueError("ab_counts_stream: bucket_width must "
                             "be > 0")
        v = F.floor(v / F.lit(w)) * F.lit(w)
    g = F.col(group_col)
    keyed = (events
             .select(g.alias("__g"), v.alias("v"))
             .where(F.col("v").isNotNull()
                    & F.col("__g").isin([group_a, group_b]))
             .select("v", (F.col("__g") == F.lit(group_a))
                     .cast("long").alias("ia")))
    return (keyed.groupBy("v")
            .applyInPandasWithState(_update,
                                    outputStructType=OUTPUT_SCHEMA,
                                    stateStructType=STATE_SCHEMA,
                                    outputMode="update",
                                    timeoutConf=GroupStateTimeout.NoTimeout))
