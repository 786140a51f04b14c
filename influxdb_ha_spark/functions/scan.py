"""Distributed single-series scans (global lag / prefix sum) without a
single-partition Window.

`Window.orderBy(time)` with no partition key moves every row through ONE
task — the classic 100 TB killer. For an ungrouped InfluxQL transform
(`difference`, `derivative`, `elapsed`, `moving_average`, `cumulative_sum`
over a whole measurement treated as one series) the scalable plan is the
textbook distributed scan:

1. Split the time axis into ~shuffle-partition ranges using approximate
   quantiles of `time` (one lightweight aggregate job; boundaries are plain
   literals afterwards, so bucket assignment is a pure projection — no
   range shuffle, and the same row always lands in the same bucket).
2. Run the ordinary per-partition Window over `__pid` (one hash shuffle,
   P-way parallel).
3. Stitch partition boundaries:
   - lag-style ops: prepend to each bucket the last k rows of the previous
     bucket (`__carry` rows), compute the window, then drop carries;
   - prefix sums: per-bucket partial totals (P rows) → tiny driver-side
     running offset → broadcast join back.

The reference has no analog (its merge engine refuses these transforms
across nodes — merge/query_merge.go:171-184); this is the Spark-first
replacement that keeps the semantics of its single-node pass-through
(coordinator.go:238-241) at cluster scale.
"""

from __future__ import annotations

import functools
import operator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

PID = "__pid"
CARRY = "__carry"


def _default_parts(df: DataFrame) -> int:
    try:
        return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        return 32


def time_boundaries(df: DataFrame, time_col: str, parts: int) -> list[float]:
    """Approximate (parts-1) interior quantile boundaries of the time axis.

    One aggregate job; 1% relative error is plenty — boundaries only need to
    balance work, not be exact."""
    if parts <= 1:
        return []
    probs = [i / parts for i in range(1, parts)]
    [qs] = df.stat.approxQuantile([time_col], probs, 0.01)
    # dedup (skewed clocks can collapse quantiles); order is non-decreasing
    out: list[float] = []
    for q in qs:
        if not out or q > out[-1]:
            out.append(q)
    return out


def bucket_id(time_col: str, bounds: list[float]) -> Column:
    """Pure-projection bucket id: number of boundaries <= time."""
    if not bounds:
        return F.lit(0)
    t = F.col(time_col).cast("double")
    flags = [F.when(t >= F.lit(b), 1).otherwise(0) for b in bounds]
    return functools.reduce(operator.add, flags).alias(PID)


def with_carry(df: DataFrame, time_col: str, k: int,
               parts: int | None = None) -> tuple[DataFrame, "Window"]:
    """Return (df', window) where df' carries `__pid`/`__carry` columns and
    `window = Window.partitionBy(__pid).orderBy(time)` sees the last `k`
    rows of the previous time-range bucket as leading context rows.

    Correctness invariant: each bucket's carry must be the k rows that
    GLOBALLY precede it, which holds iff every feeding bucket has >= k real
    rows. On sparse inputs (30 aggregate buckets across 32 quantile
    ranges) that fails — carries come up short and k-row frames at bucket
    heads silently miss context — so the bucketing is validated with a
    P-row count and coarsened (parts //= 4) until the invariant holds;
    degenerate case parts=1 is a single small partition, which is exactly
    when that's affordable. Large inputs pass on the first try.

    Callers compute lag/frame expressions over the window, then must filter
    `~F.col(CARRY)` and drop both helper columns."""
    parts = parts or _default_parts(df)
    while True:
        bounds = time_boundaries(df, time_col, parts)
        d = (df.withColumn(PID, bucket_id(time_col, bounds))
             .withColumn(CARRY, F.lit(False)))
        if not bounds or k <= 0:
            break
        counts = {r[PID]: r["n"] for r in
                  d.groupBy(PID).agg(F.count(F.lit(1)).alias("n")).collect()}
        if all(counts.get(b, 0) >= k for b in range(len(bounds))):
            break
        if parts <= 1:
            break
        parts = max(1, parts // 4)
    if bounds:
        wtail = Window.partitionBy(PID).orderBy(F.col(time_col).desc())
        tails = (d.withColumn("__rnt", F.row_number().over(wtail))
                 .where(F.col("__rnt") <= k).drop("__rnt")
                 .withColumn(PID, F.col(PID) + 1)
                 .withColumn(CARRY, F.lit(True))
                 .where(F.col(PID) <= len(bounds)))
        d = d.unionByName(tails)
    w = Window.partitionBy(PID).orderBy(time_col)
    return d, w


def finish_carry(d: DataFrame) -> DataFrame:
    return d.where(~F.col(CARRY)).drop(PID, CARRY)


def distributed_cumsum(df: DataFrame, field: str, time_col: str,
                       out: str, parts: int | None = None) -> DataFrame:
    """Global running sum ordered by time: per-bucket cumsum + broadcast of
    per-bucket prefix offsets (P rows ranked driver-side)."""
    parts = parts or _default_parts(df)
    bounds = time_boundaries(df, time_col, parts)
    d = df.withColumn(PID, bucket_id(time_col, bounds))
    w = Window.partitionBy(PID).orderBy(time_col) \
        .rowsBetween(Window.unboundedPreceding, 0)
    local = d.withColumn(out, F.sum(field).over(w))
    if not bounds:
        return local.drop(PID)
    partials = d.groupBy(PID).agg(F.sum(field).alias("__ps"))
    # P rows: the single-partition window here is over ~shuffle-partition
    # count rows, not the data — constant-size by construction.
    woff = Window.orderBy(PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(PID, F.coalesce(
        F.sum("__ps").over(woff), F.lit(0)).alias("__off"))
    return (local.join(F.broadcast(offsets), on=PID, how="left")
            .withColumn(out, F.col(out) + F.coalesce(F.col("__off"), F.lit(0)))
            .drop(PID, "__off"))
