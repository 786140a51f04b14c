"""Plan-shape diagnostics run BEFORE committing to a shuffle strategy
(added scope — the reference proxies InfluxQL only, service/routing.go:
137-138, but every operator in this repo that documents "salt the hot
keys" or "broadcast the small side" presumes somebody MEASURED the key
distribution first; this module is that measurement, as a first-class
distributed operator rather than a notebook one-off).

- key_skew_profile : the salting decision table for a prospective
  join/groupBy key — top heavy keys with exact counts, parts-per-million
  share, and the integer salt fan-out that would level each one back to
  the mean. The companion of sketch.join_sample_estimate (which sizes
  the JOIN OUTPUT; this sizes the key DISTRIBUTION feeding it) and of
  graph.degree_histogram (the same audit on graph adjacency).

Everything is built-in DataFrame ops, integer-exact end-to-end (counts,
floor divisions — no floats anywhere), so any partitioning and any
engine agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_profile(df: DataFrame, key_cols: list,
                     top: int = 20) -> DataFrame:
    """Exact skew profile of a prospective shuffle key: the `top`
    heaviest key values with, per key, the row count, its
    parts-per-million share of the table, and `salt_factor` — the
    number of salt shards that would split this key's partition back
    down to the mean key load (ceil(cnt / mean), the fan-out you pass
    to a salted repartition or the AQE skew-join threshold you set).
    `total_rows` / `n_keys` ride along as 1-row broadcast scalars so
    the table is self-contained.

    NULL is profiled as a key value like any other — the unmatched
    foreign key parked at NULL is the single most common hot key in
    production joins, and a profiler that silently dropped it would
    miss exactly the skew it exists to find.

    All arithmetic is integer floor division (share_ppm =
    cnt·10⁶ div total, mean = total div n_keys, salt_factor =
    (cnt + mean − 1) div mean), so the output is engine-exact with no
    rounding contract.

    Scale shape: ONE key-keyed count aggregation (partials combine
    map-side — the profile of a 100 TB key column moves |distinct keys|
    rows, not data rows), a TakeOrderedAndProject for the top slice
    (cnt desc, keys asc — deterministic under ties), and a 1-row scalar
    crossJoin(broadcast) for the totals (the q11/tpch_q15 convention).
    The profiler is strictly cheaper than the shuffle it de-risks.
    """
    if not key_cols:
        raise ValueError("key_skew_profile: key_cols must be non-empty")
    if top < 1:
        raise ValueError("key_skew_profile: top must be >= 1")
    counts = (df.groupBy(*[F.col(k) for k in key_cols])
              .agg(F.count(F.lit(1)).alias("cnt")))
    stats = counts.agg(
        F.sum("cnt").alias("total_rows"),
        F.count(F.lit(1)).alias("n_keys"))
    topk = counts.orderBy(
        F.col("cnt").desc(),
        *[F.col(k).asc_nulls_first() for k in key_cols]).limit(int(top))
    return (topk.crossJoin(F.broadcast(stats))
            .select(*key_cols, "cnt",
                    F.expr("(cnt * 1000000) div total_rows")
                    .alias("share_ppm"),
                    F.expr("(cnt + (total_rows div n_keys) - 1) "
                           "div (total_rows div n_keys)")
                    .alias("salt_factor"),
                    "total_rows", "n_keys"))
