"""fill() semantics: bucket-spine generation + the four fill modes.

In the reference, `fill(...)` is propagated verbatim to the InfluxDB data
nodes which gap-fill server-side (merge/query_merge.go:72-81); Spark has no
built-in equivalent, so this is real engine work (SURVEY.md §4 item 2):

1. build the complete bucket spine for the query time range via
   `sequence()` + `explode` (per series group — a lateral cross of
   distinct-groups × spine, NOT a driver loop);
2. left-join the aggregated buckets onto the spine;
3. fill: `null` (default), `none` (drop), number (`coalesce(lit)`),
   `previous` (`last(ignorenulls) over`), `linear` (lead/lag interpolation).

Scale notes: the spine size is range/interval buckets per series — bounded
by the query's WHERE time range, exactly like InfluxDB (which refuses
unbounded GROUP BY time() queries). The join key is (group tags, bucket); the
distinct-groups side is small (it is the series cardinality of the filter),
so Catalyst broadcast-joins the spine side after AQE sizes it.

Ungrouped previous/linear fills over a LARGE spine (a year of 1 s buckets is
31 M rows) do not use a keyless Window: the spine is evenly spaced with
bounds known at plan time, so rows are segmented into fixed bucket ranges
and stitched with per-segment carry partials (the segmented-scan trick —
see functions/scan.py for the irregular-time variant). Spines up to
`_SMALL_SPINE` rows keep the plain single-window plan.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SMALL_SPINE = 65_536
_DAY_NS = 86_400_000_000_000
# Hard refusal above this many buckets — mirroring InfluxDB, which rejects
# GROUP BY time() queries whose bucket count explodes (max-select-buckets).
# A 100M-row generated spine is never what the user meant (1 s buckets over
# 3 years); erroring beats silently materializing it.
MAX_SPINE_BUCKETS = 100_000_000


def _floor_bucket(t_ns: int, interval_ns: int, offset_ns: int) -> int:
    """Python twin of timeutil.time_bucket (epoch-aligned floor + offset)."""
    shifted = t_ns - offset_ns
    return shifted - (shifted % interval_ns) + offset_ns


def bucket_spine(df_aggregated: DataFrame, bucket_col: str, interval_ns: int,
                 start_ns: int | None, end_ns: int | None,
                 group_cols: list[str], offset_ns: int = 0,
                 tz: str | None = None) -> DataFrame:
    """All buckets in [start, end) per distinct group combination.

    The spine MUST align with the bucket values the aggregation produced
    (timeutil.time_bucket / time_bucket_tz), so it honors the same
    `GROUP BY time(interval, offset)` offset and tz(): a misaligned spine
    left-joins to nothing and fill() silently nulls out every row.

    tz spines are generated as an arithmetic sequence in LOCAL wall-clock ns
    (where buckets are evenly spaced even across DST) and each edge is
    mapped back to its UTC instant with to_utc_timestamp — the exact inverse
    walk time_bucket_tz does per data row, so edges match bit-for-bit.

    When the query gave no explicit time bounds, fall back to the observed
    min/max bucket (InfluxDB bounds the spine by the WHERE time range;
    min/max is the sensible batch analog).
    """
    if start_ns is None or end_ns is None:
        lo, hi = df_aggregated.agg(
            F.min(bucket_col), F.max(bucket_col)).first()
        if lo is None:
            return df_aggregated.select(*group_cols, bucket_col).limit(0)
        # lo/hi are already bucket values (aligned); use them directly.
        start_ns = lo if start_ns is None else start_ns
        end_ns = hi + interval_ns if end_ns is None else end_ns
        bounds_are_buckets = True
    else:
        bounds_are_buckets = False

    if tz is None:
        first_bucket = (start_ns if bounds_are_buckets
                        else _floor_bucket(start_ns, interval_ns, offset_ns))
        spine = F.explode(F.sequence(
            F.lit(first_bucket), F.lit(end_ns - 1),
            F.lit(interval_ns))).alias(bucket_col)
    else:
        # Uniform local-ns sequence starting at floor_local(start), one extra
        # day of steps as DST slack, mapped back to UTC and clipped at end.
        base = F.unix_micros(F.from_utc_timestamp(
            F.timestamp_micros(F.lit(start_ns // 1000)), tz)) * F.lit(1000)
        shifted = base - F.lit(offset_ns)
        first_local = (shifted - F.pmod(shifted, F.lit(interval_ns))
                       + F.lit(offset_ns))
        steps = F.explode(F.sequence(
            F.lit(0), F.lit(end_ns - start_ns + _DAY_NS),
            F.lit(interval_ns))).alias("__step")
        edges = df_aggregated.sparkSession.range(1).select(steps) \
            .select((first_local + F.col("__step")).alias("__local"))
        utc = F.unix_micros(F.to_utc_timestamp(
            F.timestamp_micros((F.col("__local") / F.lit(1000)).cast("long")),
            tz)) * F.lit(1000)
        spine_df = (edges.select(utc.alias(bucket_col))
                    .where(F.col(bucket_col) < F.lit(end_ns))
                    .distinct())
        if group_cols:
            groups = df_aggregated.select(*group_cols).distinct()
            return groups.crossJoin(spine_df)
        return spine_df
    if group_cols:
        groups = df_aggregated.select(*group_cols).distinct()
        return groups.select(*group_cols, spine)
    return df_aggregated.sparkSession.range(1).select(spine)


def fill_buckets(df_aggregated: DataFrame, bucket_col: str, interval_ns: int,
                 mode: str | float | int | None, value_cols: list[str],
                 group_cols: list[str] | None = None,
                 start_ns: int | None = None,
                 end_ns: int | None = None,
                 offset_ns: int = 0,
                 tz: str | None = None) -> DataFrame:
    """Apply fill() to a bucket-aggregated DataFrame.

    mode: None → 'null' semantics (emit empty buckets as null);
          'none' → drop empty buckets (no spine join needed);
          'previous' | 'linear' | numeric constant.
    """
    group_cols = group_cols or []
    if mode == "none":
        preds = [F.col(c).isNotNull() for c in value_cols]
        keep = preds[0]
        for p in preds[1:]:
            keep = keep | p
        return df_aggregated.where(keep)

    if start_ns is None or end_ns is None:
        # resolve data-driven bounds ONCE (observed buckets are already
        # aligned, so flooring them below is the identity)
        lo, hi = df_aggregated.agg(
            F.min(bucket_col), F.max(bucket_col)).first()
        if lo is not None:
            start_ns = lo if start_ns is None else start_ns
            end_ns = hi + interval_ns if end_ns is None else end_ns
    nbuckets = _spine_size(df_aggregated, bucket_col, interval_ns,
                           start_ns, end_ns, offset_ns)
    if nbuckets > MAX_SPINE_BUCKETS:
        from ..errors import QueryError
        raise QueryError(
            f"GROUP BY time() would generate {nbuckets} buckets "
            f"(max {MAX_SPINE_BUCKETS}); narrow the time range or widen "
            "the interval")
    spine = bucket_spine(df_aggregated, bucket_col, interval_ns,
                         start_ns, end_ns, group_cols, offset_ns, tz)
    joined = spine.join(df_aggregated, on=group_cols + [bucket_col], how="left")

    if mode is None or mode == "null":
        return joined
    if isinstance(mode, (int, float)) and not isinstance(mode, bool):
        exprs = [F.coalesce(F.col(c), F.lit(mode)).alias(c) for c in value_cols]
        return joined.select(*group_cols, bucket_col, *exprs)

    if not group_cols:
        if nbuckets > _SMALL_SPINE and mode in ("previous", "linear"):
            return _fill_ungrouped_segmented(joined, bucket_col, interval_ns,
                                             mode, value_cols, nbuckets)

    if mode == "previous":
        w = (Window.partitionBy(*group_cols).orderBy(bucket_col)
             if group_cols else Window.orderBy(bucket_col))
        wprev = w.rowsBetween(Window.unboundedPreceding, 0)
        exprs = [F.coalesce(F.col(c),
                            F.last(F.col(c), ignorenulls=True).over(wprev)).alias(c)
                 for c in value_cols]
        return joined.select(*group_cols, bucket_col, *exprs)
    if mode == "linear":
        w = (Window.partitionBy(*group_cols).orderBy(bucket_col)
             if group_cols else Window.orderBy(bucket_col))
        wprev = w.rowsBetween(Window.unboundedPreceding, -1)
        wnext = w.rowsBetween(1, Window.unboundedFollowing)
        exprs = []
        for c in value_cols:
            v = F.col(c)
            prev_v = F.last(v, ignorenulls=True).over(wprev)
            next_v = F.first(v, ignorenulls=True).over(wnext)
            prev_b = F.last(F.when(v.isNotNull(), F.col(bucket_col)),
                            ignorenulls=True).over(wprev)
            next_b = F.first(F.when(v.isNotNull(), F.col(bucket_col)),
                             ignorenulls=True).over(wnext)
            interp = prev_v + (next_v - prev_v) * (
                (F.col(bucket_col) - prev_b).cast("double")
                / (next_b - prev_b).cast("double"))
            exprs.append(F.coalesce(v, interp).alias(c))
        return joined.select(*group_cols, bucket_col, *exprs)
    raise ValueError(f"unknown fill mode: {mode!r}")


def _spine_size(df_aggregated: DataFrame, bucket_col: str, interval_ns: int,
                start_ns: int | None, end_ns: int | None,
                offset_ns: int = 0) -> int:
    """Bucket count of the spine (exact for UTC; tz spines may differ by the
    DST hours in range — irrelevant for the segmented-path size cutoff)."""
    if start_ns is None or end_ns is None:
        lo, hi = df_aggregated.agg(F.min(bucket_col), F.max(bucket_col)).first()
        if lo is None:
            return 0
        start_ns = lo if start_ns is None else start_ns
        end_ns = hi + interval_ns if end_ns is None else end_ns
        first_bucket = start_ns
    else:
        first_bucket = _floor_bucket(start_ns, interval_ns, offset_ns)
    return max(0, (end_ns - 1 - first_bucket) // interval_ns + 1)


def _fill_ungrouped_segmented(joined: DataFrame, bucket_col: str,
                              interval_ns: int, mode: str,
                              value_cols: list[str], nbuckets: int) -> DataFrame:
    """previous/linear fill over one big evenly-spaced spine, P-way parallel.

    Segment id = bucket position // rows-per-segment (pure projection —
    the spine is arithmetic, so no range shuffle or sampling). Per-segment
    windows handle in-segment gaps; cross-segment gaps are stitched with
    per-segment extreme partials (P rows) broadcast back — a segmented scan.
    """
    spark = joined.sparkSession
    try:
        parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        parts = 32
    rpp = max(1, math.ceil(nbuckets / parts))
    pos = (F.col(bucket_col) / F.lit(interval_ns)).cast("long")
    d = joined.withColumn("__pid", (pos / F.lit(rpp)).cast("long"))

    def nn(c):  # non-null (bucket, value) struct for ordering
        return F.when(F.col(c).isNotNull(),
                      F.struct(F.col(bucket_col).alias("b"),
                               F.col(c).alias("v")))

    # per-segment extreme partials: P rows — tiny by construction
    partials = d.groupBy("__pid").agg(
        *[F.max(nn(c)).alias(f"__last_{c}") for c in value_cols],
        *([F.min(nn(c)).alias(f"__first_{c}") for c in value_cols]
          if mode == "linear" else []))
    wfwd = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    wbwd = Window.orderBy(F.col("__pid").desc()) \
        .rowsBetween(Window.unboundedPreceding, -1)
    carry_cols = [F.max(F.col(f"__last_{c}")).over(wfwd).alias(f"__cprev_{c}")
                  for c in value_cols]
    if mode == "linear":
        carry_cols += [F.min(F.col(f"__first_{c}")).over(wbwd)
                       .alias(f"__cnext_{c}") for c in value_cols]
    carries = partials.select("__pid", *carry_cols)
    d = d.join(F.broadcast(carries), on="__pid", how="left")

    w = Window.partitionBy("__pid").orderBy(bucket_col)
    exprs = []
    if mode == "previous":
        wprev = w.rowsBetween(Window.unboundedPreceding, 0)
        for c in value_cols:
            within = F.last(nn(c), ignorenulls=True).over(wprev)
            prev = F.coalesce(within, F.col(f"__cprev_{c}"))
            exprs.append(F.coalesce(F.col(c), prev["v"]).alias(c))
    else:  # linear
        wprev = w.rowsBetween(Window.unboundedPreceding, -1)
        wnext = w.rowsBetween(1, Window.unboundedFollowing)
        for c in value_cols:
            prev = F.coalesce(F.last(nn(c), ignorenulls=True).over(wprev),
                              F.col(f"__cprev_{c}"))
            nxt = F.coalesce(F.first(nn(c), ignorenulls=True).over(wnext),
                             F.col(f"__cnext_{c}"))
            interp = prev["v"] + (nxt["v"] - prev["v"]) * (
                (F.col(bucket_col) - prev["b"]).cast("double")
                / (nxt["b"] - prev["b"]).cast("double"))
            exprs.append(F.coalesce(F.col(c), interp).alias(c))
    return d.select(bucket_col, *exprs)
