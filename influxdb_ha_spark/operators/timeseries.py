"""Time-series relational operators Spark lacks as built-ins: as-of join
and gap sessionization.

Added scope beyond the reference (its engine has no joins at all —
README.md:190-200 routes every SELECT to single-measurement merge), but
core capability for a time-series engine: "latest reading at or before t"
(as-of) and activity sessionization are the two canonical event-table ops.

Both are expressed as compositions of built-in DataFrame ops (no UDFs):

- as-of join = union both sides with a side marker, then one window per
  key ordered by (time, side) carrying the last-seen right-side value
  forward. ONE shuffle on the `by` keys; no range explosion, no
  per-row probing. This is the standard distributed as-of shape (vs. the
  naive time-range join which is quadratic per key).
- sessionize = lag + running sum over the same per-key window: a session
  break is `time - lag(time) > gap`; the session id is the running count
  of breaks. One shuffle, two windows sharing one sort.

Scale: the window partitions by the join/session keys (user, series, ...)
— high-cardinality by construction in event data, so no single-partition
funnel; skewed keys fall to AQE skew handling. State per key is O(1)
(last value carried), unlike a buffered range join.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str = "time",
              by: Sequence[str] = ("user_id",),
              value_cols: Sequence[str] = ("value",),
              tolerance: int | None = None,
              prefix: str = "r_") -> DataFrame:
    """For each left row, the most recent right row with
    right.on <= left.on (inclusive), matched per `by` key.

    `tolerance` (same unit as `on`, ns by convention) nulls out matches
    older than `on - tolerance`. Output = left columns + `{prefix}{on}`
    (the matched right time) + `{prefix}{v}` for each value column.

    Right rows must be unique per (by, on) — pre-aggregate otherwise —
    so the carried value is deterministic on any partitioning.
    """
    by = list(by)
    value_cols = list(value_cols)
    rv = [f"__rv_{v}" for v in value_cols]
    r = right.select(
        *by, F.col(on),
        *[F.col(v).alias(a) for v, a in zip(value_cols, rv)],
    ).withColumn("__side", F.lit(0))
    l = left.withColumn("__side", F.lit(1))
    for v, a in zip(value_cols, rv):
        l = l.withColumn(a, F.lit(None).cast(dict(r.dtypes)[a]))
    # right rows carry nulls for left-only columns
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    u = l.unionByName(r.select(*l.columns))
    # side=0 sorts before side=1 at equal time → inclusive (>=) semantics
    w = (Window.partitionBy(*by)
         .orderBy(F.col(on).asc(), F.col("__side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    r_time = F.last(F.when(F.col("__side") == 0, F.col(on)),
                    ignorenulls=True).over(w)
    out = u.withColumn(f"{prefix}{on}", r_time)
    for v, a in zip(value_cols, rv):
        out = out.withColumn(
            f"{prefix}{v}",
            F.last(F.when(F.col("__side") == 0, F.col(a)),
                   ignorenulls=True).over(w))
    out = out.where(F.col("__side") == 1).drop("__side", *rv)
    if tolerance is not None:
        in_tol = F.col(f"{prefix}{on}") >= F.col(on) - F.lit(tolerance)
        for c in [f"{prefix}{v}" for v in value_cols] + [f"{prefix}{on}"]:
            out = out.withColumn(c, F.when(in_tol, F.col(c)))
    return out


def interval_join(points: DataFrame, intervals: DataFrame,
                  on: str = "time", by: Sequence[str] = (),
                  start_col: str = "t_start", end_col: str = "t_end",
                  bucket: int | None = None) -> DataFrame:
    """Point-in-interval containment join (events ↔ sessions, readings ↔
    maintenance windows, ...).

    Two scale-safe plans, chosen by whether shared keys exist:

    - `by` keys: plain equi-join on the keys with the containment range as
      a post-filter — a hash join, never a cartesian; per-key interval
      counts bound the filter fan-out.
    - keyless (same unit as `on`): each interval explodes to the time
      buckets it covers and each point maps to its bucket, turning the
      range join into an equi-join on the bucket key + filter. Bucket
      keys use exact long arithmetic (`t - t % bucket`), NOT float
      division — ns epochs don't fit a double mantissa.

    Keyless bucket sizing: when `bucket` is not given it is derived from
    the interval-length distribution — the p99 length (one tiny agg over
    the intervals; a single scalar reaches the driver). A width near the
    *typical* length (mean/median) explodes each of the few long-tail
    intervals into `len/bucket` bucket rows — at 100 TB a handful of
    month-long maintenance windows over a 1 s median would fan out ~2.6 M
    rows EACH. At p99, 99% of intervals emit 1-2 bucket rows and only the
    top 1% fan out at all, with ratio bounded by max_len/p99; the cost is
    a proportionally coarser filter per bucket, which the post-join range
    predicate absorbs. Pass `bucket` explicitly to override.

    A point matching k overlapping intervals emits k rows (standard
    containment-join semantics; disjoint intervals ⇒ ≤1).
    """
    if by:
        cond = [points[c] == intervals[c] for c in by] + [
            points[on] >= intervals[start_col],
            points[on] <= intervals[end_col]]
        return points.join(intervals, cond).drop(*[intervals[c] for c in by])
    if bucket is None:
        row = intervals.select(F.percentile_approx(
            F.col(end_col) - F.col(start_col), 0.99, 10_000).alias("p99")
        ).first()
        bucket = max(int(row["p99"] or 0), 1)
    b = F.lit(bucket)
    iv = intervals.withColumn(
        "__bkt", F.explode(F.sequence(
            F.col(start_col) - F.col(start_col) % b,
            F.col(end_col) - F.col(end_col) % b, b)))
    pt = points.withColumn("__bkt", F.col(on) - F.col(on) % b)
    return (pt.join(iv, [pt["__bkt"] == iv["__bkt"],
                         pt[on] >= iv[start_col], pt[on] <= iv[end_col]])
            .drop("__bkt"))


def sessionize(df: DataFrame, on: str = "time",
               by: Sequence[str] = ("user_id",),
               gap: int = 3_600_000_000_000,
               out: str = "session_id") -> DataFrame:
    """Assign per-key session ids: a new session starts when the gap to
    the previous event exceeds `gap` (ns). Ids are 1-based and contiguous
    per key."""
    by = list(by)
    w = Window.partitionBy(*by).orderBy(on)
    prev = F.lag(on).over(w)
    is_new = F.when(prev.isNull() | (F.col(on) - prev > F.lit(gap)),
                    F.lit(1)).otherwise(F.lit(0))
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(out, F.sum(is_new).over(wcum))


def session_stats(df: DataFrame, on: str = "time",
                  by: Sequence[str] = ("user_id",),
                  gap: int = 3_600_000_000_000) -> DataFrame:
    """Sessionize then collapse to one row per session:
    (by..., session_id, n_events, t_start, t_end, duration)."""
    by = list(by)
    s = sessionize(df, on=on, by=by, gap=gap)
    return (s.groupBy(*by, "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min(on).alias("t_start"),
                 F.max(on).alias("t_end"))
            .withColumn("duration", F.col("t_end") - F.col("t_start")))


def m4_downsample(df: DataFrame, on: str = "time",
                  by: Sequence[str] = ("event_type",),
                  value_col: str = "value",
                  interval_ns: int = 3_600_000_000_000) -> DataFrame:
    """M4 downsampling: per (series, time bucket) keep min, max, first and
    last values — the standard error-free line-chart reduction (the M4
    aggregation of Jugel et al., PVLDB 2014: those four points are exactly
    what a pixel column of a line plot needs).

    Scale shape: one groupBy on (series, bucket) — partial aggregation
    does min/max/first/last map-side, the exchange carries four scalars
    per group, and the output is |series|·|buckets| rows regardless of
    input volume. first/last are min_by/max_by on the timestamp
    (deterministic whenever (series, time) is unique — the engine's
    dedup_points invariant).
    """
    by = list(by)
    b = F.col(on) - F.pmod(F.col(on), F.lit(interval_ns))
    return (df.groupBy(*by, b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(value_col).alias("v_min"),
                 F.max(value_col).alias("v_max"),
                 F.min_by(value_col, F.col(on)).alias("v_first"),
                 F.max_by(value_col, F.col(on)).alias("v_last")))


def lttb_downsample(df: DataFrame, on: str = "time",
                    by: Sequence[str] = ("event_type",),
                    value_col: str = "value", n_out: int = 64) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013):
    keep the first and last point of each series plus, per bucket, the
    point forming the largest triangle with the previously selected
    point and the next bucket's average — the visually-faithful
    downsample M4 can't give (M4 preserves extremes, LTTB preserves
    shape). Series shorter than `n_out` pass through unchanged.

    The selection recurrence is inherently sequential PER SERIES (each
    pick depends on the previous one), so it runs in applyInPandas
    grouped by the series tags — series are the parallelism unit, the
    same distribution contract as holt_winters. Floating-point order is
    pinned (sequential time-ordered folds for bucket averages, the
    spec's exact area expression) so the DuckDB recursive-CTE oracle
    reproduces the selection bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    by = list(by)
    schema = ", ".join([f"`{c}` string" for c in by]
                       + [f"`{on}` long", f"`{value_col}` double"])

    def reduce(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values(on)
        ts = pdf[on].to_numpy(dtype=np.int64)
        vs = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(ts)
        keys = [pdf.iloc[0][c] for c in by]
        if n <= n_out:
            return pd.DataFrame(
                [keys + [int(t), float(v)] for t, v in zip(ts, vs)],
                columns=by + [on, value_col])
        B = n_out - 2
        mid_t, mid_v = ts[1:-1], vs[1:-1]
        n_mid = n - 2
        bks = np.minimum(B, 1 + (np.arange(n_mid) * B) // n_mid)
        idxs, ax, ay = {}, {}, {}
        for b in range(1, B + 1):
            sel = np.nonzero(bks == b)[0]
            idxs[b] = sel
            sx = np.float64(0.0)
            sy = np.float64(0.0)
            for i in sel:                     # sequential time-ordered fold
                sx += np.float64(mid_t[i])    # = DuckDB list_reduce over
                sy += np.float64(mid_v[i])    #   list(x ORDER BY t)
            ax[b], ay[b] = sx / len(sel), sy / len(sel)
        anchors = {b: (ax[b + 1], ay[b + 1]) for b in range(1, B)}
        anchors[B] = (np.float64(ts[-1]), np.float64(vs[-1]))
        rows = [(int(ts[0]), float(vs[0]))]
        st, sv = int(ts[0]), np.float64(vs[0])
        for b in range(1, B + 1):
            axb, ayb = anchors[b]
            std = np.float64(st)
            best, best_area = None, np.float64(-1.0)
            for i in idxs[b]:                 # first max = earliest time
                # Steinarsson's triangle area (×2): with a = previous pick
                # (st, sv), b = candidate, c = next-bucket anchor:
                # |(a.x-c.x)(b.y-a.y) - (a.x-b.x)(c.y-a.y)| — the second
                # factor is (c.y - a.y); a sign flip there stops being a
                # triangle area (a candidate collinear with a and c would
                # score maximal instead of zero).
                area = abs((std - axb) * (np.float64(mid_v[i]) - sv)
                           - np.float64(st - int(mid_t[i])) * (ayb - sv))
                if area > best_area:
                    best_area, best = area, i
            st, sv = int(mid_t[best]), np.float64(mid_v[best])
            rows.append((st, float(sv)))
        rows.append((int(ts[-1]), float(vs[-1])))
        return pd.DataFrame([keys + [t, v] for t, v in rows],
                            columns=by + [on, value_col])

    return df.groupBy(*by).applyInPandas(reduce, schema)


def seasonal_decompose(df: DataFrame, on: str = "time",
                       by: Sequence[str] = ("event_type",),
                       value_col: str = "value",
                       bucket_ns: int = 3_600_000_000_000,
                       period: int = 24) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    method of Macaulay 1931, the `decompose()` of every stats stack):
    bucket the series, estimate trend with a centered (period+1)-point
    moving average (NULL where the window is incomplete — no padding
    invention), seasonal as the per-phase mean of the detrended values,
    residual as what's left. value = trend + seasonal + resid on every
    fully-windowed row.

    Determinism for the cross-engine gate: per-bucket and per-phase
    means accumulate in DECIMAL (order-free — a double sum's value
    depends on partition order), window trend rounds at 4 (the
    tr_moving_average convention), and all downstream arithmetic runs
    on the rounded doubles, so both engines chain identical bits.

    Shape at scale: one groupBy on (series, bucket) — output is
    |series|·|buckets| regardless of input volume — then a per-series
    window sort and a per-(series, phase) aggregation whose result
    (|series|·period rows) broadcasts back. The raw stream shuffles
    once, into the bucket aggregation."""
    by = list(by)
    half = period // 2
    # shared gate-critical arithmetic: _fr is the floor-form rounding
    # (a decimal mean lands EXACTLY on .xxx5 boundaries where engine
    # round() disagrees) and _bucket_means the decimal bucket-mean
    # stage — ONE definition each, shared with acf/cross_correlate/
    # linear_trend so the cross-engine bit-stability contract cannot
    # drift between copies (r5 review)
    _r = _fr
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    if not by:
        # an ungrouped call makes the trend window keyless (single-task
        # global sort over the bucket table) — same funnel class the
        # recurrence family caps, so reuse its loud-failure guard; the
        # probe's materialized partitions are cached for the real run
        from ..functions.transforms import _guard_ungrouped_recurrence
        g = _guard_ungrouped_recurrence(g, "bucket", "seasonal_decompose")
    w = Window.partitionBy(*by).orderBy("bucket")
    wf = w.rowsBetween(-half, half)
    # decimal window sum, not avg: a double window-avg's value depends on
    # the engine's frame summation order (sliding vs recompute) — 3 of
    # ~5k rows flipped at the round-4 boundary in testing
    tsum = F.sum(F.col("v").cast("decimal(28,6)")).over(wf).cast("double")
    trend = F.when(F.count("v").over(wf) == 2 * half + 1,
                   _r(tsum / F.lit(float(2 * half + 1)), 4))
    t = g.select(*by, "bucket", "v", trend.alias("trend"))
    phase = F.pmod(F.expr(f"bucket div {bucket_ns}"), F.lit(period))
    det = (F.col("v") - F.col("trend")).cast("decimal(28,10)")
    s = (t.where(F.col("trend").isNotNull())
         .groupBy(*by, phase.alias("__ph"))
         .agg(_r(F.sum(det).cast("double") / F.count(F.lit(1)), 4)
              .alias("seasonal")))
    out = (t.withColumn("__ph", phase)
           .join(F.broadcast(s), [*by, "__ph"], "left"))
    return out.select(
        *by, "bucket", "v", "trend", "seasonal",
        _r(F.col("v") - F.col("trend") - F.col("seasonal"), 4)
        .alias("resid"))


def mad_profile(df: DataFrame, by: Sequence[str] = ("event_type",),
                value_col: str = "value") -> DataFrame:
    """Per-series robust location/scale: median + MAD (2 doubles per
    series) — the train half of both `mad_outliers` and the streaming
    Hampel filter (streaming/outlier_stream.py). Two `by`-keyed
    aggregations; the second carries the median through `first()` so no
    third aggregation is needed to pair them (r5 review fix)."""
    by = list(by)
    med = df.groupBy(*by).agg(F.median(value_col).alias("med"))
    return (df.join(F.broadcast(med), by)
            .groupBy(*by)
            .agg(F.first("med").alias("med"),
                 F.median(F.abs(F.col(value_col) - F.col("med")))
                 .alias("mad")))


def mad_score(value: "F.Column", med: "F.Column", mad: "F.Column",
              threshold: float = 3.5) -> tuple:
    """(robust_z, is_outlier) column pair for the Iglewicz–Hoaglin
    modified z-score Mi = 0.6745·(x − median)/MAD — the single shared
    definition for the batch operator and the streaming twin. MAD = 0 ⇒
    NULL score, nothing flagged (the Hampel convention).

    Floor-form rounding, NOT F.round (r6, hypothesis-found): medians of
    integer-valued data are nice decimals, so 0.6745·(x−med)/mad lands
    on .xxxxxx5 SHORTEST-REPR boundaries (e.g. 0.6745·(−0.5)/4 reprs as
    -0.0843125 while the true double sits just below) — Spark's round()
    HALF_UPs the shortest string repr where DuckDB rounds the actual
    double, a one-ulp-class cross-engine flip _fr exists to kill."""
    z = F.when(mad > 0, _fr(F.lit(0.6745) * (value - med) / mad, 6))
    return z, F.coalesce(F.abs(z) > threshold, F.lit(False))


def mad_outliers(df: DataFrame, on: str = "time",
                 by: Sequence[str] = ("event_type",),
                 value_col: str = "value",
                 threshold: float = 3.5) -> DataFrame:
    """Robust per-series outlier detection via the modified z-score
    (Iglewicz & Hoaglin 1993): Mi = 0.6745·(xi − median) / MAD, flagging
    |Mi| > threshold (their recommended 3.5). Median/MAD are immune to
    the outliers they detect, unlike mean/stddev z-scores where one
    spike inflates sigma and masks itself.

    Shape: `mad_profile`'s two per-series aggregations — both shuffle on
    the `by` keys only — and the per-series summary (2 doubles)
    broadcasts back onto the scan, so the event stream itself shuffles
    zero times. Exact `median` implies a per-group sort at scale; swap
    in percentile_approx(…, 0.5) for the 100 TB path exactly as
    agg_median documents.
    """
    by = list(by)
    stats = mad_profile(df, by, value_col)
    z, flag = mad_score(F.col(value_col), F.col("med"), F.col("mad"),
                        threshold)
    return (df.join(F.broadcast(stats), by)
            .select(*by, F.col(on), F.col(value_col),
                    z.alias("robust_z"), flag.alias("is_outlier")))


def deadman(df: DataFrame, by: Sequence[str] = ("event_type",),
            on: str = "time", threshold_ns: int = 30 * 60 * 10 ** 9,
            now_ns: int | None = None) -> DataFrame:
    """Per-series liveness — the classic InfluxDB/Kapacitor "deadman"
    check (a monitor alerting when a series stops reporting; the
    reference proxies such queries but has no alerting op — added
    scope). A series is `dead` when its newest point is older than
    `threshold_ns` relative to `now_ns`.

    `now_ns=None` anchors "now" at the GLOBAL newest point — the
    deterministic, replayable form the contract gate uses (wall-clock
    now is not replayable); production monitors pass wall-clock ns.

    Shape: one groupBy on the series keys (partial max/count map-side),
    plus — only in the anchored form — a 1-row global-max aggregate
    broadcast onto the per-series rows. Nothing else moves; at 100 TB
    the parquet max-statistics prune most of the scan for the global
    max.
    """
    by = list(by)
    last = df.groupBy(by).agg(F.max(on).alias("last_time"),
                              F.count(F.lit(1)).alias("n_points"))
    if now_ns is None:
        now = df.agg(F.max(on).alias("__now"))
        last = last.crossJoin(F.broadcast(now))
    else:
        last = last.withColumn("__now", F.lit(now_ns))
    return (last.select(*by, "last_time", "n_points",
                        (F.col("__now") - F.col("last_time"))
                        .alias("age_ns"))
            .withColumn("dead", F.col("age_ns") > F.lit(threshold_ns)))


def gap_report(df: DataFrame, by: Sequence[str] = ("event_type",),
               on: str = "time",
               min_gap_ns: int = 2 * 3600 * 10 ** 9) -> DataFrame:
    """Report every silence longer than `min_gap_ns` inside each series'
    history: (gap_start, gap_end, gap_ns) per offending interval — the
    historical complement of `deadman` (which only checks the newest
    point). One lag over the per-series time window; same single-shuffle
    shape as sessionize, whose gap test this reuses semantically.
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(on)
    prev = F.lag(on).over(w)
    return (df.select(*by, prev.alias("gap_start"),
                      F.col(on).alias("gap_end"))
            .where(F.col("gap_start").isNotNull()
                   & (F.col("gap_end") - F.col("gap_start")
                      > F.lit(min_gap_ns)))
            .withColumn("gap_ns", F.col("gap_end") - F.col("gap_start")))


def _fr(c, k: int):
    # floor(x·10^k + 0.5)/10^k — bit-stable cross-engine rounding (the
    # __spark_entry__._fr convention; see seasonal_decompose._r)
    s = 10 ** k
    return F.floor(c * s + F.lit(0.5)) / F.lit(float(s))


def _decimal_mean(col) -> "F.Column":
    """Order-free round-6 mean: decimal-accumulated sum / count, floor-
    form rounded — THE gate-critical mean expression, declared once and
    shared by _bucket_means / acf / cross_correlate / cusum so the
    cross-engine bit-stability contract cannot drift between copies
    (r5 review; the _fr/_bucket_means consolidation precedent)."""
    dsum = F.sum(col.cast("decimal(28,6)")).cast("double")
    return _fr(dsum / F.count(F.lit(1)), 6)


def _bucket_expr(on: str, bucket_ns: int):
    """time -> bucket floor (exact long arithmetic) — THE shared bucket
    expression of the bucketed-series family (_bucket_means) and the
    cohort/DAU operators (retention, active_users), declared once so an
    alignment fix cannot silently diverge them (r7 review; the
    _fr/_bucket_means consolidation precedent)."""
    return F.col(on) - F.pmod(F.col(on), F.lit(bucket_ns))


def _bucket_means(df: DataFrame, on: str, by: list, value_col: str,
                  bucket_ns: int) -> DataFrame:
    """Per-(series, bucket) mean with decimal accumulation + round-6 —
    the shared front stage of seasonal_decompose / acf / cross_correlate.
    ONE shuffle on (by, bucket); output is |series|·|buckets| rows
    regardless of input volume, so everything downstream is sketch-sized.
    """
    b = _bucket_expr(on, bucket_ns)
    return (df.groupBy(*by, b.alias("bucket"))
            .agg(_decimal_mean(F.col(value_col)).alias("v")))


def acf(df: DataFrame, on: str = "time",
        by: Sequence[str] = ("event_type",), value_col: str = "value",
        bucket_ns: int = 3_600_000_000_000, max_lag: int = 12) -> DataFrame:
    """Sample autocorrelation function per series: bucket the raw points
    to per-interval means, then for every lag l in 1..max_lag compute the
    standard biased-estimator ACF (Box & Jenkins 1970, the `acf()` of
    every stats stack) over the bucketed sequence in ROW order:

        r_l = sum_t (x_t - mean)(x_{t+l} - mean) / sum_t (x_t - mean)^2

    Row-order lag (not wall-clock lag): on a gap-free grid they agree;
    across gaps this matches statsmodels' treatment of the series as a
    plain sequence. Gaps that must break pairs belong to cross_correlate,
    which aligns by bucket arithmetic instead.

    Determinism for the cross-engine gate: bucket means are decimal-
    accumulated and rounded at 6 (see _bucket_means); the per-series mean
    is the same decimal/round-6 form; each centered product is cast to
    DECIMAL(28,10) so the lag/denominator sums are order-free; the final
    ratio rounds at 6.

    Lags longer than a series' bucket count emit no row for that
    (series, lag) — absent, not NULL — matching the oracle's join.

    Shape at scale: the raw stream shuffles once into the bucket agg.
    The per-series mean is a |series|-row broadcast join; the lag pairing
    is a self-join of the bucket table on (series, rn+l) — sketch-sized
    (|series|·|buckets|·max_lag rows), shuffled on the series key, never
    the raw data. No keyless window: rn partitions by series.
    """
    by = list(by)
    if not by:
        raise ValueError("acf requires at least one series key: an "
                         "ungrouped call would sort every bucket through "
                         "one task (the recurrence-guard funnel class)")
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    return _acf_core(g, by, max_lag)


def _acf_core(g: DataFrame, by: list, max_lag: int) -> DataFrame:
    """acf's post-bucket pipeline over a _bucket_means table — factored
    out (r8) so ljung_box can share ONE bucket shuffle with acf instead
    of re-scanning the raw stream; the expressions are byte-identical
    to the pre-refactor acf body (plan fingerprints unchanged)."""
    mean = g.groupBy(*by).agg(_decimal_mean(F.col("v")).alias("xbar"))
    w = Window.partitionBy(*by).orderBy("bucket")
    r = (g.join(F.broadcast(mean), by)
         .select(*by, "xbar", F.row_number().over(w).alias("rn"),
                 (F.col("v") - F.col("xbar")).alias("c")))
    lags = F.explode(F.sequence(F.lit(1), F.lit(max_lag))).alias("lag")
    a = r.select(*by, "rn", "c", lags)
    bwd = r.select(*[F.col(k).alias(f"__b_{k}") for k in by],
                   F.col("rn").alias("__b_rn"), F.col("c").alias("__b_c"))
    pairs = a.join(bwd, [a[k] == bwd[f"__b_{k}"] for k in by]
                   + [(a["rn"] + a["lag"]) == bwd["__b_rn"]])
    num = (pairs.groupBy(*by, "lag")
           .agg(F.sum((F.col("c") * F.col("__b_c"))
                      .cast("decimal(28,10)")).cast("double").alias("num"),
                F.count(F.lit(1)).alias("n_pairs")))
    den = (r.groupBy(*by)
           .agg(F.sum((F.col("c") * F.col("c"))
                      .cast("decimal(28,10)")).cast("double").alias("den")))
    # den = 0 (constant series): Spark's non-ANSI divide yields NULL but
    # DuckDB's IEEE 0/0 yields NaN — guard to 0.0 on both engines
    # (linear_trend's denx convention; r5 review)
    r = F.when(F.col("den") > 0,
               _fr(F.col("num") / F.col("den"), 6)).otherwise(F.lit(0.0))
    return (num.join(F.broadcast(den), by)
            .select(*by, "lag", "n_pairs", r.alias("acf")))


# chi-square 95th-percentile quantiles for df = 1..12 (the standard
# published table values, 6 dp — Abramowitz & Stegun 1964 table 26.8
# lineage): inlined as literals in BOTH engines so the Ljung-Box
# decision is one float compare on pinned-rounding operands (the
# ts_trend |z| > 1.959964 precedent)
CHI2_95 = {1: 3.841459, 2: 5.991465, 3: 7.814728, 4: 9.487729,
           5: 11.070498, 6: 12.591587, 7: 14.067140, 8: 15.507313,
           9: 16.918978, 10: 18.307038, 11: 19.675138, 12: 21.026070}


def ljung_box(df: DataFrame, on: str = "time",
              by: Sequence[str] = ("event_type",),
              value_col: str = "value",
              bucket_ns: int = 3_600_000_000_000,
              max_lag: int = 12) -> DataFrame:
    """Ljung–Box portmanteau whiteness test per series (Ljung & Box
    1978 — "is anything left in the residuals": the standard companion
    of acf in every forecasting stack):

        Q = n(n+2) · Σ_{k=1..h}  r_k² / (n−k)

    over the hourly bucket-mean sequence, h = min(max_lag, n−1) lags
    actually available, with the 5% decision Q > χ²_{0.95,h}. Rejecting
    (white=false…rejected=true) means the series is NOT white noise —
    autocorrelation structure remains.

    Determinism for the cross-engine gate: r_k comes from the shared
    acf core (round-6, gate-hardened since r4); each Q term
    r_k²/(n−k) is a float of two pinned operands cast to
    DECIMAL(28,18) so the h-term sum is order-free; Q rounds at 6; the
    χ² thresholds are per-h literals from the published table, inlined
    identically in the oracle (CASE) and here (create_map).

    Output-cardinality == |series| (the r6 family convention): a series
    with < 2 buckets has no lags — it reports h=0, NULL q,
    rejected=false, never a silent drop.

    Shape at scale: ONE raw shuffle (the shared _bucket_means stage);
    everything downstream — acf core, per-series Q fold, the
    |series|-row count join — is sketch-sized. No extra scan vs acf
    alone.
    """
    by = list(by)
    if not by:
        raise ValueError("ljung_box requires at least one series key")
    if not 1 <= max_lag <= max(CHI2_95):
        raise ValueError(f"ljung_box: max_lag {max_lag} outside the "
                         f"inlined chi-square table (1..{max(CHI2_95)}); "
                         "extend CHI2_95 to raise it")
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    counts = g.groupBy(*by).agg(F.count(F.lit(1)).alias("n_buckets"))
    r = _acf_core(g, by, max_lag).select(*by, "lag", "acf")
    t = r.join(F.broadcast(counts), by)
    term = ((F.col("acf") * F.col("acf"))
            / (F.col("n_buckets") - F.col("lag")).cast("double")
            ).cast("decimal(28,18)")
    per = (t.groupBy(*by)
           .agg(F.max("n_buckets").alias("__n"),
                F.count(F.lit(1)).alias("h"),
                F.sum(term).alias("__s")))
    chi2 = F.create_map(*[x for k, v in sorted(CHI2_95.items())
                          for x in (F.lit(k).cast("long"), F.lit(v))])
    q = _fr((F.col("__n") * (F.col("__n") + 2)).cast("double")
            * F.col("__s").cast("double"), 6)
    scored = per.select(
        *by, "h", q.alias("q"),
        (q > F.element_at(chi2, F.col("h").cast("long")))
        .alias("rejected"))
    return (counts.join(scored, by, "left")
            .select(*by, "n_buckets",
                    F.coalesce(F.col("h"), F.lit(0)).cast("long").alias("h"),
                    "q",
                    F.coalesce(F.col("rejected"), F.lit(False))
                    .alias("rejected")))


def cross_correlate(df: DataFrame, series_a: str, series_b: str,
                    key_col: str = "event_type", on: str = "time",
                    value_col: str = "value",
                    bucket_ns: int = 3_600_000_000_000,
                    max_lag: int = 6) -> DataFrame:
    """Lagged cross-correlation between two named series: bucket both to
    per-interval means, align by BUCKET ARITHMETIC (series b shifted by
    l·bucket_ns — a wall-clock lag, so gaps break pairs instead of
    silently sliding, unlike acf's row lag), and for every lag l in
    -max_lag..max_lag compute the Pearson-style normalized cross-
    correlation over the overlap:

        r_l = sum_t (a_t - abar)(b_{t+l} - bbar)
              / sqrt(sum (a - abar)^2) / sqrt(sum (b - bbar)^2)

    with each series' mean/denominator taken over its FULL bucketed
    history (the signal-processing normalization, constant across lags —
    lag peaks stay comparable; documented contract).

    Determinism: decimal bucket means round-6, decimal product sums,
    IEEE-exact sqrt (correctly rounded in both engines), final round-6.

    Shape at scale: one bucket-agg shuffle over the filtered pair of
    series; the lagged self-join runs on the sketch-sized bucket table
    keyed by shifted bucket; means/denoms are scalar broadcasts.
    """
    g = _bucket_means(
        df.where(F.col(key_col).isin([series_a, series_b])),
        on, [key_col], value_col, bucket_ns)
    stats = (g.groupBy(key_col)
             .agg(_decimal_mean(F.col("v")).alias("xbar")))
    c = (g.join(F.broadcast(stats), key_col)
         .select(key_col, "bucket", (F.col("v") - F.col("xbar")).alias("c")))
    den = (c.groupBy(key_col)
           .agg(F.sqrt(F.sum((F.col("c") * F.col("c"))
                             .cast("decimal(28,10)")).cast("double"))
                .alias("den")))
    # lag fan-out via explode (13 rows per a-bucket), not a nested-loop
    # join; the b side shifts by bucket arithmetic so the equi-join key
    # stays hashable
    ca = (c.where(F.col(key_col) == series_a)
          .select(F.col("bucket").alias("ab"), F.col("c").alias("ac"),
                  F.explode(F.sequence(F.lit(-max_lag), F.lit(max_lag)))
                  .alias("lag")))
    cb = c.where(F.col(key_col) == series_b).select(
        F.col("bucket").alias("bb"), F.col("c").alias("bc"))
    pairs = ca.join(cb, F.col("bb") == F.col("ab")
                    + F.col("lag").cast("long") * F.lit(bucket_ns))
    num = (pairs.groupBy("lag")
           .agg(F.sum((F.col("ac") * F.col("bc"))
                      .cast("decimal(28,10)")).cast("double").alias("num"),
                F.count(F.lit(1)).alias("n_pairs")))
    # scalar denominators: 1-row broadcast nested-loop joins onto the
    # (2·max_lag+1)-row lag table — bounded by construction and
    # allowlisted in explain_audit (constant-key equi-joins constant-fold
    # to the same plan anyway)
    da = den.where(F.col(key_col) == series_a).select(
        F.col("den").alias("den_a"))
    db = den.where(F.col(key_col) == series_b).select(
        F.col("den").alias("den_b"))
    # constant series => den 0: guard to 0.0 (see acf; r5 review)
    r = F.when((F.col("den_a") > 0) & (F.col("den_b") > 0),
               _fr(F.col("num") / F.col("den_a") / F.col("den_b"), 6)
               ).otherwise(F.lit(0.0))
    return (num.crossJoin(F.broadcast(da)).crossJoin(F.broadcast(db))
            .select("lag", "n_pairs", r.alias("xcorr")))


def _cusum_step(sp: float, sn: float, alarm: bool, x: float, mu: float,
                k: float, h: float):
    """One two-sided CUSUM update with the pinned float operand order
    shared by the batch operator, the streaming twin
    (streaming/cusum_stream.py) and — by replay — the recursive-CTE
    oracle. Keeping the arithmetic in ONE place is what makes the
    batch/streaming equivalence test meaningful (the shared-MAD-profile
    precedent, outlier_stream.py)."""
    if alarm:
        sp = sn = 0.0
    up = sp + (x - mu - k)
    dn = sn + (mu - x - k)
    sp = up if up > 0.0 else 0.0
    sn = dn if dn > 0.0 else 0.0
    return sp, sn, sp > h or sn > h


def cusum(df: DataFrame, on: str = "time",
          by: Sequence[str] = ("event_type",), value_col: str = "value",
          slack: float = 25.0, threshold: float = 250.0,
          target: float | None = None) -> DataFrame:
    """Two-sided CUSUM mean-shift detection (Page 1954, the tabular
    CUSUM of every SPC text): per series ordered by time,

        S+_t = max(0, S+_{t-1} + (x_t - mu - slack))
        S-_t = max(0, S-_{t-1} + (mu - x_t - slack))

    alarm when either side exceeds `threshold`; on alarm BOTH sides
    reset (the standard restart), so each alarm marks a fresh detection
    rather than one saturated excursion. `target` mu defaults to the
    per-series decimal-accumulated round-6 mean (the ts_decompose
    convention), the retrospective form; online deployments pass the
    in-control mean explicitly.

    The recurrence is inherently sequential per series, so like the
    EMA family it runs in applyInPandas with a pinned float64 operand
    order ((x - mu) - slack; max via Python's float compare) that the
    DuckDB recursive-CTE oracle replays bit-for-bit. Ungrouped calls
    hit the shared recurrence guard.

    Shape at scale: one |series|-row mean agg broadcast back, then one
    shuffle into the per-series Arrow groups; state is two floats.
    """
    import pandas as pd

    by = list(by)
    if target is None:
        mu_df = (df.where(F.col(value_col).isNotNull())
                 .groupBy(*by)
                 .agg(_decimal_mean(F.col(value_col)).alias("__mu")))
        src = df.join(F.broadcast(mu_df), by)
    else:
        src = df.withColumn("__mu", F.lit(float(target)))
    schema = ", ".join([f"`{c}` string" for c in by]
                       + [f"`{on}` long", "`s_pos` double",
                          "`s_neg` double", "`alarm` boolean"])
    k, h = float(slack), float(threshold)

    def run(pdf: "pd.DataFrame") -> "pd.DataFrame":
        # value as the secondary key pins duplicate timestamps: after
        # (time, value) ordering any remaining ties are equal-x rows,
        # whose fold order cannot change the carry (r5 review; the
        # oracle's row_number orders the same way)
        pdf = pdf.dropna(subset=[value_col]).sort_values([on, value_col])
        keys = [pdf.iloc[0][c] for c in by] if len(pdf) else []
        mu = float(pdf.iloc[0]["__mu"]) if len(pdf) else 0.0
        rows = []
        sp = sn = 0.0
        alarm = False
        for t, x in zip(pdf[on], (float(v) for v in pdf[value_col])):
            sp, sn, alarm = _cusum_step(sp, sn, alarm, x, mu, k, h)
            rows.append(keys + [int(t), sp, sn, alarm])
        return pd.DataFrame(rows, columns=by + [on, "s_pos", "s_neg",
                                                "alarm"])

    if not by:
        from ..functions.transforms import _guard_ungrouped_recurrence
        src = _guard_ungrouped_recurrence(src, on, "cusum")
    return src.groupBy(*by).applyInPandas(run, schema)


def linear_trend(df: DataFrame, on: str = "time",
                 by: Sequence[str] = ("event_type",),
                 value_col: str = "value",
                 bucket_ns: int = 3_600_000_000_000) -> DataFrame:
    """Per-series ordinary-least-squares linear trend over bucketed
    means — the 'is this metric drifting' diagnostic (and the internals
    of every HOLT_WINTERS-style trend seed):

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)     [per bucket step]
        intercept = (Sy - slope*Sx) / n               [at the first bucket]
        r2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)*(n*Syy - Sy^2))

    x is the per-series bucket INDEX ((bucket - min_bucket)/bucket_ns —
    small exact integers; raw ns epochs squared overflow any decimal), so
    every moment accumulates exactly in DECIMAL and the closed forms are
    pure arithmetic over identical doubles on both engines — this is a
    HASH-gated regression, not a structural one. Constant series
    (zero variance) report r2 = 0.

    Shape at scale: the raw stream shuffles once into the bucket agg
    (shared _bucket_means); the OLS is ONE more aggregation over the
    sketch-sized bucket table + a broadcast join of the |series|-row
    min-bucket table. Output is |series| rows.
    """
    by = list(by)
    if not by:
        raise ValueError("linear_trend requires at least one series key")
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    mn = g.groupBy(*by).agg(F.min("bucket").alias("__b0"))
    # integer `div`, NOT double division: a span past 2^53 ns (~104 days)
    # would round in the long->double conversion and truncate the index
    # off-by-one, diverging from the oracle's exact `//` (r5 review)
    x = F.expr(f"(bucket - __b0) div {int(bucket_ns)}")
    d = (g.join(F.broadcast(mn), by)
         .select(*by, x.alias("x"), F.col("v")))

    def dsum(c):
        return F.sum(c.cast("decimal(28,10)")).cast("double")

    mo = (d.groupBy(*by)
          .agg(F.count(F.lit(1)).cast("double").alias("n"),
               dsum(F.col("x").cast("double")).alias("sx"),
               dsum((F.col("x") * F.col("x")).cast("double")).alias("sxx"),
               dsum(F.col("v")).alias("sy"),
               dsum(F.col("v") * F.col("v")).alias("syy"),
               dsum(F.col("x").cast("double") * F.col("v")).alias("sxy")))
    num = mo["n"] * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = mo["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = mo["n"] * F.col("syy") - F.col("sy") * F.col("sy")
    slope = F.when(denx > 0, num / denx).otherwise(F.lit(0.0))
    r2 = F.when((denx > 0) & (deny > 0),
                (num / denx) * (num / deny)).otherwise(F.lit(0.0))
    return mo.select(
        *by, F.col("n").cast("bigint").alias("n_buckets"),
        _fr(slope, 6).alias("slope_per_bucket"),
        _fr((F.col("sy") - slope * F.col("sx")) / mo["n"], 6)
        .alias("intercept"),
        _fr(r2, 6).alias("r2"))


def theil_sen_trend(df: DataFrame, on: str = "time",
                    by: Sequence[str] = ("event_type",),
                    value_col: str = "value",
                    bucket_ns: int = 3_600_000_000_000,
                    max_buckets: int = 4096) -> DataFrame:
    """Theil–Sen robust trend per series (Theil 1950 / Sen 1968 — the
    median of all pairwise slopes, the estimator of choice when OLS'
    squared loss would let outliers steer the fit; up to ~29% of points
    can be arbitrary before it breaks):

        slope = median over i<j of (v_j - v_i) / (x_j - x_i)
        intercept = median over i of (v_i - slope * x_i)

    computed over the bucketed means, with x the exact integer bucket
    step (`div`, the linear_trend convention). The pairwise stage is
    quadratic IN BUCKETS, never in raw rows — B≈720 hourly buckets is
    ~260k pairs per series — and a loud cap (`max_buckets`, the
    recurrence-guard convention) refuses series whose bucket count
    would explode the pair join; coarsen bucket_ns instead.

    Determinism: bucket means are round-6 (shared _bucket_means), each
    pair slope is one identical double division on both engines, both
    medians are the interpolating exact median (Spark F.median /
    DuckDB median — (a+b)/2 of the two middles, the mad_outliers
    parity), slope rounds at 6 BEFORE the intercept residuals so the
    chained arithmetic matches bit-for-bit.

    Shape at scale: one bucket-agg shuffle over the raw stream; the
    pair join and both medians run on the sketch-sized bucket table,
    keyed by series (equi-join + range filter — never cartesian).
    """
    by = list(by)
    if not by:
        raise ValueError("theil_sen_trend requires at least one series key")
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    counts = g.groupBy(*by).agg(F.count(F.lit(1)).alias("__n"))
    over = counts.where(F.col("__n") > max_buckets).limit(1).collect()
    if over:
        raise ValueError(
            f"theil_sen_trend: a series has {over[0]['__n']} buckets "
            f"(cap {max_buckets}); the pairwise stage is quadratic in "
            f"buckets — coarsen bucket_ns or pre-filter the time range")
    a = g.select(*by, F.col("bucket").alias("__ba"), F.col("v").alias("__va"))
    b = g.select(*[F.col(k).alias(f"__b_{k}") for k in by],
                 F.col("bucket").alias("__bb"), F.col("v").alias("__vb"))
    pairs = (a.join(b, [a[k] == b[f"__b_{k}"] for k in by])
             .where(F.col("__bb") > F.col("__ba"))
             .select(*by,
                     ((F.col("__vb") - F.col("__va"))
                      / F.expr(f"cast((__bb - __ba) div {int(bucket_ns)}"
                               f" AS DOUBLE)")).alias("__s")))
    slope = (pairs.groupBy(*by)
             .agg(_fr(F.median("__s"), 6).alias("slope_per_bucket"),
                  F.count(F.lit(1)).alias("n_pairs")))
    mn = g.groupBy(*by).agg(F.min("bucket").alias("__b0"))
    resid = (g.join(F.broadcast(mn), by).join(F.broadcast(slope), by)
             .select(*by, "slope_per_bucket", "n_pairs",
                     (F.col("v") - F.col("slope_per_bucket")
                      * F.expr(f"cast((bucket - __b0) div {int(bucket_ns)}"
                               f" AS DOUBLE)")).alias("__r")))
    res = (resid.groupBy(*by, "slope_per_bucket", "n_pairs")
           .agg(_fr(F.median("__r"), 6).alias("intercept"))
           .select(*by, "n_pairs", "slope_per_bucket", "intercept"))
    # LEFT join back onto the series list (r5 verdict #1): a
    # single-bucket series has no pairs, so the slope aggregate drops
    # it — contract: the row STAYS, with n_pairs=0 and NULL
    # slope/intercept (no slope is estimable from one point; NULL, not
    # a fake 0.0, so downstream can tell "flat" from "unknown")
    return (counts.select(*by)
            .join(res, by, "left")
            .select(*by,
                    F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
                    "slope_per_bucket", "intercept"))


def mann_kendall(df: DataFrame, on: str = "time",
                 by: Sequence[str] = ("event_type",),
                 value_col: str = "value",
                 bucket_ns: int = 3_600_000_000_000,
                 max_buckets: int = 4096) -> DataFrame:
    """Mann–Kendall trend significance test per series (Mann 1945 /
    Kendall 1975 — the standard nonparametric companion of the Theil–Sen
    slope: "is there a monotonic trend at all?"):

        S = sum over i<j of sign(v_j - v_i)
        Var(S) = [n(n-1)(2n+5) - sum_t t(t-1)(2t+5)] / 18   (tie groups t)
        z = (S-1)/sqrt(Var)  if S > 0;  0 if S = 0;  (S+1)/sqrt(Var) else

    EXACT cross-engine by construction: S and the tie correction are
    INTEGER aggregations over round-6 bucket means, Var is one rational
    division, sqrt is IEEE-correctly-rounded — nothing to drift. The
    trend flag applies the two-sided 5% normal cutoff (|z| > 1.959964).

    Same shape and cap as theil_sen_trend: one bucket-agg shuffle, a
    series-keyed pair join quadratic in buckets only, plus one
    tie-group aggregation (|series|·|distinct v| rows).
    """
    by = list(by)
    if not by:
        raise ValueError("mann_kendall requires at least one series key")
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    counts = g.groupBy(*by).agg(F.count(F.lit(1)).alias("n"))
    over = counts.where(F.col("n") > max_buckets).limit(1).collect()
    if over:
        raise ValueError(
            f"mann_kendall: a series has {over[0]['n']} buckets "
            f"(cap {max_buckets}); the pairwise stage is quadratic in "
            f"buckets — coarsen bucket_ns or pre-filter the time range")
    a = g.select(*by, F.col("bucket").alias("__ba"), F.col("v").alias("__va"))
    b = g.select(*[F.col(k).alias(f"__b_{k}") for k in by],
                 F.col("bucket").alias("__bb"), F.col("v").alias("__vb"))
    s = (a.join(b, [a[k] == b[f"__b_{k}"] for k in by])
         .where(F.col("__bb") > F.col("__ba"))
         .groupBy(*by)
         .agg(F.sum(F.signum(F.col("__vb") - F.col("__va"))
                    .cast("long")).alias("s")))
    ties = (g.groupBy(*by, "v").agg(F.count(F.lit(1)).alias("t"))
            .groupBy(*by)
            .agg(F.sum(F.col("t") * (F.col("t") - 1)
                       * (2 * F.col("t") + 5)).alias("tie_corr")))
    # LEFT join + coalesce: a single-bucket series has no i<j pairs, so
    # the pair aggregate `s` has no row for it — an inner join would
    # silently DROP the series instead of reporting s=0/z=0/trend=false
    # (r5 verdict #1: output cardinality must equal |series|, always)
    j = (counts.join(s, by, "left").join(ties, by, "left")
         .select(*by, "n",
                 F.coalesce(F.col("s"), F.lit(0)).alias("s"),
                 F.coalesce(F.col("tie_corr"), F.lit(0)).alias("tie_corr")))
    n = F.col("n").cast("double")
    var = ((n * (n - 1) * (2 * n + 5)
            - F.col("tie_corr").cast("double")) / F.lit(18.0))
    z = (F.when(F.col("s") > 0,
                (F.col("s").cast("double") - 1) / F.sqrt(var))
         .when(F.col("s") < 0,
               (F.col("s").cast("double") + 1) / F.sqrt(var))
         .otherwise(F.lit(0.0)))
    zz = F.when(var > 0, _fr(z, 6)).otherwise(F.lit(0.0))
    return j.select(*by, F.col("n").alias("n_buckets"), "s",
                    zz.alias("z"),
                    (F.abs(zz) > 1.959964).alias("trend"))


def seasonal_mann_kendall(df: DataFrame, on: str = "time",
                          by: Sequence[str] = ("event_type",),
                          value_col: str = "value",
                          bucket_ns: int = 3_600_000_000_000,
                          period: int = 24,
                          max_buckets: int = 4096) -> DataFrame:
    """Seasonal Mann–Kendall trend test (Hirsch & Slack 1984 — the
    hydrology-standard fix for MK's seasonal false positives): the S
    statistic and tie-corrected variance are computed WITHIN each
    season (phase = bucket index mod period, hour-of-day at the
    defaults) and summed across seasons, so a strong diurnal/annual
    cycle contributes nothing and only cross-season-consistent
    monotonic drift registers:

        S = sum_p S_p ,   Var = sum_p Var_p ,   z as in mann_kendall

    Exact like mann_kendall: per-season S, the per-season variance
    numerators n_p(n_p-1)(2n_p+5), and the tie corrections all stay
    INTEGER through the cross-season sums; the single /18.0 happens
    once at the end, so no double-accumulation order exists for an
    engine to vary. Output cardinality is ALWAYS |series|: a series in
    which no season has >= 2 buckets (any series shorter than ~2 days
    at the period=24 default) reports s=0, z=0, trend=false rather
    than vanishing. Shape: the pair join gains the phase key (so it is
    quadratic in buckets PER SEASON — period× fewer pairs than plain
    MK), same loud cap.
    """
    by = list(by)
    if not by:
        raise ValueError("seasonal_mann_kendall requires a series key")
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    counts = g.groupBy(*by).agg(F.count(F.lit(1)).alias("n_buckets"))
    over = counts.where(F.col("n_buckets") > max_buckets).limit(1).collect()
    if over:
        raise ValueError(
            f"seasonal_mann_kendall: a series has "
            f"{over[0]['n_buckets']} buckets (cap {max_buckets}); "
            f"coarsen bucket_ns or pre-filter the time range")
    ph = F.pmod(F.expr(f"bucket div {int(bucket_ns)}"), F.lit(period))
    gp = g.select(*by, ph.alias("__ph"), "bucket", "v")
    a = gp.select(*by, "__ph", F.col("bucket").alias("__ba"),
                  F.col("v").alias("__va"))
    b = gp.select(*[F.col(k).alias(f"__b_{k}") for k in by],
                  F.col("__ph").alias("__b_ph"),
                  F.col("bucket").alias("__bb"), F.col("v").alias("__vb"))
    s = (a.join(b, [a[k] == b[f"__b_{k}"] for k in by]
                + [a["__ph"] == b["__b_ph"]])
         .where(F.col("__bb") > F.col("__ba"))
         .groupBy(*by)
         .agg(F.sum(F.signum(F.col("__vb") - F.col("__va"))
                    .cast("long")).alias("s")))
    # per-phase variance pieces stay INTEGER through the cross-phase sum
    # (r5 advice: summing already-divided doubles made the accumulation
    # order engine-dependent; sum the exact integer numerators instead
    # and divide by 18.0 ONCE — now truly "exact like mann_kendall")
    var = (gp.groupBy(*by, "__ph")
           .agg(F.count(F.lit(1)).alias("np"))
           .join(gp.groupBy(*by, "__ph", "v")
                 .agg(F.count(F.lit(1)).alias("t"))
                 .groupBy(*by, "__ph")
                 .agg(F.sum(F.col("t") * (F.col("t") - 1)
                            * (2 * F.col("t") + 5)).alias("tie_corr")),
                 [*by, "__ph"])
           .groupBy(*by)
           .agg(F.sum(F.col("np") * (F.col("np") - 1)
                      * (2 * F.col("np") + 5)).alias("__vn"),
                F.sum("tie_corr").alias("__tc")))
    # LEFT join + coalesce (r5 verdict #1): when no season has >= 2
    # buckets there are no intra-season pairs and the `s` aggregate has
    # no row — the series must still appear with s=0/z=0/trend=false
    # (at the default period=24 ANY series shorter than ~2 days hit this)
    j = (counts.join(s, by, "left").join(var, by, "left")
         .select(*by, "n_buckets",
                 F.coalesce(F.col("s"), F.lit(0)).alias("s"),
                 ((F.coalesce(F.col("__vn"), F.lit(0))
                   - F.coalesce(F.col("__tc"), F.lit(0)))
                  .cast("double") / F.lit(18.0)).alias("var")))
    z = (F.when(F.col("s") > 0,
                (F.col("s").cast("double") - 1) / F.sqrt(F.col("var")))
         .when(F.col("s") < 0,
               (F.col("s").cast("double") + 1) / F.sqrt(F.col("var")))
         .otherwise(F.lit(0.0)))
    zz = F.when(F.col("var") > 0, _fr(z, 6)).otherwise(F.lit(0.0))
    return j.select(*by, "n_buckets", "s", zz.alias("z"),
                    (F.abs(zz) > 1.959964).alias("trend"))


def pettitt_bucket_sums(df: DataFrame, on: str = "time",
                        by: Sequence[str] = ("event_type",),
                        value_col: str = "value",
                        bucket_ns: int = 3_600_000_000_000) -> DataFrame:
    """Integer-exact bucket stage of the Pettitt pipeline: per
    (series, bucket) the SCALED decimal sum si = Σvalue·10⁶ (exact —
    values enter as DECIMAL(28,6), so ×10⁶ is an integer re-scale, not
    a rounding) and the row count n, both as exact integer types
    (DECIMAL(38,0) / LONG). No mean is ever formed: the sign of
    mean_b − mean_a downstream is decided by cross-multiplication
    si_b·n_a vs si_a·n_b, so the whole pipeline from raw values to the
    change-point row contains zero floats and zero rounding (r8: this
    replaces the round-6 double means the r5–r7 contract compared —
    `sgn(vb − va)` over _fr-rounded doubles was the last float stage).

    Exposed as its own operator (beyond pettitt_test's internal use) so
    the contract can stage-diagnose a cross-engine divergence: this IS
    the `ts_pettitt_means` diagnostic key.

    The ×10⁶ happens PER ROW before the sum (decimal(22,6)·10⁶ →
    decimal(33,6), exact, cast decimal(28,0)) so no arithmetic step ever
    crosses Spark's 38-digit precision-loss boundary; the sum of
    decimal(28,0) widens to decimal(38,0) losslessly. Magnitude bound
    (set by the DOWNSTREAM cross-multiplication si_b·n_a − si_a·n_b,
    not this sum): |si·n| = |Σv·10⁶|·n ≤ 10⁶·V·N² must stay under
    ~5·10³⁷, so e.g. |value| ≤ 10¹⁰ with ≤ 10¹⁰ points per bucket is
    safe (10³⁶ per term) — far beyond the 4096-bucket series this
    family caps at. Beyond that the product overflows DECIMAL(38,0);
    _pettitt_u raises loudly rather than letting Spark's non-ANSI
    NULL-on-overflow silently score the pair as a tie.
    """
    by = list(by)
    if not by:
        raise ValueError("pettitt_test requires at least one series key")
    b = _bucket_expr(on, bucket_ns)
    si_row = (F.col(value_col).cast("decimal(22,6)")
              * F.lit(1_000_000)).cast("decimal(28,0)")
    return (df.groupBy(*by, b.alias("bucket"))
            .agg(F.sum(si_row).alias("si"),
                 F.count(F.lit(1)).alias("n")))


def _pettitt_u(g: DataFrame, by: list) -> DataFrame:
    """U_t stage of the Pettitt pipeline over the pettitt_bucket_sums
    table `g` — exact integer prefix statistic per (series, bucket).
    This IS the `ts_pettitt_u` diagnostic key; pettitt_test composes it.
    """
    a = g.select(*by, F.col("bucket").alias("__ba"),
                 F.col("si").alias("__sa"), F.col("n").alias("__na"))
    b = g.select(*[F.col(k).alias(f"__b_{k}") for k in by],
                 F.col("bucket").alias("__bb"),
                 F.col("si").alias("__sb"), F.col("n").alias("__nb"))
    # sgn(mean_b − mean_a) == sgn(si_b·n_a − si_a·n_b): counts are
    # positive, so cross-multiplying clears both divisions without any
    # float. DECIMAL(38,0)·LONG products and their difference are exact
    # integer arithmetic on any engine (DuckDB mirrors with HUGEINT).
    d = (F.col("__sb") * F.col("__na") - F.col("__sa") * F.col("__nb"))
    # A NULL d can only mean DECIMAL(38,0) overflow (or an all-NULL
    # value bucket upstream): under Spark's non-ANSI arithmetic an
    # overflowing decimal product yields NULL, and an .otherwise(0)
    # would silently record the pair as a TIE — a wrong statistic where
    # DuckDB's HUGEINT raises. Fail loudly instead (r8 ADVICE).
    sg = (F.when(d > 0, 1).when(d < 0, -1).when(d == 0, 0)
          .otherwise(F.raise_error(F.lit(
              "pettitt: si_b*n_a - si_a*n_b overflowed DECIMAL(38,0) "
              "(needs 10^6*|value|*n_per_bucket^2 < ~5e37) or a bucket "
              "sum is NULL; rescale values or shrink buckets")))
          .cast("long").alias("__sg"))
    pairs = (a.join(b, [a[k] == b[f"__b_{k}"] for k in by])
             .where(F.col("__bb") > F.col("__ba"))
             .select(*by, "__ba", "__bb", sg))
    # A_t keyed by the pair's LEFT endpoint, B_t by the RIGHT
    at = (pairs.groupBy(*by, F.col("__ba").alias("bucket"))
          .agg(F.sum("__sg").alias("__a")))
    bt = (pairs.groupBy(*by, F.col("__bb").alias("bucket"))
          .agg(F.sum("__sg").alias("__b")))
    w = Window.partitionBy(*by).orderBy("bucket")
    return (g.join(at, [*by, "bucket"], "left")
            .join(bt, [*by, "bucket"], "left")
            .select(*by, "bucket",
                    (F.coalesce(F.col("__a"), F.lit(0))
                     - F.coalesce(F.col("__b"), F.lit(0))).alias("__d"))
            .select(*by, "bucket",
                    F.sum("__d").over(
                        w.rowsBetween(Window.unboundedPreceding, 0))
                    .alias("u")))


def pettitt_test(df: DataFrame, on: str = "time",
                 by: Sequence[str] = ("event_type",),
                 value_col: str = "value",
                 bucket_ns: int = 3_600_000_000_000,
                 max_buckets: int = 4096) -> DataFrame:
    """Pettitt change-point test per series (Pettitt 1979 — the
    rank-based single change-point detector, the standard
    "did the level shift, and when" companion to Mann–Kendall's
    "is it drifting"):

        U_t = sum over i<=t < j of sgn(x_j - x_i)
        K = max_t |U_t| ,  t* = argmax (earliest on ties)
        p ~= 2 exp(-6 K^2 / (B^3 + B^2))       (Pettitt's approximation)

    U_t is NOT materialized per (t, pair): with A_t = sum_{j>t}
    sgn(x_j - x_t) and B_t = sum_{i<t} sgn(x_t - x_i), the exact
    telescoping U_t = U_{t-1} + A_t - B_t reduces the statistic to two
    endpoint aggregations over the pair table plus ONE per-series
    prefix-sum window.

    INTEGER-EXACT END TO END (r8): the bucket stage keeps exact scaled
    sums (si = Σv·10⁶ as DECIMAL(38,0)) and counts instead of round-6
    double means, and each pairwise sign is decided by the
    cross-multiplied comparison sgn(si_b·n_a − si_a·n_b) — equivalent
    to sgn(mean_b − mean_a) but with zero floats and zero rounding
    anywhere between the raw values and the output row. (Through r7 the
    signs compared _fr-rounded double means; two means differing only
    past the 6th decimal now count as a real sign instead of a tie —
    strictly closer to Pettitt's definition.)

    Same bucket-quadratic pair stage and loud cap as theil_sen /
    mann_kendall; output is |series| rows: (n_buckets, k, change_bucket,
    u_at_k, pexp_num, pexp_den, log_p_exponent, shift) where
    pexp_num=6K^2 and pexp_den=B^3+B^2 are EXACT integers,
    log_p_exponent = -pexp_num/pexp_den rounded at 6 (p = 2*exp of it,
    a diagnostic convenience — the only float in the row, excluded from
    the hash-gated contract), and shift (p < 0.05) is decided by the
    EXACT integer comparison pexp_num*10^16 > floor(ln(40)*10^16)*
    pexp_den in DECIMAL(38,0) — no transcendental and no float anywhere
    in the decision.
    """
    by = list(by)
    if not by:
        raise ValueError("pettitt_test requires at least one series key")
    g = pettitt_bucket_sums(df, on, by, value_col, bucket_ns)
    counts = g.groupBy(*by).agg(F.count(F.lit(1)).alias("n_buckets"))
    over = counts.where(F.col("n_buckets") > max_buckets).limit(1).collect()
    if over:
        raise ValueError(
            f"pettitt_test: a series has {over[0]['n_buckets']} buckets "
            f"(cap {max_buckets}); coarsen bucket_ns or pre-filter the "
            f"time range")
    u = _pettitt_u(g, by)
    wk = Window.partitionBy(*by).orderBy(F.abs(F.col("u")).desc(),
                                         F.col("bucket").asc())
    best = (u.withColumn("__r", F.row_number().over(wk))
            .where(F.col("__r") == 1)
            .select(*by, F.col("bucket").alias("change_bucket"),
                    F.col("u").alias("u_at_k"),
                    F.abs(F.col("u")).alias("k")))
    # the p-value needs exp(), a JVM-intrinsified transcendental this
    # codebase deliberately keeps out of oracle-compared plans (the
    # lm_score/dsir log convention). Report the EXACT exponent instead
    # and decide significance against a driver-precomputed libm literal:
    # p = 2 exp(E) < 0.05  <=>  E < ln(0.025)
    # Hardened r6: numerator 6k^2 and denominator n^3+n^2 are built in
    # LONG arithmetic (k<=n(n-1)/2, n<=4096 keeps both < 2^53) and
    # emitted as integer columns; the only float in the row is ONE
    # division of those two exactly-represented integers — no double
    # accumulation whose order an engine could vary.
    # Hardened r7: `shift` no longer derives from that float at all.
    # p = 2 exp(-num/den) < 0.05  <=>  num/den > ln(40)
    #   <=>  num * 10^16 > floor(ln(40) * 10^16) * den
    # (ln(40) = 3.6888794541139363 is exactly 16 fractional digits of
    # the libm double here, so scaling by 10^16 makes the threshold an
    # integer literal). Both sides fit DECIMAL(38,0): num <= 6*(n(n-1)/2)^2
    # ~ 4.2e14 -> lhs ~ 4.2e30; rhs ~ 3.7e16 * 6.9e10 ~ 2.6e27. The
    # comparison is exact integer arithmetic on any engine — zero floats
    # anywhere in the decision.
    num = F.lit(6) * F.col("k") * F.col("k")
    den = (F.col("n_buckets") * F.col("n_buckets") * F.col("n_buckets")
           + F.col("n_buckets") * F.col("n_buckets"))
    expo = _fr(F.lit(-1.0) * num.cast("double") / den.cast("double"), 6)
    _LN40_SCALED = 36888794541139363  # floor(ln(40) * 1e16)
    shift = (num.cast("decimal(20,0)")
             * F.lit(10_000_000_000_000_000).cast("decimal(17,0)")
             > F.lit(_LN40_SCALED).cast("decimal(17,0)")
             * den.cast("decimal(20,0)"))
    return (counts.join(best, by)
            .select(*by, "n_buckets", "k", "change_bucket", "u_at_k",
                    num.alias("pexp_num"), den.alias("pexp_den"),
                    expo.alias("log_p_exponent"),
                    shift.alias("shift")))


def _funnel_reach(df: DataFrame, steps: list, by: list, on: str,
                  type_col: str, within_ns: int | None) -> DataFrame:
    """The funnel family's shared per-entity reach-time chain (factored
    out r8 so funnel_times rides the identical expressions — funnel's
    plan fingerprint is unchanged): one row per entity with columns
    __r0..__r{k-1}, the first-touch reach time of each step (NULL =
    never reached under the strictly-after / within_ns gating).

    The aggregate aliases MUST differ from the window column names:
    re-aliasing max(__t0) back to __t0 makes the outer aggregate
    resolve against the pre-aggregate window column and Catalyst
    collapses the two aggregates into a wrong global one (verified on
    Spark 4.1; the renamed form produces the correct per-step values).
    """
    w = Window.partitionBy(*by)
    cur = df
    prev_t = None
    tcols = []
    for i, s in enumerate(steps):
        cond = F.col(type_col) == F.lit(s)
        if prev_t is not None:
            cond = cond & F.col(prev_t).isNotNull() \
                   & (F.col(on) > F.col(prev_t))
            if within_ns is not None:
                cond = cond & (F.col(on)
                               <= F.col(prev_t) + F.lit(int(within_ns)))
        tc = f"__t{i}"
        cur = cur.withColumn(tc, F.min(F.when(cond, F.col(on))).over(w))
        prev_t = tc
        tcols.append(tc)
    return cur.groupBy(*by).agg(
        *[F.max(tc).alias(f"__r{i}") for i, tc in enumerate(tcols)])


def funnel(df: DataFrame, steps: Sequence[str],
           by: Sequence[str] = ("user_id",), on: str = "time",
           type_col: str = "event_type",
           within_ns: int | None = None) -> DataFrame:
    """Ordered-funnel analysis: for each entity (`by`), step i counts as
    reached only if an event of type steps[i] occurs STRICTLY AFTER the
    entity's step-(i-1) reach time (first-touch semantics — the earliest
    qualifying time per step, the standard product-analytics funnel).
    Output is one row per step: (step long, step_name, entities long) —
    entities that reached that step; entities is non-increasing in step.
    `within_ns` adds the conversion-window form: step i must also occur
    no later than `within_ns` after the step-(i-1) reach time.

    The reference proxies InfluxQL only (no funnel op — added scope,
    the events-analytics companion of sessionize); the semantics are
    the classic windowed-funnel of the product-analytics engines.

    Shape at 100 TB: ONE shuffle — all k step times are unordered
    aggregate-windows over the SAME entity partitioning (Catalyst
    reuses a single Exchange; no sort, frames are whole-partition), and
    the per-entity reach flags then fold through a partial-agg groupBy
    into k rows. Events never sort; nothing quadratic; k is query-sized.
    """
    steps = list(steps)
    if not steps:
        raise ValueError("funnel requires at least one step")
    by = list(by)
    ent = _funnel_reach(df, steps, by, on, type_col, within_ns)
    counts = ent.agg(*[F.sum(F.col(f"__r{i}").isNotNull().cast("long"))
                       .alias(f"__c{i}") for i in range(len(steps))])
    pairs = F.array(*[
        F.struct(F.lit(i).cast("long").alias("step"),
                 F.lit(s).alias("step_name"),
                 F.coalesce(F.col(f"__c{i}"), F.lit(0)).alias("entities"))
        for i, s in enumerate(steps)])
    return (counts.select(F.explode(pairs).alias("__p"))
            .select("__p.step", "__p.step_name", "__p.entities"))


def funnel_times(df: DataFrame, steps: Sequence[str],
                 by: Sequence[str] = ("user_id",), on: str = "time",
                 type_col: str = "event_type",
                 within_ns: int | None = None) -> DataFrame:
    """Per-step conversion-LAG profile — the "how long does each step
    take" companion of `funnel` (every product-analytics funnel chart
    draws both): for each step i ≥ 1, over the entities that reached
    it, the lag t_i − t_{i−1} between consecutive first-touch reach
    times, reported as (step, step_name, entities, min_lag_ns,
    median_lag_ns, max_lag_ns). Steps nobody reached emit entities=0
    with NULL stats — present, never dropped. Step 0 has no
    predecessor and no row (it is the funnel entry, not a conversion).

    Lags are exact ns longs (the chain is integer arithmetic over
    first-touch times); the median is the exact interpolating
    percentile (quantile_cont mirror, the ev_rfm convention —
    percentile_approx is the documented 100 TB swap), exact in double
    for any lag below 2⁵² ns ≈ 52 days.

    Shape at 100 TB: IDENTICAL to funnel — the k reach times are
    unordered aggregate-windows over ONE entity partitioning (shared
    _funnel_reach chain, single data shuffle), and the lag stats fold
    through one 1-row aggregate (k·4 scalars).
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("funnel_times needs at least two steps — a "
                         "single step has no conversion lag")
    by = list(by)
    ent = _funnel_reach(df, steps, by, on, type_col, within_ns)
    lag = {i: F.col(f"__r{i}") - F.col(f"__r{i - 1}")
           for i in range(1, len(steps))}
    aggs = []
    for i in range(1, len(steps)):
        aggs += [
            F.sum(F.col(f"__r{i}").isNotNull().cast("long"))
            .alias(f"__c{i}"),
            F.min(lag[i]).alias(f"__mn{i}"),
            F.percentile(lag[i], F.lit(0.5)).alias(f"__md{i}"),
            F.max(lag[i]).alias(f"__mx{i}"),
        ]
    one = ent.agg(*aggs)
    rows = F.array(*[
        F.struct(F.lit(i).cast("long").alias("step"),
                 F.lit(steps[i]).alias("step_name"),
                 F.coalesce(F.col(f"__c{i}"), F.lit(0)).alias("entities"),
                 F.col(f"__mn{i}").alias("min_lag_ns"),
                 F.col(f"__md{i}").alias("median_lag_ns"),
                 F.col(f"__mx{i}").alias("max_lag_ns"))
        for i in range(1, len(steps))])
    return (one.select(F.explode(rows).alias("__p"))
            .select("__p.step", "__p.step_name", "__p.entities",
                    "__p.min_lag_ns", "__p.median_lag_ns",
                    "__p.max_lag_ns"))


def retention(df: DataFrame, by: Sequence[str] = ("user_id",),
              on: str = "time", bucket_ns: int = 86_400_000_000_000,
              max_offset: int | None = None) -> DataFrame:
    """Cohort retention: entities are cohorted by the bucket of their
    FIRST event; for each (cohort_bucket, offset) cell, count the
    distinct entities active `offset` buckets after their cohort bucket
    (offset 0 = the cohort size). The classic triangular retention
    matrix, emitted sparse (only observed cells).

    Shape at 100 TB: dedup to (entity, bucket) activity first (partial
    agg — the raw volume collapses to entity×active-bucket before
    anything else), ONE entity-partitioned unordered window for the
    cohort minimum, then the cell groupBy counts entities directly
    (the activity rows are already distinct per (entity, bucket), so
    it is a plain count, not a count-distinct shuffle).
    """
    by = list(by)
    b = _bucket_expr(on, bucket_ns).alias("__b")
    act = df.select(*by, b).distinct()
    w = Window.partitionBy(*by)
    coh = act.withColumn("__cohort", F.min("__b").over(w))
    cells = (coh.select(
        F.col("__cohort").alias("cohort_bucket"),
        ((F.col("__b") - F.col("__cohort")) / F.lit(bucket_ns))
        .cast("long").alias("offset")))
    if max_offset is not None:
        cells = cells.where(F.col("offset") <= F.lit(int(max_offset)))
    return (cells.groupBy("cohort_bucket", "offset")
            .agg(F.count(F.lit(1)).alias("n_entities")))


def cohort_ltv(df: DataFrame, by: Sequence[str] = ("user_id",),
               on: str = "time", value_col: str = "value",
               type_col: str = "event_type",
               revenue_type: str = "purchase",
               bucket_ns: int = 7 * 86_400_000_000_000) -> DataFrame:
    """Cohort revenue / LTV triangle — `retention`'s monetary twin (the
    other half of every growth dashboard): entities cohort by the
    bucket of their FIRST event of any type; each revenue event
    (`type_col == revenue_type`) lands in the (cohort_bucket, offset)
    cell of its owner, offset in buckets since cohort; the cell reports
    distinct buyers, exact-decimal revenue, and revenue-per-cohort-
    member (the incremental-LTV curve read cumulatively). Sparse like
    retention — only cells with revenue emit; cohort_size rides every
    row so the caller can densify or normalize without a second query.

    Determinism: revenue is a DECIMAL(28,6)-accumulated sum emitted as
    double (order-free, the _dsum convention); ltv_per_user is ONE
    float division of that exact double by the exact long cohort size,
    floor-rounded at 6.

    Shape at 100 TB: ONE entity-keyed shuffle computes first-touch
    cohorts (partial-agg min); the revenue slice joins it on the same
    entity key (AQE broadcasts only if the purchaser set is genuinely
    small); then one cell-keyed agg — the distinct-buyers count rides
    the SAME exchange as the revenue sum because the pre-agg dedups
    (entity, cell) first. The cohort-size join is |cohorts|-sized.
    """
    by = list(by)
    if not by:
        raise ValueError("cohort_ltv requires at least one entity key")
    b = _bucket_expr(on, bucket_ns)
    first = df.groupBy(*by).agg(F.min(b).alias("__cohort"))
    sizes = (first.groupBy(F.col("__cohort").alias("cohort_bucket"))
             .agg(F.count(F.lit(1)).alias("cohort_size")))
    rev = (df.where(F.col(type_col) == F.lit(revenue_type))
           .select(*by, b.alias("__b"), F.col(value_col).alias("__v")))
    cells = (rev.join(first, by)
             .select(*by,
                     F.col("__cohort").alias("cohort_bucket"),
                     ((F.col("__b") - F.col("__cohort"))
                      / F.lit(bucket_ns)).cast("long").alias("offset"),
                     "__v"))
    agg = (cells.groupBy("cohort_bucket", "offset")
           .agg(F.count_distinct(*[F.col(k) for k in by]).alias("buyers"),
                F.sum(F.col("__v").cast("decimal(28,6)")).cast("double")
                .alias("revenue")))
    out = agg.join(sizes, "cohort_bucket")
    ltv = _fr(F.col("revenue") / F.col("cohort_size").cast("double"), 6)
    return out.select("cohort_bucket", "offset", "cohort_size",
                      "buyers", "revenue", ltv.alias("ltv_per_user"))


def heavy_hitters(df: DataFrame, by: Sequence[str] = ("user_id",),
                  k: int = 140) -> DataFrame:
    """Exact φ-heavy hitters (φ = 1/k): keys whose event count STRICTLY
    exceeds n/k — the hot-entity screen (abusive clients, hot shard
    keys, dominant crawl hosts) every ingestion pipeline runs before
    the skew hits a shuffle. The decision is the exact integer
    comparison cnt·k > n — no division, no float, engine-independent
    even at n near 2⁶³/k; `share` (cnt/n, round-6) is reporting only.

    Shape at 100 TB: ONE key-partial-agg shuffle (the exchange carries
    (key, count) partials, never events) + one 1-row scalar agg
    crossJoin-broadcast back (the quality_sample threshold form). At
    most k−1 keys can exceed n/k, so the output is bounded by the
    parameter — a true sketch-sized result.

    Streaming twin: streaming/heavy_hitters_stream.py maintains
    bounded-memory Misra–Gries summaries per shard — a SUPERSET of the
    true heavy hitters with counts underestimated by ≤ n_shard/k (the
    classic guarantee); this batch op is the exact reference the twin's
    equivalence test is pinned to.
    """
    by = list(by)
    if not by:
        raise ValueError("heavy_hitters requires at least one key column")
    if k < 2:
        raise ValueError("heavy_hitters: k must be >= 2 (phi = 1/k)")
    cnt = df.groupBy(*by).agg(F.count(F.lit(1)).alias("cnt"))
    tot = df.agg(F.count(F.lit(1)).alias("__n"))
    return (cnt.crossJoin(F.broadcast(tot))
            .where(F.col("cnt") * F.lit(int(k)) > F.col("__n"))
            .select(*by, "cnt", F.col("__n").alias("n_total"),
                    _fr(F.col("cnt").cast("double")
                        / F.col("__n").cast("double"), 6).alias("share")))


def permutation_entropy(df: DataFrame, on: str = "time",
                        by: Sequence[str] = ("event_type",),
                        value_col: str = "value",
                        bucket_ns: int = 3_600_000_000_000) -> DataFrame:
    """Order-3 permutation entropy per series (Bandt & Pompe 2002,
    "Permutation Entropy: A Natural Complexity Measure for Time
    Series") over the hourly bucket-mean sequence: each consecutive
    triple (a,b,c) maps to an ordinal pattern via the three pairwise
    comparisons (a<=b, b<=c, a<=c) — ties resolve to <= (earlier index
    ranks first, the standard convention) — giving 6 reachable codes;
    H = ln(n) - (1/n)·sum c·ln c over the pattern counts (the
    token_entropy formula), h_norm = H/ln(6) in [0,1]. Low H = regular/
    trending signal; maximal = white noise. The complexity companion of
    acf/decompose in the anomaly toolkit.

    Shape: the shared _bucket_means front stage (one shuffle, output
    |series|·|buckets| sketch-sized rows), one ordered per-series
    window for the two lags, then two tiny groupBys. The only floats
    are the final H/h_norm, floor-rounded at 6 (the token_entropy
    hash-gate precedent); counts and codes are exact integers.

    r8 (ADVICE): ln values are DRIVER-SIDE libm literals — sparse
    create_map over the distinct pattern counts / window totals, the
    token_entropy/pmi/tfidf convention — instead of in-plan F.log
    (JVM Math.log is intrinsified and can drift an ulp vs DuckDB's
    libm ln); and each c·ln c term is cast to DECIMAL(28,12) so the
    per-series sum is order-free across partitionings (the acf centered-
    product precedent). The two distinct-value collects are ≤ 6·|series|
    and ≤ |series| rows respectively — sketch-sized, never data-sized.

    EAGER: unlike most operators here, CONSTRUCTING this DataFrame runs
    two small Spark jobs (the distinct-count collects that build the
    literal log maps) — plan-only callers (explain / fingerprinting)
    pay them too. The literal-map cap is 4096 entries (r8 ADVICE: a
    64k-entry create_map is an enormous expression tree long before the
    guard trips); series sets whose distinct pattern-count/window-total
    cardinality exceeds it should use the in-plan F.log variant and
    accept the ulp-level oracle tolerance instead.
    """
    from ..cache import keep

    by = list(by)
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    w = Window.partitionBy(*by).orderBy("bucket")
    tri = (g.select(*by,
                    F.lag("v", 2).over(w).alias("__a"),
                    F.lag("v", 1).over(w).alias("__b"),
                    F.col("v").alias("__c"))
           .where(F.col("__a").isNotNull()))
    code = ((F.col("__a") <= F.col("__b")).cast("long") * 4
            + (F.col("__b") <= F.col("__c")).cast("long") * 2
            + (F.col("__a") <= F.col("__c")).cast("long"))
    cnt = keep("ts.perm_entropy.cnt",
               tri.select(*by, code.alias("pattern"))
               .groupBy(*by, "pattern")
               .agg(F.count(F.lit(1)).alias("cnt")))
    cvals = sorted(int(r[0]) for r in cnt.select("cnt").distinct().collect())
    if len(cvals) > 4096:
        raise ValueError(f"permutation_entropy: {len(cvals)} distinct "
                         "pattern counts exceed the literal log-map cap "
                         "(4096)")
    if not cvals:  # no series has >= 3 buckets: all-NULL entropy rows
        cvals = [1]
    lnc = F.create_map(*[x for c in cvals
                         for x in (F.lit(c).cast("long"),
                                   F.lit(math.log(c)))])
    term = (F.col("cnt").cast("double")
            * F.element_at(lnc, F.col("cnt").cast("long"))
            ).cast("decimal(28,12)")
    per0 = keep("ts.perm_entropy.per0",
                cnt.groupBy(*by)
                .agg(F.sum("cnt").alias("n_windows"),
                     F.count(F.lit(1)).alias("n_patterns"),
                     F.sum(term).alias("__s")))
    nvals = sorted(int(r[0]) for r in
                   per0.select("n_windows").distinct().collect())
    if len(nvals) > 4096:
        raise ValueError(f"permutation_entropy: {len(nvals)} distinct "
                         "window totals exceed the literal log-map cap "
                         "(4096)")
    lnn = F.create_map(*[x for c in (nvals or [1])
                         for x in (F.lit(c).cast("long"),
                                   F.lit(math.log(c)))])
    h = (F.element_at(lnn, F.col("n_windows").cast("long"))
         - F.col("__s").cast("double") / F.col("n_windows").cast("double"))
    per = per0.select(*by, "n_windows", "n_patterns",
                      _fr(h, 6).alias("h"),
                      _fr(h / F.lit(math.log(6.0)), 6).alias("h_norm"))
    # output-cardinality == |series| (the r6 convention, enforced
    # family-wide by tests/test_series_cardinality.py): a series too
    # short for any triple (< 3 buckets) reports 0 windows / 0 patterns
    # with NULL entropy — "unknown", never a silent drop
    series = g.groupBy(*by).agg(F.count(F.lit(1)).alias("__nb")).drop("__nb")
    return (series.join(per, by, "left")
            .select(*by,
                    F.coalesce(F.col("n_windows"), F.lit(0)).cast("long")
                    .alias("n_windows"),
                    F.coalesce(F.col("n_patterns"), F.lit(0)).cast("long")
                    .alias("n_patterns"),
                    "h", "h_norm"))


def user_paths(df: DataFrame, by: Sequence[str] = ("user_id",),
               on: str = "time", type_col: str = "event_type",
               max_steps: int = 5) -> DataFrame:
    """Top user-journey paths: each entity's first `max_steps` events
    (ordered by time, ties by event type) join into a '>'-delimited
    path string; output is (path, n_entities) — the path-exploration
    companion of `funnel` (funnel scores ONE hypothesized sequence;
    this surfaces which sequences actually occur). Added scope like
    funnel/retention; the reference proxies InfluxQL only.

    Determinism: the ordering key is (time, type), so entities with
    same-timestamp same-type events produce identical paths regardless
    of physical row order; same-timestamp DIFFERENT-type events order
    lexicographically — pinned, engine-independent.

    Shape at 100 TB: one entity-keyed shuffle — the ranking window and
    the per-entity fold share the partitioning (rank prunes each entity
    to max_steps rows before the fold's collect_list, so the folded
    arrays are bounded); the final path groupBy moves |entities| short
    strings. Nothing quadratic, no driver collect.
    """
    by = list(by)
    w = Window.partitionBy(*by).orderBy(F.col(on).asc(),
                                        F.col(type_col).asc())
    firstn = (df.select(*by, F.col(on), F.col(type_col))
              .withColumn("__r", F.row_number().over(w))
              .where(F.col("__r") <= F.lit(int(max_steps))))
    paths = (firstn.groupBy(*by)
             .agg(F.concat_ws(
                 ">", F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("__r").alias("r"),
                                  F.col(type_col).alias("t")))),
                     lambda x: x["t"])).alias("path")))
    return (paths.groupBy("path")
            .agg(F.count(F.lit(1)).alias("n_entities")))


def path_ngrams(df: DataFrame, by: Sequence[str] = ("user_id",),
                on: str = "time", type_col: str = "event_type",
                n: int = 3, max_steps: int = 8,
                min_support: int = 2) -> DataFrame:
    """Sequential n-gram support mining over per-entity event paths —
    the ORDERED sibling of association_rules' unordered baskets
    (AprioriAll/GSP lineage: Agrawal & Srikant 1995, "Mining
    sequential patterns"; contiguous-gram restriction keeps the
    pattern lattice linear in sequence length instead of the full
    subsequence explosion): each entity's first `max_steps` events
    order by (time, type) — user_paths' determinism contract, so
    same-timestamp events order lexicographically, engine-independent
    — and every CONTIGUOUS n-gram of event types counts ONCE per
    entity (distinct-entity support, the classic definition: a
    pattern repeating inside one entity is still one supporting
    entity). type_transitions is the n=2 adjacent-pair special case
    measured in EVENT counts; this measures ENTITY support at any n.

    Returns (gram, support) for grams with support >= min_support
    (an ABSOLUTE integer floor — the association_rules min_count
    convention; a fractional min-support would put a float boundary
    in row selection). gram is the '>'-joined type sequence.

    Shape at 100 TB: one entity-keyed shuffle (the ranking window and
    the per-entity fold share the partitioning; rank prunes each
    entity to max_steps rows BEFORE the fold, so folded arrays are
    bounded), a map-only gram explode bounded by max_steps − n + 1
    grams per entity, one distinct on (entity, gram) co-partitioned
    with the fold's keys, and a final gram-keyed count shuffle that
    moves |entities|·(max_steps−n+1) short strings at worst. Nothing
    quadratic, no driver collect.
    """
    by = list(by)
    if n < 1:
        raise ValueError("path_ngrams: n must be >= 1")
    if max_steps < n:
        raise ValueError("path_ngrams: max_steps must be >= n")
    w = Window.partitionBy(*by).orderBy(F.col(on).asc(),
                                        F.col(type_col).asc())
    firstn = (df.where(F.col(type_col).isNotNull())
              .select(*by, F.col(on), F.col(type_col))
              .withColumn("__r", F.row_number().over(w))
              .where(F.col("__r") <= F.lit(int(max_steps))))
    seqs = (firstn.groupBy(*by)
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("__r").alias("r"),
                             F.col(type_col).alias("t")))),
                lambda x: x["t"]).alias("__seq")))
    grams = (seqs.where(F.size("__seq") >= n)
             .select(*by, F.explode(F.transform(
                 F.sequence(F.lit(1), F.size("__seq") - (n - 1)),
                 lambda i: F.concat_ws(">", F.slice("__seq", i, n))))
                 .alias("gram"))
             .distinct())
    return (grams.groupBy("gram")
            .agg(F.count(F.lit(1)).alias("support"))
            .where(F.col("support") >= F.lit(int(min_support))))


def type_transitions(df: DataFrame, by: Sequence[str] = ("user_id",),
                     on: str = "time",
                     type_col: str = "event_type") -> DataFrame:
    """Event-flow transition matrix — the Sankey/flow view next to
    `user_paths` (paths surface whole journeys; this aggregates the
    step-to-step edges every flow diagram draws): for each entity's
    time-ordered event sequence, count consecutive (from_type, to_type)
    pairs, plus how many distinct entities made each transition.

    Determinism: the per-entity order key is (time, type) — the
    user_paths convention — so same-timestamp different-type events
    order lexicographically, pinned and engine-independent. NULL-typed
    events are EXCLUDED by contract (the canonical_select totality
    class: Spark's bare ASC sorts NULLs first, DuckDB's last, so a
    null type on a tied timestamp would make the lag chain
    engine-dependent; a typeless event is no transition anyway).

    Shape at 100 TB: ONE entity-keyed shuffle (the lag window), then a
    |types|²-bounded pair aggregation; the distinct-entity count rides
    the same exchange because the pre-agg dedups (entity, pair) first.
    """
    by = list(by)
    if not by:
        raise ValueError("type_transitions requires an entity key")
    w = Window.partitionBy(*by).orderBy(F.col(on).asc(),
                                        F.col(type_col).asc())
    pairs = (df.where(F.col(type_col).isNotNull())
             .select(*by, F.col(on), F.col(type_col))
             .withColumn("__prev", F.lag(type_col).over(w))
             .where(F.col("__prev").isNotNull())
             .select(*by, F.col("__prev").alias("from_type"),
                     F.col(type_col).alias("to_type")))
    return (pairs.groupBy("from_type", "to_type")
            .agg(F.count(F.lit(1)).alias("n_transitions"),
                 F.count_distinct(*[F.col(k) for k in by])
                 .alias("n_entities")))


def active_users(df: DataFrame, by: Sequence[str] = ("user_id",),
                 on: str = "time", bucket_ns: int = 86_400_000_000_000,
                 window_buckets: int = 7) -> DataFrame:
    """DAU / trailing-WAU / stickiness per bucket: for each day (bucket),
    the distinct entities active that day (DAU), the distinct entities
    active in the trailing `window_buckets`-day window ending that day
    (WAU), and the DAU/WAU stickiness ratio — the standard
    product-health triple next to `retention`.

    Trailing distinct-count windows are not expressible as Spark range
    frames (no COUNT(DISTINCT) OVER RANGE); instead each (entity,
    active-day) row CONTRIBUTES to the `window_buckets` window-end days
    it falls into — a map-only ×W fan-out of the already-deduped
    activity table — and a plain distinct-count per window-end day does
    the rest. Output rows only for days with actual activity (windows
    anchored on silent days are not emitted; a spine-join gives the
    dense form if needed).

    Shape at 100 TB: the raw stream collapses to distinct (entity,
    bucket) FIRST (the retention front stage — partial-agg dedup, the
    volume cliff); the ×W explode multiplies only that sketch-sized
    activity table; two bucket-keyed aggregations follow. W is
    query-sized (7); nothing quadratic.
    """
    by = list(by)
    b = _bucket_expr(on, bucket_ns).alias("__b")
    act = df.select(*by, b).distinct()
    dau = act.groupBy(F.col("__b").alias("bucket")) \
             .agg(F.count(F.lit(1)).alias("dau"))
    contrib = act.select(
        *by, F.explode(F.sequence(
            F.col("__b"),
            F.col("__b") + F.lit((window_buckets - 1) * bucket_ns),
            F.lit(bucket_ns))).alias("bucket"))
    # distinct + plain count, NOT count_distinct: count_distinct skips
    # NULL entity keys while the DAU side (distinct rows + count(*))
    # and the DuckDB oracle both count them — a null entity would
    # break the dau <= wau invariant (r7 review)
    wau = (contrib.distinct()
           .groupBy("bucket").agg(F.count(F.lit(1)).alias("wau")))
    stick = (F.floor(F.col("dau").cast("double")
                     / F.col("wau").cast("double")
                     * F.lit(1_000_000) + F.lit(0.5)) / F.lit(1e6))
    return (dau.join(wau, "bucket")
            .select("bucket", F.col("dau").cast("long").alias("dau"),
                    F.col("wau").cast("long").alias("wau"),
                    stick.alias("stickiness")))


def inter_event_gaps(df: DataFrame, by: Sequence[str] = ("user_id",),
                     on: str = "time",
                     type_col: str = "event_type") -> DataFrame:
    """Per-(entity, type) consecutive-gap table — the SHARED front
    stage of `inter_event_profile` and the streaming gap twin
    (streaming/gap_stream.py), declared once so the two paths cannot
    drift (the _cusum_step / _bucket_expr consolidation discipline).
    One row per (NULL-type-excluded) event, `__gap` = distance to the
    previous same-(entity, type) event, NULL for each series' first
    event. The gap multiset depends only on the sorted time multiset,
    so tied timestamps yield 0 under any physical order."""
    by = list(by)
    w = Window.partitionBy(*by, type_col).orderBy(F.col(on).asc())
    return (df.where(F.col(type_col).isNotNull())
            .select(*by, F.col(type_col), F.col(on))
            .withColumn("__gap", F.col(on) - F.lag(on).over(w)))


def inter_event_profile(df: DataFrame, by: Sequence[str] = ("user_id",),
                        on: str = "time",
                        type_col: str = "event_type") -> DataFrame:
    """Per-type inter-event-gap profile — "how often does each event
    fire per user", the cadence chart next to ev_transitions' flow
    edges: gaps between consecutive events of the SAME type for the
    SAME entity (per (entity, type) series ordered by time — the gap
    multiset depends only on the sorted time multiset, so tied
    timestamps produce a 0 gap under any physical order and cannot
    make the result engine-dependent). Per type: n_gaps, exact
    min/max, exact interpolating median (F.median ↔ quantile_cont —
    the agg_median convention; the midpoint of two middle ns gaps is
    exactly representable because gaps are data-span-bounded, far
    below 2^53), and mean = DECIMAL-exact gap sum over count, one IEEE
    division (ns gap sums overflow BIGINT at corpus scale —
    DECIMAL(38,0) on the Spark side mirrors DuckDB's HUGEINT sum).
    Median and mean floor-round to WHOLE nanoseconds — the usual _fr
    micro-unit scale is wrong for ns magnitudes (x·10⁶ at 10¹⁴ ns
    overflows the 64-bit floor; caught by the gate) and sub-ns digits
    of a gap mean carry no information anyway. NULL-typed events are
    excluded (the type_transitions contract).

    Output-cardinality == |types| (the r6 series-cardinality
    convention): a type whose entities never repeat it reports
    n_gaps=0 with NULL stats — "unknown", never a silent drop.

    Shape at 100 TB: ONE (entity, type)-keyed shuffle for the lag
    window, then a |types|-keyed aggregate of scalar gaps. The exact
    median holds each type's gap list on one reducer —
    percentile_approx is the documented 100 TB swap (the
    agg_median_percentile precedent); everything else is algebraic
    partial-agg.
    """
    by = list(by)
    gaps = inter_event_gaps(df, by=by, on=on, type_col=type_col) \
        .where(F.col("__gap").isNotNull())
    mean = (F.sum(F.col("__gap").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1)).cast("double"))
    per = (gaps.groupBy(type_col)
           .agg(F.count(F.lit(1)).alias("n_gaps"),
                F.min("__gap").alias("min_gap_ns"),
                F.max("__gap").alias("max_gap_ns"),
                (F.floor(F.median("__gap") + F.lit(0.5)) / F.lit(1.0))
                .alias("median_gap_ns"),
                (F.floor(mean + F.lit(0.5)) / F.lit(1.0))
                .alias("mean_gap_ns")))
    types = (df.where(F.col(type_col).isNotNull())
             .select(type_col).distinct())
    return (types.join(per, type_col, "left")
            .select(type_col,
                    F.coalesce(F.col("n_gaps"), F.lit(0)).cast("long")
                    .alias("n_gaps"),
                    "min_gap_ns", "max_gap_ns", "median_gap_ns",
                    "mean_gap_ns"))


def association_rules(df: DataFrame, by: Sequence[str] = ("user_id",),
                      on: str = "time", type_col: str = "event_type",
                      bucket_ns: int = 86_400_000_000_000,
                      min_count: int = 2, max_basket: int = 64,
                      round_to: int = 6) -> DataFrame:
    """Pairwise association rules over (entity, bucket) baskets —
    support / confidence / lift (Agrawal, Imieliński & Swami 1993,
    "Mining association rules between sets of items in large
    databases"): a basket is the distinct set of types an entity
    touched in one bucket; a pair's support is the fraction of baskets
    containing both, confidence a→b = P(b | a basket contains a), and
    lift = how far co-occurrence exceeds independence. Output one row
    per unordered pair (type_a < type_b) with both directed
    confidences — the audit view of "users who X also Y within a day".

    Determinism: every count is an exact integer; `min_count` is an
    ABSOLUTE basket-count floor compared in integers (a fractional
    min-support would put a float boundary in the row-selection
    predicate — the quality_filter lesson); support/confidence/lift
    are each ONE IEEE division of exact-decimal-cast integers,
    floor-rounded at `round_to`. NULL types are excluded (the family
    contract).

    Shape at 100 TB: raw events collapse through ONE (entity, bucket,
    type) distinct shuffle; the pair stage self-joins baskets on the
    (entity, bucket) key with basket size capped to [2, max_basket]
    (the co_occurrence_edges cap — one bot entity touching 10⁵ item
    types would otherwise emit C(10⁵, 2) pairs; capped baskets are
    DROPPED loudly by contract, mirrored by the oracle); per-type and
    pair counts shuffle on type keys only. The singles join-back is
    UNHINTED — |types| is app-bounded here but item domains are not,
    so AQE decides (the link_predict discipline).

    DENOMINATOR SEMANTICS (deliberate, oracle-mirrored): n_a / n_b /
    n_baskets count ALL baskets — including size-1 and over-max_basket
    ones — while n_ab only counts pairs from size-[2, max_basket]
    baskets. So support/confidence/lift for a type whose occurrences
    sit mostly in capped (or singleton) baskets are DEFLATED relative
    to the textbook Agrawal et al. definitions over the mined basket
    set — a conservative bias: the cap can only under-claim an
    association, never invent one.
    """
    by = list(by)
    # NOT persisted, and the b side deliberately UNFILTERED, both by
    # measurement (r12): the basket relation feeds five consumers, but a
    # keep()-persisted generation measured 2.4x SLOWER at sf10 (8.9 ->
    # 21.6 s interleaved — materializing the 10M-row distinct beats
    # Spark's exchange reuse at no point measured) and ~1.1x at sf1;
    # deriving b from the cap-filtered a (output-identical) rode the
    # same regression. The exchange-reuse path wins at every measured
    # scale, so the r11-shaped plan stands.
    basket = (df.where(F.col(type_col).isNotNull())
              .select(*by, _bucket_expr(on, bucket_ns).alias("__b"),
                      F.col(type_col).alias("__t"))
              .distinct())
    sized = (basket.groupBy(*by, "__b")
             .agg(F.count(F.lit(1)).alias("__k")))
    ok = sized.where((F.col("__k") >= 2) & (F.col("__k") <= max_basket)) \
              .select(*by, "__b")
    nb = basket.select(*by, "__b").distinct() \
               .agg(F.count(F.lit(1)).alias("__nb"))
    singles = basket.groupBy(F.col("__t").alias("type_a")) \
                    .agg(F.count(F.lit(1)).alias("n_a"))
    a = basket.join(ok, [*by, "__b"]) \
              .select(*by, "__b", F.col("__t").alias("type_a"))
    b = basket.select(*by, "__b", F.col("__t").alias("type_b"))
    pairs = (a.join(b, [*by, "__b"])
             .where(F.col("type_a") < F.col("type_b"))
             .groupBy("type_a", "type_b")
             .agg(F.count(F.lit(1)).alias("n_ab"))
             .where(F.col("n_ab") >= int(min_count)))
    sb = singles.select(F.col("type_a").alias("type_b"),
                        F.col("n_a").alias("n_b"))
    j = (pairs.join(singles, "type_a").join(sb, "type_b")
         .crossJoin(F.broadcast(nb)))
    dec = lambda c: c.cast("decimal(19,0)")
    s = float(10 ** round_to)
    rnd = lambda x: F.floor(x * F.lit(s) + F.lit(0.5)) / F.lit(s)
    supp = rnd(F.col("n_ab").cast("double") / F.col("__nb").cast("double"))
    cab = rnd(F.col("n_ab").cast("double") / F.col("n_a").cast("double"))
    cba = rnd(F.col("n_ab").cast("double") / F.col("n_b").cast("double"))
    lift = rnd((dec(F.col("n_ab")) * dec(F.col("__nb"))).cast("double")
               / (dec(F.col("n_a")) * dec(F.col("n_b"))).cast("double"))
    return j.select("type_a", "type_b",
                    F.col("n_a").cast("long").alias("n_a"),
                    F.col("n_b").cast("long").alias("n_b"),
                    F.col("n_ab").cast("long").alias("n_ab"),
                    F.col("__nb").cast("long").alias("n_baskets"),
                    supp.alias("support"),
                    cab.alias("conf_a_to_b"), cba.alias("conf_b_to_a"),
                    lift.alias("lift"))


def type_mix_drift(df: DataFrame, on: str = "time",
                   type_col: str = "event_type",
                   bucket_ns: int = 86_400_000_000_000,
                   round_to: int = 6) -> DataFrame:
    """Per-bucket event-mix drift screen — "did today's traffic LOOK
    different", the composition-shift alarm next to dau_anomaly's
    volume alarm (and, run over a training corpus's source/language
    column, the batch-mix drift check a data pipeline runs per
    ingestion day): chi-square goodness-of-fit of each bucket's
    event-type counts against the corpus-wide type distribution.

    Exactness contract (the ljung_box construction): each cell's
    deviation d = obs·N − D·T is EXACT in DECIMAL (obs = cell count,
    D = bucket total, T = type total, N = grand total — all integers);
    the per-cell term is computed NORMALIZED as d²/(D·T·N²) = the
    cell's φ² contribution, which is ≤ 1 BY CONSTRUCTION (d ≤
    min(D,T)·N ⇒ d² ≤ D·T·N²), so casting it to DECIMAL(28,18) can
    never overflow and the per-bucket sum is fold-order-free; χ² is
    then φ²·N — one deterministic double product at the end. Both φ²
    and χ² floor-round at `round_to`. The drift flag compares χ²
    against the same published CHI2_95 literals ljung_box inlines, at
    dof = n_types − 1; dof outside the table reports NULL — "unknown",
    never a silent pass. Zero-count cells CONTRIBUTE (the bucket ×
    type spine is materialized): a day missing a usually-common type
    is exactly the drift this screen exists to catch. NULL types are
    excluded (the family contract).

    Shape at 100 TB: raw events collapse through ONE (bucket, type)
    partial-count shuffle; everything downstream lives on the
    |buckets|·|types| spine (spine-class bounded — the fill
    convention), built from a |buckets|-row × broadcast(|types|-row)
    join plus the 1-row grand total.
    """
    cell = (df.where(F.col(type_col).isNotNull())
            .select(F.col(type_col).alias("__t"),
                    _bucket_expr(on, bucket_ns).alias("__b"))
            .groupBy("__b", "__t")
            .agg(F.count(F.lit(1)).alias("__obs")))
    dsum = cell.groupBy("__b").agg(F.sum("__obs").alias("__d"))
    tsum = cell.groupBy("__t").agg(F.sum("__obs").alias("__tc"))
    nsum = cell.agg(F.sum("__obs").alias("__n"))
    spine = dsum.crossJoin(F.broadcast(tsum))
    full = (spine.join(cell, ["__b", "__t"], "left")
            .crossJoin(F.broadcast(nsum))
            .select("__b", "__d", "__tc", "__n",
                    F.coalesce(F.col("__obs"), F.lit(0)).alias("__obs")))
    dec = lambda c: F.col(c).cast("decimal(19,0)")
    diff = (dec("__obs") * dec("__n") - dec("__d") * dec("__tc")) \
        .cast("double")
    # parenthesization pinned — the oracle multiplies in the same order
    den = ((F.col("__d").cast("double") * F.col("__tc").cast("double"))
           * (F.col("__n").cast("double") * F.col("__n").cast("double")))
    term = ((diff * diff) / den).cast("decimal(28,18)")
    per = (full.groupBy(F.col("__b").alias("bucket"))
           .agg(F.count(F.lit(1)).alias("n_types"),
                F.sum(term).alias("__s"),
                F.max("__n").alias("__nn")))
    s = float(10 ** round_to)
    phi2 = F.floor(F.col("__s").cast("double") * F.lit(s) + F.lit(0.5)) \
        / F.lit(s)
    chi2 = F.floor(F.col("__s").cast("double")
                   * F.col("__nn").cast("double")
                   * F.lit(s) + F.lit(0.5)) / F.lit(s)
    cmap = F.create_map(*[x for k, v in sorted(CHI2_95.items())
                          for x in (F.lit(k).cast("long"), F.lit(v))])
    out = per.select("bucket",
                     F.col("n_types").cast("long").alias("n_types"),
                     phi2.alias("phi2"), chi2.alias("chi2"))
    return out.withColumn(
        "drifted",
        F.col("chi2") > F.element_at(cmap, F.col("n_types") - F.lit(1)))


def growth_accounting(df: DataFrame, by: Sequence[str] = ("user_id",),
                      on: str = "time",
                      bucket_ns: int = 86_400_000_000_000,
                      round_to: int = 6) -> DataFrame:
    """Per-bucket growth accounting — the new / retained / resurrected
    / churned decomposition every DAU chart hides (the standard
    growth-accounting identity: DAU(d) = new + retained + resurrected;
    DAU(d) − DAU(d−1) = new + resurrected − churned), plus the quick
    ratio (new + resurrected) / churned. Activity collapses to
    distinct (entity, bucket) FIRST (the retention/active_users front
    stage), then ONE entity-keyed lag/lead window classifies each
    active bucket: `new` = no prior activity, `retained` = active the
    immediately previous bucket, `resurrected` = returned after ≥1
    absent bucket. A user churns INTO bucket b+1 when their next
    active bucket is not b+1 — and churn into buckets past the
    dataset's last observed bucket is right-censored OUT (attributing
    "churned" beyond the observation window is a claim the data can't
    support; the max-bucket is one 1-row scalar crossJoin, the
    deadman anchored-'now' pattern). Churn-only buckets (everyone
    absent) still emit rows via the full outer join — a day of zero
    inflow with churn is exactly the day worth seeing.

    All four counts are exact integers; quick_ratio is one IEEE
    division of two exact ints, floor-rounded at `round_to`, NULL when
    nobody churned (never Inf — the assortativity guard).

    Shape at 100 TB: one dedup shuffle to distinct (entity, bucket),
    one entity-keyed window, then two |buckets|-keyed count aggs and a
    spine-sized outer join. Nothing after the dedup touches raw
    events.
    """
    by = list(by)
    step = F.lit(int(bucket_ns))
    act = df.select(*by, _bucket_expr(on, bucket_ns).alias("__b")) \
            .distinct()
    w = Window.partitionBy(*by).orderBy(F.col("__b").asc())
    lagb = F.lag("__b").over(w)
    leadb = F.lead("__b").over(w)
    flags = act.select(
        F.col("__b"),
        F.when(lagb.isNull(), 1).otherwise(0).alias("__new"),
        F.when(lagb == F.col("__b") - step, 1).otherwise(0).alias("__ret"),
        F.when(lagb.isNotNull() & (lagb < F.col("__b") - step), 1)
         .otherwise(0).alias("__res"),
        F.when(leadb.isNull() | (leadb > F.col("__b") + step),
               F.col("__b") + step).alias("__churn_b"))
    inflow = (flags.groupBy(F.col("__b").alias("bucket"))
              .agg(F.sum("__new").alias("n_new"),
                   F.sum("__ret").alias("n_retained"),
                   F.sum("__res").alias("n_resurrected")))
    mx = act.agg(F.max("__b").alias("__mx"))
    churn = (flags.where(F.col("__churn_b").isNotNull())
             .crossJoin(F.broadcast(mx))
             .where(F.col("__churn_b") <= F.col("__mx"))
             .groupBy(F.col("__churn_b").alias("bucket"))
             .agg(F.count(F.lit(1)).alias("n_churned")))
    out = inflow.join(churn, ["bucket"], "full")
    nn = F.coalesce(F.col("n_new"), F.lit(0)).cast("long")
    nr = F.coalesce(F.col("n_retained"), F.lit(0)).cast("long")
    ns = F.coalesce(F.col("n_resurrected"), F.lit(0)).cast("long")
    nc = F.coalesce(F.col("n_churned"), F.lit(0)).cast("long")
    s = float(10 ** round_to)
    quick = (F.floor((nn + ns).cast("double") / nc.cast("double")
                     * F.lit(s) + F.lit(0.5)) / F.lit(s))
    return out.select("bucket", nn.alias("n_new"),
                      nr.alias("n_retained"), ns.alias("n_resurrected"),
                      nc.alias("n_churned"),
                      F.when(nc > 0, quick).alias("quick_ratio"))


def dau_anomaly(df: DataFrame, by: Sequence[str] = ("user_id",),
                on: str = "time", bucket_ns: int = 86_400_000_000_000,
                threshold: float = 3.5) -> DataFrame:
    """Traffic-anomaly screen over the DAU series — "did activity dip
    or spike", the first chart every incident review pulls up: the
    Iglewicz–Hoaglin modified z-score (the shared mad_score definition,
    so the arithmetic cannot drift from ts_mad_outliers / the Hampel
    twin) over active_users' daily distinct-entity counts. Audit view:
    EVERY day reports (bucket, dau, robust_z, is_anomaly); MAD = 0 (a
    perfectly flat week) scores NULL and flags nothing, the Hampel
    convention.

    Shape at 100 TB: the raw stream collapses through active_users'
    distinct-(entity, day) front stage (window_buckets=1 — no WAU
    fan-out is paid); everything after lives on the |days|-row DAU
    table — two 1-row global median aggregates crossJoin-broadcast
    back, the quality_sample/heavy_hitters scalar pattern on a
    spine-class bounded table.
    """
    act = active_users(df, by=by, on=on, bucket_ns=bucket_ns,
                       window_buckets=1).select("bucket", "dau")
    med = act.agg(F.median("dau").alias("med"))
    prof = (act.crossJoin(F.broadcast(med))
            .agg(F.first("med").alias("med"),
                 F.median(F.abs(F.col("dau") - F.col("med")))
                 .alias("mad")))
    scored = act.crossJoin(F.broadcast(prof))
    z, flag = mad_score(F.col("dau").cast("double"), F.col("med"),
                        F.col("mad"), threshold)
    return scored.select("bucket", "dau", z.alias("robust_z"),
                         flag.alias("is_anomaly"))


def seasonal_anomalies(df: DataFrame, on: str = "time",
                       by: Sequence[str] = ("event_type",),
                       value_col: str = "value",
                       bucket_ns: int = 3_600_000_000_000,
                       period: int = 24,
                       threshold: float = 3.5) -> DataFrame:
    """Seasonal-adjusted anomaly detection: Iglewicz–Hoaglin modified
    z-score over the RESIDUALS of the classical decomposition — the
    composition every monitoring stack ships as "anomaly detection with
    seasonality" (a raw-value MAD flags every rush-hour peak; scoring
    the residual keeps trend and diurnal cycle out of the anomaly
    budget). Composes seasonal_decompose + mad_profile + mad_score —
    the three existing gate-hardened pieces, no new arithmetic — and
    emits the flagged rows: (series, bucket, v, resid, robust_z).

    Shape at scale: decompose's single raw shuffle (everything after
    the bucket stage is |series|·|buckets| sketch-sized); mad_profile's
    two residual aggregations and the 2-doubles-per-series broadcast
    ride the sketch too. Only fully-windowed rows (resid non-NULL)
    participate — decompose's no-padding contract.
    """
    by = list(by)
    d = seasonal_decompose(df, on, by, value_col, bucket_ns, period)
    r = d.where(F.col("resid").isNotNull())
    prof = mad_profile(r, by=by, value_col="resid")
    j = r.join(F.broadcast(prof), by)
    z, flag = mad_score(F.col("resid"), F.col("med"), F.col("mad"),
                        threshold)
    return (j.select(*by, "bucket", _fr(F.col("v"), 6).alias("v"),
                     "resid", z.alias("robust_z"))
            .where(F.coalesce(F.abs(z) > threshold, F.lit(False))))


def attribution(df: DataFrame, conversion_type: str = "purchase",
                by: Sequence[str] = ("user_id",), on: str = "time",
                type_col: str = "event_type", value_col: str = "value",
                id_col: str = "event_id", window_ns: int | None = None,
                model: str = "last") -> DataFrame:
    """Marketing-touch attribution: each conversion event credits the
    entity's last (or first) non-conversion touch event at-or-before the
    conversion time, optionally only within a `window_ns` lookback;
    unattributed conversions report channel '(none)'. Output per channel:
    (channel, conversions, revenue) — revenue is the exact-decimal sum of
    the conversion events' value column (the _dsum convention).

    Added scope (the reference proxies InfluxQL only) — the funnel's
    revenue-accounting sibling, the standard single-touch attribution
    models of the product-analytics engines.

    Shape at 100 TB: NOT a conversions×touches pairwise join — the union
    stream sorts once per entity (one keyed window, ordered by
    (time, kind, event_id) so same-timestamp touches precede their
    conversion and the latest/earliest touch wins deterministically) and
    the qualifying touch is carried by last_value(ignoreNulls)/first_value
    across that frame. One entity-keyed exchange over the two filtered
    event classes, then a |channels|-row aggregation.
    """
    by = list(by)
    is_conv = F.col(type_col) == F.lit(conversion_type)
    # null-time rows are unorderable (and Spark/DuckDB default null
    # ordering differs) — excluded from both engines by contract
    tagged = df.where(F.col(on).isNotNull()).select(
        *by, F.col(on).alias("__t"), F.col(type_col).alias("__ch"),
        F.col(value_col).alias("__v"),
        is_conv.cast("int").alias("__k"),
        F.col(id_col).alias("__id"))
    w = (Window.partitionBy(*by)
         .orderBy(F.col("__t").asc(), F.col("__k").asc(),
                  F.col("__id").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    touch = F.when(F.col("__k") == 0,
                   F.struct(F.col("__t").alias("t"),
                            F.col("__ch").alias("ch")))
    if model == "last":
        carried = F.last(touch, ignorenulls=True).over(w)
    elif model == "first":
        carried = F.first(touch, ignorenulls=True).over(w)
    else:
        raise ValueError(f"unknown attribution model {model!r}; "
                         "expected 'last' or 'first'")
    conv = (tagged.withColumn("__touch", carried)
            .where(F.col("__k") == 1))
    in_window = F.col("__touch").isNotNull()
    if window_ns is not None:
        in_window = in_window & (
            F.col("__t") - F.col("__touch.t") <= F.lit(int(window_ns)))
    channel = F.when(in_window, F.col("__touch.ch")).otherwise("(none)")
    return (conv.select(channel.alias("channel"), "__v")
            .groupBy("channel")
            .agg(F.count(F.lit(1)).alias("conversions"),
                 (F.sum(F.col("__v").cast("decimal(28,6)"))
                  .cast("double")).alias("revenue")))


def rfm_segments(df: DataFrame, conversion_type: str = "purchase",
                 by: Sequence[str] = ("user_id",), on: str = "time",
                 type_col: str = "event_type", value_col: str = "value",
                 now_ns: int | None = None) -> DataFrame:
    """RFM (recency / frequency / monetary) quartile segmentation over
    conversion events: per entity, recency = now − last conversion time
    in whole SECONDS (ns recency magnitudes exceed double's 2^53 and
    the quartile comparisons run in double — seconds keep every operand
    exactly representable), frequency = conversion count, monetary =
    exact-cents value sum; each
    scored 1–4 against the population's exact interpolating quartiles
    (score = 1 + #thresholds strictly exceeded; recency inverted so
    fresher entities score higher). Output: one row per populated
    (r_score, f_score, m_score) cell with its entity count and
    exact-decimal revenue total — the classic CRM segmentation cube,
    ≤64 rows.

    Quartile thresholds come from ONE 1-row scalar aggregate broadcast
    back as literals (the doc_quality_sample allowlisted pattern;
    percentile_approx is the documented 100 TB swap). All three metrics
    are exact integers (ns recency, counts, cents), so the only floats
    are the interpolated thresholds — computed identically by both
    engines from identical integer inputs — and the strict-> comparisons
    are deterministic at ties.
    """
    by = list(by)
    if now_ns is None:
        raise ValueError("rfm_segments requires an explicit now_ns "
                         "anchor (deterministic-now convention)")
    conv = df.where((F.col(type_col) == F.lit(conversion_type))
                    & F.col(on).isNotNull())
    ent = (conv.groupBy(*by)
           .agg(F.max(on).alias("__last"),
                F.count(F.lit(1)).alias("__freq"),
                F.sum(F.floor(F.col(value_col) * 100 + F.lit(0.5))
                      .cast("long")).alias("__cents"))
           .withColumn("__rec", F.expr(
               f"({int(now_ns)} - __last) div 1000000000"))
           .drop("__last"))
    qs = ent.agg(
        F.percentile("__rec", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75)]))
        .alias("qr"),
        F.percentile("__freq", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75)]))
        .alias("qf"),
        F.percentile("__cents", F.array(*[F.lit(x) for x in (0.25, 0.5, 0.75)]))
        .alias("qm")).collect()[0]

    def score(col, q):
        s = F.lit(1)
        for t in q:
            s = s + (F.col(col) > F.lit(float(t))).cast("int")
        return s

    scored = ent.select(
        *by,
        (F.lit(5) - score("__rec", qs["qr"])).alias("r_score"),
        score("__freq", qs["qf"]).alias("f_score"),
        score("__cents", qs["qm"]).alias("m_score"),
        F.col("__cents"))
    return (scored.groupBy("r_score", "f_score", "m_score")
            .agg(F.count(F.lit(1)).alias("n_entities"),
                 (F.sum(F.col("__cents")) / F.lit(100.0)).alias("revenue")))


def runs_test(df: DataFrame, on: str = "time",
              by: Sequence[str] = ("event_type",), value_col: str = "value",
              bucket_ns: int = 3_600_000_000_000) -> DataFrame:
    """Wald–Wolfowitz runs test for randomness per series (Wald &
    Wolfowitz 1940): bucket the series to interval means, binarize
    against the series median (ties-to-median dropped, the classic
    treatment), count runs R of consecutive same-sign values, and score

        z = (R - mu) / sqrt(var),  mu = 1 + 2 n1 n2 / n,
        var = 2 n1 n2 (2 n1 n2 - n) / (n^2 (n - 1)),  n = n1 + n2

    Too few runs ⇒ trending/clustered; too many ⇒ oscillating. R, n1,
    n2 are exact integers (bucket means and the median are the gate-
    hardened decimal/round-6 forms, so the > / < binarization is
    deterministic); mu/var/z are one fixed float expression over those
    integers, floor-rounded at 6; `nonrandom` compares the ROUNDED z to
    1.96 so the flag cannot straddle engines. Series with n < 2 or
    var = 0 report NULL z (insufficient evidence), never vanish.

    Shape at scale: one raw→bucket shuffle, a |series|-row median join,
    one ordered per-series window for the run boundaries, one final
    per-series agg. Everything after the bucket stage is sketch-sized.
    """
    by = list(by)
    if not by:
        raise ValueError("runs_test requires at least one series key")
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    med = g.groupBy(*by).agg(F.median("v").alias("__med"))
    s = (g.join(F.broadcast(med), by)
         .where(F.col("v") != F.col("__med"))
         .select(*by, "bucket", (F.col("v") > F.col("__med")).alias("__up")))
    w = Window.partitionBy(*by).orderBy("bucket")
    marked = s.withColumn(
        "__new_run",
        F.when(F.lag("__up").over(w).isNull()
               | (F.col("__up") != F.lag("__up").over(w)), 1).otherwise(0))
    agg = (marked.groupBy(*by)
           .agg(F.sum("__new_run").cast("long").alias("runs"),
                F.sum(F.col("__up").cast("long")).alias("n_above"),
                F.sum((~F.col("__up")).cast("long")).alias("n_below")))
    # LEFT join back onto the series list (the r6 trend-family
    # discipline): an all-equal series drops every tie-to-median row
    # and would otherwise VANISH instead of reporting NULL z
    agg = (med.select(*by).join(agg, by, "left")
           .select(*by,
                   F.coalesce(F.col("runs"), F.lit(0)).alias("runs"),
                   F.coalesce(F.col("n_above"), F.lit(0)).alias("n_above"),
                   F.coalesce(F.col("n_below"), F.lit(0)).alias("n_below")))
    n = F.col("n_above") + F.col("n_below")
    two = 2.0 * F.col("n_above") * F.col("n_below")
    mu = 1.0 + two / n
    var = (two * (two - n)) / (n * n * (n - 1))
    z = F.when((n >= 2) & (var > 0),
               _fr((F.col("runs") - mu) / F.sqrt(var), 6))
    return agg.select(
        *by, "n_above", "n_below", "runs", z.alias("z"),
        F.when(z.isNotNull(), F.abs(z) > 1.96).alias("nonrandom"))


def peaks(df: DataFrame, on: str = "time",
          by: Sequence[str] = ("event_type",), value_col: str = "value",
          bucket_ns: int = 3_600_000_000_000, k: int = 2) -> DataFrame:
    """Local-maximum detection per series: a bucket mean is a peak when
    it STRICTLY exceeds all k preceding and all k following bucket
    means, with the full 2k neighborhood present (edge buckets with a
    truncated window never qualify — the contract matches scipy
    argrelmax's interior-only behavior on the bucketed grid).

    Pure comparisons over the gate-hardened round-6 bucket means —
    no new arithmetic, engine parity is free. One raw→bucket shuffle +
    one ordered per-series window (frame of 2k+1 scalars).
    """
    by = list(by)
    if not by:
        raise ValueError("peaks requires at least one series key")
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    w = Window.partitionBy(*by).orderBy("bucket")
    prev = Window.partitionBy(*by).orderBy("bucket").rowsBetween(-k, -1)
    nxt = Window.partitionBy(*by).orderBy("bucket").rowsBetween(1, k)
    return (g.select(
        *by, "bucket", "v",
        F.count(F.lit(1)).over(prev).alias("__np"),
        F.max("v").over(prev).alias("__mp"),
        F.count(F.lit(1)).over(nxt).alias("__nn"),
        F.max("v").over(nxt).alias("__mn"))
        .where((F.col("__np") == k) & (F.col("__nn") == k)
               & (F.col("v") > F.col("__mp")) & (F.col("v") > F.col("__mn")))
        .select(*by, "bucket", "v"))


def autoperiod(df: DataFrame, on: str = "time",
               by: Sequence[str] = ("event_type",), value_col: str = "value",
               bucket_ns: int = 3_600_000_000_000,
               max_lag: int = 12) -> DataFrame:
    """Dominant-period detection per series: the lag in 1..max_lag with
    the highest sample autocorrelation (ties → smallest lag) — the ACF
    half of the AUTOPERIOD method (Vlachos et al. 2005; the
    periodogram half needs an FFT, out of scope by design). Composes
    the gate-hardened `acf` operator (already rounded at 6, so the
    argmax ordering is deterministic cross-engine) with one per-series
    rank over max_lag rows.

    Returns (series, period_lag, acf_peak, period_ns). A series whose
    every lag row is absent (shorter than 2 buckets) emits nothing —
    the acf contract.
    """
    by = list(by)
    a = acf(df, on, by, value_col, bucket_ns, max_lag)
    w = Window.partitionBy(*by).orderBy(F.col("acf").desc(),
                                        F.col("lag").asc())
    return (a.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .select(*by, F.col("lag").alias("period_lag"),
                    F.col("acf").alias("acf_peak"),
                    (F.col("lag") * F.lit(int(bucket_ns)))
                    .cast("long").alias("period_ns")))


def sax_symbols(df: DataFrame, on: str = "time",
                by: Sequence[str] = ("event_type",),
                value_col: str = "value",
                bucket_ns: int = 3_600_000_000_000,
                segments: int = 32, alphabet: int = 4,
                max_buckets: int = 4096) -> DataFrame:
    """SAX symbolization per series (Lin, Keogh, Lonardi & Chiu 2003,
    "A Symbolic Representation of Time Series, with Implications for
    Streaming Algorithms"): PAA-reduce the bucket-mean sequence to
    `segments` equal-count segments, z-normalize against the SERIES
    mean/stddev, and map each segment mean to a letter by the standard
    Gaussian equiprobable breakpoints — the discretization front of
    motif mining, of symbolic anomaly detection, and of building
    inverted indexes over a fleet of metric series.

    Determinism (the family contract): segment assignment is the EXACT
    integer rule seg = floor(rank·segments/n) over the (bucket ASC)
    row order — no float boundaries in row routing; series moments are
    decimal-exact (Σv, Σv² accumulated as DECIMAL(28,6)/(38,12) of the
    already-round-6 bucket means — the assortativity construction);
    the z-score is two IEEE ops (one subtract-divide, one sqrt) on
    exact-decimal-derived doubles, floor-rounded at 6 BEFORE the
    breakpoint comparisons, so symbol routing compares identical
    rounded doubles on both engines. Breakpoints are driver-side
    literals (scipy's ppf table inlined for a ∈ {3..8} — public
    constants from the paper's Table 3 lineage).

    Shape at 100 TB: the shared _bucket_means shuffle, one |series|-
    row moment aggregate joined back (sketch-sized), one per-series
    window for ranks, one (series, segment) aggregate —
    |series|·segments output rows. A constant series (σ = 0) reports
    NULL z/symbol ("unknown", never a fabricated letter); series
    longer than max_buckets raise loudly (the pettitt cap contract).

    Added scope (the reference has no symbolic surface) — cited
    against SURVEY §2 as a training-data/feature-pipeline operator.
    """
    _BREAKPOINTS = {
        3: [-0.4307272992954576, 0.4307272992954576],
        4: [-0.6744897501960817, 0.0, 0.6744897501960817],
        5: [-0.8416212335729142, -0.2533471031357997,
            0.2533471031357997, 0.8416212335729142],
        6: [-0.9674215661017014, -0.4307272992954576, 0.0,
            0.4307272992954576, 0.9674215661017014],
        7: [-1.0675705238469575, -0.5659488219378827,
            -0.18001236936363817, 0.18001236936363817,
            0.5659488219378827, 1.0675705238469575],
        8: [-1.1503493803760083, -0.6744897501960817,
            -0.3186393639643752, 0.0, 0.3186393639643752,
            0.6744897501960817, 1.1503493803760083],
    }
    if alphabet not in _BREAKPOINTS:
        raise ValueError(f"sax_symbols: alphabet must be in "
                         f"{sorted(_BREAKPOINTS)}")
    if segments < 1:
        raise ValueError("sax_symbols: segments must be >= 1")
    by = list(by)
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    n_chk = (g.groupBy(*by).agg(F.count(F.lit(1)).alias("__n"))
             .where(F.col("__n") > max_buckets).limit(1).collect())
    if n_chk:
        raise ValueError(
            f"sax_symbols: a series exceeds max_buckets={max_buckets} "
            "buckets; widen bucket_ns or raise the cap")
    # series moments, decimal-exact over the round-6 bucket means
    mom = (g.groupBy(*by)
           .agg(F.count(F.lit(1)).alias("__n"),
                F.sum(F.col("v").cast("decimal(28,6)")).alias("__s1"),
                F.sum((F.col("v") * F.col("v")).cast("decimal(38,12)"))
                .alias("__s2")))
    # the SUMS are decimal-exact (order-free); the variance combination
    # then runs in DOUBLE with a pinned parenthesization — a decimal
    # product s2·n would cross Spark's precision-38 loss boundary, and
    # identical exact-decimal inputs make the IEEE ops engine-identical
    s1d, s2d = F.col("__s1").cast("double"), F.col("__s2").cast("double")
    nd = F.col("__n").cast("double")
    # greatest(·, 0): float cancellation on a (near-)constant series
    # can land s2·n − s1² a few ulps NEGATIVE — Spark's sqrt would give
    # NaN (and DuckDB's raises), and NaN ordering DIFFERS between the
    # engines (NaN > 0 is false in Spark, TRUE in DuckDB), so the
    # clamp is a cross-engine-correctness guard, not cosmetics
    varn2 = F.greatest(s2d * nd - s1d * s1d, F.lit(0.0))
    mom = mom.select(*by, "__n",
                     (s1d / nd).alias("__mu"),
                     F.sqrt(varn2 / (nd * nd)).alias("__sigma"))
    w = Window.partitionBy(*by).orderBy("bucket")
    # integer-exact floor((rank-1)·segments / n): subtract the pmod
    # remainder first so the division is of an exact multiple — no
    # float quotient anywhere in row routing
    num = (F.row_number().over(w) - 1) * F.lit(int(segments))
    seg = ((num - F.pmod(num, F.col("__n"))) / F.col("__n")).cast("long")
    segd = (g.join(mom.select(*by, "__n"), by)
            .select(*by, seg.alias("segment"), "v"))
    paa = (segd.groupBy(*by, "segment")
           .agg(_decimal_mean(F.col("v")).alias("paa"),
                F.count(F.lit(1)).alias("n_pts")))
    z_raw = (F.col("paa") - F.col("__mu")) / F.col("__sigma")
    z = F.when(F.col("__sigma") > 0, _fr(z_raw, 6))
    bps = _BREAKPOINTS[alphabet]
    sym = F.when(F.col("z").isNull(), F.lit(None).cast("string"))
    letters = [chr(ord("a") + i) for i in range(alphabet)]
    cond = F.lit(letters[-1])
    for i in range(alphabet - 2, -1, -1):
        cond = F.when(F.col("z") < F.lit(bps[i]), F.lit(letters[i])) \
                .otherwise(cond)
    sym = sym.otherwise(cond)
    return (paa.join(mom, by)
            .withColumn("z", z)
            .select(*by, "segment", "n_pts", "paa", "z",
                    sym.alias("symbol")))


def matrix_profile(df: DataFrame, on: str = "time",
                   by: Sequence[str] = ("event_type",),
                   value_col: str = "value",
                   bucket_ns: int = 3_600_000_000_000,
                   m: int = 4, max_buckets: int = 2048) -> DataFrame:
    """Euclidean matrix profile per series (Yeh et al. 2016, "Matrix
    Profile I: All Pairs Similarity Joins for Time Series" — the
    motif/discord workhorse): for every length-m window of the
    bucket-mean sequence, the distance to its NEAREST non-trivial
    neighbor window (exclusion zone |i−j| < m, the standard trivial-
    match guard) plus that neighbor's index. Low profile = motif
    (repeated behavior), high profile = discord (the series' most
    anomalous stretch) — the modern complement of the MAD/CUSUM
    point-outlier screens.

    This pins the UN-normalized Euclidean variant: squared distance
    d²(i,j) = Σ_{k<m}(x_{i+k}−x_{j+k})² accumulated term-by-term in
    DECIMAL(30,12) from the round-6 bucket means, so every pairwise
    distance is EXACT and the argmin over (d², j) — one fold-order-free
    min(struct) aggregate, the LPA convention — is deterministic on any
    engine/partitioning. (The z-normalized variant divides by window
    σ's — float-heavy with no exactness story; at scale swap in the
    STOMP recurrence behind the same output contract.) Only the final
    reported distance takes the IEEE sqrt, floor-rounded at 6.

    Shape: the shared _bucket_means shuffle; windows materialize as m
    lead columns (map-only); the pair stage is the pettitt-class
    bucket-quadratic self-join — bounded by the LOUD max_buckets cap
    (default 2048 → ≤ ~2M pairs/series of (2 longs + m doubles)-wide
    rows); argmin = one (series, i)-keyed aggregate. At 100 TB series
    count scales out, series LENGTH is capped by contract — the same
    trade every published MP-at-scale system makes per-partition.

    Added scope (the reference has no motif surface).
    """
    by = list(by)
    if m < 2:
        raise ValueError("matrix_profile: m must be >= 2")
    g = _bucket_means(df, on, by, value_col, bucket_ns)
    n_chk = (g.groupBy(*by).agg(F.count(F.lit(1)).alias("__n"))
             .where(F.col("__n") > max_buckets).limit(1).collect())
    if n_chk:
        raise ValueError(
            f"matrix_profile: a series exceeds max_buckets="
            f"{max_buckets} buckets; widen bucket_ns or raise the cap")
    w = Window.partitionBy(*by).orderBy("bucket")
    cols = [F.col("v").alias("__w0")] + [
        F.lead("v", k).over(w).alias(f"__w{k}") for k in range(1, m)]
    idx = (F.row_number().over(w) - 1).alias("i")
    win = (g.select(*by, idx, *cols)
           .where(F.col(f"__w{m - 1}").isNotNull()))
    a = win.select(*by, "i", *[F.col(f"__w{k}").alias(f"__a{k}")
                               for k in range(m)])
    b = win.select(*[F.col(k).alias(f"__b_{k}") for k in by],
                   F.col("i").alias("j"),
                   *[F.col(f"__w{k}").alias(f"__b{k}") for k in range(m)])
    # exact decimal d²: each squared diff is one double subtract+square
    # (identical operands both engines), cast DECIMAL(30,12) and summed
    # term-by-term in a FIXED left-to-right parenthesization — (30,12)
    # operands keep every intermediate addition under Spark's
    # precision-38 loss boundary for any m ≤ ~10^5 (each add widens
    # precision by 1), bounding |diff| ≤ 10^9 per the cap contract
    d2 = F.lit(0).cast("decimal(30,12)")
    for k in range(m):
        diff = F.col(f"__a{k}") - F.col(f"__b{k}")
        d2 = d2 + (diff * diff).cast("decimal(30,12)")
    pairs = (a.join(b, [a[k] == b[f"__b_{k}"] for k in by])
             .where(F.abs(F.col("i") - F.col("j")) >= m)
             .select(*by, "i", "j", d2.alias("__d2")))
    best = (pairs.groupBy(*by, "i")
            .agg(F.min(F.struct(F.col("__d2"), F.col("j")))
                 .alias("__best")))
    return (best.select(*by, "i",
                        F.col("__best.j").alias("nn_index"),
                        _fr(F.sqrt(F.col("__best.__d2").cast("double")),
                            6).alias("nn_dist"))
            )


def activity_concentration(df: DataFrame,
                           by: Sequence[str] = ("user_id",),
                           type_col: str = "event_type") -> DataFrame:
    """Per-type activity-concentration audit — Gini coefficient + top-
    decile share of the per-entity event-count distribution (Gini 1912
    via the rank formula; Dorfman 1979's "A Formula for the Gini
    Coefficient"): the one-number answer to "is this event type's
    volume a broad base or three whales?", which is simultaneously the
    SKEW AUDIT for every entity-keyed shuffle downstream — a type with
    gini → 1 is exactly the type whose groupBy(entity) needs salting
    (the graph degree_histogram companion, on the events side).

        G = (2·Σ i·c_i − (n+1)·Σc) / (n·Σc),  c ascending, i = 1..n

    Exactness: counts and ranks are integers; Σ i·c_i accumulates as
    DECIMAL(38,0) (i·c overflows BIGINT at 10¹⁰ entities × 10¹² events
    scale); within a tied count block the Σ i·c_i contribution is
    permutation-invariant, so the (cnt, entity) rank tie-break cannot
    change G — but is pinned anyway (the family convention). G and the
    top-decile share are each ONE floor-round-6 division of exact
    integers; the decile head count is the integer ceil(n/10) =
    (n+9) div 10, no float rank boundary. A single-entity type reports
    G = 0 (no inequality measurable), never NULL/NaN.

    Shape at 100 TB: one (type, entity) count shuffle (partial agg
    map-side), ONE type-keyed window pass carrying BOTH the rank and
    the per-type total (two window specs over the same partitioning —
    one exchange, one sort), one |types|-row final aggregate with the
    decile tail as a conditional sum inside it. Nothing quadratic, no
    join-back: the count table is read once.

    Added scope (the reference has no concentration surface).
    """
    by = list(by)
    if not by:
        raise ValueError("activity_concentration requires entity keys")
    cnt = (df.where(F.col(type_col).isNotNull())
           .groupBy(type_col, *by)
           .agg(F.count(F.lit(1)).alias("__c")))
    w = Window.partitionBy(type_col).orderBy(
        F.col("__c").asc(), *[F.col(k).asc() for k in by])
    wn = Window.partitionBy(type_col)
    r = cnt.select(type_col, "__c",
                   F.row_number().over(w).alias("__i"),
                   F.count(F.lit(1)).over(wn).alias("__n"))
    # i·c as DECIMAL(18,0)×DECIMAL(18,0) → (37,0) — multiplying in LONG
    # would overflow silently at 10^10 entities × 10^12 events, and a
    # (38,0)×(38,0) product would cross Spark's precision-38 loss
    # boundary; 18-digit operands bound the contract at n_entities,
    # n_events < 10^18 (documented, far beyond any real corpus)
    dec = lambda c: c.cast("decimal(18,0)")
    # top-decile tail flag: ASC rank i is in the top ceil(n/10) iff
    # i > n − ceil(n/10); ceil(n/10) = (n+9 − pmod(n+9, 10))/10 is an
    # exact-multiple division — integer everywhere
    ceil10 = ((F.col("__n") + 9 - F.pmod(F.col("__n") + 9, F.lit(10)))
              / F.lit(10)).cast("long")
    in_tail = F.col("__i") > F.col("__n") - ceil10
    agg = (r.groupBy(type_col)
           .agg(F.count(F.lit(1)).alias("n_entities"),
                F.sum("__c").alias("n_events"),
                F.sum(dec(F.col("__i")) * dec(F.col("__c")))
                .alias("__ric"),
                F.sum(F.when(in_tail, F.col("__c")).otherwise(F.lit(0)))
                .alias("__top")))
    g_num = (F.col("__ric") + F.col("__ric")
             - dec(F.col("n_entities") + 1) * dec(F.col("n_events")))
    g_den = dec(F.col("n_entities")) * dec(F.col("n_events"))
    return agg.select(type_col, "n_entities", "n_events",
                      _fr(g_num.cast("double") / g_den.cast("double"), 6)
                      .alias("gini"),
                      _fr(F.col("__top").cast("double")
                          / F.col("n_events").cast("double"), 6)
                      .alias("top_decile_share"))


def markov_stationary(df: DataFrame, by: Sequence[str] = ("user_id",),
                      on: str = "time", type_col: str = "event_type",
                      iters: int = 10) -> DataFrame:
    """Stationary distribution of the empirical event-transition chain
    (power iteration over the row-normalized `type_transitions` matrix
    — the long-run "where does a user's session settle" summary that
    turns the Sankey edge list into one importance score per state;
    PageRank's chain-theoretic parent, Kemeny & Snell 1960).

    EXACT FIXED-POINT INTEGERS end to end (the graph.pagerank
    convention — float power iteration drifts ulps between engines and
    fold orders; this is bit-stable by construction):

        p_ij = (n_ij · 10⁶) div n_i          (row-normalize ONCE)
        π_0  = 10¹² div S                     (S = number of states)
        π_{t+1}(j) = Σ_i (π_t(i) · p_ij) div 10⁶

    Every operand is a BIGINT and every division a floor; the bound
    π·p ≤ 10¹²·10⁶ = 10¹⁸ keeps all products inside int64, and
    normalization requires n_ij ≤ 9.2·10¹² (checked LOUDLY — beyond
    that, raise the probability scale's complement). Floor truncation
    leaks ≤1 unit per nonzero p_ij per iteration plus the ≤outdeg
    row-normalization deficit — a ≤1e-6-relative artifact identically
    replayed by the oracle's unrolled CTEs. DANGLING states (observed
    only as a transition target) get an exact self-loop p = 10⁶: they
    absorb, which is the truthful long-run behavior of the observed
    chain (teleportation belongs to pagerank's damping, not here).

    Shape at 100 TB: the `type_transitions` front stage (ONE entity-
    keyed window shuffle); everything after lives on the sparse
    |observed pairs|-bounded edge table and |states|-row π vectors —
    `iters` joins over sketch-sized tables, no checkpoint needed (the
    plan depth is parameter-bounded and the tables are tiny, unlike
    pagerank's O(|V|) frontiers).

    Added scope (the reference has no chain-analysis surface).
    """
    SCALE_PI, SCALE_P = 1_000_000_000_000, 1_000_000
    trans = (type_transitions(df, by, on, type_col)
             .select("from_type", "to_type", "n_transitions"))
    from ..cache import keep
    # states = every type observed in any transition role
    states = keep("ts.markov.states",
                  trans.select(F.col("from_type").alias("state"))
                  .union(trans.select(F.col("to_type").alias("state")))
                  .distinct())
    outd = trans.groupBy("from_type").agg(
        F.sum("n_transitions").alias("__n"))
    # overflow guard IN the plan (the pettitt raise_error convention —
    # an eager collect probe here would run the whole entity-window
    # pipeline once per construction): beyond 9.2e12 transitions per
    # pair, n_ij·10⁶ wraps int64 under non-ANSI arithmetic
    p_val = (F.when(F.col("n_transitions") <= 9_200_000_000_000,
                    F.expr(f"(n_transitions * {SCALE_P}) div __n"))
             .otherwise(F.raise_error(F.lit(
                 "markov_stationary: a transition count exceeds 9.2e12 "
                 "- n_ij * 1e6 would overflow int64 in row "
                 "normalization"))))
    p = (trans.join(outd, "from_type")
         .select(F.col("from_type").alias("src"),
                 F.col("to_type").alias("dst"),
                 p_val.cast("long").alias("__p")))
    # dangling states: exact self-loop
    dangle = (states.join(trans.select(F.col("from_type").alias("state"))
                          .distinct(), "state", "left_anti")
              .select(F.col("state").alias("src"),
                      F.col("state").alias("dst"),
                      F.lit(SCALE_P).cast("long").alias("__p")))
    p = keep("ts.markov.p", p.unionByName(dangle))
    # π_0 = 10¹² div S with S the state count as an IN-PLAN 1-row
    # scalar (the q11/tpch_q15 crossJoin convention) — the previous
    # eager states.count() here ran the whole entity-window transition
    # pipeline once at CONSTRUCTION time, so plan-only callers
    # (explain, fingerprint capture) paid a real Spark job. An empty
    # states table short-circuits naturally: empty × 1-row = empty,
    # and the div-by-zero branch is never evaluated.
    n1 = states.agg(F.count(F.lit(1)).alias("__s"))
    pi = (states.crossJoin(F.broadcast(n1))
          .select("state", F.expr(f"{SCALE_PI} div __s")
                  .cast("long").alias("__pi")))
    for _ in range(int(iters)):
        moved = (pi.join(p, pi.state == p.src)
                 .select(F.col("dst").alias("state"),
                         F.expr(f"(__pi * __p) div {SCALE_P}")
                         .cast("long").alias("__c")))
        pi = (states.join(moved.groupBy("state")
                          .agg(F.sum("__c").alias("__pi")),
                          "state", "left")
              .select("state", F.coalesce(F.col("__pi"), F.lit(0))
                      .cast("long").alias("__pi")))
    return pi.select(F.col("state").alias(type_col),
                     F.col("__pi").alias("pi_fp"),
                     _fr(F.col("__pi").cast("double")
                         / F.lit(float(SCALE_PI)), 6).alias("pi"))


def quantile_bands(df: DataFrame, on: str = "time",
                   by: Sequence[str] = ("event_type",),
                   value_col: str = "value",
                   bucket_ns: int = 3_600_000_000_000) -> DataFrame:
    """Per-(series, bucket) latency/value bands — count, p50/p95/p99
    and max — THE monitoring workhorse table (SLO dashboards, burn-rate
    alerts, "did p99 move after the deploy") that every metrics stack
    materializes continuously; the per-bucket companion of the GLOBAL
    exact order statistics in `agg_median_percentile`.

    Quantiles are EXACT interpolating order statistics (the (n−1)·q
    convention — Spark `percentile` ↔ DuckDB `quantile_cont`, the
    hash-gate equivalence `ev_inter_event` pinned for the median,
    extended here to the tail), floor-rounded at 6; count and max are
    exact. At 100 TB swap `percentile_approx` (t-digest) behind the
    same columns — the documented trade on `agg_median_percentile`.

    Shape: ONE (series, bucket) shuffle; the sort cost of the exact
    order statistics is per-group (bucket-bounded), not global.

    Added scope (the reference approximates percentile per calls.go:
    46-103 and has no per-bucket band surface).
    """
    by = list(by)
    b = _bucket_expr(on, bucket_ns)
    pct = F.percentile(F.col(value_col), F.array(
        F.lit(0.5), F.lit(0.95), F.lit(0.99)))
    return (df.groupBy(*by, b.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n"),
                 pct.alias("__p"),
                 F.max(value_col).alias("__mx"))
            .select(*by, "bucket", "n",
                    _fr(F.element_at("__p", 1), 6).alias("p50"),
                    _fr(F.element_at("__p", 2), 6).alias("p95"),
                    _fr(F.element_at("__p", 3), 6).alias("p99"),
                    _fr(F.col("__mx"), 6).alias("v_max")))


def precedence_matrix(df: DataFrame, by: Sequence[str] = ("user_id",),
                      on: str = "time",
                      type_col: str = "event_type") -> DataFrame:
    """First-occurrence PRECEDENCE matrix — funnel DISCOVERY, where
    ev_funnel is funnel MEASUREMENT: for every ordered pair of event
    types (a, b), how many entities saw their FIRST a strictly before
    their FIRST b, out of the entities that saw both at all. The table
    that tells you which step orderings actually exist in the data
    before you commit a funnel definition to them ("do users really
    view before they click before they purchase, and in what
    fraction?"). Unlike type_transitions (ADJACENT steps only), a
    precedes b here across any gap — precedence is about the partial
    order of journeys, not their edges.

    Tie discipline: first occurrences are min(time) per (entity,
    type); a precedes b only if first_a < first_b STRICTLY, so two
    types debuting on the same timestamp count in n_both but in
    NEITHER direction's n_precedes — ties are visible as
    n_precedes(a,b) + n_precedes(b,a) < n_both, never silently
    awarded to one side. Exact integers end-to-end; the one division
    (share_ppm = n_precedes·10⁶ div n_both) is floor.

    Returns (type_a, type_b, n_precedes, n_both, share_ppm) for every
    ORDERED pair with n_both > 0 (both directions present — the
    asymmetry between (a,b) and (b,a) IS the funnel signal).

    Scale shape: one (entity, type) min-aggregation — map-side
    combinable, the only data-sized shuffle — then a per-entity
    self-join of the ≤|types|-row first-occurrence lists (bounded by
    the type VOCABULARY per entity, the type_transitions argument)
    into a |types|²-bounded count aggregate.
    """
    g = list(by)
    firsts = (df.where(F.col(type_col).isNotNull()
                       & F.col(on).isNotNull())
              .groupBy(*g, F.col(type_col).alias("__t"))
              .agg(F.min(on).alias("__ft")))
    a = firsts.select(*g, F.col("__t").alias("type_a"),
                      F.col("__ft").alias("__ta"))
    b = firsts.select(*g, F.col("__t").alias("type_b"),
                      F.col("__ft").alias("__tb"))
    pairs = (a.join(b, g)
             .where(F.col("type_a") != F.col("type_b")))
    return (pairs.groupBy("type_a", "type_b")
            .agg(F.sum((F.col("__ta") < F.col("__tb")).cast("long"))
                 .cast("long").alias("n_precedes"),
                 F.count(F.lit(1)).cast("long").alias("n_both"))
            .select("type_a", "type_b", "n_precedes", "n_both",
                    F.expr("(n_precedes * 1000000) div n_both")
                    .alias("share_ppm")))


def rank_sum_test(df: DataFrame, group_col: str, value_col: str,
                  group_a, group_b,
                  max_n: int = 2_000_000) -> DataFrame:
    """Mann–Whitney–Wilcoxon rank-sum test between two groups — THE
    nonparametric A/B-experiment primitive (Mann & Whitney 1947):
    does treatment shift the metric's distribution, without assuming
    normality and without the mean's outlier fragility. U counts
    cross-group pairs (a, b) with a > b (ties half) — computed here
    WITHOUT materializing pairs or ranking raw rows: per distinct
    VALUE, the two groups' counts; then U_A = Σ_v cntA(v)·(cumB(<v) +
    ½·cntB(v)) from one cumulative pass over the value-ordered count
    table. Carried as the INTEGER 2U (halves ×2), with the exact
    tie-corrected normal approximation:

      z = (U − n_a·n_b/2) / σ,
      σ² = n_a·n_b·[(n+1)·n·(n−1) − Σ_t(t³−t)] / (12·n·(n−1))

    — every term an exact BIGINT until one pinned double chain
    (multiply, divide, ONE correctly-rounded IEEE sqrt — sqrt is
    exactly rounded in IEEE 754, so both engines agree bit-for-bit),
    floor-round-6. Σ(t³−t) needs n ≤ ~2·10⁶ in int64; guarded loudly
    (pettitt convention, DECIMAL(38,0) swap documented).

    Returns ONE row: (n_a, n_b, u_a, z): u_a in exact halves (a
    double; .5 is exact), z > 0 ⟺ group_a's values sit higher.

    Scale shape: one (value)-keyed count aggregation — map-side
    combinable, |distinct values| rows out — then cumulative windows
    over the VALUE-VOCABULARY-bounded count table (the fixed-decimal
    metric's vocabulary is bounded by its precision; for genuinely
    continuous metrics, pre-bucket with _hist_bin_cols first — the
    test on the coarsened scale is the documented trade, exactly the
    histogram_quantiles argument), and a 1-row fold. The raw rows
    never ride a rank window.
    """
    ga, gb = F.lit(group_a), F.lit(group_b)
    g = F.col("__g")
    base = (df.select(F.col(group_col).alias("__g"),
                      F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull() & g.isin([group_a, group_b])))
    counts = (base.groupBy("__v")
              .agg(F.sum((g == ga).cast("long")).alias("__ca"),
                   F.sum((g == gb).cast("long")).alias("__cb")))
    return _ranksum_fold(counts, max_n)


def _ranksum_fold(counts: DataFrame, max_n: int) -> DataFrame:
    """rank_sum_test's post-counts arithmetic over a (__v, __ca, __cb)
    per-value count table — factored out (r11) so the batch operator,
    ab_test/ab_from_counts, and the streaming count twin's readout all
    share ONE pinned expression tree (bit-equality by construction,
    not by parallel maintenance)."""
    wb = (Window.orderBy("__v")
          .rowsBetween(Window.unboundedPreceding, -1))
    per_v = (counts
             .withColumn("__cumb", F.coalesce(F.sum("__cb").over(wb),
                                              F.lit(0))))
    t = F.col("__ca") + F.col("__cb")
    folded = per_v.agg(
        F.sum("__ca").cast("long").alias("n_a"),
        F.sum("__cb").cast("long").alias("n_b"),
        F.sum(F.lit(2) * F.col("__ca") * F.col("__cumb")
              + F.col("__ca") * F.col("__cb")).cast("long")
        .alias("__u2"),
        F.sum(t * t * t - t).cast("long").alias("__ties"))
    n = F.col("n_a") + F.col("n_b")
    guarded_u2 = (F.when(n > F.lit(int(max_n)),
                         F.raise_error(F.lit(
                             "rank_sum_test: n exceeds the int64 "
                             "tie-sum headroom (t^3 terms); "
                             "pre-bucket the metric or switch the "
                             "tie sum to DECIMAL(38,0)"))
                         .cast("long"))
                  .otherwise(F.col("__u2")))
    # pinned double chain: exact-integer operands, fixed op order,
    # one correctly-rounded sqrt
    num = (guarded_u2 - F.col("n_a") * F.col("n_b")).cast("double")
    s2 = ((F.col("n_a") * F.col("n_b")).cast("double")
          * ((n + 1) * n * (n - 1) - F.col("__ties")).cast("double")
          / (F.lit(12).cast("double") * (n * (n - 1)).cast("double")))
    z = (F.when((F.col("n_a") == 0) | (F.col("n_b") == 0)
                | (s2 == F.lit(0.0)), F.lit(None).cast("double"))
         .otherwise(F.floor(num * F.lit(0.5) / F.sqrt(s2)
                            * F.lit(1000000.0) + F.lit(0.5))
                    / F.lit(1000000.0)))
    return folded.select(
        "n_a", "n_b",
        (guarded_u2.cast("double") / F.lit(2.0)).alias("u_a"),
        z.alias("z"))


def ks_test(df: DataFrame, group_col: str, value_col: str,
            group_a, group_b, max_vocab: int = 2_000_000) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov D statistic — the rank-sum
    test's distribution-SHAPE companion (rank_sum_test asks "did the
    distribution shift"; KS asks "do the distributions DIFFER
    anywhere": location, spread or shape): D = sup_v |F_a(v) −
    F_b(v)| over the two empirical CDFs. Computed EXACTLY as integer
    cross-multiplication over the same per-value count machinery as
    rank_sum_test: D = max_v |cumA(v)·n_b − cumB(v)·n_a| / (n_a·n_b)
    — the max of integer numerators, then ONE floor-rounded division;
    both engines bit-equal with no sqrt needed. The asymptotic scaling
    rides along: ks_stat_scaled = D·√(n_a·n_b/(n_a+n_b)) (one
    correctly-rounded IEEE sqrt; > ~1.36 rejects at α = 0.05 in the
    classic table).

    Returns ONE row: (n_a, n_b, d_num, d_stat, ks_stat_scaled) with
    d_num the exact integer max |cumA·n_b − cumB·n_a| and d_stat
    rounded at 6. NULL statistics when either group is empty.

    Overflow: cum·n ≤ n_a·n_b ≤ n² needs n ≤ 2³¹; loudly guarded
    (pettitt convention).

    Scale shape: identical to rank_sum_test — one map-combinable
    per-value count shuffle, a cumulative pass over the value
    VOCABULARY, and a 1-row max fold. The cumulative pass is a
    keyless window, so the vocabulary size IS the single-partition
    bound: `max_vocab` (default 2·10⁶, rank_sum_test's n-cap
    convention) is enforced by an eager pre-window cap probe (the
    pettitt `limit(1).collect()` convention — the probe runs BEFORE
    the window so an unbounded continuous metric raises instead of
    funneling ~2e9 distinct values through one window task). Past
    the cap, pre-bucket the metric — `ab_test(bucket_width=...)` is
    the packaged form. `max_vocab=None` disables the probe (and its
    extra job) for callers that have already bounded the vocabulary.

    NOTE: with `max_vocab` set (the default), CONSTRUCTING this plan
    runs an eager Spark job — the probe's per-value count aggregate
    must complete before the limit applies (the limit bounds the
    post-shuffle row count, not the scan). Explain-only tooling and
    lazy plan composition should pass `max_vocab=None`.
    """
    ga, gb = F.lit(group_a), F.lit(group_b)
    g = F.col("__g")
    base = (df.select(F.col(group_col).alias("__g"),
                      F.col(value_col).alias("__v"))
            .where(F.col("__v").isNotNull() & g.isin([group_a, group_b])))
    counts = (base.groupBy("__v")
              .agg(F.sum((g == ga).cast("long")).alias("__ca"),
                   F.sum((g == gb).cast("long")).alias("__cb")))
    if max_vocab is not None:
        # cap probe (eager, pre-window): the groupBy count shuffle runs
        # in full (the limit sits ABOVE the aggregate, so it bounds the
        # result rows, not the scan), but that shuffle is map-combinable
        # and parallel — cheap next to the single-partition window the
        # raise exists to prevent; fires before any window runs
        nv = (counts.select(F.lit(1).alias("__one"))
              .limit(int(max_vocab) + 1).count())
        if nv > int(max_vocab):
            raise ValueError(
                f"ks_test: metric vocabulary exceeds max_vocab="
                f"{int(max_vocab)} distinct values — the CDF "
                "cumulative pass would funnel them through ONE window "
                "partition; pre-bucket the metric (ab_test("
                "bucket_width=...) / sketch._hist_bin_cols) or raise "
                "max_vocab deliberately")
    return _ks_fold(counts)


def _ks_fold(counts: DataFrame) -> DataFrame:
    """ks_test's post-counts arithmetic over a (__v, __ca, __cb)
    per-value count table — factored out (r11) for the same shared-
    expression-tree reason as _ranksum_fold."""
    wle = (Window.orderBy("__v")
           .rowsBetween(Window.unboundedPreceding, 0))
    per_v = (counts
             .withColumn("__cuma", F.sum("__ca").over(wle))
             .withColumn("__cumb", F.sum("__cb").over(wle)))
    wall = Window.partitionBy()
    with_totals = (per_v
                   .withColumn("__na", F.sum("__ca").over(wall))
                   .withColumn("__nb", F.sum("__cb").over(wall)))
    folded = with_totals.agg(
        F.min("__na").cast("long").alias("n_a"),
        F.min("__nb").cast("long").alias("n_b"),
        F.max(F.abs(F.col("__cuma") * F.col("__nb")
                    - F.col("__cumb") * F.col("__na")))
        .cast("long").alias("d_num"))
    guard = (F.when(F.col("n_a") + F.col("n_b") > F.lit(1 << 31),
                    F.raise_error(F.lit(
                        "ks_test: n exceeds 2^31 — cum*n leaves "
                        "int64; switch the numerators to "
                        "DECIMAL(38,0)")).cast("long"))
             .otherwise(F.col("d_num")))
    d = (F.when((F.col("n_a") == 0) | (F.col("n_b") == 0),
                F.lit(None).cast("double"))
         .otherwise(F.floor(guard.cast("double")
                            / (F.col("n_a") * F.col("n_b"))
                            .cast("double")
                            * F.lit(1000000.0) + F.lit(0.5))
                    / F.lit(1000000.0)))
    scaled = (F.when(d.isNull(), F.lit(None).cast("double"))
              .otherwise(F.floor(
                  d * F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")
                             / (F.col("n_a") + F.col("n_b"))
                             .cast("double"))
                  * F.lit(1000000.0) + F.lit(0.5))
                  / F.lit(1000000.0)))
    return folded.select("n_a", "n_b", guard.alias("d_num"),
                         d.alias("d_stat"),
                         scaled.alias("ks_stat_scaled"))


def chi_square_test(df: DataFrame, row_col: str, col_col: str,
                    max_n: int = 10 ** 8) -> DataFrame:
    """Pearson χ² test of independence over a contingency table — the
    CATEGORICAL member of the A/B trio (rank_sum_test: continuous
    shift; ks_test: continuous shape; this: are two categorical
    variables independent — variant × converted, segment × churned).
    χ² = Σ_cells (O − E)²/E with E = row·col/N, computed from EXACT
    integer counts with the fractions cleared:

      χ² = Σ_cells (O·N − row·col)² / (N·row·col)

    — each cell's term is floor-scaled to integer MICROUNITS
    (term_µ = (dev²·10⁶) div (N·row·col), DECIMAL(38,0)-held
    intermediates, exact integral division) and the fold is an
    INTEGER sum — no float accumulation anywhere, so fold order
    cannot perturb the result on any engine or partitioning (a
    double-sum fold would differ between Spark's and DuckDB's
    summation orders). The per-cell floor loses < 10⁻⁶ per cell —
    bounded by |R|·|C|·10⁻⁶ absolute, identically replayed by the
    oracle. dof = (|R|−1)(|C|−1) rides along; chi2 = Σterm_µ / 10⁶
    in one pinned division.

    Returns ONE row: (n, n_rows_cat, n_cols_cat, dof, chi2);
    chi2 NULL when dof = 0 (a degenerate 1×C or R×1 table).

    Overflow: dev²·10⁶ ≤ N⁴·10⁶ must fit DECIMAL(38,0), needing
    N ≤ 10⁸; guarded loudly (pettitt convention; beyond it,
    pre-aggregate or widen to HUGEINT-class arithmetic).

    Scale shape: one (row, col)-keyed count — map-combinable, the
    only data-sized stage — then margins and the fold over the
    |R|·|C|-bounded cell table (category vocabularies, never rows).
    """
    base = (df.select(F.col(row_col).alias("__r"),
                      F.col(col_col).alias("__c"))
            .where(F.col("__r").isNotNull() & F.col("__c").isNotNull()))
    cells = (base.groupBy("__r", "__c")
             .agg(F.count(F.lit(1)).cast("long").alias("__o")))
    rows = cells.groupBy("__r").agg(F.sum("__o").cast("long")
                                    .alias("__rm"))
    cols = cells.groupBy("__c").agg(F.sum("__o").cast("long")
                                    .alias("__cm"))
    # the full R x C spine: a cell absent from the data (O = 0) still
    # contributes (0 - E)^2/E
    spine = rows.crossJoin(F.broadcast(cols))
    full = (spine.join(cells, ["__r", "__c"], "left")
            .select("__r", "__c", "__rm", "__cm",
                    F.coalesce("__o", F.lit(0)).cast("long")
                    .alias("__o")))
    wall = Window.partitionBy()
    with_n = full.withColumn("__n", F.sum("__o").over(wall))
    guarded_o = (F.when(F.col("__n") > F.lit(int(max_n)),
                        F.raise_error(F.lit(
                            "chi_square_test: N exceeds 10^8 — "
                            "dev^2 * 10^6 leaves DECIMAL(38,0); "
                            "pre-aggregate or widen (see docstring)"))
                        .cast("long"))
                 .otherwise(F.col("__o")))
    # integer microunit term: DECIMAL(38,0) square, exact `div`
    with_term = (with_n
                 .withColumn("__dev",
                             (guarded_o * F.col("__n")
                              - F.col("__rm") * F.col("__cm"))
                             .cast("decimal(38,0)"))
                 .withColumn("__den",
                             (F.col("__n").cast("decimal(38,0)")
                              * F.col("__rm") * F.col("__cm")))
                 .withColumn("__tm",
                             F.expr("CAST((__dev * __dev * 1000000) "
                                    "div __den AS LONG)")))
    folded = with_term.agg(
        F.min("__n").cast("long").alias("n"),
        F.count_distinct("__r").cast("long").alias("n_rows_cat"),
        F.count_distinct("__c").cast("long").alias("n_cols_cat"),
        F.sum("__tm").cast("long").alias("__chi2_micro"))
    dof = ((F.col("n_rows_cat") - 1)
           * (F.col("n_cols_cat") - 1)).cast("long")
    chi2 = (F.when(dof <= 0, F.lit(None).cast("double"))
            .otherwise(F.col("__chi2_micro").cast("double")
                       / F.lit(1000000.0)))
    return folded.select("n", "n_rows_cat", "n_cols_cat",
                         dof.alias("dof"), chi2.alias("chi2"))


def ab_test(df: DataFrame, group_col: str, value_col: str,
            group_a, group_b, bucket_width: float = None,
            max_n: int = 2_000_000,
            max_vocab: int = 2_000_000) -> DataFrame:
    """The A/B experiment readout in one call — rank-sum (shift) and
    KS (shape) over the same metric, with the continuous-metric
    pre-bucketing the two tests' docstrings advise made API: when
    `bucket_width` is given, the metric is coarsened to its bucket's
    LEFT EDGE (floor(v/w)·w) before either test runs, which bounds
    the value vocabulary by range/width no matter how continuous the
    raw metric is — the vocabulary bound that makes the per-value
    count formulation safe at 100 TB (rank_sum_test / ks_test scale
    notes). Both tests on the coarsened scale is the documented
    trade, exactly the histogram_quantiles argument: U and D move by
    at most the mass that changes rank within a bucket.

    Choose a power-of-two `bucket_width` (0.25, 0.5, 8.0): v/w is
    then an exact binary scaling, so floor(v/w)·w is bit-identical
    in any IEEE-754 engine and the cross-engine gate stays exact.

    Returns ONE row — the union of the two tests' statistics over
    identical (n_a, n_b): (n_a, n_b, u_a, z, d_num, d_stat,
    ks_stat_scaled). z > 0 ⟺ group_a sits higher; ks_stat_scaled >
    ~1.36 rejects equality at α = 0.05.

    Scale shape: the two tests share ONE per-value count table (a
    single map-combinable count shuffle — r11: the folds are factored
    helpers over the shared counts, so the count machinery is built
    once, not once per test), then a vocabulary-bounded cumulative
    pass and 1-row folds each; the final combine is a 1-row × 1-row
    broadcast crossJoin. With bucket_width set, the vocabulary cap
    probe is skipped — the width already bounds it, no extra job.
    """
    v = F.col(value_col).cast("double")
    if bucket_width is not None:
        w = float(bucket_width)
        if not w > 0:
            raise ValueError("ab_test: bucket_width must be > 0")
        base = df.select(
            F.col(group_col).alias("__g"),
            (F.floor(v / F.lit(w)) * F.lit(w)).alias("__v"))
        ks_cap = None  # width bounds the vocabulary; skip the probe
    else:
        base = df.select(F.col(group_col).alias("__g"), v.alias("__v"))
        ks_cap = max_vocab
    ga, gb = F.lit(group_a), F.lit(group_b)
    g = F.col("__g")
    filt = base.where(F.col("__v").isNotNull()
                      & g.isin([group_a, group_b]))
    counts = (filt.groupBy("__v")
              .agg(F.sum((g == ga).cast("long")).alias("__ca"),
                   F.sum((g == gb).cast("long")).alias("__cb")))
    if ks_cap is not None:
        nv = (counts.select(F.lit(1).alias("__one"))
              .limit(int(ks_cap) + 1).count())
        if nv > int(ks_cap):
            raise ValueError(
                f"ab_test: metric vocabulary exceeds max_vocab="
                f"{int(ks_cap)} distinct values — pre-bucket with "
                "bucket_width=... (power-of-two widths are exact) or "
                "raise max_vocab deliberately")
    return ab_from_counts(counts, max_n=max_n)


def ab_from_counts(counts: DataFrame, value_col: str = "__v",
                   count_a: str = "__ca", count_b: str = "__cb",
                   max_n: int = 2_000_000) -> DataFrame:
    """The A/B readout over an ALREADY-AGGREGATED per-value count
    table — (value, count_in_a, count_in_b) rows in, the same ONE-row
    (n_a, n_b, u_a, z, d_num, d_stat, ks_stat_scaled) out as ab_test,
    through literally the same fold helpers (_ranksum_fold /
    _ks_fold), so the statistics are bit-identical by construction.

    This is the readout half of the live-A/B split: per-value count
    tables are MERGEABLE (cell-wise +, the countmin algebra), so a
    streaming job maintains the counts incrementally
    (streaming/ab_stream.py — per-value keyed state, no single-key
    funnel) or a rollup job keeps per-hour count partials, and this
    fold turns any merged snapshot into the test statistics. The
    cumulative pass is bounded by the count table's vocabulary — the
    caller owns the bucketing contract (ab_test's bucket_width note).
    """
    c = counts.select(F.col(value_col).alias("__v"),
                      F.col(count_a).cast("long").alias("__ca"),
                      F.col(count_b).cast("long").alias("__cb"))
    rs = _ranksum_fold(c, max_n)
    ks = _ks_fold(c).select("d_num", "d_stat", "ks_stat_scaled")
    return (rs.crossJoin(F.broadcast(ks))
            .select("n_a", "n_b", "u_a", "z",
                    "d_num", "d_stat", "ks_stat_scaled"))


def cuped(df: DataFrame, group_col: str, y_col: str, x_col: str,
          group_a, group_b, scale: float = 100.0) -> DataFrame:
    """CUPED variance-reduced A/B readout (Deng, Xu, Kohavi & Walker,
    WSDM 2013): adjust each randomization unit's experiment metric Y by
    its pre-experiment covariate X, Y' = Y − θ·(X − mean X) with
    θ = cov(X,Y)/var(X) pooled over both arms, and report per-arm raw
    and adjusted means plus the achieved variance reduction ρ². The
    adjustment leaves the expected treatment effect unchanged (X
    predates assignment, so E[X|arm] is equal across arms) while
    removing the between-user variance X explains — the standard way
    to shrink experiment runtimes on high-variance metrics.

    Input: ONE row per randomization unit — (group, y, x); aggregate
    per-unit metrics upstream (the gate query builds them with one
    keyed sum over events).

    Exactness: every statistic reduces to SIX moment sums — n, Σx, Σy,
    Σx², Σxy, Σy² (global + per arm) — so the whole readout is ONE
    map-side-combinable aggregation and a 1-row closed-form projection;
    no second pass over the data, no per-unit adjusted column
    materialized. To make those sums bit-stable under ANY partitioning
    (the ab_test bucket_width discipline), x and y are first coarsened
    to integers ROUND(v·scale) — exact when the metric has ≤log10(scale)
    decimals, a documented coarsening otherwise — and the moments
    accumulate as DECIMAL(38,0) integer sums, order-free on any engine
    (DuckDB mirrors with HUGEINT). θ = (N·Σxy − Σx·Σy)/(N·Σx² − (Σx)²)
    and the means then involve a handful of IEEE doubles computed from
    identical integers, floor-rounded to 1e-6 at the edge.

    Scale: a single global aggregate over the per-unit table — partial
    aggregation makes the shuffle six numbers per task regardless of
    data size. var(X) = 0 ⇒ θ and adjusted columns NULL (nothing to
    explain; raw columns still report).
    """
    s = float(scale)
    g = F.col(group_col)
    base = df.where(g.isin([group_a, group_b])).select(
        g.alias("__g"),
        F.floor(F.col(y_col).cast("double") * F.lit(s) + F.lit(0.5))
        .cast("long").alias("__y"),
        F.floor(F.col(x_col).cast("double") * F.lit(s) + F.lit(0.5))
        .cast("long").alias("__x"))
    d = lambda c: c.cast("decimal(19,0)")  # noqa: E731

    def msum(expr):
        return F.sum(expr).cast("decimal(38,0)")

    ia = (F.col("__g") == F.lit(group_a)).cast("long")
    ib = (F.col("__g") == F.lit(group_b)).cast("long")
    m = base.agg(
        F.sum(ia).alias("n_a"), F.sum(ib).alias("n_b"),
        msum(d(F.col("__x"))).alias("sx"),
        msum(d(F.col("__y"))).alias("sy"),
        msum(d(F.col("__x")) * d(F.col("__x"))).alias("sxx"),
        msum(d(F.col("__x")) * d(F.col("__y"))).alias("sxy"),
        msum(d(F.col("__y")) * d(F.col("__y"))).alias("syy"),
        msum(d(F.col("__x")) * ia).alias("sxa"),
        msum(d(F.col("__y")) * ia).alias("sya"),
        msum(d(F.col("__x")) * ib).alias("sxb"),
        msum(d(F.col("__y")) * ib).alias("syb"))
    # closed-form scalars; every operand below is an exact integer cast
    # to double, so both engines evaluate identical expression trees
    # over identical bits
    dbl = lambda name: F.col(name).cast("double")  # noqa: E731
    n = dbl("n_a") + dbl("n_b")
    cov_n2 = n * dbl("sxy") - dbl("sx") * dbl("sy")   # N²·cov(X,Y)
    varx_n2 = n * dbl("sxx") - dbl("sx") * dbl("sx")  # N²·var(X)
    vary_n2 = n * dbl("syy") - dbl("sy") * dbl("sy")  # N²·var(Y)
    theta = F.when(varx_n2 > 0, cov_n2 / varx_n2)
    mean_x = dbl("sx") / n
    # empty-arm guard: engines disagree on double x/0 (NULL vs inf), so
    # an empty arm reports NULL means explicitly rather than whatever
    # the engine's division does
    ma_raw = F.when(F.col("n_a") > 0, dbl("sya") / dbl("n_a") / F.lit(s))
    mb_raw = F.when(F.col("n_b") > 0, dbl("syb") / dbl("n_b") / F.lit(s))
    ma_adj = ma_raw - theta * (dbl("sxa") / dbl("n_a") - mean_x) / F.lit(s)
    mb_adj = mb_raw - theta * (dbl("sxb") / dbl("n_b") - mean_x) / F.lit(s)
    var_red = F.when((varx_n2 > 0) & (vary_n2 > 0),
                     cov_n2 * cov_n2 / (varx_n2 * vary_n2))
    return m.select(
        F.col("n_a"), F.col("n_b"),
        _fr(theta, 6).alias("theta"),
        _fr(ma_raw, 6).alias("mean_a"),
        _fr(mb_raw, 6).alias("mean_b"),
        _fr(ma_raw - mb_raw, 6).alias("diff"),
        _fr(ma_adj, 6).alias("mean_a_adj"),
        _fr(mb_adj, 6).alias("mean_b_adj"),
        _fr(ma_adj - mb_adj, 6).alias("diff_adj"),
        _fr(var_red, 6).alias("var_reduction"))


def rolling_hampel(df: DataFrame, on: str = "time",
                   by: Sequence[str] = ("event_type",),
                   value_col: str = "value",
                   window_ns: int = 3_600_000_000_000,
                   k: float = 3.0,
                   max_window: int = 4096) -> DataFrame:
    """Rolling Hampel filter: flag points more than k·1.4826·MAD from
    the ROLLING median of their ±window_ns time neighborhood — the
    local-context complement of `mad_outliers`' global per-series
    median/MAD (a level shift mid-series poisons a global median; the
    rolling form adapts). 1.4826·MAD estimates σ under normality;
    k = 3 is the classical Hampel identifier.

    Exactness across engines: both the median and the MAD use the
    LOWER-median convention — element ⌈n/2⌉ of the sorted window — so
    every emitted med/mad is an exact double PICKED from the input,
    never an interpolated average whose a+(b−a)/2 vs (a+b)/2 ulp could
    diverge between engines. NULL values are excluded by contract
    (filter upstream); duplicate timestamps are frame PEERS (range
    frame), giving order-insensitive windows under any partitioning.

    Shape: ONE shuffle — the (by, time) window sort — then pure array
    math per row (collect_list over a RANGE frame, array_sort /
    transform, all JVM-side). Per-row state is the window occupancy,
    which is data-rate·width, NOT data size — but a fixed width over
    densening data grows, so occupancy is capped LOUDLY at max_window
    via an in-plan raise on the emitted row (n is part of the med
    expression's guard, so no projection prunes it): at higher rates,
    narrow the window or downsample first (m4_downsample), both
    order-preserving.
    """
    by = list(by)
    w = (Window.partitionBy(*by).orderBy(F.col(on).cast("long"))
         .rangeBetween(-int(window_ns), int(window_ns)))
    arr = F.array_sort(F.collect_list(F.col(value_col).cast("double"))
                       .over(w))
    out = df.select(*by, F.col(on), F.col(value_col).cast("double")
                    .alias(value_col), arr.alias("__arr"))
    n = F.size("__arr")
    idx = F.floor((n + F.lit(1)) / F.lit(2)).cast("int")
    med = F.when(
        n <= F.lit(int(max_window)), F.element_at("__arr", idx)
    ).otherwise(F.raise_error(F.lit(
        f"rolling_hampel: window occupancy exceeds max_window="
        f"{int(max_window)} — narrow window_ns or downsample first "
        "(m4_downsample), or raise max_window deliberately")))
    out = out.select(*by, F.col(on), F.col(value_col),
                     med.alias("med"), F.col("__arr"), idx.alias("__i"))
    mad = F.element_at(
        F.array_sort(F.transform(
            "__arr", lambda x: F.abs(x - F.col("med")))), F.col("__i"))
    out = out.select(*by, F.col(on), F.col(value_col), "med",
                     mad.alias("mad"))
    flag = (F.abs(F.col(value_col) - F.col("med"))
            > F.lit(float(k)) * F.lit(1.4826) * F.col("mad"))
    return out.select(*by, F.col(on), F.col(value_col), "med", "mad",
                      flag.alias("is_outlier"))
