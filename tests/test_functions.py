"""Operator-library unit tests: fill modes, window transforms, math quirks."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from influxdb_ha_spark.functions import fill, transforms as T
from influxdb_ha_spark.functions.math import binary_op


@pytest.fixture(scope="module")
def series(spark):
    # one series, buckets 0,2,5 present out of 0..5 (interval 1)
    rows = [(0, 10.0), (2, 30.0), (5, 0.0)]
    return spark.createDataFrame(rows, "time long, v double")


def _fill(df, mode):
    out = fill.fill_buckets(df, "time", 1, mode, ["v"],
                            start_ns=0, end_ns=6)
    return {r["time"]: r["v"] for r in out.collect()}


def test_fill_null(series):
    got = _fill(series, None)
    assert got == {0: 10.0, 1: None, 2: 30.0, 3: None, 4: None, 5: 0.0}


def test_fill_number(series):
    got = _fill(series, -1)
    assert got[1] == -1 and got[3] == -1 and got[0] == 10.0


def test_fill_none(series):
    got = _fill(series, "none")
    assert got == {0: 10.0, 2: 30.0, 5: 0.0}


def test_fill_previous(series):
    got = _fill(series, "previous")
    assert got == {0: 10.0, 1: 10.0, 2: 30.0, 3: 30.0, 4: 30.0, 5: 0.0}


def test_fill_linear(series):
    got = _fill(series, "linear")
    assert got[1] == pytest.approx(20.0)
    assert got[3] == pytest.approx(20.0)
    assert got[4] == pytest.approx(10.0)


def test_fill_grouped(spark):
    rows = [(0, "a", 1.0), (2, "a", 3.0), (1, "b", 5.0)]
    df = spark.createDataFrame(rows, "time long, tag string, v double")
    out = fill.fill_buckets(df, "time", 1, 0, ["v"], group_cols=["tag"],
                            start_ns=0, end_ns=3)
    got = {(r["tag"], r["time"]): r["v"] for r in out.collect()}
    assert got[("a", 1)] == 0.0 and got[("b", 0)] == 0.0 and got[("b", 2)] == 0.0
    assert len(got) == 6


@pytest.fixture(scope="module")
def walk(spark):
    rows = [(i * 1_000_000_000, "s", float(v))
            for i, v in enumerate([1, 3, 2, 6, 6, 10])]
    return spark.createDataFrame(rows, "time long, tag string, value double")


def test_difference(walk):
    out = T.difference(walk, "value", by=["tag"]).collect()
    assert [r["difference"] for r in out] == [2.0, -1.0, 4.0, 0.0, 4.0]


def test_non_negative_difference(walk):
    out = T.non_negative_difference(walk, "value", by=["tag"]).collect()
    assert [r["non_negative_difference"] for r in out] == [2.0, 4.0, 0.0, 4.0]


def test_derivative_per_second(walk):
    out = T.derivative(walk, "value", unit_ns=1_000_000_000, by=["tag"]).collect()
    assert [r["derivative"] for r in out] == [2.0, -1.0, 4.0, 0.0, 4.0]


def test_cumulative_sum(walk):
    out = T.cumulative_sum(walk, "value", by=["tag"]).collect()
    assert [r["cumulative_sum"] for r in out] == [1.0, 4.0, 6.0, 12.0, 18.0, 28.0]


def test_elapsed_seconds(walk):
    out = T.elapsed(walk, unit_ns=1_000_000_000, by=["tag"]).collect()
    assert [r["elapsed"] for r in out] == [1, 1, 1, 1, 1]


def test_moving_average(walk):
    out = T.moving_average(walk, "value", n=3, by=["tag"]).collect()
    assert [r["moving_average"] for r in out] == \
        pytest.approx([2.0, 11 / 3, 14 / 3, 22 / 3])
    # emitted only once n points exist
    assert len(out) == 4


def test_integral_trapezoid(walk):
    out = T.integral(walk, "value", unit_ns=1_000_000_000, by=["tag"]).collect()
    # trapezoids: 2+2.5+4+6+8 = 22.5
    assert out[0]["integral"] == pytest.approx(22.5)


def test_histogram(spark):
    rows = [(i, float(v)) for i, v in enumerate([-5, 0, 5, 15, 95, 205])]
    df = spark.createDataFrame(rows, "time long, v double")
    out = T.histogram(df, "v", lo=0.0, hi=100.0, nbuckets=10)
    got = {r["bucket"]: r["bucket_count"] for r in out.collect()}
    assert got[0] == 1       # below range
    assert got[1] == 2       # values 0 and 5
    assert got[2] == 1       # value 15
    assert got[10] == 1      # value 95
    assert got[11] == 1      # above range


def test_binary_op_compat():
    from pyspark.sql import SparkSession
    spark = SparkSession.getActiveSession()
    df = spark.range(1).select(F.lit(10.0).alias("a"), F.lit(0.0).alias("b"))
    std = df.select(binary_op("/", F.col("a"), F.col("b"), compat=False)).first()[0]
    cmp = df.select(binary_op("/", F.col("a"), F.col("b"), compat=True)).first()[0]
    assert std is None or std != std or std == float("inf")  # SQL semantics
    assert cmp == 0.0  # query_merge.go:319-323
    mod = df.select(binary_op("%", F.lit(7.9), F.lit(3.0), compat=True)).first()[0]
    assert mod == 1  # int-cast modulo (query_merge.go:325-329)


# -- distributed single-series scan (scan.py): ungrouped by=[] must match
# -- the per-series semantics while staying P-way parallel ------------------

@pytest.fixture(scope="module")
def longwalk(spark):
    import random
    rng = random.Random(7)
    vals, v = [], 0.0
    for _ in range(500):
        v += rng.uniform(-2, 3)
        vals.append(v)
    rows = [(1_700_000_000_000_000_000 + i * 1_000_000_000, float(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "time long, value double").repartition(4)


def _expected_lagged(longwalk, f):
    rows = sorted(longwalk.collect(), key=lambda r: r["time"])
    return f(rows)


def test_global_difference_matches_serial(longwalk):
    out = T.difference(longwalk, "value").orderBy("time").collect()
    rows = _expected_lagged(longwalk, lambda rs: [
        rs[i]["value"] - rs[i - 1]["value"] for i in range(1, len(rs))])
    assert [r["difference"] for r in out] == pytest.approx(rows)


def test_global_cumsum_matches_serial(longwalk):
    out = T.cumulative_sum(longwalk, "value").orderBy("time").collect()
    rows = sorted(longwalk.collect(), key=lambda r: r["time"])
    acc, exp = 0.0, []
    for r in rows:
        acc += r["value"]
        exp.append(acc)
    assert [r["cumulative_sum"] for r in out] == pytest.approx(exp)


def test_global_moving_average_matches_serial(longwalk):
    out = T.moving_average(longwalk, "value", n=7).orderBy("time").collect()
    rows = sorted(longwalk.collect(), key=lambda r: r["time"])
    exp = [sum(x["value"] for x in rows[i - 6:i + 1]) / 7
           for i in range(6, len(rows))]
    assert [r["moving_average"] for r in out] == pytest.approx(exp)


def test_global_elapsed_and_derivative(longwalk):
    out = T.elapsed(longwalk, unit_ns=1_000_000_000).orderBy("time").collect()
    assert len(out) == 499 and all(r["elapsed"] == 1 for r in out)
    d = T.derivative(longwalk, "value", unit_ns=1_000_000_000) \
        .orderBy("time").collect()
    assert len(d) == 499


def test_global_integral_matches_serial(longwalk):
    out = T.integral(longwalk, "value", unit_ns=1_000_000_000).collect()
    rows = sorted(longwalk.collect(), key=lambda r: r["time"])
    exp = sum((rows[i]["value"] + rows[i - 1]["value"]) / 2
              for i in range(1, len(rows)))
    assert out[0]["integral"] == pytest.approx(exp)


def test_scan_is_parallel(longwalk):
    """The plan must not contain a keyless (single-partition) Window."""
    plan = T.difference(longwalk, "value")._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # every Window should partition on __pid, never on nothing
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            assert "__pid" in line, line


def test_fill_segmented_matches_plain(spark, monkeypatch):
    """Ungrouped previous/linear over a big spine takes the segmented-scan
    path; force it with a tiny threshold and check it equals the plain
    single-window result bucket-for-bucket."""
    interval = 10
    # sparse observations over a 300-bucket spine, with long gaps
    rows = [(b * interval, float(v)) for b, v in
            [(3, 5.0), (7, 9.0), (55, 1.0), (120, 33.0), (121, 2.0), (290, 8.0)]]
    agg = spark.createDataFrame(rows, "bucket long, val double")
    for mode in ("previous", "linear"):
        plain = fill.fill_buckets(agg, "bucket", interval, mode, ["val"],
                                  [], 0, 300 * interval)
        monkeypatch.setattr(fill, "_SMALL_SPINE", 16)
        seg = fill.fill_buckets(agg, "bucket", interval, mode, ["val"],
                                [], 0, 300 * interval)
        monkeypatch.setattr(fill, "_SMALL_SPINE", 65_536)
        p = {r["bucket"]: r["val"] for r in plain.collect()}
        s = {r["bucket"]: r["val"] for r in seg.collect()}
        assert len(p) == 300 and len(s) == 300
        for b in p:
            if p[b] is None:
                assert s[b] is None, (mode, b)
            else:
                assert s[b] == pytest.approx(p[b]), (mode, b)
    # and the segmented plan must not contain a keyless window
    monkeypatch.setattr(fill, "_SMALL_SPINE", 16)
    seg = fill.fill_buckets(agg, "bucket", interval, "linear", ["val"],
                            [], 0, 300 * interval)
    plan = seg._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        low = line.lower()
        if "windowspecdefinition(" in low and "__pid" not in low:
            # the only keyless window allowed is the P-row carry table
            assert "__last_" in low or "__first_" in low, line


def test_fill_refuses_huge_spine(spark):
    """fill() must refuse to materialize absurd spines (1 ns buckets over a
    month) instead of exploding — the InfluxDB max-select-buckets analog."""
    import pytest as _pytest

    from influxdb_ha_spark.errors import QueryError

    agg = spark.createDataFrame([(0, 1.0)], "time long, v double")
    with _pytest.raises(QueryError, match="buckets"):
        fill.fill_buckets(agg, "time", 1, 0, ["v"],
                          start_ns=0, end_ns=30 * 86_400_000_000_000)


def test_holt_winters_matches_python_reference(spark):
    """Engine recurrence (incl. seasonal) equals a straight-line python
    replay; forecast times continue the bucket grid."""
    from influxdb_ha_spark.functions.transforms import (
        HW_ALPHA, HW_BETA, HW_GAMMA, holt_winters)

    ys = [10.0, 12.0, 15.0, 13.0, 18.0, 21.0, 19.0, 24.0]
    day = 86_400_000_000_000
    rows = [(i * day, "a", ys[i]) for i in range(len(ys))]
    df = spark.createDataFrame(rows, "time long, tag string, v double")

    out = holt_winters(df, "v", n_forecast=3, seasonal=4, interval_ns=day,
                       by=["tag"], out="hw")
    got = {r["time"]: r["hw"] for r in out.collect()}

    m = 4
    level, trend = ys[0], ys[1] - ys[0]
    base = sum(ys[:m]) / m
    seas = [ys[i] - base for i in range(m)]
    for t in range(1, len(ys)):
        s = seas[t % m]
        prev = level
        level = HW_ALPHA * (ys[t] - s) + (1 - HW_ALPHA) * (level + trend)
        trend = HW_BETA * (level - prev) + (1 - HW_BETA) * trend
        seas[t % m] = HW_GAMMA * (ys[t] - level) + (1 - HW_GAMMA) * s
    want = {(len(ys) - 1 + h) * day:
            level + h * trend + seas[(len(ys) - 1 + h) % m]
            for h in (1, 2, 3)}
    assert got == pytest.approx(want)

    # ungrouped + with_fit: fitted points at observed times, then forecasts
    fitted = holt_winters(df, "v", 2, 0, day, by=[], out="hw",
                          with_fit=True).collect()
    times = sorted(r["time"] for r in fitted)
    assert times[:len(ys)] == [i * day for i in range(len(ys))]
    assert len(times) == len(ys) + 2


def test_distributed_scan_sparse_input(spark):
    """Regression: with ~1 row per quantile bucket, carries used to come up
    short (previous bucket had < k rows) and moving_average dropped every
    row. The bucketing must coarsen until each feeding bucket has >= k
    rows, matching the keyless-window reference exactly."""
    rows = [(i * 1000, float(i * i % 17)) for i in range(30)]
    df = spark.createDataFrame(rows, "time long, v double")
    got = {r["time"]: r["moving_average"]
           for r in T.moving_average(df, "v", 3, by=[]).collect()}
    w = Window.orderBy("time").rowsBetween(-2, 0)
    ref = (df.withColumn("ma", F.avg("v").over(w))
           .withColumn("c", F.count("v").over(w)).where(F.col("c") >= 3))
    assert got == {r["time"]: r["ma"] for r in ref.collect()}
    assert len(got) == 28


def test_exponential_moving_average(spark):
    """EMA recurrence y_t = (1-a)y + ax from the first point; the InfluxQL
    string form plans to the same operator."""
    from influxdb_ha_spark.functions import transforms as T
    from influxdb_ha_spark.model import Catalog
    from influxdb_ha_spark.planner import influxql_df
    rows = [("a", i, float(v)) for i, v in enumerate([10.0, 20.0, 14.0, 8.0])]
    df = spark.createDataFrame(rows, "s string, time long, value double")
    out = {r["time"]: r["ema"] for r in T.exponential_moving_average(
        df, "value", n=3, by=["s"], out="ema").collect()}
    a = 0.5  # 2/(3+1)
    want, y = {}, None
    for i, v in enumerate([10.0, 20.0, 14.0, 8.0]):
        y = v if y is None else (1 - a) * y + a * v
        want[i] = y
    assert out == want
    cat = Catalog(spark)
    cat.register_dataframe("db", "m", df, time_col="time", tags=["s"])
    iq = influxql_df(
        cat, "SELECT exponential_moving_average(value, 3) FROM m", "db")
    got = {r["time"]: r["exponential_moving_average"] for r in iq.collect()}
    assert got == want


def test_ungrouped_recurrence_guard(spark, monkeypatch):
    """VERDICT r4 #5: an ungrouped (by=[]) sequential recurrence funnels
    everything through one worker — above the row cap it must fail
    loudly (fill's MAX_SPINE_BUCKETS precedent), below it it runs."""
    import pytest

    from influxdb_ha_spark.functions import transforms as T
    rows = [("a", i, float(i % 7)) for i in range(12)]
    df = spark.createDataFrame(rows, "s string, time long, value double")
    # under the cap: ungrouped call works (single series by definition)
    got = T.exponential_moving_average(df, "value", n=3, by=[],
                                       out="ema").count()
    assert got == 12
    monkeypatch.setattr(T, "MAX_UNGROUPED_RECURRENCE_ROWS", 10)
    for call in (
            lambda: T.exponential_moving_average(df, "value", 3, by=[]),
            lambda: T.double_exponential_moving_average(df, "value", 3,
                                                        by=[]),
            lambda: T.relative_strength_index(df, "value", 3, by=[]),
            lambda: T.kaufmans_adaptive_moving_average(df, "value", 3,
                                                       by=[]),
            lambda: T.holt_winters(df, "value", 2, 0, 10**9, by=[]),
    ):
        with pytest.raises(ValueError, match="one sequential worker"):
            call()
    # grouped calls are unaffected by the cap
    assert T.exponential_moving_average(df, "value", 3,
                                        by=["s"]).count() == 12


def test_dema_tema(spark):
    """Chained-EMA indicators: hand recurrence check + planner wiring."""
    from influxdb_ha_spark.functions import transforms as T
    from influxdb_ha_spark.model import Catalog
    from influxdb_ha_spark.planner import influxql_df
    xs = [10.0, 20.0, 14.0, 8.0, 30.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(xs)],
        "s string, time long, value double")
    a = 0.5  # 2/(3+1)
    y1 = y2 = y3 = None
    dema, tema = {}, {}
    for i, x in enumerate(xs):
        if y1 is None:
            y1 = y2 = y3 = x
        else:
            y1 = (1 - a) * y1 + a * x
            y2 = (1 - a) * y2 + a * y1
            y3 = (1 - a) * y3 + a * y2
        dema[i] = 2.0 * y1 - y2
        tema[i] = 3.0 * y1 - 3.0 * y2 + y3
    got_d = {r["time"]: r["d"] for r in T.double_exponential_moving_average(
        df, "value", n=3, by=["s"], out="d").collect()}
    got_t = {r["time"]: r["t3"] for r in T.triple_exponential_moving_average(
        df, "value", n=3, by=["s"], out="t3").collect()}
    assert got_d == dema and got_t == tema
    cat = Catalog(spark)
    cat.register_dataframe("db", "m", df, time_col="time", tags=["s"])
    iq = influxql_df(
        cat, "SELECT triple_exponential_moving_average(value, 3) FROM m",
        "db")
    assert {r["time"]: r["triple_exponential_moving_average"]
            for r in iq.collect()} == tema


def test_chande_momentum_oscillator(spark):
    """CMO hand check: deltas +10,-4,+2 → window n=3 at the last point
    gives 100*(12-4)/(12+4) = 50; warmup rows are dropped (strict)."""
    from influxdb_ha_spark.functions import transforms as T
    xs = [1.0, 11.0, 7.0, 9.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(xs)],
        "s string, time long, value double")
    out = {r["time"]: r["cmo"] for r in T.chande_momentum_oscillator(
        df, "value", n=3, by=["s"], out="cmo").collect()}
    assert out == {3: 50.0}
    nulls = {r["time"]: r["cmo"] for r in T.chande_momentum_oscillator(
        df, "value", n=3, by=["s"], out="cmo", strict=False).collect()}
    assert nulls[3] == 50.0 and nulls[0] is None and nulls[2] is None


def test_relative_strength_index(spark):
    """Wilder RSI hand check on a tiny series (n=2): warmup mean of the
    first 2 deltas, then one smoothed step; all-gain series pins 100."""
    from influxdb_ha_spark.functions import transforms as T
    xs = [10.0, 12.0, 11.0, 15.0]  # deltas +2, -1, +4
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(xs)]
        + [("up", i, float(i)) for i in range(4)],
        "s string, time long, value double")
    out = {(r["s"], r["time"]): r["rsi"]
           for r in T.relative_strength_index(
               df, "value", n=2, by=["s"], out="rsi").collect()}
    # series a, t=2 (2nd delta): ag=(2+0)/2=1, al=(0+1)/2=0.5, RS=2
    assert abs(out[("a", 2)] - (100.0 - 100.0 / 3.0)) < 1e-12
    # t=3: ag=(1*1+4)/2=2.5, al=(0.5*1+0)/2=0.25 -> 100-100/(1+10)
    assert abs(out[("a", 3)] - (100.0 - 100.0 / 11.0)) < 1e-12
    # monotone-up series: avg loss 0 -> RSI 100 at every emitted point
    assert out[("up", 2)] == 100.0 and out[("up", 3)] == 100.0


def test_kaufmans(spark):
    """KER hand check (monotone series → ratio 1; reversal shrinks it)
    and KAMA recurrence replay on a tiny series."""
    from influxdb_ha_spark.functions import transforms as T
    xs = [1.0, 2.0, 3.0, 4.0, 2.0]
    df = spark.createDataFrame(
        [("a", i, v) for i, v in enumerate(xs)],
        "s string, time long, value double")
    ker = {r["time"]: r["ker"] for r in T.kaufmans_efficiency_ratio(
        df, "value", n=3, by=["s"], out="ker").collect()}
    assert ker[3] == 1.0                      # straight trend: |3|/3
    assert abs(ker[4] - 0.0) < 1e-12          # |2-2|/(1+1+2) = 0
    fast, slow = 2.0 / 3.0, 2.0 / 31.0
    y = None
    want = {}
    deltas = [abs(xs[i] - xs[i - 1]) for i in range(1, len(xs))]
    for i in range(3, len(xs)):
        path = sum(deltas[i - 3:i])
        er = abs(xs[i] - xs[i - 3]) / path if path > 0 else 0.0
        sc = (er * (fast - slow) + slow) ** 2
        y = xs[i] if y is None else y + sc * (xs[i] - y)
        want[i] = y
    kama = {r["time"]: r["kama"] for r in T.kaufmans_adaptive_moving_average(
        df, "value", n=3, by=["s"], out="kama").collect()}
    assert kama == want
