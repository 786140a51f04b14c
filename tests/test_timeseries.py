"""As-of join + sessionization operator tests (operators/timeseries.py)."""

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.operators.timeseries import (
    asof_join, session_stats, sessionize)


@pytest.fixture(scope="module")
def quotes(spark):
    # (key, time, value) — the right side of the as-of join
    rows = [
        ("a", 10, 1.0),
        ("a", 20, 2.0),
        ("a", 30, 3.0),
        ("b", 15, 9.0),
    ]
    return spark.createDataFrame(rows, "k string, time long, value double")


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        ("a", 5),    # before any quote -> no match
        ("a", 10),   # equal time -> inclusive match (1.0)
        ("a", 25),   # between -> 2.0
        ("a", 99),   # after all -> 3.0
        ("b", 14),   # before b's only quote -> no match
        ("b", 16),   # -> 9.0
        ("c", 50),   # key with no quotes at all -> no match
    ]
    return spark.createDataFrame(rows, "k string, time long")


def test_asof_basic(trades, quotes):
    out = {(r["k"], r["time"]): (r["r_time"], r["r_value"])
           for r in asof_join(trades, quotes, on="time", by=["k"],
                              value_cols=["value"]).collect()}
    assert out[("a", 5)] == (None, None)
    assert out[("a", 10)] == (10, 1.0)      # inclusive at equal time
    assert out[("a", 25)] == (20, 2.0)
    assert out[("a", 99)] == (30, 3.0)
    assert out[("b", 14)] == (None, None)
    assert out[("b", 16)] == (15, 9.0)
    assert out[("c", 50)] == (None, None)


def test_asof_tolerance(trades, quotes):
    out = {(r["k"], r["time"]): (r["r_time"], r["r_value"])
           for r in asof_join(trades, quotes, on="time", by=["k"],
                              value_cols=["value"], tolerance=5).collect()}
    assert out[("a", 25)] == (20, 2.0)      # gap 5 <= tolerance
    assert out[("a", 99)] == (None, None)   # gap 69 > tolerance
    assert out[("b", 16)] == (15, 9.0)


def test_asof_empty_right(spark, trades):
    empty = spark.createDataFrame([], "k string, time long, value double")
    rows = asof_join(trades, empty, on="time", by=["k"],
                     value_cols=["value"]).collect()
    assert len(rows) == trades.count()
    assert all(r["r_value"] is None for r in rows)


def test_asof_keeps_left_columns(spark, quotes):
    left = spark.createDataFrame([("a", 25, "x")],
                                 "k string, time long, note string")
    r = asof_join(left, quotes, on="time", by=["k"],
                  value_cols=["value"]).collect()[0]
    assert r["note"] == "x" and r["r_value"] == 2.0


def test_interval_join_keyed(spark):
    from influxdb_ha_spark.operators.timeseries import interval_join
    pts = spark.createDataFrame(
        [("a", 5), ("a", 15), ("a", 25), ("b", 15)],
        "k string, time long")
    iv = spark.createDataFrame(
        [("a", 1, 10, 20), ("a", 2, 14, 30), ("b", 3, 0, 10)],
        "k string, iv_id long, t_start long, t_end long")
    got = sorted((r["k"], r["time"], r["iv_id"])
                 for r in interval_join(pts, iv, by=["k"]).collect())
    # a@15 overlaps both intervals; a@25 only the second; b@15 none
    assert got == [("a", 15, 1), ("a", 15, 2), ("a", 25, 2)]


def test_interval_join_bucketed(spark):
    import pytest as _pytest

    from influxdb_ha_spark.operators.timeseries import interval_join
    pts = spark.createDataFrame([(5,), (15,), (25,), (95,)], "time long")
    iv = spark.createDataFrame(
        [(1, 10, 20), (2, 14, 30), (3, 90, 91)],
        "iv_id long, t_start long, t_end long")
    got = sorted((r["time"], r["iv_id"]) for r in
                 interval_join(pts, iv, bucket=8).collect())
    assert got == [(15, 1), (15, 2), (25, 2)]
    # inclusive bounds across a bucket edge
    edge = sorted((r["time"], r["iv_id"]) for r in interval_join(
        spark.createDataFrame([(10,), (20,)], "time long"),
        iv, bucket=8).collect())
    assert edge == [(10, 1), (20, 1), (20, 2)]


def test_interval_join_adaptive_bucket(spark):
    """Keyless join without an explicit bucket derives width from the p99
    interval length: results must equal the brute-force containment join
    on a mixed short/long distribution, and the bucket fan-out must not
    explode on the long tail."""
    import random

    from influxdb_ha_spark.operators.timeseries import interval_join
    rnd = random.Random(11)
    # 95 short intervals (len 1-20), 5 long ones (len 2_000-5_000)
    ivs = []
    for i in range(95):
        s = rnd.randrange(0, 10_000)
        ivs.append((i, s, s + rnd.randrange(1, 21)))
    for i in range(95, 100):
        s = rnd.randrange(0, 8_000)
        ivs.append((i, s, s + rnd.randrange(2_000, 5_001)))
    pts = [(t,) for t in rnd.sample(range(0, 12_000), 400)]
    pdf = spark.createDataFrame(pts, "time long")
    idf = spark.createDataFrame(ivs, "iv_id long, t_start long, t_end long")
    got = sorted((r["time"], r["iv_id"])
                 for r in interval_join(pdf, idf).collect())
    want = sorted((t, i) for (t,) in pts for (i, s, e) in ivs
                  if s <= t <= e)
    assert got == want
    # the derived bucket bounds fan-out: total exploded bucket rows stay
    # within a small multiple of the interval count (p99 sizing), instead
    # of the ~100x a typical-length bucket would give the long tail
    lens = sorted(e - s for _, s, e in ivs)
    p99 = lens[int(0.99 * len(lens)) - 1]
    fanout = sum((e - s) // p99 + 1 for _, s, e in ivs)
    assert fanout <= 3 * len(ivs)


def test_sessionize_gap(spark):
    rows = [("u", t) for t in (0, 10, 25, 100, 105, 300)]
    df = spark.createDataFrame(rows, "k string, time long")
    s = {r["time"]: r["session_id"]
         for r in sessionize(df, on="time", by=["k"], gap=20).collect()}
    # gaps: 10, 15, 75(new), 5, 195(new)
    assert s == {0: 1, 10: 1, 25: 1, 100: 2, 105: 2, 300: 3}


def test_session_stats(spark):
    rows = [("u", t) for t in (0, 10, 25, 100, 105, 300)] + [("v", 7)]
    df = spark.createDataFrame(rows, "k string, time long")
    out = {(r["k"], r["session_id"]): (r["n_events"], r["t_start"],
                                       r["t_end"], r["duration"])
           for r in session_stats(df, on="time", by=["k"], gap=20).collect()}
    assert out[("u", 1)] == (3, 0, 25, 25)
    assert out[("u", 2)] == (2, 100, 105, 5)
    assert out[("u", 3)] == (1, 300, 300, 0)
    assert out[("v", 1)] == (1, 7, 7, 0)


def test_m4_downsample(spark):
    """min/max/first/last per (series, bucket) — hand-checked tiny case."""
    from influxdb_ha_spark.operators.timeseries import m4_downsample
    rows = [("a", 10, 5.0), ("a", 20, 1.0), ("a", 30, 9.0), ("a", 40, 2.0),
            ("a", 110, 7.0), ("b", 15, 4.0)]
    df = spark.createDataFrame(rows, "s string, time long, value double")
    out = {(r["s"], r["bucket"]): r for r in
           m4_downsample(df, on="time", by=["s"], value_col="value",
                         interval_ns=100).collect()}
    g = out[("a", 0)]
    assert (g["n"], g["v_min"], g["v_max"], g["v_first"], g["v_last"]) == \
        (4, 1.0, 9.0, 5.0, 2.0)
    assert out[("a", 100)]["v_first"] == 7.0 and out[("b", 0)]["n"] == 1


def test_lttb_downsample(spark):
    """Endpoints always kept; output is a time-ordered subset of the
    input of exactly n_out points; short series pass through; the
    selected interior point of a 1-bucket reduction is the max-area
    point by hand calculation."""
    from influxdb_ha_spark.operators.timeseries import lttb_downsample
    rows = [("a", t, float(v)) for t, v in
            [(0, 0.0), (1, 1.0), (2, 9.0), (3, 1.5), (4, 2.0)]]
    rows += [("b", t, float(t)) for t in range(3)]   # short: passthrough
    df = spark.createDataFrame(rows, "s string, time long, value double")
    out = lttb_downsample(df, on="time", by=["s"], value_col="value",
                          n_out=3).collect()
    a = sorted([(r["time"], r["value"]) for r in out if r["s"] == "a"])
    # n_out=3: first + one interior + last; (2, 9.0) is the spike with
    # the largest triangle vs first point and last point (the anchor)
    assert a == [(0, 0.0), (2, 9.0), (4, 2.0)]
    b = sorted([(r["time"], r["value"]) for r in out if r["s"] == "b"])
    assert b == [(0, 0.0), (1, 1.0), (2, 2.0)]
    # larger random series: size + subset + endpoint invariants
    import random
    rng = random.Random(5)
    big = [("c", t, rng.random() * 100) for t in range(500)]
    df2 = spark.createDataFrame(big, "s string, time long, value double")
    got = sorted([(r["time"], r["value"]) for r in
                  lttb_downsample(df2, on="time", by=["s"],
                                  value_col="value", n_out=50).collect()])
    assert len(got) == 50
    src = dict((t, v) for _, t, v in big)
    assert all(src[t] == v for t, v in got)
    assert got[0][0] == 0 and got[-1][0] == 499


def test_lttb_collinear_candidate_scores_zero(spark):
    """Distinguishes Steinarsson's exact area from the sign-flipped
    variant |T1 + T2|: with previous pick a=(0,0) and next-bucket anchor
    c=(10,100), candidate (9,90) is collinear with a and c (true area 0;
    flipped formula scores it 1800 — maximal) while (1,-5) has true area
    150 (flipped: 50). Correct LTTB must select (1,-5)."""
    from influxdb_ha_spark.operators.timeseries import lttb_downsample
    rows = [("a", 0, 0.0), ("a", 1, -5.0), ("a", 9, 90.0), ("a", 10, 100.0)]
    df = spark.createDataFrame(rows, "s string, time long, value double")
    out = sorted([(r["time"], r["value"]) for r in
                  lttb_downsample(df, on="time", by=["s"], value_col="value",
                                  n_out=3).collect()])
    assert out == [(0, 0.0), (1, -5.0), (10, 100.0)]


def test_mad_outliers_flags_spike_not_masked(spark):
    """A single spike must be flagged; the robust score must not let the
    spike inflate the scale estimate (the mean/stddev masking failure)."""
    from influxdb_ha_spark.operators.timeseries import mad_outliers
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 10.0, 11.5, 9.0, 10.0, 500.0]
    df = spark.createDataFrame(
        [(i, "s", v) for i, v in enumerate(vals)],
        "time long, event_type string, value double")
    out = mad_outliers(df, on="time", by=["event_type"],
                       value_col="value").collect()
    flagged = {r["time"] for r in out if r["is_outlier"]}
    assert flagged == {9}
    z = {r["time"]: r["robust_z"] for r in out}
    # median 10.0, MAD 0.75 -> spike z = 0.6745*490/0.75
    assert z[9] == pytest.approx(0.6745 * 490 / 0.75, abs=1e-4)
    assert abs(z[0]) < 1.0


def test_mad_outliers_constant_series(spark):
    """MAD = 0 (constant series): no finite score, nothing flagged —
    the Hampel convention, not a division error."""
    from influxdb_ha_spark.operators.timeseries import mad_outliers
    df = spark.createDataFrame(
        [(i, "c", 5.0) for i in range(6)] + [(9, "c", 5.0)],
        "time long, event_type string, value double")
    out = mad_outliers(df, by=["event_type"]).collect()
    assert all(r["robust_z"] is None for r in out)
    assert all(r["is_outlier"] is False for r in out)


def test_seasonal_decompose_recovers_components(spark):
    """A clean signal (linear trend + daily square-wave season) must come
    back out: identity v = trend + seasonal + resid on fully-windowed
    rows, NULL trend at the series edges, and the seasonal estimate
    separating the two phases by their planted offset."""
    from influxdb_ha_spark.operators.timeseries import seasonal_decompose
    HOUR = 3_600_000_000_000
    rows = []
    for h in range(24 * 6):              # 6 days hourly
        season = 10.0 if (h % 24) < 12 else -10.0
        rows.append((h * HOUR, "s", 100.0 + 0.1 * h + season))
    df = spark.createDataFrame(rows, "time long, event_type string, value double")
    out = sorted(seasonal_decompose(df, period=24).collect(),
                 key=lambda r: r["bucket"])
    assert len(out) == 144
    # edges: first/last 12 buckets have incomplete windows
    assert all(r["trend"] is None for r in out[:12] + out[-12:])
    for r in out[12:-12]:
        assert r["trend"] is not None
        assert abs(r["v"] - (r["trend"] + r["seasonal"] + r["resid"])) < 1e-9
    # phase separation: morning seasonal ~ +10+delta, evening ~ -10+delta
    morning = {r["seasonal"] for r in out[12:-12]
               if (r["bucket"] // HOUR) % 24 == 3}
    evening = {r["seasonal"] for r in out[12:-12]
               if (r["bucket"] // HOUR) % 24 == 15}
    assert len(morning) == 1 and len(evening) == 1
    assert next(iter(morning)) - next(iter(evening)) == pytest.approx(20.0, abs=1.0)


def test_seasonal_decompose_ungrouped_guarded(spark, monkeypatch):
    """by=[] routes the trend window through one task — allowed under
    the recurrence cap (small bucket tables), loud error above it."""
    from influxdb_ha_spark.functions import transforms as T
    from influxdb_ha_spark.operators.timeseries import seasonal_decompose
    HOUR = 3_600_000_000_000
    df = spark.createDataFrame(
        [(h * HOUR, float(h % 24)) for h in range(48)],
        "time long, value double")
    out = seasonal_decompose(df, by=[], period=4).collect()
    assert len(out) == 48
    full = [r for r in out if r["trend"] is not None]
    assert full and all(
        abs(r["v"] - (r["trend"] + r["seasonal"] + r["resid"])) < 1e-9
        for r in full)
    monkeypatch.setattr(T, "MAX_UNGROUPED_RECURRENCE_ROWS", 10)
    with pytest.raises(ValueError, match="seasonal_decompose"):
        seasonal_decompose(df, by=[], period=4)
