"""runs_test / peaks / autoperiod (operators/timeseries.py) goldens."""

import math

import pytest

from influxdb_ha_spark.operators.timeseries import autoperiod, peaks, runs_test

HOUR = 3_600_000_000_000


def _series(spark, vals, series="s"):
    rows = [(series, i * HOUR, float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(
        rows, "event_type string, time long, value double")


def _wald_wolfowitz(vals):
    med = sorted(vals)[len(vals) // 2] if len(vals) % 2 else \
        (sorted(vals)[len(vals) // 2 - 1] + sorted(vals)[len(vals) // 2]) / 2
    signs = [v > med for v in vals if v != med]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1, n2 = sum(signs), len(signs) - sum(signs)
    n = n1 + n2
    two = 2.0 * n1 * n2
    mu = 1.0 + two / n
    var = (two * (two - n)) / (n * n * (n - 1))
    return runs, n1, n2, (runs - mu) / math.sqrt(var)


def test_runs_test_alternating_vs_sorted(spark):
    alt = [0, 10] * 10          # maximal runs -> large positive z
    srt = [0] * 10 + [10] * 10  # 2 runs -> large negative z
    r_alt = runs_test(_series(spark, alt)).collect()[0]
    r_srt = runs_test(_series(spark, srt)).collect()[0]
    runs, n1, n2, z = _wald_wolfowitz([float(v) for v in alt])
    assert (r_alt.runs, r_alt.n_above, r_alt.n_below) == (runs, n1, n2)
    assert r_alt.z == pytest.approx(z, abs=2e-6)
    assert r_alt.z > 0 and r_alt.nonrandom
    assert r_srt.runs == 2 and r_srt.z < 0 and r_srt.nonrandom


def test_runs_test_ties_dropped_and_degenerate(spark):
    # all-equal series: every value == median -> n = 0 -> no z
    r = runs_test(_series(spark, [5.0] * 8)).collect()[0]
    assert r.n_above == 0 and r.n_below == 0
    assert r.z is None and r.nonrandom is None


def test_peaks_interior_only(spark):
    #        0  1  2  3  4  5  6  7  8
    vals = [9, 1, 2, 7, 2, 1, 5, 1, 9]
    # with k=2: index 3 (7 > 1,2 and > 2,1) is a peak; index 0/8 are
    # edges (truncated neighborhood) and never qualify; index 6
    # (5 > 2,1 and > 1,9) fails the right side
    got = sorted(r.bucket // HOUR for r in
                 peaks(_series(spark, vals), k=2).collect())
    assert got == [3]


def test_peaks_strictness(spark):
    # plateau: equal neighbor kills the strict > contract
    vals = [1, 5, 5, 1, 0, 0]
    assert peaks(_series(spark, vals), k=1).count() == 0


def test_autoperiod_detects_planted_period(spark):
    # strong period-4 signal over 48 buckets
    vals = [10 if i % 4 == 0 else 0 for i in range(48)]
    r = autoperiod(_series(spark, vals), max_lag=6).collect()[0]
    assert r.period_lag == 4
    assert r.period_ns == 4 * HOUR
    assert r.acf_peak > 0.5
