"""Degenerate-input contract sweep for the per-series analytics family
(r5 verdict #6): every per-series statistical operator must emit a row
for EVERY input series — or carry a documented exclusion — on the
degenerate shapes that historically broke them (single-point series,
constant series, period >= n). The r5 bug class was an INNER join with
a pair/lag aggregate silently dropping any series too short to produce
pairs; this sweep hunts that class across the whole family at once.

Input fixture: series "a" = one point; series "b" = five CONSTANT
points (heavy ties, zero variance); series "c" = two points. Every op
runs over all three at once, so partial drops (not just empty output)
are caught.
"""

import pytest

import pyspark.sql.functions as F

from influxdb_ha_spark.operators import timeseries as ts

B = 10 ** 9  # 1 s buckets — every point its own bucket


@pytest.fixture(scope="module")
def degenerate_df(spark):
    rows = ([(0, 7.0, "a")]
            + [(i * B, 2.0, "b") for i in range(5)]
            + [(0, 1.0, "c"), (B, 3.0, "c")])
    return spark.createDataFrame(rows, "time long, value double, tag string")


# ops whose output contract is EXACTLY one row per input series
PER_SERIES_OPS = [
    pytest.param(lambda df: ts.linear_trend(
        df, by=["tag"], value_col="value", bucket_ns=B), id="linear_trend"),
    pytest.param(lambda df: ts.theil_sen_trend(
        df, by=["tag"], value_col="value", bucket_ns=B), id="theil_sen"),
    pytest.param(lambda df: ts.mann_kendall(
        df, by=["tag"], value_col="value", bucket_ns=B), id="mann_kendall"),
    pytest.param(lambda df: ts.seasonal_mann_kendall(
        df, by=["tag"], value_col="value", bucket_ns=B, period=24),
        id="seasonal_mk_period_gt_n"),
    pytest.param(lambda df: ts.seasonal_mann_kendall(
        df, by=["tag"], value_col="value", bucket_ns=B, period=2),
        id="seasonal_mk_period_2"),
    pytest.param(lambda df: ts.pettitt_test(
        df, by=["tag"], value_col="value", bucket_ns=B), id="pettitt"),
    pytest.param(lambda df: ts.deadman(df, by=["tag"]), id="deadman"),
    pytest.param(lambda df: ts.permutation_entropy(
        df, by=["tag"], value_col="value", bucket_ns=B),
        id="perm_entropy"),
    pytest.param(lambda df: ts.ljung_box(
        df, by=["tag"], value_col="value", bucket_ns=B, max_lag=12),
        id="ljung_box"),
]


@pytest.mark.parametrize("op", PER_SERIES_OPS)
def test_per_series_output_cardinality(degenerate_df, op):
    out = op(degenerate_df)
    tags = sorted(r["tag"] for r in out.select("tag").collect())
    assert tags == ["a", "b", "c"], f"series dropped/duplicated: {tags}"


def test_degenerate_trend_values(degenerate_df):
    """Spot-pin the contract VALUES on the degenerate rows, not just
    presence: pairless -> s=0/z=0/trend=false (MK family), n_pairs=0
    with NULL slope (Theil-Sen — NULL, not a fake 0.0), k=0 unshifted
    (Pettitt on flat/single input), slope 0 (OLS on zero variance)."""
    mk = {r["tag"]: r for r in
          ts.mann_kendall(degenerate_df, by=["tag"], value_col="value",
                          bucket_ns=B).collect()}
    for t in "ab":   # a: single point; b: constant (all-tied) series
        assert (mk[t]["s"], mk[t]["z"], mk[t]["trend"]) == (0, 0.0, False)
    assert mk["c"]["s"] == 1

    smk = {r["tag"]: r for r in
           ts.seasonal_mann_kendall(degenerate_df, by=["tag"],
                                    value_col="value", bucket_ns=B,
                                    period=24).collect()}
    for t in "abc":  # period > n: every season pairless for all three
        assert (smk[t]["s"], smk[t]["z"], smk[t]["trend"]) == (0, 0.0, False)

    tsn = {r["tag"]: r for r in
           ts.theil_sen_trend(degenerate_df, by=["tag"], value_col="value",
                              bucket_ns=B).collect()}
    assert tsn["a"]["n_pairs"] == 0
    assert tsn["a"]["slope_per_bucket"] is None
    assert tsn["a"]["intercept"] is None
    assert (tsn["b"]["n_pairs"], tsn["b"]["slope_per_bucket"]) == (10, 0.0)
    assert (tsn["c"]["n_pairs"], tsn["c"]["slope_per_bucket"]) == (1, 2.0)

    pt = {r["tag"]: r for r in
          ts.pettitt_test(degenerate_df, by=["tag"], value_col="value",
                          bucket_ns=B).collect()}
    for t in "ab":   # no sign variation anywhere -> K=0, no shift
        assert (pt[t]["k"], pt[t]["u_at_k"], pt[t]["shift"]) == (0, 0, False)
        assert pt[t]["pexp_num"] == 0
    lt = {r["tag"]: r for r in
          ts.linear_trend(degenerate_df, by=["tag"], value_col="value",
                          bucket_ns=B).collect()}
    assert lt["a"]["slope_per_bucket"] == 0.0   # denx=0 -> 0 by contract
    assert lt["b"]["slope_per_bucket"] == 0.0

    pe = {r["tag"]: r for r in
          ts.permutation_entropy(degenerate_df, by=["tag"],
                                 value_col="value", bucket_ns=B).collect()}
    # a (1 bucket), c (2 buckets): too short for any triple -> 0/0/NULL
    for t in "ac":
        assert (pe[t]["n_windows"], pe[t]["n_patterns"]) == (0, 0)
        assert pe[t]["h"] is None and pe[t]["h_norm"] is None
    # b: 5 constant buckets -> 3 windows, single all-ties pattern, H=0
    assert (pe["b"]["n_windows"], pe["b"]["n_patterns"]) == (3, 1)
    assert pe["b"]["h"] == 0.0


def test_per_row_and_per_lag_contracts(degenerate_df):
    """The family's non-|series| contracts, pinned so their exclusion
    from the sweep above is a DOCUMENTED shape, not an oversight:
    cusum/mad_outliers are per-input-row; acf emits exactly
    min(max_lag, n_i - 1) rows per series (absent, not NULL, beyond)."""
    assert ts.cusum(degenerate_df, by=["tag"], value_col="value").count() == 8
    assert ts.mad_outliers(degenerate_df, by=["tag"],
                           value_col="value").count() == 8

    rows = ts.acf(degenerate_df, by=["tag"], value_col="value",
                  bucket_ns=B, max_lag=12).collect()
    per = {}
    for r in rows:
        per[r["tag"]] = per.get(r["tag"], 0) + 1
    # a: 1 bucket -> no lags; b: 5 buckets -> lags 1..4; c: lag 1
    assert per == {"b": 4, "c": 1}
    assert all(r["acf"] == 0.0 for r in rows if r["tag"] == "b")


def test_r9_family_shapes(degenerate_df):
    """The r9 additions' cardinality contracts on the same degenerate
    fixture, pinned so their shapes are DOCUMENTED, not oversights:

    - sax_symbols: >= 1 segment row for EVERY series (a 1-point series
      is one segment); constant/singleton series carry NULL z/symbol.
    - quantile_bands: one row per (series, bucket) — every series
      present; a 1-point bucket has p50 = p95 = p99 = max = the point.
    - matrix_profile: per-WINDOW — a series with < 2m buckets has no
      window with a non-trivial (|i-j| >= m) neighbor and is ABSENT by
      documented contract (the acf absent-not-NULL convention).
    - markov_stationary: per-STATE over observed transitions — a
      series key is an ENTITY here, not a state; single-event entities
      contribute no transitions, and a corpus with none yields an
      empty chain.
    """
    sax = ts.sax_symbols(degenerate_df, by=["tag"], value_col="value",
                         bucket_ns=B, segments=4, alphabet=4).collect()
    per = {}
    for r in sax:
        per.setdefault(r["tag"], []).append(r)
    assert sorted(per) == ["a", "b", "c"]
    assert len(per["a"]) == 1   # one point -> one occupied segment
    assert per["a"][0]["z"] is None and per["a"][0]["symbol"] is None
    assert all(r["z"] is None for r in per["b"])   # constant: sigma 0

    qb = ts.quantile_bands(degenerate_df, by=["tag"], value_col="value",
                           bucket_ns=B).collect()
    tags = {r["tag"] for r in qb}
    assert tags == {"a", "b", "c"}
    one = [r for r in qb if r["tag"] == "a"][0]
    assert (one["p50"], one["p99"], one["v_max"]) == (7.0, 7.0, 7.0)

    mp = ts.matrix_profile(degenerate_df, by=["tag"], value_col="value",
                           bucket_ns=B, m=2).collect()
    # only b (5 buckets >= 2m=4) can host non-trivial neighbors
    assert {r["tag"] for r in mp} == {"b"}
    assert all(r["nn_dist"] == 0.0 for r in mp)   # constant series

    # two entities, each with a single event type twice -> self-loops
    mk = ts.markov_stationary(
        degenerate_df.withColumnRenamed("tag", "event_type")
        .withColumn("user_id", F.lit(1)),
        by=["user_id"]).collect()
    states = {r["event_type"] for r in mk}
    # entity 1's time-ordered chain over a/b/c transitions exists;
    # every observed state gets a pi row
    assert states <= {"a", "b", "c"} and len(states) >= 1
