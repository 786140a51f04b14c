"""Hand-checked goldens for the r9 additions: sax_symbols,
matrix_profile, activity_concentration, zipf_fit."""

import math

import pytest

from influxdb_ha_spark.operators.text import zipf_fit
from influxdb_ha_spark.operators.timeseries import (
    activity_concentration, matrix_profile, sax_symbols)

B = 10 ** 9  # 1 s buckets


def test_sax_two_level_series(spark):
    # 8 points: four at -1, four at +1 -> mu=0, sigma=1; segments=2
    # puts each level in its own segment; z = -1 / +1 maps to the
    # a=4 breakpoints as 'a' (z < -0.6745) and 'd' (z >= 0.6745)
    rows = [(i * B, -1.0 if i < 4 else 1.0, "x") for i in range(8)]
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {r["segment"]: r for r in
           sax_symbols(df, by=["tag"], value_col="value", bucket_ns=B,
                       segments=2, alphabet=4).collect()}
    assert out[0]["symbol"] == "a" and out[0]["z"] == -1.0
    assert out[1]["symbol"] == "d" and out[1]["z"] == 1.0
    assert out[0]["paa"] == -1.0 and out[0]["n_pts"] == 4


def test_sax_constant_series_null_symbol(spark):
    rows = [(i * B, 7.0, "k") for i in range(6)]
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = sax_symbols(df, by=["tag"], value_col="value", bucket_ns=B,
                      segments=3, alphabet=4).collect()
    assert len(out) == 3
    assert all(r["z"] is None and r["symbol"] is None for r in out)
    assert all(r["paa"] == 7.0 for r in out)


def test_sax_segment_routing_and_validation(spark):
    # 5 buckets, 2 segments: ranks 0..4 -> floor(rk*2/5) = 0,0,0,1,1
    rows = [(i * B, float(i), "x") for i in range(5)]
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {r["segment"]: r["n_pts"] for r in
           sax_symbols(df, by=["tag"], value_col="value", bucket_ns=B,
                       segments=2, alphabet=4).collect()}
    assert out == {0: 3, 1: 2}
    with pytest.raises(ValueError, match="alphabet"):
        sax_symbols(df, by=["tag"], alphabet=2)
    with pytest.raises(ValueError, match="segments"):
        sax_symbols(df, by=["tag"], segments=0)
    with pytest.raises(ValueError, match="max_buckets"):
        sax_symbols(df, by=["tag"], value_col="value", bucket_ns=B,
                    max_buckets=3)


def test_matrix_profile_planted_motif(spark):
    # series: a [0,10,0] spike at positions 2..4 and again at 10..12,
    # flat elsewhere; m=2 windows — each spike window's nearest
    # non-trivial neighbor is its twin in the other spike, distance 0
    vals = [0.0] * 16
    vals[3], vals[11] = 10.0, 10.0
    rows = [(i * B, v, "x") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {r["i"]: r for r in
           matrix_profile(df, by=["tag"], value_col="value",
                          bucket_ns=B, m=2).collect()}
    # window starting at 2 is [0,10]; its twin starts at 10
    assert out[2]["nn_index"] == 10 and out[2]["nn_dist"] == 0.0
    assert out[10]["nn_index"] == 2 and out[10]["nn_dist"] == 0.0
    # a flat window far from the spikes matches another flat window
    assert out[6]["nn_dist"] == 0.0
    # 16 points, m=2 -> 15 windows, all with a non-trivial neighbor
    assert len(out) == 15


def test_matrix_profile_exclusion_zone_and_ties(spark):
    # strictly increasing series: no exact repeats; for window i the
    # nearest neighbor under |i-j| >= m must NOT be i+-1 (trivial
    # match), and ties resolve to the smallest j
    rows = [(i * B, float(i * i), "x") for i in range(8)]
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = matrix_profile(df, by=["tag"], value_col="value",
                         bucket_ns=B, m=3).collect()
    for r in out:
        assert abs(r["i"] - r["nn_index"]) >= 3
    with pytest.raises(ValueError, match="m must be"):
        matrix_profile(df, by=["tag"], m=1)
    with pytest.raises(ValueError, match="max_buckets"):
        matrix_profile(df, by=["tag"], value_col="value", bucket_ns=B,
                       max_buckets=4)


def test_activity_concentration_goldens(spark):
    # type "eq": 4 users x 5 events -> perfect equality, gini 0,
    #   top decile = top ceil(4/10)=1 user = 5/20
    # type "whale": counts 1,1,1,7 -> G = (2*(1+2+3+28) - 5*10)/(4*10)
    #   = (68-50)/40 = 0.45; top 1 user share 0.7
    rows = ([(u, "eq") for u in range(4) for _ in range(5)]
            + [(0, "whale"), (1, "whale"), (2, "whale")]
            + [(3, "whale")] * 7)
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = {r["event_type"]: r for r in
           activity_concentration(df, by=["user_id"]).collect()}
    assert out["eq"]["gini"] == 0.0
    assert out["eq"]["top_decile_share"] == 0.25
    assert out["whale"]["gini"] == 0.45
    assert out["whale"]["top_decile_share"] == 0.7
    assert out["whale"]["n_entities"] == 4
    assert out["whale"]["n_events"] == 10


def test_activity_concentration_single_entity_zero_gini(spark):
    df = spark.createDataFrame([(1, "solo")] * 9,
                               "user_id long, event_type string")
    r = activity_concentration(df, by=["user_id"]).collect()[0]
    assert r["gini"] == 0.0 and r["top_decile_share"] == 1.0


def test_zipf_exact_power_law(spark):
    # construct frequencies f_r = round(1000 * r^-1): tokens t01..t20,
    # token t_r repeated f_r times -> OLS slope close to -1
    docs = []
    did = 0
    for r in range(1, 21):
        f = max(1, round(1000 / r))
        for _ in range(f):
            docs.append((did, f"tok{r:02d}"))
            did += 1
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = zipf_fit(df, top_n=20).collect()[0]
    assert row["n_ranks"] == 20
    # reference OLS on the same (ln r, ln f) points
    xs = [math.log(r) for r in range(1, 21)]
    fs = sorted((max(1, round(1000 / r)) for r in range(1, 21)),
                reverse=True)
    ys = [math.log(f) for f in fs]
    n = 20.0
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row["slope"] - slope) < 1e-4
    assert -1.05 < row["slope"] < -0.95


def test_zipf_uniform_corpus_zero_slope(spark):
    # every token appears exactly 3 times -> all y equal -> slope 0
    docs = [(i, f"w{i % 7} w{i % 7} w{i % 7}") for i in range(7)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    row = zipf_fit(df, top_n=7).collect()[0]
    assert row["n_ranks"] == 7 and row["slope"] == 0.0
    with pytest.raises(ValueError, match="top_n"):
        zipf_fit(df, top_n=1)


def test_zipf_empty_corpus(spark):
    df = spark.createDataFrame([], "doc_id long, text string")
    assert zipf_fit(df, top_n=10).collect() == []


def test_markov_two_state_chain(spark):
    # chain a->b->a->b... : P = [[0,1],[1,0]], stationary (0.5, 0.5);
    # power iteration from uniform hits it exactly at every step
    from influxdb_ha_spark.operators.timeseries import markov_stationary
    rows = [(1, i * B, "a" if i % 2 == 0 else "b") for i in range(20)]
    df = spark.createDataFrame(rows, "user_id long, time long, "
                               "event_type string")
    out = {r["event_type"]: r for r in
           markov_stationary(df, by=["user_id"], iters=6).collect()}
    assert out["a"]["pi_fp"] == 500_000_000_000
    assert out["b"]["pi_fp"] == 500_000_000_000
    assert out["a"]["pi"] == 0.5


def test_markov_absorbing_dangling_state(spark):
    # a -> b only, b never leaves: b is dangling -> exact self-loop,
    # all mass absorbs into b
    from influxdb_ha_spark.operators.timeseries import markov_stationary
    rows = [(u, t * B, ty) for u in range(3)
            for t, ty in [(0, "a"), (1, "b")]]
    df = spark.createDataFrame(rows, "user_id long, time long, "
                               "event_type string")
    out = {r["event_type"]: r["pi_fp"] for r in
           markov_stationary(df, by=["user_id"], iters=10).collect()}
    assert out["b"] == 1_000_000_000_000  # all mass absorbed
    assert out["a"] == 0


def test_markov_empty(spark):
    from influxdb_ha_spark.operators.timeseries import markov_stationary
    df = spark.createDataFrame([], "user_id long, time long, "
                               "event_type string")
    assert markov_stationary(df, by=["user_id"]).collect() == []


def test_quantile_bands_golden(spark):
    from influxdb_ha_spark.operators.timeseries import quantile_bands
    # one series, one bucket, values 1..100: p50=50.5, p95=95.05,
    # p99=99.01 under the (n-1)*q interpolation
    rows = [(i * 1000, float(i), "x") for i in range(1, 101)]
    df = spark.createDataFrame(rows, "time long, value double, "
                               "tag string")
    r = quantile_bands(df, by=["tag"], value_col="value",
                       bucket_ns=10**12).collect()[0]
    assert r["n"] == 100 and r["v_max"] == 100.0
    assert r["p50"] == 50.5
    assert r["p95"] == 95.05
    assert r["p99"] == 99.01


def test_burstiness_uniform_vs_bursty(spark):
    from influxdb_ha_spark.operators.text import token_burstiness
    # "flat" appears once in each of 8 docs -> per-doc counts all 1
    # over n=8 docs: mean 1, var 0 -> VMR 0 (population, zeros absent)
    # "burst" appears 8 times in ONE doc: counts (8,0,...,0):
    # mean 1, E[c^2] = 64/8 = 8 -> var 7 -> VMR 7
    docs = [(i, "flat " + ("burst " * 8 if i == 0 else ""))
            for i in range(8)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["token"]: r for r in
           token_burstiness(df, top_n=10).collect()}
    assert out["flat"]["vmr"] == 0.0
    assert out["flat"]["df_docs"] == 8 and out["flat"]["total"] == 8
    assert out["burst"]["vmr"] == 7.0
    assert out["burst"]["df_docs"] == 1 and out["burst"]["total"] == 8
    import pytest as _pt
    with _pt.raises(ValueError, match="top_n"):
        token_burstiness(df, top_n=0)


def test_length_profile_nulls_counted_not_measured(spark):
    from influxdb_ha_spark.operators.text import length_profile
    rows = [("s1", 10), ("s1", 20), ("s1", 30), ("s1", None),
            ("s2", 5)]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    out = {r["source"]: r for r in length_profile(df).collect()}
    assert out["s1"]["n_docs"] == 4 and out["s1"]["n_measured"] == 3
    assert out["s1"]["p50"] == 20.0 and out["s1"]["mean_len"] == 20.0
    assert out["s1"]["p25"] == 15.0  # (n-1)q interpolation over 3 pts
    assert out["s2"]["p95"] == 5.0 and out["s2"]["n_docs"] == 1
