"""Property tests for the r9 operators (the test_timeseries_props
conventions: hypothesis drives shapes, few examples because each is a
full Spark job, generators favor collisions — tiny domains so ties and
degenerate groups actually occur).

Invariants, each provable from the operator contracts:
- Gini is EXACTLY invariant under uniform count scaling (c_i -> k*c_i
  cancels in the rank formula) and always within [0, 1).
- markov_stationary conserves fixed-point mass up to the documented
  floor-truncation leak, and never goes negative.
- quantile_bands is monotone (p50 <= p95 <= p99 <= max) with bucket
  counts summing to the input size.
- sax_symbols covers every bucket exactly once per series and only
  emits alphabet letters.
"""

from hypothesis import given, settings, strategies as st

from influxdb_ha_spark.operators.timeseries import (
    activity_concentration, markov_stationary, quantile_bands,
    sax_symbols)

B = 10 ** 9

users = st.integers(min_value=0, max_value=3)
types = st.sampled_from(["x", "y", "z"])


@settings(max_examples=8, deadline=None)
@given(events=st.lists(st.tuples(users, types), min_size=1, max_size=12),
       k=st.integers(min_value=2, max_value=4))
def test_gini_scale_invariant_and_bounded(spark, events, k):
    df1 = spark.createDataFrame(events, "user_id long, event_type string")
    dfk = spark.createDataFrame(events * k,
                                "user_id long, event_type string")
    g1 = {r["event_type"]: r for r in
          activity_concentration(df1, by=["user_id"]).collect()}
    gk = {r["event_type"]: r for r in
          activity_concentration(dfk, by=["user_id"]).collect()}
    assert set(g1) == set(gk)
    for t, r in g1.items():
        assert 0.0 <= r["gini"] < 1.0
        assert gk[t]["gini"] == r["gini"], t
        assert gk[t]["n_events"] == k * r["n_events"]
        assert gk[t]["n_entities"] == r["n_entities"]
        assert gk[t]["top_decile_share"] == r["top_decile_share"]


@settings(max_examples=6, deadline=None)
@given(chain=st.lists(st.tuples(users, types), min_size=2, max_size=10))
def test_markov_mass_conserved_up_to_leak(spark, chain):
    rows = [(u, i * B, t) for i, (u, t) in enumerate(chain)]
    df = spark.createDataFrame(rows, "user_id long, time long, "
                               "event_type string")
    out = markov_stationary(df, by=["user_id"], iters=4).collect()
    if not out:   # no entity produced two events -> empty chain
        return
    total = sum(r["pi_fp"] for r in out)
    assert all(r["pi_fp"] >= 0 for r in out)
    # leak bound: initial division loss (< n_states) + per-round
    # row-normalization deficit (< n_states * n_states per round) +
    # per-round floor loss (<= 1 per nonzero p_ij); states <= 3 here
    n = len(out)
    bound = n + 4 * (n * n + n * n)
    # row-normalization deficit scales pi multiplicatively: each unit
    # of pi loses at most (outdeg/1e6 + pairs/SCALE) — for these tiny
    # chains a loose absolute cap suffices
    assert 10 ** 12 - total <= bound * (10 ** 6 + 1)
    assert total <= 10 ** 12


@settings(max_examples=8, deadline=None)
@given(vals=st.lists(st.floats(min_value=-50, max_value=50,
                               allow_nan=False, width=32),
                     min_size=1, max_size=14))
def test_quantile_bands_monotone(spark, vals):
    rows = [(i * B // 3, float(v), "s") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = quantile_bands(df, by=["tag"], value_col="value",
                         bucket_ns=2 * B).collect()
    assert sum(r["n"] for r in out) == len(vals)
    for r in out:
        assert r["p50"] <= r["p95"] <= r["p99"] <= r["v_max"] + 1e-9


@settings(max_examples=6, deadline=None)
@given(vals=st.lists(st.floats(min_value=-9, max_value=9,
                               allow_nan=False, width=32),
                     min_size=1, max_size=12),
       segments=st.integers(min_value=1, max_value=5))
def test_sax_partition_and_alphabet(spark, vals, segments):
    rows = [(i * B, float(v), "s") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = sax_symbols(df, by=["tag"], value_col="value", bucket_ns=B,
                      segments=segments, alphabet=4).collect()
    assert sum(r["n_pts"] for r in out) == len(vals)
    assert len({r["segment"] for r in out}) == len(out)  # no dup segs
    for r in out:
        assert r["symbol"] in (None, "a", "b", "c", "d")
        assert (r["symbol"] is None) == (r["z"] is None)
