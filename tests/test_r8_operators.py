"""Hand-checked goldens for the r8 additions: ljung_box, cohort_ltv,
heavy_hitters (batch), winnowing_fingerprints."""

import math

from pyspark.sql import functions as F

from influxdb_ha_spark.operators.timeseries import (
    cohort_ltv, heavy_hitters, ljung_box)
from influxdb_ha_spark.operators.text import (
    rolling_fingerprints, winnowing_fingerprints)

B = 10 ** 9  # 1 s buckets
DAY = 86_400_000_000_000


def test_ljung_box_alternating_rejects_constant_does_not(spark):
    # series "x": strict +-1 alternation, 20 buckets -> r_1 ~ -1,
    # Q explodes past any chi-square bound -> rejected
    # series "k": constant, acf defined 0 by the den=0 guard -> Q=0
    # series "s": single point -> no lags: h=0, NULL q, not rejected
    rows = ([(i * B, 1.0 if i % 2 else -1.0, "x") for i in range(20)]
            + [(i * B, 5.0, "k") for i in range(10)]
            + [(0, 3.0, "s")])
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {r["tag"]: r for r in
           ljung_box(df, by=["tag"], value_col="value", bucket_ns=B,
                     max_lag=12).collect()}
    assert out["x"]["rejected"] and out["x"]["q"] > 21.026070
    assert out["x"]["n_buckets"] == 20 and out["x"]["h"] == 12
    assert out["k"]["q"] == 0.0 and not out["k"]["rejected"]
    assert out["s"]["h"] == 0 and out["s"]["q"] is None
    assert not out["s"]["rejected"]


def test_ljung_box_matches_python_reference(spark):
    # deterministic pseudo-noise; reference computes the same
    # round-6-chained pipeline the operator documents
    vals = [((i * 37) % 11) - 5.0 for i in range(15)]
    df = spark.createDataFrame(
        [(i * B, v, "z") for i, v in enumerate(vals)],
        "time long, value double, tag string")
    h = 4
    out = ljung_box(df, by=["tag"], value_col="value", bucket_ns=B,
                    max_lag=h).collect()[0]

    def fr6(x):
        return math.floor(x * 1e6 + 0.5) / 1e6

    n = len(vals)
    xbar = fr6(sum(vals) / n)  # values are exact halves/integers
    c = [v - xbar for v in vals]
    den = sum(x * x for x in c)
    r = [fr6(sum(c[i] * c[i + lag] for i in range(n - lag)) / den)
         for lag in range(1, h + 1)]
    q = fr6(n * (n + 2) * sum(rk * rk / (n - lag)
                              for lag, rk in enumerate(r, start=1)))
    assert out["h"] == h and out["n_buckets"] == n
    assert abs(out["q"] - q) < 2e-6


def test_cohort_ltv_hand_matrix(spark):
    rows = [
        # u1 cohorts day 0; buys 10.0 on day 0 and 20.0 on day 2
        (1, "signup", 0, 0.0),
        (1, "purchase", 10, 10.0),
        (1, "purchase", 2 * DAY + 5, 20.0),
        # u2 cohorts day 0 (view), never buys
        (2, "view", 50, 0.0),
        # u3 cohorts day 2, buys 7.5 same day
        (3, "purchase", 2 * DAY + 9, 7.5),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, time long, value double")
    out = {(r["cohort_bucket"], r["offset"]): r
           for r in cohort_ltv(df, by=["user_id"], bucket_ns=DAY).collect()}
    assert set(out) == {(0, 0), (0, 2), (2 * DAY, 0)}
    c00 = out[(0, 0)]
    assert (c00["cohort_size"], c00["buyers"], c00["revenue"]) == (2, 1, 10.0)
    assert c00["ltv_per_user"] == 5.0
    c02 = out[(0, 2)]
    assert (c02["buyers"], c02["revenue"], c02["ltv_per_user"]) \
        == (1, 20.0, 10.0)
    c20 = out[(2 * DAY, 0)]
    assert (c20["cohort_size"], c20["revenue"], c20["ltv_per_user"]) \
        == (1, 7.5, 7.5)


def test_heavy_hitters_strict_threshold(spark):
    # n = 10: with k = 5 the bar is cnt*5 > 10, i.e. cnt >= 3 — a key
    # at exactly n/k (2) must NOT qualify (strict >)
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2
    df = spark.createDataFrame(rows, "u string")
    got = {r["u"]: (r["cnt"], r["n_total"], r["share"])
           for r in heavy_hitters(df, by=["u"], k=5).collect()}
    assert got == {"a": (5, 10, 0.5), "b": (3, 10, 0.3)}


def test_winnowing_properties(spark):
    text_a = " ".join(f"w{(i * 7) % 23}" for i in range(40))
    shared = " ".join(f"s{i}" for i in range(15))
    docs = spark.createDataFrame(
        [(1, text_a + " " + shared),
         (2, "unrelated prefix tokens here " + shared),
         (3, "tiny doc")],  # < k tokens -> no fingerprints
        "doc_id long, text string")
    k, s = 8, 4
    fp = winnowing_fingerprints(docs, k=k, s=s).collect()
    roll = {(r["doc_id"], r["pos"]): r["whash"]
            for r in rolling_fingerprints(docs, w=k).collect()}
    sel = {}
    for r in fp:
        # every selection is a real (pos, hash) from the rolling table
        assert roll[(r["doc_id"], r["pos"])] == r["fp"]
        sel.setdefault(r["doc_id"], set()).add(r["pos"])
    assert 3 not in sel
    # coverage: every s-window of hash positions contains a selection
    for d in (1, 2):
        m = max(p for dd, p in roll if dd == d)
        for j in range(1, m - s + 2):
            assert any(j <= p <= j + s - 1 for p in sel[d]), (d, j)
    # guarantee: the shared >= s+k-1 = 11-token run yields a shared fp
    fps = {d: {(r["fp"]) for r in fp if r["doc_id"] == d} for d in (1, 2)}
    assert fps[1] & fps[2]


def test_cluster_purity_hand_clusters(spark):
    from influxdb_ha_spark.operators.similarity import cluster_purity
    # centroid 0 ~ +x, centroid 1 ~ +y; vectors land by cosine;
    # cluster 0 gets labels [7, 7, 8] -> purity 2/3; cluster 1 pure
    rows = [
        (0, [1.0, 0.0], None),    # centroid seed rows double as corpus
        (1, [0.0, 1.0], None),    # NULL labels -> excluded from voting
        (10, [0.9, 0.1], 7),
        (11, [0.8, 0.0], 7),
        (12, [0.7, 0.2], 8),
        (20, [0.1, 0.9], 3),
        (21, [0.0, 0.8], 3),
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    cent = (df.where(F.col("vec_id") < 2)
            .selectExpr("vec_id AS centroid_id", "embedding"))
    got = {r.centroid_id: r for r in
           cluster_purity(df, cent, label_col="label").collect()}
    assert got[0].n_vectors == 3 and got[0].majority_label == 7
    assert got[0].n_majority == 2 and got[0].purity == 0.666667
    assert got[1].n_vectors == 2 and got[1].majority_label == 3
    assert got[1].purity == 1.0


def test_cluster_purity_majority_tie_breaks_to_lowest_label(spark):
    from influxdb_ha_spark.operators.similarity import cluster_purity
    df = spark.createDataFrame(
        [(0, [1.0, 0.0], None), (10, [0.9, 0.1], 9), (11, [0.8, 0.2], 4)],
        "vec_id long, embedding array<double>, label int")
    cent = (df.where(F.col("vec_id") < 1)
            .selectExpr("vec_id AS centroid_id", "embedding"))
    r = cluster_purity(df, cent, label_col="label").collect()[0]
    assert r.majority_label == 4 and r.n_majority == 1 and r.purity == 0.5


def test_funnel_times_hand_lags(spark):
    from influxdb_ha_spark.operators.timeseries import funnel_times
    H = 3_600_000_000_000
    rows = [
        # u1: signup@0, view@2h, purchase@5h -> lags 2h, 3h
        (1, "signup", 0), (1, "view", 2 * H), (1, "purchase", 5 * H),
        # u2: signup@0, view@4h, never purchases -> lag 4h, None
        (2, "signup", 0), (2, "view", 4 * H),
        # u3: view only (never signs up) -> reaches nothing
        (3, "view", H),
    ]
    df = spark.createDataFrame(rows,
                               "user_id long, event_type string, time long")
    out = {r["step"]: r for r in
           funnel_times(df, steps=["signup", "view", "purchase"],
                        by=["user_id"], on="time").collect()}
    assert set(out) == {1, 2}  # step 0 has no conversion lag
    v = out[1]
    assert v["step_name"] == "view" and v["entities"] == 2
    assert (v["min_lag_ns"], v["max_lag_ns"]) == (2 * H, 4 * H)
    assert v["median_lag_ns"] == 3.0 * H  # exact interpolating median
    p = out[2]
    assert p["step_name"] == "purchase" and p["entities"] == 1
    assert p["min_lag_ns"] == p["max_lag_ns"] == 3 * H
    # a step nobody reaches stays present with NULL stats
    out2 = {r["step"]: r for r in
            funnel_times(df, steps=["signup", "view", "error"],
                         by=["user_id"], on="time").collect()}
    assert out2[2]["entities"] == 0 and out2[2]["median_lag_ns"] is None


def test_cross_corpus_near_dup_orients_and_filters(spark):
    from influxdb_ha_spark.operators.dedup import (
        cross_corpus_near_duplicates)
    base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (1, base, True),              # new copy
        (2, base, False),             # ref copy  -> cross pair (1, 2)
        (3, base + " iota", True),    # new near-dup of both
        (10, "completely different text with other tokens", False),
        (11, base, True),             # second new copy: (1,11) is
                                      # new-new and must NOT emit
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, nw boolean")
    out = cross_corpus_near_duplicates(df, F.col("nw"), threshold=0.5)
    got = {(r["new_id"], r["ref_id"]) for r in out.collect()}
    # every emitted pair is oriented new -> ref, and only cross pairs
    assert got == {(1, 2), (3, 2), (11, 2)}


def test_type_transitions_hand_matrix(spark):
    from influxdb_ha_spark.operators.timeseries import type_transitions
    rows = [
        (1, "a", 0), (1, "b", 10), (1, "a", 20),   # a->b, b->a
        (2, "a", 0), (2, "b", 5),                  # a->b (2nd entity)
        # same-timestamp tie: types order lexicographically -> a then b
        (3, "b", 7), (3, "a", 7),
    ]
    df = spark.createDataFrame(rows,
                               "user_id long, event_type string, time long")
    got = {(r.from_type, r.to_type): (r.n_transitions, r.n_entities)
           for r in type_transitions(df, by=["user_id"]).collect()}
    assert got == {("a", "b"): (3, 3), ("b", "a"): (1, 1)}


def test_type_transitions_excludes_null_types(spark):
    from influxdb_ha_spark.operators.timeseries import type_transitions
    rows = [(1, "a", 0), (1, None, 5), (1, "b", 10)]
    df = spark.createDataFrame(rows,
                               "user_id long, event_type string, time long")
    got = {(r.from_type, r.to_type): r.n_transitions
           for r in type_transitions(df, by=["user_id"]).collect()}
    # the null-typed event is skipped entirely: a -> b, not a -> null -> b
    assert got == {("a", "b"): 1}


def test_dau_anomaly_flags_planted_dip(spark):
    from influxdb_ha_spark.operators.timeseries import dau_anomaly
    D = 86_400_000_000_000
    rows = []
    for day in range(11):
        n = 1 if day == 5 else 20 + (day % 3)  # planted outage on day 5
        for u in range(n):
            rows.append((u, day * D + u))
    df = spark.createDataFrame(rows, "user_id long, time long")
    out = {r.bucket // D: r for r in
           dau_anomaly(df, by=["user_id"], on="time").collect()}
    assert len(out) == 11 and out[5].dau == 1
    assert out[5].is_anomaly and out[5].robust_z < -3.5
    assert all(not out[d].is_anomaly for d in out if d != 5)


def test_dau_anomaly_flat_series_scores_null(spark):
    from influxdb_ha_spark.operators.timeseries import dau_anomaly
    D = 86_400_000_000_000
    rows = [(u, d * D + u) for d in range(5) for u in range(7)]
    df = spark.createDataFrame(rows, "user_id long, time long")
    res = dau_anomaly(df, by=["user_id"], on="time").collect()
    assert all(r.robust_z is None and not r.is_anomaly for r in res)


def test_dup_profile_hand_counts(spark):
    from influxdb_ha_spark.operators.dedup import dup_profile
    rows = [(0, "aa", "s1"), (1, "aa", "s1"), (2, "aa", "s1"),
            (3, "bb", "s1"), (4, "cc", "s2"), (5, "dd", "s2")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r.source: r for r in dup_profile(df).collect()}
    s1 = got["s1"]
    assert (s1.n_docs, s1.n_unique, s1.n_dup_excess, s1.max_clone) == (4, 2, 2, 3)
    assert s1.dup_rate == 0.5
    s2 = got["s2"]
    assert (s2.n_docs, s2.n_unique, s2.n_dup_excess, s2.max_clone) == (2, 2, 0, 1)
    assert s2.dup_rate == 0.0


def test_inter_event_profile_hand_gaps(spark):
    from influxdb_ha_spark.operators.timeseries import inter_event_profile
    # user 1 type a at t=0,10,40  -> gaps 10, 30
    # user 2 type a at t=100,105  -> gap 5
    # type b: one event per user  -> 0 gaps, NULL stats
    # null-typed event must not contribute anywhere
    rows = [(1, "a", 0), (1, "a", 10), (1, "a", 40),
            (2, "a", 100), (2, "a", 105),
            (1, "b", 7), (2, None, 8)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, time long")
    got = {r.event_type: r for r in
           inter_event_profile(df, by=["user_id"]).collect()}
    a = got["a"]
    assert (a.n_gaps, a.min_gap_ns, a.max_gap_ns) == (3, 5, 30)
    assert a.median_gap_ns == 10.0  # odd count: exact middle element
    assert a.mean_gap_ns == 15.0    # (10+30+5)/3
    b = got["b"]
    assert b.n_gaps == 0 and b.min_gap_ns is None and b.median_gap_ns is None
    assert None not in got  # the NULL type never becomes a row


def test_inter_event_profile_tied_timestamps_deterministic(spark):
    from influxdb_ha_spark.operators.timeseries import inter_event_profile
    # two events at the same instant -> gap 0 under any physical order
    rows = [(1, "a", 5), (1, "a", 5), (1, "a", 9)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, time long")
    a = inter_event_profile(df, by=["user_id"]).collect()[0]
    assert (a.n_gaps, a.min_gap_ns, a.max_gap_ns) == (2, 0, 4)
    assert a.median_gap_ns == 2.0  # even count: midpoint of 0 and 4


def test_centroid_outliers_flags_far_vector(spark):
    from influxdb_ha_spark.operators.similarity import centroid_outliers
    # 20 vectors hugging +x, one pointing -x; single centroid = +x
    rows = [(i, [1.0, 0.01 * i]) for i in range(20)] + [(99, [-1.0, 0.0])]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame([(0, [1.0, 0.0])],
                                  "centroid_id long, embedding array<double>")
    out = {r.vec_id: r for r in centroid_outliers(corpus, cents).collect()}
    assert len(out) == 21
    # bottom 5% of 21 rows: 100*rank <= 5*21 -> rank 1 only
    assert out[99].is_outlier and out[99].rank == 1
    assert sum(r.is_outlier for r in out.values()) == 1
    assert all(r.centroid_id == 0 for r in out.values())


def test_label_propagation_two_cliques(spark):
    from influxdb_ha_spark.operators.graph import label_propagation
    # two 4-cliques bridged by one edge: LPA labels each clique by its
    # minimum id; the bridge does not merge them (clique votes dominate)
    clique1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    clique2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    edges = spark.createDataFrame(clique1 + clique2 + [(3, 10)],
                                  "src long, dst long")
    out = {r.node: r for r in label_propagation(edges, rounds=4).collect()}
    assert len(out) == 8
    assert {out[n].community for n in range(4)} == {0}
    assert {out[n].community for n in range(10, 14)} == {10}
    assert out[0].community_size == 4 and out[10].community_size == 4


def test_association_rules_hand_counts(spark):
    from influxdb_ha_spark.operators.timeseries import association_rules
    # bucket=10. Baskets: u1/day0 {a,b}, u2/day0 {a,b}, u3/day0 {a},
    # u1/day1 {b,c}. N=4 baskets; n_a=3, n_b=3, n_c=1; (a,b) co-occurs
    # twice; (b,c) once (below min_count=2 -> dropped)
    rows = [(1, "a", 0), (1, "b", 1), (2, "a", 2), (2, "b", 3),
            (3, "a", 4), (1, "b", 10), (1, "c", 11)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, time long")
    out = association_rules(df, by=["user_id"], on="time", bucket_ns=10,
                            min_count=2).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b) == ("a", "b")
    assert (r.n_a, r.n_b, r.n_ab, r.n_baskets) == (3, 3, 2, 4)
    assert r.support == 0.5
    assert r.conf_a_to_b == 0.666667 and r.conf_b_to_a == 0.666667
    assert r.lift == 0.888889  # 2*4/(3*3)


def test_association_rules_basket_cap_drops_pairs_not_singles(spark):
    from influxdb_ha_spark.operators.timeseries import association_rules
    # one entity touches 5 types in a day with max_basket=4: the basket
    # is dropped from the PAIR stage but its types still count in
    # singles and the basket in n_baskets; two normal baskets supply
    # the surviving pair
    big = [(9, t, i) for i, t in enumerate("abcde")]
    norm = [(1, "a", 0), (1, "b", 1), (2, "a", 2), (2, "b", 3)]
    df = spark.createDataFrame(big + norm,
                               "user_id long, event_type string, time long")
    out = association_rules(df, by=["user_id"], on="time", bucket_ns=100,
                            min_count=2, max_basket=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b, r.n_ab) == ("a", "b", 2)
    assert r.n_a == 3 and r.n_b == 3  # the capped basket still counts
    assert r.n_baskets == 3


def test_type_mix_drift_proportional_mix_is_zero(spark):
    from influxdb_ha_spark.operators.timeseries import type_mix_drift
    # day 0: a=2, b=4; day 1: a=1, b=2 — identical 1:2 mix both days,
    # so every cell equals its expectation exactly: chi2 = phi2 = 0
    rows = ([("a", 0)] * 2 + [("b", 1)] * 4
            + [("a", 10)] * 1 + [("b", 11)] * 2)
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {r.bucket: r for r in
           type_mix_drift(df, on="time", bucket_ns=10).collect()}
    assert set(got) == {0, 10}
    for r in got.values():
        assert r.n_types == 2
        assert r.phi2 == 0.0 and r.chi2 == 0.0
        assert r.drifted is False


def test_type_mix_drift_flags_inverted_day(spark):
    from influxdb_ha_spark.operators.timeseries import type_mix_drift
    # days 0-2 are all-a, day 3 is all-b: day 3's mix is maximally
    # off the corpus mix; zero-count cells must contribute
    rows = ([("a", t) for t in range(30)]
            + [("b", 30 + t) for t in range(10)])
    df = spark.createDataFrame(rows, "event_type string, time long")
    got = {r.bucket: r for r in
           type_mix_drift(df, on="time", bucket_ns=10).collect()}
    # N=40, Ta=30, Tb=10. All-a day (D=10): chi2 = N*phi2 where
    # phi2 = (10*40-10*30)^2/(10*30*1600) + (0*40-10*10)^2/(10*10*1600)
    #      = 10000/480000 + 10000/160000 = 1/48 + 1/16 = 1/12
    # chi2 = 40/12 = 3.333333 < 3.841459 (dof 1) -> not drifted
    a_day = got[0]
    assert a_day.chi2 == 3.333333 and a_day.drifted is False
    # all-b day: phi2 = (10*40-10*10)^2/(10*10*1600)
    #                 + (0*40-10*30)^2/(10*30*1600) = 9/16 + 3/16 = 0.75
    # chi2 = 30.0 > 3.841459 -> drifted
    b_day = got[30]
    assert b_day.phi2 == 0.75 and b_day.chi2 == 30.0
    assert b_day.drifted is True
    # null-type events never shift anything
    rows2 = rows + [(None, 5)]
    df2 = spark.createDataFrame(rows2, "event_type string, time long")
    got2 = {r.bucket: (r.phi2, r.chi2) for r in
            type_mix_drift(df2, on="time", bucket_ns=10).collect()}
    assert got2 == {b: (r.phi2, r.chi2) for b, r in got.items()}


def test_growth_accounting_hand_lifecycle(spark):
    from influxdb_ha_spark.operators.timeseries import growth_accounting
    # bucket_ns=10. user 1 active at days 0,1,3; user 2 at day 1 only.
    # day 0: u1 new.  day 1: u1 retained, u2 new.  day 2: u2 churns
    # (churn-only day).  day 3: u1 resurrected.  u1's churn into day 4
    # is right-censored (max day = 3).
    rows = [(1, 0), (1, 10), (1, 30), (2, 15)]
    df = spark.createDataFrame(rows, "user_id long, time long")
    got = {r.bucket: r for r in
           growth_accounting(df, by=["user_id"], on="time",
                             bucket_ns=10).collect()}
    assert set(got) == {0, 10, 20, 30}
    assert (got[0].n_new, got[0].n_retained, got[0].n_resurrected,
            got[0].n_churned) == (1, 0, 0, 0)
    assert got[0].quick_ratio is None  # nobody churned -> NULL not Inf
    assert (got[10].n_new, got[10].n_retained) == (1, 1)
    assert (got[20].n_new, got[20].n_retained, got[20].n_resurrected,
            got[20].n_churned) == (0, 0, 0, 2)  # u1 gap + u2 last day
    assert got[20].quick_ratio == 0.0
    assert (got[30].n_resurrected, got[30].n_churned) == (1, 0)


def test_growth_accounting_dau_identity(spark):
    from influxdb_ha_spark.operators.timeseries import (
        growth_accounting, active_users)
    rows = [(u, d * 10 + u) for u in range(5) for d in range(4)
            if (u + d) % 3 != 0]
    df = spark.createDataFrame(rows, "user_id long, time long")
    ga = {r.bucket: r for r in
          growth_accounting(df, by=["user_id"], on="time",
                            bucket_ns=10).collect()}
    dau = {r.bucket: r.dau for r in
           active_users(df, by=["user_id"], on="time", bucket_ns=10,
                        window_buckets=1).collect()}
    for b, r in ga.items():
        assert r.n_new + r.n_retained + r.n_resurrected == dau.get(b, 0)


def test_assortativity_star_is_minus_one(spark):
    from influxdb_ha_spark.operators.graph import degree_assortativity
    # star 0-(1,2,3): every edge pairs degree 3 with degree 1 — the
    # maximally disassortative graph, r = -1 exactly (num = -36, d = 36)
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)],
                                  "src long, dst long")
    row = degree_assortativity(edges).collect()[0]
    assert row.m_directed == 6
    assert row.r == -1.0


def test_assortativity_regular_graph_is_null(spark):
    from influxdb_ha_spark.operators.graph import degree_assortativity
    # two disjoint edges: all degrees equal -> zero variance -> NULL, not NaN
    edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    row = degree_assortativity(edges).collect()[0]
    assert row.m_directed == 4 and row.r is None


def test_label_propagation_star_adopts_center_neighborhood_majority(spark):
    from influxdb_ha_spark.operators.graph import label_propagation
    # star 0-(1,2,3): every closed neighborhood's votes tie at 1 and
    # the smallest label wins — center sees {0,1,2,3} -> 0, leaf i
    # sees {0, i} -> 0 — so round 1 already converges to community 0
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)],
                                  "src long, dst long")
    out = {r.node: r.community for r in
           label_propagation(edges, rounds=2).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 0}
