"""r10 fixes as tests: markov_stationary's in-plan state count (zero
Spark jobs at construction), and the scoped SHOW CARDINALITY exact
fallback (InfluxDB 1.x estimates database-wide only)."""

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.model import Catalog
from influxdb_ha_spark.server import Engine

from .conftest import NOW

B = 10 ** 9


def test_markov_construction_runs_zero_jobs(spark):
    """markov_stationary previously ran an eager states.count() during
    DataFrame CONSTRUCTION — the whole entity-window transition
    pipeline executed once before the caller ever acted (r9 verdict
    #2a). π₀ = 10¹² div S is now an in-plan 1-row scalar: building the
    plan schedules no Spark job."""
    from influxdb_ha_spark.operators.timeseries import markov_stationary
    rows = [(1, i * B, "a" if i % 2 == 0 else "b") for i in range(20)]
    df = spark.createDataFrame(rows, "user_id long, time long, "
                               "event_type string")
    sc = spark.sparkContext
    sc.setJobGroup("markov-construct-probe", "plan-only construction")
    try:
        out = markov_stationary(df, by=["user_id"], iters=3)
        jobs = sc.statusTracker().getJobIdsForGroup(
            "markov-construct-probe")
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert list(jobs) == [], "construction scheduled Spark jobs"
    # and the in-plan scalar produces the same stationary vector
    got = {r["event_type"]: r["pi_fp"] for r in out.collect()}
    assert got == {"a": 500_000_000_000, "b": 500_000_000_000}


def test_markov_empty_in_plan_scalar(spark):
    # the empty-states early return was dropped with the eager count:
    # empty x 1-row crossJoin short-circuits, schema preserved
    from influxdb_ha_spark.operators.timeseries import markov_stationary
    df = spark.createDataFrame([], "user_id long, time long, "
                               "event_type string")
    out = markov_stationary(df, by=["user_id"])
    assert [f.name for f in out.schema.fields] == ["event_type",
                                                   "pi_fp", "pi"]
    assert out.collect() == []


def test_show_cardinality_scoped_falls_back_to_exact(spark):
    """InfluxDB 1.x supports ESTIMATED cardinality only database-wide:
    a scoped bare form (FROM <m> / WITH KEY) silently falls back to
    exact counts there — and now here (r9 ADVICE). The unscoped bare
    form stays HLL-estimated."""
    iso = Catalog(spark)
    df = spark.range(2000).select(
        (F.col("id") * 1_000_000_000).alias("time"),
        F.concat(F.lit("t"), (F.col("id") % 500).cast("string"))
        .alias("type"),
        F.col("id").cast("double").alias("value"))
    iso.register_dataframe("db", "m", df, time_col="time", tags=["type"])
    eng = Engine(iso, database="db", now_ns=NOW)
    # scoped bare forms: EXACT counts even without the EXACT keyword
    assert eng.query_df("SHOW SERIES CARDINALITY FROM m") \
              .first()["count"] == 500
    assert eng.query_df("SHOW TAG VALUES CARDINALITY FROM m "
                        "WITH KEY = type").first()["count"] == 500
    # unscoped bare form: still the HLL estimate (within 3 sigma)
    est = eng.query_df("SHOW SERIES CARDINALITY").first()["count"]
    assert 0.8 * 500 <= est <= 1.2 * 500


def test_key_skew_profile_hand_checked(spark):
    """10 'hot' + 2 + 1 + 1 rows over 4 keys (one NULL): exact counts,
    floor-divided ppm shares, and the salt fan-out that levels the hot
    key back to the mean (mean = 14 div 4 = 3 -> ceil(10/3) = 4)."""
    from influxdb_ha_spark.operators.diagnostics import key_skew_profile
    rows = ([("hot",)] * 10 + [("warm",)] * 2 + [("cold",)] + [(None,)])
    df = spark.createDataFrame(rows, "k string")
    got = {r.k: r for r in key_skew_profile(df, ["k"], top=3).collect()}
    # cold and NULL tie at cnt 1; nulls-first tie-break admits NULL
    assert set(got) == {"hot", "warm", None}
    assert all(r.total_rows == 14 and r.n_keys == 4
               for r in got.values())
    assert (got["hot"].cnt, got["hot"].share_ppm,
            got["hot"].salt_factor) == (10, 714285, 4)
    assert (got["warm"].cnt, got["warm"].share_ppm,
            got["warm"].salt_factor) == (2, 142857, 1)
    assert (got[None].cnt, got[None].share_ppm,
            got[None].salt_factor) == (1, 71428, 1)
    # widening to top=4 admits the remaining tied key
    all4 = key_skew_profile(df, ["k"], top=4).collect()
    assert {r.k for r in all4} == {"hot", "warm", "cold", None}


def test_key_skew_profile_validation_and_uniform(spark):
    from influxdb_ha_spark.operators.diagnostics import key_skew_profile
    import pytest
    df = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    uni = key_skew_profile(df, ["k"], top=10).collect()
    assert len(uni) == 3
    assert all(r.salt_factor == 1 and r.share_ppm == 333333 for r in uni)
    with pytest.raises(ValueError, match="key_cols"):
        key_skew_profile(df, [])
    with pytest.raises(ValueError, match="top"):
        key_skew_profile(df, ["k"], top=0)


def test_rrf_fuse_hand_checked(spark):
    """Two 3-item lists sharing one id: fused scores are exactly
    1/(60+rank) sums, absent-list ranks are NULL, order is score desc
    then id asc."""
    from influxdb_ha_spark.operators.similarity import rrf_fuse
    lex = spark.createDataFrame(
        [(1, 9.0), (2, 5.0), (3, 1.0)], "id long, score double")
    sem = spark.createDataFrame(
        [(2, 0.9), (4, 0.8), (5, 0.7)], "id long, score double")
    rows = rrf_fuse({"lex": lex, "sem": sem}, k=10).collect()
    got = {r.id: r for r in rows}
    fr = lambda x: __import__("math").floor(x * 1e6 + 0.5) / 1e6
    # id 2: rank 2 in lex, rank 1 in sem
    assert (got[2].rank_lex, got[2].rank_sem) == (2, 1)
    assert got[2].rrf_score == fr(1 / 62 + 1 / 61)
    # id 1: lex only
    assert (got[1].rank_lex, got[1].rank_sem) == (1, None)
    assert got[1].rrf_score == fr(1 / 61)
    # fused order: 2 first (two terms), then rank-1 singles by id
    assert [r.id for r in rows] == [2, 1, 4, 3, 5]


def test_rrf_fuse_tie_break_and_validation(spark):
    from influxdb_ha_spark.operators.similarity import rrf_fuse
    import pytest
    tied = spark.createDataFrame(
        [(7, 1.0), (3, 1.0), (5, 1.0)], "id long, score double")
    got = {r.id: r.rank_tied for r in
           rrf_fuse({"tied": tied}, k=3).collect()}
    assert got == {3: 1, 5: 2, 7: 3}          # score tie -> id asc
    with pytest.raises(ValueError, match="lists"):
        rrf_fuse({})
    with pytest.raises(ValueError, match="c must"):
        rrf_fuse({"a": tied}, c=0)


def test_fuzzy_blocked_pairs_hand_checked(spark):
    """Known edit distances within the 'bolt' block; cross-block pairs
    never materialize; oversize blocks drop (cap convention)."""
    from influxdb_ha_spark.operators.text import fuzzy_blocked_pairs
    df = spark.createDataFrame(
        [("red bolt",), ("hot bolt",), ("red bolt",),   # dup collapses
         ("small bolt",), ("red gear",), (None,)], "n string")
    got = {(r.a, r.b): (r.block, r.dist) for r in
           fuzzy_blocked_pairs(df, "n", max_dist=3).collect()}
    # lev(red,hot)=3 qualifies; lev('red bolt','small bolt')=5 and the
    # cross-block ('red bolt','red gear') pair is never generated
    assert got == {("hot bolt", "red bolt"): ("bolt", 3)}
    wider = {(r.a, r.b): r.dist for r in
             fuzzy_blocked_pairs(df, "n", max_dist=6).collect()}
    assert wider[("red bolt", "small bolt")] == 5
    assert ("red bolt", "red gear") not in wider
    # block-size cap: cap 2 drops the 3-name bolt block entirely
    assert fuzzy_blocked_pairs(df, "n", max_dist=6,
                               max_block_size=2).collect() == []
    import pytest
    with pytest.raises(ValueError, match="max_dist"):
        fuzzy_blocked_pairs(df, "n", max_dist=0)
    with pytest.raises(ValueError, match="max_block_size"):
        fuzzy_blocked_pairs(df, "n", max_block_size=1)


def test_k_anonymity_report_hand_checked(spark):
    """QI (city, age): the full set has two singleton cells (risk 2
    rows); dropping age heals everything, dropping city heals one —
    the report ranks age as the generalization target."""
    from influxdb_ha_spark.operators.pipeline import k_anonymity_report
    rows = [("x", 30)] * 4 + [("x", 31)] + [("y", 30)] * 3 + [("y", 32)]
    df = spark.createDataFrame(rows, "city string, age long")
    got = {r.dropped: r for r in
           k_anonymity_report(df, ["city", "age"], k=2).collect()}
    full = got["(none)"]
    assert (full.level, full.n_groups, full.n_violating,
            full.rows_at_risk, full.total_rows) == (0, 4, 2, 2, 9)
    assert full.risk_ppm == 2 * 1_000_000 // 9
    # drop age -> cells {x:5, y:4}: zero risk
    assert (got["age"].level, got["age"].n_violating,
            got["age"].rows_at_risk) == (2, 0, 0)
    # drop city -> cells {30:7, 31:1, 32:1}: 2 rows still at risk
    assert (got["city"].level, got["city"].rows_at_risk) == (1, 2)


def test_k_anonymity_null_qi_is_a_cell_and_validation(spark):
    from influxdb_ha_spark.operators.pipeline import k_anonymity_report
    import pytest
    df = spark.createDataFrame([(None,), (None,), ("z",)], "q string")
    got = {r.dropped: r for r in
           k_anonymity_report(df, ["q"], k=2).collect()}
    # NULL cell has 2 rows (safe at k=2); 'z' is the singleton at risk
    assert (got["(none)"].n_violating, got["(none)"].rows_at_risk) == (1, 1)
    with pytest.raises(ValueError, match="qi_cols"):
        k_anonymity_report(df, [])
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_report(df, ["q"], k=1)


# -- column_profile ----------------------------------------------------


def test_column_profile_counts_and_minmax(spark):
    """Hand-checked profile: counts, nulls, lexicographic min/max, and
    the HLL estimate equals hll_distinct run directly (exact in the
    linear-counting regime at these cardinalities)."""
    from influxdb_ha_spark.operators.diagnostics import column_profile
    from influxdb_ha_spark.operators.sketch import hll_distinct
    df = spark.createDataFrame(
        [(1, "b", None), (2, "a", None), (3, "a", None), (4, None, None)],
        "k long, s string, dead string")
    got = {r.col_name: r for r in
           column_profile(df, ["k", "s", "dead"]).collect()}
    assert set(got) == {"k", "s", "dead"}
    k = got["k"]
    assert (k.n_rows, k.n_null, k.min_s, k.max_s) == (4, 0, "1", "4")
    s = got["s"]
    assert (s.n_rows, s.n_null, s.min_s, s.max_s) == (4, 1, "a", "b")
    (direct,) = hll_distinct(
        df.select(F.col("s").alias("v")), "v").collect()
    assert s.est_distinct == direct.est_distinct
    dead = got["dead"]
    assert dead.n_null == 4 and dead.est_distinct is None
    assert dead.min_s is None and dead.max_s is None


def test_column_profile_validation(spark):
    from influxdb_ha_spark.operators.diagnostics import column_profile
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="cols must be non-empty"):
        column_profile(df, [])


# -- entity_clusters ---------------------------------------------------


def test_entity_clusters_transitive_closure(spark):
    """A~B (dist 1) and B~C (dist 1) but dist(A, C) = 2 > max_dist=1:
    the closure still puts all three in ONE entity with the
    lexicographically-smallest member canonical."""
    from influxdb_ha_spark.operators.text import entity_clusters
    df = spark.createDataFrame(
        [("acme corp",), ("acme corpa",), ("acme corpab",),
         ("zeta inc",)], "name string")
    got = {r.entity: r for r in
           entity_clusters(df, "name", block_pattern="^[a-z0-9]+",
                           max_dist=1).collect()}
    assert len(got) == 4
    trio = {"acme corp", "acme corpa", "acme corpab"}
    for nm in trio:
        assert got[nm].canonical == "acme corp"
        assert got[nm].cluster_size == 3
    assert got["zeta inc"].canonical == "zeta inc"
    assert got["zeta inc"].cluster_size == 1


def test_entity_clusters_covers_whole_vocabulary(spark):
    """Every distinct non-null string gets exactly one row; duplicates
    in the input collapse; nulls are excluded."""
    from influxdb_ha_spark.operators.text import entity_clusters
    df = spark.createDataFrame(
        [("aa x",), ("aa x",), ("ab x",), (None,), ("solo y",)],
        "name string")
    rows = entity_clusters(df, "name", max_dist=1).collect()
    assert sorted(r.entity for r in rows) == ["aa x", "ab x", "solo y"]
    by = {r.entity: r for r in rows}
    assert by["aa x"].canonical == by["ab x"].canonical == "aa x"
    assert by["solo y"].cluster_size == 1


# -- zone_map ----------------------------------------------------------


def test_zone_map_hand_checked(spark):
    """Two buckets with known ranges; the [10, 20) predicate prunes
    the bucket entirely below it, keeps the overlapping one, and an
    all-null bucket is prunable for any range."""
    from influxdb_ha_spark.operators.diagnostics import zone_map
    D = 86_400_000_000_000
    rows = [(0 * D + 5, 1.0), (0 * D + 9, 9.0),          # day 0: [1, 9]
            (1 * D + 5, 15.0), (1 * D + 9, 25.0),        # day 1: [15, 25]
            (2 * D + 5, None), (2 * D + 9, None)]        # day 2: nulls
    df = spark.createDataFrame(rows, "time long, value double")
    got = {r.bucket // D: r for r in
           zone_map(df, "value", pred_lo=10.0, pred_hi=20.0).collect()}
    assert got[0].prunable and (got[0].v_min, got[0].v_max) == (1.0, 9.0)
    assert not got[1].prunable
    assert got[2].prunable and got[2].v_min is None
    assert (got[2].n_rows, got[2].n_null) == (2, 2)


def test_zone_map_no_predicate_and_validation(spark):
    from influxdb_ha_spark.operators.diagnostics import zone_map
    df = spark.createDataFrame([(1, 1.0)], "time long, value double")
    cols = zone_map(df, "value").columns
    assert "prunable" not in cols
    with pytest.raises(ValueError, match="bucket_ns"):
        zone_map(df, "value", bucket_ns=0)
    with pytest.raises(ValueError, match="both pred_lo"):
        zone_map(df, "value", pred_lo=1.0)


# -- join_advisor ------------------------------------------------------


def test_join_advisor_hand_checked_broadcast_and_salt(spark):
    """Small right side -> broadcast_right with exact side stats; a
    hot left key above threshold with big sides -> salted_shuffle."""
    from influxdb_ha_spark.operators.diagnostics import join_advisor
    left = spark.createDataFrame(
        [(k,) for k in [1] * 8 + [2, 3]], "k long")     # hot key 1
    right = spark.createDataFrame([(1,), (2,)], "k long")
    (r,) = join_advisor(left, right, "k", "k",
                        broadcast_max_rows=5).collect()
    assert (r.n_left, r.keys_left, r.max_key_left) == (10, 3, 8)
    assert (r.n_right, r.keys_right, r.max_key_right) == (2, 2, 1)
    # mean left load = 10 div 3 = 3 -> salt = ceil(8/3) = 3
    assert r.salt_left == 3 and r.salt_right == 1
    assert r.recommendation == "broadcast_right"
    # shrink the broadcast budget below both sides: skew now decides
    (r2,) = join_advisor(left, right, "k", "k", broadcast_max_rows=1,
                         skew_salt_threshold=3).collect()
    assert r2.recommendation == "salted_shuffle"
    (r3,) = join_advisor(left, right, "k", "k", broadcast_max_rows=1,
                         skew_salt_threshold=10).collect()
    assert r3.recommendation == "shuffle"


def test_join_advisor_sample_estimate_and_validation(spark):
    """rate=1 samples everything: est_pairs == the exact join size."""
    from influxdb_ha_spark.operators.diagnostics import join_advisor
    left = spark.createDataFrame([(i % 5,) for i in range(50)], "k long")
    right = spark.createDataFrame([(i,) for i in range(5)], "k long")
    (r,) = join_advisor(left, right, "k", "k", rate=1).collect()
    assert r.sampled_pairs == r.est_pairs == 50
    with pytest.raises(ValueError, match="rate"):
        join_advisor(left, right, "k", "k", rate=0)


# -- l_diversity_report ------------------------------------------------


def test_l_diversity_hand_checked(spark):
    """Group (x): 4 rows all sensitive=1 -> l_distinct 1 (homogeneous,
    at risk even though k-anonymous at k=4); group (y): 3 rows over 3
    values -> l_distinct 3, compliant at l=3; NULL sensitive is a real
    value."""
    from influxdb_ha_spark.operators.pipeline import l_diversity_report
    rows = [("x", 1), ("x", 1), ("x", 1), ("x", 1),
            ("y", 1), ("y", 2), ("y", 3),
            ("z", None), ("z", None)]
    df = spark.createDataFrame(rows, "qi string, s int")
    got = {r.l_distinct: r for r in
           l_diversity_report(df, ["qi"], "s", l=3).collect()}
    assert (got[1].n_groups, got[1].n_rows, got[1].at_risk) == \
        (2, 6, True)          # x (4 rows) and z (2 NULL rows)
    assert (got[3].n_groups, got[3].n_rows, got[3].at_risk) == \
        (1, 3, False)


def test_l_diversity_validation(spark):
    from influxdb_ha_spark.operators.pipeline import l_diversity_report
    df = spark.createDataFrame([("x", 1)], "qi string, s int")
    with pytest.raises(ValueError, match="qi_cols"):
        l_diversity_report(df, [], "s")
    with pytest.raises(ValueError, match="l must be"):
        l_diversity_report(df, ["qi"], "s", l=1)


# -- salted_distinct_count ---------------------------------------------


def test_salted_distinct_equals_direct(spark):
    """For ANY salt fan-out, the summed per-(key, salt) partials equal
    the direct count(DISTINCT) exactly — same value, same salt, so
    partials are disjoint."""
    from influxdb_ha_spark.operators.diagnostics import \
        salted_distinct_count
    rows = [("hot", f"u{i % 97}") for i in range(500)] + \
           [("cold", f"v{i}") for i in range(7)] + [("hot", None)]
    df = spark.createDataFrame(rows, "k string, v string")
    direct = {r.k: r.c for r in
              df.where(F.col("v").isNotNull())
              .groupBy("k").agg(F.count_distinct("v").alias("c"))
              .collect()}
    for salts in (1, 4, 16, 64):
        got = {r.k: r.n_distinct for r in
               salted_distinct_count(df, ["k"], "v",
                                     salts=salts).collect()}
        assert got == direct == {"hot": 97, "cold": 7}


def test_salted_distinct_plan_splits_hot_key(spark):
    """The distinct aggregation partitions on (key, salt) — the hot
    key's set is split across salt partitions in the PLAN."""
    from influxdb_ha_spark.operators.diagnostics import \
        salted_distinct_count
    df = spark.createDataFrame([("k", "v")], "k string, v string")
    plan = salted_distinct_count(df, ["k"], "v", salts=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    with __import__("pytest").raises(ValueError, match="salts"):
        salted_distinct_count(df, ["k"], "v", salts=0)
    with __import__("pytest").raises(ValueError, match="key_cols"):
        salted_distinct_count(df, [], "v")


# -- t_closeness_report ------------------------------------------------


def test_t_closeness_hand_checked(spark):
    """Two complementary skewed groups over buckets {0,1,2}: EMD terms
    |cumg*N - cumG*ng| sum to 15 each -> t_ppm = 15e6 // 36 = 416666;
    a group mirroring the global distribution scores 0."""
    from influxdb_ha_spark.operators.pipeline import t_closeness_report
    rows = [("a", 0), ("a", 0), ("a", 1), ("b", 2), ("b", 2), ("b", 2)]
    df = spark.createDataFrame(rows, "qi string, s long")
    got = {r.qi: r for r in
           t_closeness_report(df, ["qi"], "s",
                              t_ppm_threshold=200_000).collect()}
    assert (got["a"].t_ppm, got["a"].at_risk) == (416666, True)
    assert (got["b"].t_ppm, got["b"].at_risk) == (416666, True)
    # a group proportional to the corpus: distance exactly 0
    prop = [("g1", 0), ("g1", 1), ("g2", 0), ("g2", 1)]
    df2 = spark.createDataFrame(prop, "qi string, s long")
    got2 = {r.qi: r.t_ppm for r in
            t_closeness_report(df2, ["qi"], "s").collect()}
    assert got2 == {"g1": 0, "g2": 0}


def test_t_closeness_single_bucket_and_validation(spark):
    """B = 1: zero distance by definition; missing buckets in a group
    contribute via the spine (no silent row loss)."""
    from influxdb_ha_spark.operators.pipeline import t_closeness_report
    df = spark.createDataFrame([("a", 5), ("b", 5)], "qi string, s long")
    rows = t_closeness_report(df, ["qi"], "s").collect()
    assert all(r.t_ppm == 0 and not r.at_risk for r in rows)
    with pytest.raises(ValueError, match="qi_cols"):
        t_closeness_report(df, [], "s")


def test_join_advisor_empty_side(spark):
    """An empty right side: zero counts (not NULLs), salt 1, and the
    broadcast-right recommendation — not a fall-through to shuffle
    (r10 review fix)."""
    from influxdb_ha_spark.operators.diagnostics import join_advisor
    left = spark.createDataFrame([(i,) for i in range(10)], "k long")
    empty = spark.createDataFrame([], "k long")
    (r,) = join_advisor(left, empty, "k", "k",
                        broadcast_max_rows=5).collect()
    assert (r.n_right, r.keys_right, r.max_key_right) == (0, 0, 0)
    assert r.salt_right == 1
    assert r.recommendation == "broadcast_right"


# -- rank_sum_test -----------------------------------------------------


def _mwu_replay(a_vals, b_vals):
    """Python brute-force Mann-Whitney with midrank ties + the exact
    tie-corrected z, mirroring the operator's pinned arithmetic."""
    import math
    u2 = 0
    for x in a_vals:
        for y in b_vals:
            u2 += 2 if x > y else (1 if x == y else 0)
    na, nb = len(a_vals), len(b_vals)
    n = na + nb
    from collections import Counter
    t = Counter(a_vals + b_vals)
    ties = sum(v ** 3 - v for v in t.values())
    s2 = (na * nb) * float((n + 1) * n * (n - 1) - ties) \
        / (12.0 * (n * (n - 1)))
    z = None if s2 == 0 else \
        math.floor((u2 - na * nb) * 0.5 / math.sqrt(s2) * 1e6 + 0.5) / 1e6
    return na, nb, u2 / 2.0, z


def test_rank_sum_matches_brute_force_with_ties(spark):
    from influxdb_ha_spark.operators.timeseries import rank_sum_test
    a = [1.0, 2.0, 2.0, 5.0, 7.0]
    b = [2.0, 3.0, 3.0, 4.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = rank_sum_test(df, "g", "v", "a", "b").collect()
    na, nb, ua, z = _mwu_replay(a, b)
    assert (r.n_a, r.n_b, r.u_a, r.z) == (na, nb, ua, z)
    # identical samples: U = n_a*n_b/2 exactly, z = 0
    same = [("a", v) for v in (1.0, 2.0, 3.0)] + \
           [("b", v) for v in (1.0, 2.0, 3.0)]
    (r0,) = rank_sum_test(spark.createDataFrame(same, "g string, "
                                                "v double"),
                          "g", "v", "a", "b").collect()
    assert r0.u_a == 4.5 and r0.z == 0.0


def test_rank_sum_detects_shift_and_degenerates(spark):
    from influxdb_ha_spark.operators.timeseries import rank_sum_test
    rows = [("a", float(100 + i)) for i in range(50)] + \
           [("b", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = rank_sum_test(df, "g", "v", "a", "b").collect()
    assert r.u_a == 2500.0 and r.z > 8          # total separation
    # all-constant values: sigma = 0 -> z NULL, U still defined
    const = [("a", 1.0), ("a", 1.0), ("b", 1.0)]
    (rc,) = rank_sum_test(spark.createDataFrame(const, "g string, "
                                                "v double"),
                          "g", "v", "a", "b").collect()
    assert rc.z is None and rc.u_a == 1.0


# -- ks_test -----------------------------------------------------------


def test_ks_matches_brute_force(spark):
    """Exact integer D vs a python CDF replay, ties included."""
    import math

    from influxdb_ha_spark.operators.timeseries import ks_test
    a = [1.0, 2.0, 2.0, 5.0, 7.0]
    b = [2.0, 3.0, 3.0, 4.0]
    rows = [("a", v) for v in a] + [("b", v) for v in b]
    df = spark.createDataFrame(rows, "g string, v double")
    (r,) = ks_test(df, "g", "v", "a", "b").collect()
    vals = sorted(set(a + b))
    na, nb = len(a), len(b)
    dnum = max(abs(sum(1 for x in a if x <= v) * nb
                   - sum(1 for x in b if x <= v) * na) for v in vals)
    assert (r.n_a, r.n_b, r.d_num) == (na, nb, dnum)
    assert r.d_stat == math.floor(dnum / (na * nb) * 1e6 + 0.5) / 1e6
    # identical samples: D = 0
    same = [("a", v) for v in (1.0, 2.0)] + [("b", v) for v in (1.0, 2.0)]
    (r0,) = ks_test(spark.createDataFrame(same, "g string, v double"),
                    "g", "v", "a", "b").collect()
    assert r0.d_num == 0 and r0.d_stat == 0.0
    # disjoint supports: D = 1 exactly
    gap = [("a", 1.0), ("a", 2.0), ("b", 9.0)]
    (r1,) = ks_test(spark.createDataFrame(gap, "g string, v double"),
                    "g", "v", "a", "b").collect()
    assert r1.d_stat == 1.0


def test_ks_same_shift_vs_shape_complement(spark):
    """A pure location shift moves BOTH statistics; equal-median but
    different-spread samples move KS while the rank-sum z stays small
    — the reason both tests ship."""
    from influxdb_ha_spark.operators.timeseries import (ks_test,
                                                        rank_sum_test)
    spread = ([("a", 0.0)] * 20
              + [("b", float(v)) for v in range(1, 11)]
              + [("b", float(v)) for v in range(-1, -11, -1)])
    df = spark.createDataFrame(spread, "g string, v double")
    (ks,) = ks_test(df, "g", "v", "a", "b").collect()
    (rs,) = rank_sum_test(df, "g", "v", "a", "b").collect()
    # every a sits at b's median: rank-sum is EXACTLY balanced...
    assert rs.z == 0.0 and rs.u_a == 200.0
    # ...while the point-mass vs spread difference is loud in KS
    assert ks.d_stat == 0.5


# -- chi_square_test ---------------------------------------------------


def test_chi_square_hand_checked(spark):
    """2x2 table [[10, 20], [20, 10]]: classic chi2 = 6.666... in
    exact microunits; independent table scores ~0; degenerate 1-col
    table -> dof 0, chi2 NULL."""
    from influxdb_ha_spark.operators.timeseries import chi_square_test
    rows = ([("a", 0)] * 10 + [("a", 1)] * 20
            + [("b", 0)] * 20 + [("b", 1)] * 10)
    df = spark.createDataFrame(rows, "r string, c long")
    (r,) = chi_square_test(df, "r", "c").collect()
    assert (r.n, r.n_rows_cat, r.n_cols_cat, r.dof) == (60, 2, 2, 1)
    # chi2 = sum over 4 cells of (O*60 - 30*30)^2*1e6 // (60*30*30),
    # each cell: (600-900)^2 -> 90000*1e6 // 54000 = 1666666 microunits
    assert r.chi2 == 4 * 1666666 / 1e6
    indep = ([("a", 0)] * 10 + [("a", 1)] * 10
             + [("b", 0)] * 10 + [("b", 1)] * 10)
    (ri,) = chi_square_test(
        spark.createDataFrame(indep, "r string, c long"),
        "r", "c").collect()
    assert ri.chi2 == 0.0
    (rd,) = chi_square_test(
        spark.createDataFrame([("a", 0), ("b", 0)], "r string, c long"),
        "r", "c").collect()
    assert rd.dof == 0 and rd.chi2 is None


def test_chi_square_absent_cell_contributes(spark):
    """A structurally-absent cell (O = 0) still contributes (0-E)^2/E
    via the R x C spine — dropping it would understate chi2."""
    from influxdb_ha_spark.operators.timeseries import chi_square_test
    rows = [("a", 0)] * 6 + [("b", 1)] * 6          # perfect diagonal
    df = spark.createDataFrame(rows, "r string, c long")
    (r,) = chi_square_test(df, "r", "c").collect()
    # perfect association in 2x2: chi2 = n exactly
    assert r.chi2 == 12.0 and r.dof == 1
