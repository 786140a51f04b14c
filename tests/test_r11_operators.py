"""r11 fixes and additions as tests: ks_test's enforced vocabulary
cap (the r10 verdict's "advisory, not code" weak spot), ab_test's
packaged pre-bucketing, the k-way theta union fold, the loud
dropped-block counters in fuzzy matching / entity resolution, and
ams_f2's empty-input integer contract."""

import pytest
from pyspark.sql import functions as F


# -- ks_test vocabulary cap ---------------------------------------------


def test_ks_test_vocab_cap_raises_before_window(spark):
    """A metric whose distinct-value vocabulary exceeds max_vocab must
    raise a PYTHON ValueError from the eager pre-window cap probe —
    not an executor-side error after the keyless window ran."""
    from influxdb_ha_spark.operators.timeseries import ks_test
    rows = [("a" if i % 2 == 0 else "b", float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "g string, v double")
    with pytest.raises(ValueError, match="vocabulary exceeds"):
        ks_test(df, "g", "v", "a", "b", max_vocab=10)
    # at the cap exactly: fine (strictly-greater semantics)
    out = ks_test(df, "g", "v", "a", "b", max_vocab=50).collect()[0]
    assert (out.n_a, out.n_b) == (25, 25)
    # None disables the probe entirely
    out2 = ks_test(df, "g", "v", "a", "b", max_vocab=None).collect()[0]
    assert out2.d_num == out.d_num


def test_ks_test_default_cap_untouched_results(spark):
    """The default cap (2e6) never fires at test scale and the D
    statistic is the hand-checked exact value: A = {1, 2}, B = {2, 3}
    -> max |cumA*n_b - cumB*n_a| at v=1: |1*2 - 0*2| = 2, D = 0.5."""
    from influxdb_ha_spark.operators.timeseries import ks_test
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)],
        "g string, v double")
    out = ks_test(df, "g", "v", "a", "b").collect()[0]
    assert out.d_num == 2 and out.d_stat == 0.5


# -- ab_test ------------------------------------------------------------


def test_ab_test_bucketing_bounds_vocabulary(spark):
    """bucket_width coarsens a high-cardinality metric before either
    test: with width 1.0, values 0.1/0.9 collapse into bucket 0.0 and
    1.1/1.9 into 1.0 — the bucketed KS sees two values, and the raw
    (unbucketed) call sees four."""
    from influxdb_ha_spark.operators.timeseries import ab_test
    df = spark.createDataFrame(
        [("a", 0.1), ("a", 0.9), ("b", 1.1), ("b", 1.9)],
        "g string, v double")
    b = ab_test(df, "g", "v", "a", "b", bucket_width=1.0).collect()[0]
    # perfectly separated buckets: D = 1, U_a = 0 (all a below all b)
    assert b.d_stat == 1.0 and b.u_a == 0.0
    raw = ab_test(df, "g", "v", "a", "b").collect()[0]
    assert raw.d_stat == 1.0  # separation survives without bucketing
    assert set(b.asDict()) == {"n_a", "n_b", "u_a", "z",
                               "d_num", "d_stat", "ks_stat_scaled"}


def test_ab_test_bucketed_skips_probe_but_raw_caps(spark):
    """With bucket_width set the vocabulary is width-bounded and the
    cap probe is skipped; without it the (tiny) max_vocab fires."""
    from influxdb_ha_spark.operators.timeseries import ab_test
    rows = [("a" if i % 2 == 0 else "b", i + i / 128.0)
            for i in range(40)]
    df = spark.createDataFrame(rows, "g string, v double")
    with pytest.raises(ValueError, match="vocabulary exceeds"):
        ab_test(df, "g", "v", "a", "b", max_vocab=5)
    out = ab_test(df, "g", "v", "a", "b", bucket_width=8.0,
                  max_vocab=5).collect()[0]
    assert out.n_a == 20 and out.n_b == 20
    with pytest.raises(ValueError, match="bucket_width"):
        ab_test(df, "g", "v", "a", "b", bucket_width=0.0)


# -- kmv_union_k --------------------------------------------------------


def test_kmv_union_k_exhaustive_exact(spark):
    """All groups exhaustive (|G_i| < k): theta = 2^60 and est_union
    is EXACTLY the distinct union cardinality."""
    from influxdb_ha_spark.operators.sketch import HASH_SPACE, kmv_union_k
    rows = ([("g1", i) for i in range(10)]
            + [("g2", i) for i in range(5, 20)]
            + [("g3", i) for i in range(15, 25)])
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_union_k(df, "v", "g", k=256).collect()[0]
    assert out.n_groups == 3
    assert out.theta == HASH_SPACE
    assert out.n_union == 25          # |{0..24}|
    assert out.est_union == 25.0


def test_kmv_union_k_two_groups_matches_setops_union(spark):
    """On exactly two groups the k-way fold must reproduce
    kmv_setops' est_union — same sketches, same theta convention."""
    from influxdb_ha_spark.operators.sketch import kmv_setops, kmv_union_k
    rows = ([("a", i * 7) for i in range(400)]
            + [("b", i * 11) for i in range(400)])
    df = spark.createDataFrame(rows, "g string, v long")
    uk = kmv_union_k(df, "v", "g", k=64).collect()[0]
    so = kmv_setops(df, "v", "g", "a", "b", k=64).collect()[0]
    assert uk.n_groups == 2
    assert uk.theta == so.theta
    assert uk.est_union == so.est_union


def test_kmv_union_k_empty_input(spark):
    """Zero groups: (0, 2^60, 0, 0.0) — the union of no sets, exactly
    sampled by the full hash space (no NULL leaks)."""
    from influxdb_ha_spark.operators.sketch import HASH_SPACE, kmv_union_k
    df = spark.createDataFrame([], "g string, v long")
    out = kmv_union_k(df, "v", "g").collect()[0]
    assert (out.n_groups, out.theta, out.n_union, out.est_union) == \
        (0, HASH_SPACE, 0, 0.0)


# -- loud dropped-block counters ----------------------------------------


def test_fuzzy_blocked_pairs_loud_drop_counters(spark):
    """An oversized block is excluded from the pair output AND counted
    loudly: every surviving row carries (n_blocks_dropped,
    n_strings_dropped) — the r10 verdict's silent-drop fix."""
    from influxdb_ha_spark.operators.text import fuzzy_blocked_pairs
    rows = ([(f"name{i} big",) for i in range(5)]      # 'big': 5 > cap 3
            + [("red bolt",), ("hot bolt",)])          # 'bolt': kept
    df = spark.createDataFrame(rows, "n string")
    got = fuzzy_blocked_pairs(df, "n", max_dist=3,
                              max_block_size=3).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.a, r.b) == ("hot bolt", "red bolt")
    assert r.n_blocks_dropped == 1
    assert r.n_strings_dropped == 5
    # no oversized block -> zeros, not NULLs
    clean = fuzzy_blocked_pairs(df, "n", max_dist=3,
                                max_block_size=10).collect()[0]
    assert (clean.n_blocks_dropped, clean.n_strings_dropped) == (0, 0)


def test_entity_clusters_carries_drop_counters(spark):
    """Members of a dropped block become singleton entities and the
    output says so: the same counters ride every entity row."""
    from influxdb_ha_spark.operators.text import entity_clusters
    rows = ([(f"name{i} big",) for i in range(5)]
            + [("red bolt",), ("hot bolt",)])
    df = spark.createDataFrame(rows, "n string")
    got = {r.entity: r for r in
           entity_clusters(df, "n", max_dist=3,
                           max_block_size=3).collect()}
    assert len(got) == 7
    # the dropped-block members are singletons...
    assert got["name0 big"].cluster_size == 1
    # ...and every row carries the loud counters
    for r in got.values():
        assert r.n_blocks_dropped == 1
        assert r.n_strings_dropped == 5
    assert got["hot bolt"].canonical == "hot bolt"
    assert got["red bolt"].canonical == "hot bolt"


# -- ams_f2 empty-input contract ----------------------------------------


def test_ams_f2_empty_ungrouped_all_zero(spark):
    """Empty/all-null ungrouped input: ONE row of exact zeros — the
    integer-exact column contract (ADVICE r10 #4), not NULLs."""
    from influxdb_ha_spark.operators.sketch import ams_f2
    df = spark.createDataFrame([], "v long")
    out = ams_f2(df, "v", d=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_rows, r.n_items, r.f2_exact, r.f2_est) == (0, 0, 0, 0)
    nulls = spark.createDataFrame([(None,), (None,)], "v long")
    r2 = ams_f2(nulls, "v", d=4).collect()[0]
    assert (r2.n_rows, r2.n_items, r2.f2_exact, r2.f2_est) == (0, 0, 0, 0)


def test_ams_f2_nonempty_values_unchanged(spark):
    """The coalesce is a no-op on real input: F2 of [x, x, y] is
    2^2 + 1 = 5 exactly, and the estimate column stays integer."""
    from influxdb_ha_spark.operators.sketch import ams_f2
    df = spark.createDataFrame([("x",), ("x",), ("y",)], "v string")
    r = ams_f2(df, "v", d=32).collect()[0]
    assert (r.n_rows, r.n_items, r.f2_exact) == (3, 2, 5)
    assert isinstance(r.f2_est, int)


# -- hits degree guard --------------------------------------------------


def test_hits_small_graph_unchanged_by_degree_guard(spark):
    """The new in-plan degree guard must not fire on ordinary graphs:
    the 2-node mutual pair keeps the exact fixed point hub = auth =
    SCALE_FP for both nodes."""
    from influxdb_ha_spark.operators.graph import SCALE_FP, hits
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    got = {r.node: (r.hub_fp, r.auth_fp) for r in hits(df, iters=3)
           .collect()}
    assert got == {1: (SCALE_FP, SCALE_FP), 2: (SCALE_FP, SCALE_FP)}


def test_kmv_intersect_k_exhaustive_exact(spark):
    """All groups exhaustive: est_intersection is EXACTLY the k-way
    intersection cardinality (g1 ∩ g2 ∩ g3 = {15..19} -> 5)."""
    from influxdb_ha_spark.operators.sketch import (HASH_SPACE,
                                                    kmv_intersect_k)
    rows = ([("g1", i) for i in range(20)]
            + [("g2", i) for i in range(5, 25)]
            + [("g3", i) for i in range(15, 30)])
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_intersect_k(df, "v", "g", k=256).collect()[0]
    assert out.n_groups == 3
    assert out.theta == HASH_SPACE
    assert out.n_common == 5
    assert out.est_intersection == 5.0


def test_kmv_intersect_k_two_groups_matches_setops(spark):
    """Two groups: the k-way fold reproduces kmv_setops' n_common and
    est_intersection under the same theta."""
    from influxdb_ha_spark.operators.sketch import (kmv_intersect_k,
                                                    kmv_setops)
    rows = ([("a", i * 3) for i in range(400)]
            + [("b", i * 5) for i in range(400)])
    df = spark.createDataFrame(rows, "g string, v long")
    ik = kmv_intersect_k(df, "v", "g", k=64).collect()[0]
    so = kmv_setops(df, "v", "g", "a", "b", k=64).collect()[0]
    assert ik.theta == so.theta
    assert ik.n_common == so.n_common
    assert ik.est_intersection == so.est_intersection


def test_kmv_intersect_k_empty_and_disjoint(spark):
    """Zero groups -> the degenerate (0, 2^60, 0, 0.0); disjoint
    exhaustive groups -> exactly 0.0."""
    from influxdb_ha_spark.operators.sketch import (HASH_SPACE,
                                                    kmv_intersect_k)
    empty = spark.createDataFrame([], "g string, v long")
    r = kmv_intersect_k(empty, "v", "g").collect()[0]
    assert (r.n_groups, r.theta, r.n_common, r.est_intersection) == \
        (0, HASH_SPACE, 0, 0.0)
    dis = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("b", 4)], "g string, v long")
    r2 = kmv_intersect_k(dis, "v", "g").collect()[0]
    assert r2.n_common == 0 and r2.est_intersection == 0.0
