"""Property tests for the sketch family (the test_r9_props conventions:
hypothesis drives shapes, few examples, tiny domains so duplicates and
degenerate groups actually occur).

Invariants, each provable from the operator contracts:
- KMV and HLL are functions of the VALUE SET: duplicating every row any
  number of times changes nothing; below k KMV is exact.
- Count-Min is one-sided: cm_est >= exact_cnt always.
- kmv_setops is symmetric in (A, B) up to the n_a/n_b swap, and its
  Jaccard estimate lives in [0, 1] with intersection <= union.
- bfs: seeds sit at 0; every non-seed reached node at dist d has a
  neighbor at d-1 (the BFS layering invariant); nothing exceeds rounds.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from influxdb_ha_spark.operators import graph as G
from influxdb_ha_spark.operators.sketch import (
    countmin, hll_distinct, kmv_distinct, kmv_setops)

vals = st.integers(min_value=0, max_value=20)
grps = st.sampled_from(["a", "b"])


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(st.tuples(grps, vals), min_size=1, max_size=15),
       dup=st.integers(min_value=2, max_value=4))
def test_kmv_hll_are_set_functions(spark, rows, dup):
    df1 = spark.createDataFrame(rows, "g string, v long")
    dfk = spark.createDataFrame(rows * dup, "g string, v long")
    for op in (lambda d: kmv_distinct(d, "v", by=["g"], k=8),
               lambda d: hll_distinct(d, "v", by=["g"])):
        a = sorted(map(tuple, op(df1).collect()))
        b = sorted(map(tuple, op(dfk).collect()))
        assert a == b
    # exact branch: distinct per group <= 21 < k=64
    exact = {(r.g, r.cnt) for r in df1.groupBy("g")
             .agg(F.countDistinct("v").alias("cnt")).collect()}
    got = {(r.g, int(r.est_distinct))
           for r in kmv_distinct(df1, "v", by=["g"], k=64).collect()}
    assert got == exact


@settings(max_examples=6, deadline=None)
@given(items=st.lists(st.integers(min_value=0, max_value=8),
                      min_size=1, max_size=30))
def test_countmin_one_sided(spark, items):
    df = spark.createDataFrame([(i,) for i in items], "item long")
    for r in countmin(df, "item", d=3, w=16, top=5).collect():
        assert r.cm_est >= r.exact_cnt


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(st.tuples(grps, vals), min_size=2, max_size=20))
def test_kmv_setops_symmetry_and_bounds(spark, rows):
    if not {g for g, _ in rows} == {"a", "b"}:
        return
    df = spark.createDataFrame(rows, "g string, v long")
    ab = kmv_setops(df, "v", "g", "a", "b", k=8).collect()[0]
    ba = kmv_setops(df, "v", "g", "b", "a", k=8).collect()[0]
    assert (ab.theta, ab.n_common) == (ba.theta, ba.n_common)
    assert (ab.n_a, ab.n_b) == (ba.n_b, ba.n_a)
    assert ab.est_union == ba.est_union
    assert ab.est_intersection == ba.est_intersection
    assert ab.est_intersection <= ab.est_union
    if ab.jaccard_est is not None:
        assert 0.0 <= ab.jaccard_est <= 1.0
        assert ab.jaccard_est == ba.jaccard_est


edge_nodes = st.integers(min_value=1, max_value=8)


@settings(max_examples=6, deadline=None)
@given(edges=st.lists(st.tuples(edge_nodes, edge_nodes),
                      min_size=1, max_size=12),
       rounds=st.integers(min_value=1, max_value=3))
def test_bfs_layering_invariant(spark, edges, rounds):
    edges = [(a, b) if a < b else (b, a) for a, b in edges if a != b]
    if not edges:
        return
    e = spark.createDataFrame(sorted(set(edges)), "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in G.bfs(e, seeds, rounds=rounds).collect()}
    assert got[1] == 0
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for node, d in got.items():
        assert 0 <= d <= rounds
        if d > 0:
            assert any(got.get(nb) == d - 1 for nb in adj.get(node, ()))


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(st.tuples(st.sampled_from(["a", "b", "c"]), vals),
                     min_size=1, max_size=30))
def test_overlap_matrix_exhaustive_equals_exact_set_algebra(spark, rows):
    """With k larger than every group (all sketches exhaustive, theta =
    full hash space), the matrix IS exact set algebra — union /
    intersection / jaccard equal the true values for every pair."""
    from influxdb_ha_spark.operators.sketch import kmv_overlap_matrix
    df = spark.createDataFrame(rows, "g string, v long")
    sets = {}
    for g, v in rows:
        sets.setdefault(g, set()).add(v)
    got = {(r.g_a, r.g_b): r for r in
           kmv_overlap_matrix(df, "v", "g", k=64).collect()}
    names = sorted(sets)
    expected_pairs = {(a, b) for i, a in enumerate(names)
                      for b in names[i + 1:]}
    assert set(got) == expected_pairs
    for (a, b), r in got.items():
        u = sets[a] | sets[b]
        i = sets[a] & sets[b]
        assert r.est_union == float(len(u))
        assert r.est_intersection == float(len(i))
        if u:
            import math
            assert r.jaccard_est == math.floor(
                len(i) / len(u) * 1e6 + 0.5) / 1e6


@settings(max_examples=6, deadline=None)
@given(rows=st.lists(st.tuples(st.sampled_from(["a", "b", "c"]), vals),
                     min_size=1, max_size=24))
def test_kmv_kway_exhaustive_matches_set_arithmetic(spark, rows):
    """All-exhaustive regime (k=64 > any vocabulary here): kmv_union_k
    and kmv_intersect_k are EXACT Python set arithmetic — union of all
    groups' value sets, intersection over all groups; theta = 2^60."""
    from influxdb_ha_spark.operators.sketch import (
        HASH_SPACE, kmv_intersect_k, kmv_union_k)
    df = spark.createDataFrame(rows, "g string, v long")
    sets = {}
    for g, v in rows:
        sets.setdefault(g, set()).add(v)
    uni = kmv_union_k(df, "v", "g", k=64).collect()[0]
    inter = kmv_intersect_k(df, "v", "g", k=64).collect()[0]
    want_u = set().union(*sets.values())
    want_i = set.intersection(*sets.values())
    assert uni.theta == inter.theta == HASH_SPACE
    assert uni.n_groups == inter.n_groups == len(sets)
    assert uni.n_union == len(want_u)
    assert uni.est_union == float(len(want_u))
    assert inter.n_common == len(want_i)
    assert inter.est_intersection == float(len(want_i))
    # algebra sanity: intersection <= min group <= max group <= union
    assert len(want_i) <= min(len(s) for s in sets.values())
    assert max(len(s) for s in sets.values()) <= len(want_u)
