"""Round-12 operator regressions — the r11 ADVICE items.

- hits: the degree-overflow guard must survive an auth-only projection
  (Catalyst column pruning erased it when only hub_fp carried it).
- fuzzy_blocked_stats: the dropped-block counters must be reachable even
  when every kept block yields zero pairs (the all-dropped failure mode
  where fuzzy_blocked_pairs returns no rows to carry them).
- ab gates: Spark `%` (dividend-sign) replaces pmod so the variant/jitter
  arithmetic matches DuckDB `%` for NEGATIVE ids too.
- cosine_near_dup_pairs: bits=None derives bits from N (the r11 IVF
  C = N/64 lesson applied to hyperplane LSH).
"""
import pytest
from pyspark.sql import functions as F


def test_hits_degree_guard_survives_auth_only_projection(spark):
    """Selecting only (node, auth_fp) must NOT let column pruning erase
    the degree-overflow raise_error: both output columns carry the
    guard (r11 ADVICE #3)."""
    from influxdb_ha_spark.operators.graph import SCALE_FP, hits
    df = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    out = hits(df, iters=1).select("node", "auth_fp")
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "raise_error" in plan
    got = {r.node: r.auth_fp for r in out.collect()}
    assert got == {1: SCALE_FP, 2: SCALE_FP}


def test_fuzzy_blocked_stats_visible_when_all_blocks_dropped(spark):
    """All candidate blocks oversized -> zero pair rows, but the public
    stats accessor still reports the drop (r11 ADVICE #4)."""
    from influxdb_ha_spark.operators.text import (fuzzy_blocked_pairs,
                                                  fuzzy_blocked_stats)
    rows = [(f"name{i} big",) for i in range(5)]
    df = spark.createDataFrame(rows, "n string")
    assert fuzzy_blocked_pairs(df, "n", max_dist=3,
                               max_block_size=3).count() == 0
    st = fuzzy_blocked_stats(df, "n", max_dist=3,
                             max_block_size=3).collect()
    assert len(st) == 1
    assert (st[0].n_blocks_dropped, st[0].n_strings_dropped) == (1, 5)


def test_fuzzy_blocked_stats_matches_pair_carried_counters(spark):
    """On a mixed run the accessor returns exactly the counters the
    pair rows carry."""
    from influxdb_ha_spark.operators.text import (fuzzy_blocked_pairs,
                                                  fuzzy_blocked_stats)
    rows = ([(f"name{i} big",) for i in range(5)]
            + [("red bolt",), ("hot bolt",)])
    df = spark.createDataFrame(rows, "n string")
    pair = fuzzy_blocked_pairs(df, "n", max_dist=3,
                               max_block_size=3).collect()[0]
    st = fuzzy_blocked_stats(df, "n", max_dist=3,
                             max_block_size=3).collect()[0]
    assert (pair.n_blocks_dropped, pair.n_strings_dropped) == \
        (st.n_blocks_dropped, st.n_strings_dropped) == (1, 5)


def test_spark_modulo_matches_duckdb_for_negative_ids(spark):
    """The ab gates' `user_id % n` must take the DIVIDEND's sign (DuckDB
    semantics): -5 % 97 = -5, not pmod's 92 (r11 ADVICE #2)."""
    df = spark.createDataFrame([(-5,), (5,), (-97,)], "user_id long")
    got = [r.m for r in
           df.select((F.col("user_id") % F.lit(97)).alias("m"))
           .orderBy("user_id").collect()]
    assert got == [0, -5, 5]


def test_dedup_recall_hand_values(spark):
    """4 exact pairs, found hits 2 of them plus a spurious one:
    recall 0.5, precision 2/3 — counts exact, ratios round-6."""
    from influxdb_ha_spark.operators.dedup import dedup_recall
    exact = spark.createDataFrame([(1, 2), (3, 4), (5, 6), (7, 8)],
                                  "id_a long, id_b long")
    found = spark.createDataFrame([(1, 2), (3, 4), (9, 10)],
                                  "id_a long, id_b long")
    r = dedup_recall(exact, found).collect()[0]
    assert (r.n_exact, r.n_found, r.n_hit) == (4, 3, 2)
    assert r.recall == 0.5
    assert r.precision == round(2 / 3, 6)


def test_dedup_recall_empty_denominators_null(spark):
    """No pairs -> NULL ratio (nothing to measure), never 1.0 or 0/0."""
    from influxdb_ha_spark.operators.dedup import dedup_recall
    empty = spark.createDataFrame([], "id_a long, id_b long")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r1 = dedup_recall(empty, pairs).collect()[0]
    assert (r1.n_exact, r1.n_found, r1.n_hit) == (0, 1, 0)
    assert r1.recall is None and r1.precision == 0.0
    r2 = dedup_recall(pairs, empty).collect()[0]
    assert (r2.n_exact, r2.n_found, r2.n_hit) == (1, 0, 0)
    assert r2.recall == 0.0 and r2.precision is None


def test_setsim_shingle_mode_matches_hand_jaccard(spark):
    """shingle_k=3 switches the set elements to 3-shingles: two 7-token
    docs differing in the last word share 4 of their 5 shingles each ->
    jaccard 4/6 < 0.7 (no pair at 7/10) but a pair at 3/10."""
    from influxdb_ha_spark.operators.dedup import setsim_exact_join
    d1 = "alpha beta gamma delta epsilon zeta eta"      # 5 shingles
    d2 = "alpha beta gamma delta epsilon zeta theta"    # differs last
    df = spark.createDataFrame([(1, d1), (2, d2)], "doc_id long, text string")
    hi = setsim_exact_join(df, t_num=7, t_den=10, shingle_k=3).collect()
    assert hi == []
    lo = setsim_exact_join(df, t_num=3, t_den=10, shingle_k=3).collect()
    assert len(lo) == 1
    r = lo[0]
    # shingle sets: 5 each, 4 shared ("zeta eta"/"zeta theta" differ)
    assert (r.size_a, r.size_b, r.n_common) == (5, 5, 4)
    assert r.jaccard == round(4 / 6, 6)


def test_path_ngrams_distinct_entity_support(spark):
    """a>b appears twice inside user 1 but supports once (distinct-
    entity support); user 2 contributes its own grams; min_support=1
    shows all, =2 keeps only the shared gram."""
    from influxdb_ha_spark.operators.timeseries import path_ngrams
    rows = [(1, "a", 1), (1, "b", 2), (1, "a", 3), (1, "b", 4),
            (2, "a", 10), (2, "b", 11), (2, "c", 12)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "time long")
    got = {r.gram: r.support for r in
           path_ngrams(df, n=2, max_steps=8, min_support=1).collect()}
    assert got == {"a>b": 2, "b>a": 1, "b>c": 1}
    kept = {r.gram: r.support for r in
            path_ngrams(df, n=2, max_steps=8, min_support=2).collect()}
    assert kept == {"a>b": 2}


def test_path_ngrams_tie_order_and_max_steps(spark):
    """Same-timestamp events order lexicographically (the user_paths
    determinism contract) and max_steps prunes BEFORE gram extraction:
    user 1's events at one instant are c,a,b -> ordered a>b>c; with
    max_steps=2 only a>b survives."""
    from influxdb_ha_spark.operators.timeseries import path_ngrams
    rows = [(1, "c", 5), (1, "a", 5), (1, "b", 5)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "time long")
    full = {r.gram for r in
            path_ngrams(df, n=2, max_steps=8, min_support=1).collect()}
    assert full == {"a>b", "b>c"}
    cut = {r.gram for r in
           path_ngrams(df, n=2, max_steps=2, min_support=1).collect()}
    assert cut == {"a>b"}
    tri = {r.gram for r in
           path_ngrams(df, n=3, max_steps=8, min_support=1).collect()}
    assert tri == {"a>b>c"}


def test_path_ngrams_short_sequences_vanish(spark):
    """Entities with fewer than n events contribute no grams; n=1
    degenerates to distinct-entity type support."""
    from influxdb_ha_spark.operators.timeseries import path_ngrams
    rows = [(1, "a", 1), (2, "a", 1), (2, "b", 2)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "time long")
    assert path_ngrams(df, n=3, max_steps=8, min_support=1).count() == 0
    uni = {r.gram: r.support for r in
           path_ngrams(df, n=1, max_steps=8, min_support=1).collect()}
    assert uni == {"a": 2, "b": 1}
    import pytest as _pt
    with _pt.raises(ValueError):
        path_ngrams(df, n=0)
    with _pt.raises(ValueError):
        path_ngrams(df, n=4, max_steps=3)


def test_derived_lsh_bits_tracks_occupancy():
    """bits = ceil(log2(N/occ)) clamped: occupancy N/2^bits stays ~occ
    across decades — the linear-candidates contract."""
    from influxdb_ha_spark.operators.similarity import derived_lsh_bits
    assert derived_lsh_bits(0) == 4
    assert derived_lsh_bits(64) == 4           # n <= occ -> lo
    assert derived_lsh_bits(2_000) == 5        # ceil(log2(31.25))
    assert derived_lsh_bits(20_000) == 9       # ceil(log2(312.5))
    assert derived_lsh_bits(200_000) == 12
    assert derived_lsh_bits(2_000_000) == 15   # each decade ~ +3.3 bits
    assert derived_lsh_bits(10 ** 12) == 24    # hi clamp
    # occupancy contract: N / 2^bits <= 2*occ once past the lo clamp
    for n in (10 ** 4, 10 ** 6, 10 ** 7):
        b = derived_lsh_bits(n)
        assert n / (1 << b) <= 2 * 64


def test_cosine_near_dup_derived_bits_finds_planted_pair(spark):
    """bits=None (derived) keeps recall 1 on identical vectors and
    exact precision: one planted duplicate pair, cosine exactly 1.0."""
    from influxdb_ha_spark.operators.similarity import \
        cosine_near_dup_pairs
    import random
    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(64)])
            for i in range(200)]
    rows.append((1_000, list(rows[0][1])))     # exact copy of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cosine_near_dup_pairs(df, threshold=0.99).collect()
    assert [(r.id_a, r.id_b, r.cosine) for r in got] == [(0, 1_000, 1.0)]


def test_cosine_near_dup_max_bucket_guard_raises_loudly(spark):
    """A mass-duplicated vector blows one bucket past max_bucket: the
    in-plan filter guard raises instead of going bucket-quadratic."""
    from influxdb_ha_spark.operators.similarity import \
        cosine_near_dup_pairs
    import random
    rng = random.Random(3)
    base = [rng.uniform(-1, 1) for _ in range(64)]
    rows = [(i, list(base)) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="max_bucket"):
        cosine_near_dup_pairs(df, threshold=0.9, bits=8,
                              max_bucket=10).collect()
    # under the cap the same guard is a no-op pass-through
    ok = cosine_near_dup_pairs(df.where(F.col("vec_id") < 3),
                               threshold=0.9, bits=8, max_bucket=10)
    assert ok.count() == 3  # C(3,2) pairs of identical vectors


# ---------------------------------------------------------------------------
# cuped — variance-reduced A/B readout (hand values)
# ---------------------------------------------------------------------------

def _cuped_rows(spark, rows):
    return spark.createDataFrame(rows, "g long, y double, x double")


def test_cuped_hand_values_covariate_explains_diff(spark):
    """X and Y perfectly correlated and imbalanced across arms: the raw
    diff (1.0) is ENTIRELY covariate imbalance — theta = 1, adjusted
    diff 0, variance reduction rho^2 = 1."""
    from influxdb_ha_spark.operators.timeseries import cuped
    df = _cuped_rows(spark, [(0, 10.0, 5.0), (0, 12.0, 7.0),
                             (1, 11.0, 6.0), (1, 9.0, 4.0)])
    r = cuped(df, "g", "y", "x", 0, 1, scale=1.0).collect()[0]
    assert (r.n_a, r.n_b) == (2, 2)
    assert r.theta == pytest.approx(1.0)
    assert (r.mean_a, r.mean_b) == (pytest.approx(11.0),
                                    pytest.approx(10.0))
    assert r.diff == pytest.approx(1.0)
    assert (r.mean_a_adj, r.mean_b_adj) == (pytest.approx(10.5),
                                            pytest.approx(10.5))
    assert r.diff_adj == pytest.approx(0.0)
    assert r.var_reduction == pytest.approx(1.0)


def test_cuped_constant_covariate_yields_null_theta(spark):
    """var(X) = 0: theta/adjusted/var_reduction NULL, raw means still
    report."""
    from influxdb_ha_spark.operators.timeseries import cuped
    df = _cuped_rows(spark, [(0, 10.0, 3.0), (0, 14.0, 3.0),
                             (1, 8.0, 3.0), (1, 12.0, 3.0)])
    r = cuped(df, "g", "y", "x", 0, 1, scale=1.0).collect()[0]
    assert r.theta is None and r.mean_a_adj is None
    assert r.var_reduction is None
    assert (r.mean_a, r.mean_b) == (pytest.approx(12.0),
                                    pytest.approx(10.0))


def test_cuped_matches_numpy_reference(spark):
    """Deterministic 2-decimal data vs a float reference computed the
    classic way (per-unit adjusted column, then means)."""
    import numpy as np
    from influxdb_ha_spark.operators.timeseries import cuped
    rows = []
    for i in range(200):
        x = round((i * 37 % 101) / 4.0, 2)
        y = round(2.5 * x + (i * 53 % 17) / 8.0, 2)
        rows.append((i % 2, y, x))
    r = cuped(_cuped_rows(spark, rows), "g", "y", "x", 0, 1,
              scale=100.0).collect()[0]
    g = np.array([t[0] for t in rows])
    y = np.array([t[1] for t in rows])
    x = np.array([t[2] for t in rows])
    theta = np.cov(x, y, bias=True)[0, 1] / np.var(x)
    adj = y - theta * (x - x.mean())
    assert r.theta == pytest.approx(theta, abs=2e-6)
    assert r.mean_a_adj == pytest.approx(adj[g == 0].mean(), abs=2e-6)
    assert r.mean_b_adj == pytest.approx(adj[g == 1].mean(), abs=2e-6)
    assert r.diff_adj == pytest.approx(
        adj[g == 0].mean() - adj[g == 1].mean(), abs=2e-6)
    rho2 = (np.cov(x, y, bias=True)[0, 1] ** 2
            / (np.var(x) * np.var(y)))
    assert r.var_reduction == pytest.approx(rho2, abs=2e-6)


# ---------------------------------------------------------------------------
# rolling_hampel — rolling median/MAD outlier filter (hand values)
# ---------------------------------------------------------------------------

def _hampel_ref(times, vals, w, k):
    out = []
    for t, v in zip(times, vals):
        win = sorted(v2 for t2, v2 in zip(times, vals)
                     if abs(t2 - t) <= w)
        i = (len(win) + 1) // 2
        med = win[i - 1]
        mad = sorted(abs(u - med) for u in win)[i - 1]
        out.append((t, v, med, mad, abs(v - med) > k * 1.4826 * mad))
    return out


def test_rolling_hampel_matches_reference(spark):
    """Every (med, mad, flag) equals the brute-force lower-median
    reference; the spike is flagged, its neighbors are not (the local
    window adapts where a global MAD would over- or under-flag)."""
    from influxdb_ha_spark.operators.timeseries import rolling_hampel
    times = [i * 10 ** 9 for i in range(12)]
    vals = [1.0, 1.5, 1.2, 1.4, 100.0, 1.3, 1.1, 1.6, 1.2,
            50.0, 1.4, 1.3]
    df = spark.createDataFrame(
        [("s", t, v) for t, v in zip(times, vals)],
        "event_type string, time long, value double")
    got = {r.time: (r.value, r.med, r.mad, r.is_outlier)
           for r in rolling_hampel(df, window_ns=3 * 10 ** 9,
                                   k=3.0).collect()}
    for t, v, med, mad, flag in _hampel_ref(times, vals,
                                            3 * 10 ** 9, 3.0):
        assert got[t] == (v, med, mad, flag), t
    assert got[4 * 10 ** 9][3] is True
    assert got[3 * 10 ** 9][3] is False


def test_rolling_hampel_duplicate_timestamps_are_peers(spark):
    """RANGE frame: rows at the same timestamp see identical windows
    regardless of partition order."""
    from influxdb_ha_spark.operators.timeseries import rolling_hampel
    df = spark.createDataFrame(
        [("s", 0, 1.0), ("s", 0, 3.0), ("s", 10 ** 9, 2.0)],
        "event_type string, time long, value double")
    rows = rolling_hampel(df, window_ns=2 * 10 ** 9, k=3.0).collect()
    meds = {(r.time, r.value): r.med for r in rows}
    # window for every row is [1.0, 3.0, 2.0] sorted -> lower median 2.0
    assert set(meds.values()) == {2.0}


def test_rolling_hampel_occupancy_cap_raises_loudly(spark):
    """Window occupancy above max_window must raise, not silently
    truncate — and the guard must survive a med-only projection."""
    from influxdb_ha_spark.operators.timeseries import rolling_hampel
    df = spark.createDataFrame(
        [("s", i, float(i)) for i in range(10)],
        "event_type string, time long, value double")
    out = rolling_hampel(df, window_ns=100, max_window=4)
    with pytest.raises(Exception, match="max_window"):
        out.collect()


def test_cuped_empty_arm_reports_null_not_engine_div0(spark):
    """An empty arm must report NULL means explicitly (engines disagree
    on double x/0), never inf — and n_b still reads 0."""
    from influxdb_ha_spark.operators.timeseries import cuped
    df = _cuped_rows(spark, [(0, 10.0, 5.0), (0, 12.0, 7.0)])
    r = cuped(df, "g", "y", "x", 0, 1, scale=1.0).collect()[0]
    assert (r.n_a, r.n_b) == (2, 0)
    assert r.mean_b is None and r.mean_b_adj is None
    assert r.diff is None and r.diff_adj is None
    assert r.mean_a == pytest.approx(11.0)
