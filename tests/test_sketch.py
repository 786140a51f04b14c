"""Sketch operators (operators/sketch.py): estimator accuracy on known
cardinalities, the CM one-sided guarantee, partition-shape independence,
and degenerate inputs."""

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.operators.sketch import (
    HLL_M, countmin, histogram_quantiles, hll_distinct, kmv_distinct)


def _vals(spark, n, group="a"):
    return spark.range(n).select(
        F.lit(group).alias("g"), (F.col("id") + 1).alias("v"))


# -- KMV ---------------------------------------------------------------


def test_kmv_exact_below_k(spark):
    r = kmv_distinct(_vals(spark, 10), "v", by=["g"], k=256).collect()
    assert len(r) == 1
    assert r[0].k_used == 10
    assert r[0].est_distinct == 10.0


def test_kmv_estimates_large_cardinality(spark):
    r = kmv_distinct(_vals(spark, 2000), "v", by=["g"], k=64).collect()[0]
    assert r.k_used == 64
    # relative error ~1/sqrt(k) = 12.5%; allow 3 sigma
    assert 2000 * 0.6 < r.est_distinct < 2000 * 1.4


def test_kmv_partition_shape_independent(spark):
    df = _vals(spark, 500)
    a = kmv_distinct(df.repartition(7), "v", by=["g"], k=32).collect()[0]
    b = kmv_distinct(df.coalesce(1), "v", by=["g"], k=32).collect()[0]
    assert (a.k_used, a.kth_hash, a.est_distinct) == \
           (b.k_used, b.kth_hash, b.est_distinct)


def test_kmv_duplicates_collapse(spark):
    # 1000 rows over 10 distinct values: sketch sees 10
    df = spark.range(1000).select(
        F.lit("a").alias("g"), (F.col("id") % 10).alias("v"))
    r = kmv_distinct(df, "v", by=["g"], k=256).collect()[0]
    assert r.k_used == 10 and r.est_distinct == 10.0


# -- HLL ---------------------------------------------------------------


def test_hll_estimates_within_error(spark):
    # sigma ~ 1.04/sqrt(256) = 6.5%; allow 3 sigma
    r = hll_distinct(_vals(spark, 5000), "v", by=["g"]).collect()[0]
    assert 5000 * 0.8 < r.est_distinct < 5000 * 1.2


def test_hll_linear_counting_small_range(spark):
    r = hll_distinct(_vals(spark, 30), "v", by=["g"]).collect()[0]
    assert r.n_buckets_used <= 30
    assert r.n_empty == HLL_M - r.n_buckets_used
    assert 30 * 0.8 < r.est_distinct < 30 * 1.2


def test_hll_partition_shape_independent(spark):
    df = _vals(spark, 3000)
    a = hll_distinct(df.repartition(13), "v", by=["g"]).collect()[0]
    b = hll_distinct(df.coalesce(1), "v", by=["g"]).collect()[0]
    assert (a.n_buckets_used, a.n_empty, a.est_distinct) == \
           (b.n_buckets_used, b.n_empty, b.est_distinct)


def test_hll_groups_independent(spark):
    # two groups of very different cardinality stay separated
    df = _vals(spark, 4000, "big").unionByName(_vals(spark, 20, "small"))
    r = {x.g: x for x in hll_distinct(df, "v", by=["g"]).collect()}
    assert r["small"].est_distinct < 40
    assert r["big"].est_distinct > 3000


# -- Count-Min ---------------------------------------------------------


def test_countmin_one_sided_and_top(spark):
    # zipf-ish: item i appears (51 - i) times, i in 1..50
    rows = [(i,) for i in range(1, 51) for _ in range(51 - i)]
    df = spark.createDataFrame(rows, "item long")
    got = countmin(df, "item", d=4, w=1024, top=10).collect()
    assert len(got) == 10
    by_item = {r.item: r for r in got}
    # the exact top-10 are items 1..10 with counts 50..41
    assert sorted(by_item) == list(range(1, 11))
    for i, r in by_item.items():
        assert r.exact_cnt == 51 - i
        assert r.cm_est >= r.exact_cnt       # CM's one-sided guarantee
        # w=1024 >> 50 items: overshoot bounded by total/w per row pair
        assert r.cm_est <= r.exact_cnt + 50


def test_countmin_partition_shape_independent(spark):
    rows = [(i % 37,) for i in range(2000)]
    df = spark.createDataFrame(rows, "item long")
    a = sorted(map(tuple, countmin(df.repartition(9), "item",
                                   top=5).collect()))
    b = sorted(map(tuple, countmin(df.coalesce(1), "item",
                                   top=5).collect()))
    assert a == b


# -- Histogram quantiles -----------------------------------------------


def test_hist_quantile_within_bin_width(spark):
    # 1..1000 uniform; lo=0, hi=1024, bins=1024 -> width exactly 1.0
    df = spark.range(1000).select(
        F.lit("a").alias("g"), (F.col("id") + 1).cast("double").alias("v"))
    got = {r.q: r for r in histogram_quantiles(
        df, "v", by=["g"], lo=0.0, hi=1024.0, bins=1024,
        qs=(0.5, 0.95, 0.99)).collect()}
    for q in (0.5, 0.95, 0.99):
        r = got[q]
        assert r.n == 1000
        # rank convention: ceil(q*n)-th value; est within one bin width
        true_val = -(-q * 1000 // 1)  # ceil(q*n) == that value here
        assert abs(r.est - true_val) <= 1.0 + 1e-9


def test_hist_quantile_clamps_outliers(spark):
    # values beyond hi land in the top bin (counted, not dropped)
    df = spark.createDataFrame(
        [("a", 0.1), ("a", 0.2), ("a", 99.0)], "g string, v double")
    got = {r.q: r for r in histogram_quantiles(
        df, "v", by=["g"], lo=0.0, hi=1.0, bins=4, qs=(0.99,)).collect()}
    r = got[0.99]
    assert r.n == 3
    # p99 rank 3 -> the clamped outlier sits in the last bin [0.75, 1.0)
    assert 0.75 <= r.est <= 1.0


def test_sketches_empty_and_null_inputs(spark):
    empty = spark.createDataFrame([], "g string, v long")
    nulls = spark.createDataFrame([("a", None)], "g string, v long")
    for df in (empty, nulls):
        assert kmv_distinct(df, "v", by=["g"]).count() == 0
        assert hll_distinct(df, "v", by=["g"]).count() == 0
        assert countmin(df, "v").count() == 0
        assert histogram_quantiles(
            df.select("g", F.col("v").cast("double").alias("v")),
            "v", by=["g"]).count() == 0


def test_kmv_setops_planted_overlap(spark):
    from influxdb_ha_spark.operators.sketch import kmv_setops
    # A = 1..1000, B = 501..1500: |A∩B|=500, |A∪B|=1500, J=1/3
    rows = ([("A", v) for v in range(1, 1001)]
            + [("B", v) for v in range(501, 1501)])
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_setops(df, "v", "g", "A", "B", k=128).collect()[0]
    assert r.n_a <= 128 and r.n_b <= 128
    # sigma ~ 1/sqrt(128) = 8.8%; allow ~3 sigma
    assert 1500 * 0.7 < r.est_union < 1500 * 1.3
    assert 500 * 0.6 < r.est_intersection < 500 * 1.4
    assert 1 / 3 * 0.6 < r.jaccard_est < 1 / 3 * 1.4


def test_kmv_setops_disjoint_and_identical(spark):
    from influxdb_ha_spark.operators.sketch import kmv_setops
    dis = spark.createDataFrame(
        [("A", v) for v in range(100)] + [("B", v + 1000) for v in range(100)],
        "g string, v long")
    r = kmv_setops(dis, "v", "g", "A", "B", k=256).collect()[0]
    assert r.n_common == 0 and r.est_intersection == 0.0
    assert r.jaccard_est == 0.0
    same = spark.createDataFrame(
        [(g, v) for g in ("A", "B") for v in range(200)], "g string, v long")
    r2 = kmv_setops(same, "v", "g", "A", "B", k=256).collect()[0]
    # identical sets, both sketches exhaustive: J exactly 1
    assert r2.n_a == r2.n_b == r2.n_common == 200
    assert r2.jaccard_est == 1.0


def test_join_sample_estimate_accuracy_and_determinism(spark):
    from influxdb_ha_spark.operators.sketch import join_sample_estimate
    # 1:N join: 2000 keys on the left x multiplicity 3 on the right
    left = spark.range(2000).select((F.col("id") + 1).alias("k"))
    right = spark.range(6000).select((F.col("id") % 2000 + 1).alias("k"))
    r = join_sample_estimate(left, right, "k", "k", rate=8).collect()[0]
    assert r.exact_pairs == 6000
    assert r.est_pairs == r.sampled_pairs * 8
    # ~250 of 2000 keys sampled; each carries 3 pairs -> tight estimate
    assert 6000 * 0.7 <= r.est_pairs <= 6000 * 1.3
    # determinism: the hash-slice sample is partition-shape independent
    r2 = join_sample_estimate(left.repartition(7), right.coalesce(1),
                              "k", "k", rate=8).collect()[0]
    assert tuple(r) == tuple(r2)


def test_join_sample_empty_intersection(spark):
    from influxdb_ha_spark.operators.sketch import join_sample_estimate
    left = spark.range(100).select((F.col("id")).alias("k"))
    right = spark.range(100).select((F.col("id") + 1000).alias("k"))
    r = join_sample_estimate(left, right, "k", "k", rate=4).collect()[0]
    assert r.sampled_pairs == 0 and r.est_pairs == 0 and r.exact_pairs == 0


def test_join_sample_fast_path(spark):
    from influxdb_ha_spark.operators.sketch import join_sample_estimate
    left = spark.range(2000).select((F.col("id") + 1).alias("k"))
    right = spark.range(6000).select((F.col("id") % 2000 + 1).alias("k"))
    r = join_sample_estimate(left, right, "k", "k", rate=8,
                             hash_fn="fast").collect()[0]
    assert r.exact_pairs == 6000
    assert r.est_pairs == r.sampled_pairs * 8
    assert 6000 * 0.7 <= r.est_pairs <= 6000 * 1.3


# -- r10: two-phase bottom-k, theta convention, clamp visibility, merge --


def test_kmv_two_phase_equals_single_window(spark):
    """_bottom_k (salted two-phase) computes the IDENTICAL kept set —
    including tie-breaks — as the literal one-window form it replaced
    (r9 verdict #1), for any salt fan-out, by associativity of
    'k smallest of a union'."""
    from pyspark.sql import Window

    from influxdb_ha_spark.operators.hashing import hash64_expr
    from influxdb_ha_spark.operators.sketch import _bottom_k
    df = _vals(spark, 3000, "a").unionByName(_vals(spark, 700, "b"))
    vals = (df.select("g", F.col("v").alias("__v")).distinct()
            .withColumn("__h", hash64_expr(F.col("__v").cast("string"))))
    w = Window.partitionBy("g").orderBy(F.col("__h").asc(),
                                        F.col("__v").asc())
    single = sorted(map(tuple, (
        vals.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= 64).drop("__rn")).collect()))
    for salts in (1, 4, 16, 64):
        two = sorted(map(tuple,
                         _bottom_k(vals, ["g"], 64, salts=salts).collect()))
        assert two == single, f"salts={salts}"


def test_kmv_salts_do_not_change_estimates(spark):
    df = _vals(spark, 2000)
    base = kmv_distinct(df, "v", by=["g"], k=64, salts=16).collect()[0]
    for salts in (1, 3, 64):
        r = kmv_distinct(df, "v", by=["g"], k=64, salts=salts).collect()[0]
        assert (r.k_used, r.kth_hash, r.est_distinct) == \
               (base.k_used, base.kth_hash, base.est_distinct)


def test_kmv_setops_exhaustive_theta_is_full_space(spark):
    """When both sketches are exhaustive (< k distinct values), theta is
    the FULL hash space (standard theta convention) and all three
    estimates are exact — the old max-retained-hash theta inflated them
    by ~(n+1)/n (r9 ADVICE)."""
    from influxdb_ha_spark.operators.sketch import HASH_SPACE, kmv_setops
    rows = ([("A", v) for v in range(1, 51)]
            + [("B", v) for v in range(26, 76)])
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_setops(df, "v", "g", "A", "B", k=256).collect()[0]
    assert r.theta == HASH_SPACE
    assert r.est_union == 75.0
    assert r.est_intersection == 25.0
    assert abs(r.jaccard_est - 25.0 / 75.0) < 1e-6


def test_kmv_setops_mixed_exhaustive_theta(spark):
    # one side exhaustive, the other not: theta = the non-exhaustive
    # side's k-th hash (< full space), estimates within sketch error
    from influxdb_ha_spark.operators.sketch import HASH_SPACE, kmv_setops
    rows = ([("A", v) for v in range(1, 51)]
            + [("B", v) for v in range(1, 5001)])
    df = spark.createDataFrame(rows, "g string, v long")
    r = kmv_setops(df, "v", "g", "A", "B", k=64).collect()[0]
    assert r.theta < HASH_SPACE
    assert 5000 * 0.6 < r.est_union < 5000 * 1.4


def test_hist_quantile_rejects_bad_q(spark):
    df = spark.createDataFrame([("a", 0.5)], "g string, v double")
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="0, 1"):
            histogram_quantiles(df, "v", by=["g"], qs=(bad,))
    with pytest.raises(ValueError, match="non-empty"):
        histogram_quantiles(df, "v", by=["g"], qs=())


def test_hist_quantile_stream_rejects_bad_q(spark):
    # construction-time validation fires before any streaming machinery
    from influxdb_ha_spark.streaming.hist_quantile_stream import (
        hist_quantile_stream)
    df = spark.createDataFrame([("a", 0.5)], "g string, v double")
    with pytest.raises(ValueError, match="0, 1"):
        hist_quantile_stream(df, "g", "v", qs=(0.0,))
    with pytest.raises(ValueError, match="non-empty"):
        hist_quantile_stream(df, "g", "v", qs=())


def test_hist_quantile_n_clamped_exposed(spark):
    df = spark.createDataFrame(
        [("a", -5.0), ("a", 0.2), ("a", 0.4), ("a", 99.0)],
        "g string, v double")
    r = histogram_quantiles(df, "v", by=["g"], lo=0.0, hi=1.0, bins=4,
                            qs=(0.5,)).collect()[0]
    assert r.n == 4 and r.n_clamped == 2
    df2 = spark.createDataFrame([("a", 0.2), ("a", 0.6)],
                                "g string, v double")
    r2 = histogram_quantiles(df2, "v", by=["g"], lo=0.0, hi=1.0, bins=4,
                             qs=(1.0,)).collect()[0]
    assert r2.n_clamped == 0


def test_join_sample_fast_mixed_key_dtypes_stay_coordinated(spark):
    """xxhash64 hashes INT 5 and BIGINT 5 differently — without the
    common-type cast the samples silently decoordinate and the estimate
    biases ~rate x low (r9 ADVICE). With it, mixed-dtype keys estimate
    within normal sampling error."""
    from influxdb_ha_spark.operators.sketch import join_sample_estimate
    left = spark.range(2000).select((F.col("id") + 1).cast("int")
                                    .alias("k"))
    right = spark.range(6000).select((F.col("id") % 2000 + 1).alias("k"))
    r = join_sample_estimate(left, right, "k", "k", rate=8,
                             hash_fn="fast").collect()[0]
    assert r.exact_pairs == 6000
    assert 6000 * 0.6 <= r.est_pairs <= 6000 * 1.4


def test_sketch_merge_proof_equals_single_pass(spark):
    from influxdb_ha_spark.operators.sketch import sketch_merge_proof
    df = _vals(spark, 3000, "a").unionByName(_vals(spark, 100, "b"))
    got = {r.g: r for r in sketch_merge_proof(
        df, "v", by=["g"], k=64, shards=8).collect()}
    kmv = {r.g: r for r in kmv_distinct(df, "v", by=["g"], k=64).collect()}
    hll = {r.g: r for r in hll_distinct(df, "v", by=["g"]).collect()}
    for gk in ("a", "b"):
        assert got[gk].kmv_k_used == kmv[gk].k_used
        assert got[gk].kmv_est == kmv[gk].est_distinct
        assert got[gk].hll_buckets_used == hll[gk].n_buckets_used
        assert got[gk].hll_est == hll[gk].est_distinct


def test_sketch_merge_proof_shard_invariant(spark):
    from influxdb_ha_spark.operators.sketch import sketch_merge_proof
    df = _vals(spark, 1500)
    a = sorted(map(tuple, sketch_merge_proof(
        df, "v", by=["g"], k=32, shards=1).collect()))
    b = sorted(map(tuple, sketch_merge_proof(
        df, "v", by=["g"], k=32, shards=16).collect()))
    assert a == b


def test_hist_quantile_auto_discovers_range(spark):
    from influxdb_ha_spark.operators.sketch import histogram_quantiles_auto
    # group "a": 1..1000; group "b": constant 7
    df = (spark.range(1000).select(
        F.lit("a").alias("g"), (F.col("id") + 1).cast("double").alias("v"))
        .unionByName(spark.createDataFrame(
            [("b", 7.0)] * 5, "g string, v double")))
    got = {(r.g, r.q): r for r in histogram_quantiles_auto(
        df, "v", by=["g"], bins=1024, qs=(0.5, 0.99)).collect()}
    a50 = got[("a", 0.5)]
    assert a50.v_min == 1.0 and a50.v_max == 1000.0 and a50.n == 1000
    # auto width = 999/1024 < 1: est within one bin of the true rank value
    assert abs(a50.est - 500.0) <= 999.0 / 1024 + 1e-9
    b = got[("b", 0.99)]
    # constant group degenerates to the exact point
    assert b.v_min == b.v_max == 7.0 and b.est == 7.0 and b.n == 5


def test_hist_quantile_auto_rejects_bad_q(spark):
    from influxdb_ha_spark.operators.sketch import histogram_quantiles_auto
    df = spark.createDataFrame([("a", 0.5)], "g string, v double")
    with pytest.raises(ValueError, match="0, 1"):
        histogram_quantiles_auto(df, "v", by=["g"], qs=(0.0,))


def test_hist_quantile_auto_empty(spark):
    from influxdb_ha_spark.operators.sketch import histogram_quantiles_auto
    empty = spark.createDataFrame([], "g string, v double")
    assert histogram_quantiles_auto(empty, "v", by=["g"]).count() == 0


def test_overlap_matrix_planted_and_pair_consistency(spark):
    """kmv_overlap_matrix generalizes kmv_setops: the (A, B) row must
    equal kmv_setops(A, B) field-for-field, and the planted overlaps
    must estimate within sketch error across ALL pairs."""
    from influxdb_ha_spark.operators.sketch import (kmv_overlap_matrix,
                                                    kmv_setops)
    # A = 1..1000, B = 501..1500 (overlap 500), C = 1..100 (subset of A,
    # exhaustive at k=128)
    rows = ([("A", v) for v in range(1, 1001)]
            + [("B", v) for v in range(501, 1501)]
            + [("C", v) for v in range(1, 101)])
    df = spark.createDataFrame(rows, "g string, v long")
    mat = {(r.g_a, r.g_b): r for r in kmv_overlap_matrix(
        df, "v", "g", k=128).collect()}
    assert set(mat) == {("A", "B"), ("A", "C"), ("B", "C")}
    ab = mat[("A", "B")]
    pair = kmv_setops(df.where(F.col("g").isin(["A", "B"])),
                      "v", "g", "A", "B", k=128).collect()[0]
    assert (ab.theta, ab.n_a, ab.n_b, ab.n_common) == \
           (pair.theta, pair.n_a, pair.n_b, pair.n_common)
    assert (ab.est_union, ab.est_intersection, ab.jaccard_est) == \
           (pair.est_union, pair.est_intersection, pair.jaccard_est)
    assert 1500 * 0.7 < ab.est_union < 1500 * 1.3
    # C ⊂ A: intersection ~ |C| = 100, union ~ |A| = 1000
    ac = mat[("A", "C")]
    assert 100 * 0.5 < ac.est_intersection < 100 * 1.5
    assert 1000 * 0.7 < ac.est_union < 1000 * 1.3
    # B and C are disjoint
    bc = mat[("B", "C")]
    assert bc.est_intersection == 0.0 and bc.jaccard_est == 0.0


def test_overlap_matrix_all_exhaustive_is_exact(spark):
    from influxdb_ha_spark.operators.sketch import (HASH_SPACE,
                                                    kmv_overlap_matrix)
    rows = ([("A", v) for v in range(50)]
            + [("B", v) for v in range(25, 75)]
            + [("C", v) for v in range(100, 120)])
    df = spark.createDataFrame(rows, "g string, v long")
    mat = {(r.g_a, r.g_b): r for r in kmv_overlap_matrix(
        df, "v", "g", k=256).collect()}
    ab = mat[("A", "B")]
    assert ab.theta == HASH_SPACE
    assert ab.est_union == 75.0 and ab.est_intersection == 25.0
    ac = mat[("A", "C")]
    assert ac.est_intersection == 0.0 and ac.est_union == 70.0


def test_bottom_k_rejects_zero_salts(spark):
    from influxdb_ha_spark.operators.sketch import (kmv_distinct,
                                                    sketch_merge_proof)
    df = spark.createDataFrame([("a", 1)], "g string, v long")
    with pytest.raises(ValueError, match="salts"):
        kmv_distinct(df, "v", by=["g"], salts=0)
    with pytest.raises(ValueError, match="shards"):
        sketch_merge_proof(df, "v", by=["g"], shards=0)


def test_join_sample_numeric_dtype_coercion_both_paths(spark):
    """BIGINT-vs-DOUBLE keys join under Spark's numeric coercion, but
    '5' != '5.0' as strings — the r10 review found the string cast left
    them decoordinated in BOTH hash paths. _coordinated_keys routes any
    mixed numeric pair through double on both sides."""
    from influxdb_ha_spark.operators.sketch import join_sample_estimate
    left = spark.range(2000).select((F.col("id") + 1).cast("double")
                                    .alias("k"))
    right = spark.range(6000).select((F.col("id") % 2000 + 1).alias("k"))
    for fn in ("fast", "md5"):
        r = join_sample_estimate(left, right, "k", "k", rate=8,
                                 hash_fn=fn).collect()[0]
        assert r.exact_pairs == 6000, fn
        # coordinated: within sampling error, not biased ~rate x low
        assert 6000 * 0.6 <= r.est_pairs <= 6000 * 1.4, fn


def test_sketch_fast_hash_path(spark):
    """The xxhash64 production split on the distinct sketches: the
    exact-below-k branch agrees with md5 exactly (count, not hash,
    decides it), large-cardinality estimates stay in the 3-sigma band,
    and pmod(xxhash64, 2^60) keeps every hash in [0, 2^60)."""
    small = _vals(spark, 10)
    a = kmv_distinct(small, "v", by=["g"], k=256).collect()[0]
    b = kmv_distinct(small, "v", by=["g"], k=256,
                     hash_fn="fast").collect()[0]
    assert (a.k_used, a.est_distinct) == (b.k_used, b.est_distinct)
    big = _vals(spark, 2000)
    r = kmv_distinct(big, "v", by=["g"], k=64, hash_fn="fast").collect()[0]
    assert 0 <= r.kth_hash < (1 << 60)
    assert 2000 * 0.6 < r.est_distinct < 2000 * 1.4
    h = hll_distinct(_vals(spark, 5000), "v", by=["g"],
                     hash_fn="fast").collect()[0]
    assert 5000 * 0.8 < h.est_distinct < 5000 * 1.2
    with pytest.raises(ValueError, match="hash_fn"):
        kmv_distinct(small, "v", by=["g"], hash_fn="sha")


def test_overlap_matrix_fast_hash_exhaustive_equals_md5(spark):
    """In the exhaustive regime (k above every group) both hash paths
    return the IDENTICAL exact matrix — theta is the full space and
    every count is a set cardinality, independent of the hash."""
    from influxdb_ha_spark.operators.sketch import kmv_overlap_matrix
    rows = ([("A", v) for v in range(50)]
            + [("B", v) for v in range(25, 75)]
            + [("C", v) for v in range(100, 120)])
    df = spark.createDataFrame(rows, "g string, v long")
    a = sorted(map(tuple, kmv_overlap_matrix(df, "v", "g",
                                             k=256).collect()))
    b = sorted(map(tuple, kmv_overlap_matrix(df, "v", "g", k=256,
                                             hash_fn="fast").collect()))
    # in the exhaustive regime even theta is hash-independent (the full
    # space on both paths), so the WHOLE rows must agree
    assert a == b
    from influxdb_ha_spark.operators.sketch import HASH_SPACE
    assert all(t[2] == HASH_SPACE for t in a)


def test_hll_rollup_equals_single_pass(spark):
    """Per-bucket partial states merged across buckets equal the
    single-pass sketch on the same values — for ANY bucketing (the
    time-dimension associativity pin)."""
    from influxdb_ha_spark.operators.sketch import hll_rollup
    B = 10 ** 9
    rows = [("a", (i % 7) * B * 86_400 + (i % 5) * B * 3600, i % 900)
            for i in range(3000)] \
        + [("b", 0, i) for i in range(25)]
    df = spark.createDataFrame(rows, "g string, time long, v long")
    got = {r.g: r for r in hll_rollup(
        df, value_col="v", time_col="time", by=["g"],
        bucket_ns=86_400 * B).collect()}
    single = {r.g: r for r in hll_distinct(df, "v", by=["g"]).collect()}
    assert got["a"].n_buckets == 7 and got["b"].n_buckets == 1
    for gk in ("a", "b"):
        assert got[gk].n_buckets_used == single[gk].n_buckets_used
        assert got[gk].n_empty == single[gk].n_empty
        assert got[gk].est_distinct == single[gk].est_distinct
    # bucket granularity cannot move the estimate, only n_buckets
    hourly = {r.g: r for r in hll_rollup(
        df, value_col="v", time_col="time", by=["g"],
        bucket_ns=3600 * B).collect()}
    assert hourly["a"].est_distinct == single["a"].est_distinct
    assert hourly["a"].n_buckets > got["a"].n_buckets


def test_hll_rollup_empty_and_null(spark):
    from influxdb_ha_spark.operators.sketch import hll_rollup
    empty = spark.createDataFrame([], "g string, time long, v long")
    assert hll_rollup(empty, "v", "time", by=["g"]).count() == 0
    nulls = spark.createDataFrame([("a", None, 1), ("a", 5, None)],
                                  "g string, time long, v long")
    assert hll_rollup(nulls, "v", "time", by=["g"]).count() == 0


def test_hll_cube_every_set_equals_direct_sketch(spark):
    """Each grouping set's row folds the SAME merged registers a direct
    hll_distinct over that grouping computes — the cube is exactly
    |sets| sketches for the price of one data shuffle."""
    from influxdb_ha_spark.operators.sketch import hll_cube
    rows = [("a", i % 3, i % 700) for i in range(2500)] \
        + [("b", 0, i + 10_000) for i in range(40)]
    df = spark.createDataFrame(rows, "t string, d long, v long")
    cube = hll_cube(df, "v", dims=["t", "d"]).collect()
    by_level = {}
    for r in cube:
        by_level.setdefault(r.level, {})[(r.t, r.d)] = r
    assert set(by_level) == {0, 1, 2, 3}
    fine = {(r.t, r.d): r for r in hll_distinct(
        df, "v", by=["t", "d"]).collect()}
    assert set(by_level[0]) == set(fine)
    for k, r in by_level[0].items():
        assert (r.n_buckets_used, r.n_empty, r.est_distinct) == \
            (fine[k].n_buckets_used, fine[k].n_empty, fine[k].est_distinct)
    per_d = {r.d: r for r in hll_distinct(df, "v", by=["d"]).collect()}
    assert {k[1] for k in by_level[1]} == set(per_d)     # t aggregated out
    for (t, d), r in by_level[1].items():
        assert t is None and r.est_distinct == per_d[d].est_distinct
    per_t = {r.t: r for r in hll_distinct(df, "v", by=["t"]).collect()}
    for (t, d), r in by_level[2].items():
        assert d is None and r.est_distinct == per_t[t].est_distinct
    (overall,) = hll_distinct(df, "v").collect()
    ((_, r),) = by_level[3].items()
    assert r.est_distinct == overall.est_distinct


def test_hll_cube_level_disambiguates_null_dim_value(spark):
    """A GENUINE null dim value stays a level-0 cell, distinct from the
    aggregated-out null of a coarser set."""
    from influxdb_ha_spark.operators.sketch import hll_cube
    df = spark.createDataFrame([(None, 1), ("x", 2), ("x", 3)],
                               "t string, v long")
    got = {(r.t, r.level): r for r in
           hll_cube(df, "v", dims=["t"]).collect()}
    assert set(got) == {(None, 0), ("x", 0), (None, 1)}
    assert got[(None, 0)].n_buckets_used == 1      # just v=1
    assert got[(None, 1)].n_buckets_used == 3      # all three values


def test_hll_cube_custom_sets_and_validation(spark):
    from influxdb_ha_spark.operators.sketch import hll_cube
    df = spark.createDataFrame([("a", 1, 1)], "t string, d long, v long")
    only = hll_cube(df, "v", dims=["t", "d"], sets=[["t"]]).collect()
    assert len(only) == 1 and only[0].level == 2
    with pytest.raises(ValueError, match="dims"):
        hll_cube(df, "v", dims=[])
    with pytest.raises(ValueError, match="subset"):
        hll_cube(df, "v", dims=["t"], sets=[["zz"]])


# -- AMS F2 ------------------------------------------------------------


def _ams_replay(items, d, seed=11):
    """Python replay of ams_f2's exact arithmetic (hash64 mod p, LCG
    sign family, integer floor division)."""
    import hashlib
    from collections import Counter

    from influxdb_ha_spark.operators.hashing import (MERSENNE_P,
                                                     minhash_coeffs)
    coeffs = minhash_coeffs(d, seed=seed)
    zs = [0] * d
    for it in items:
        h = int(hashlib.md5(str(it).encode()).hexdigest()[:15], 16) \
            % MERSENNE_P
        for i, (a, b) in enumerate(coeffs):
            zs[i] += 1 - 2 * (((a * h + b) % MERSENNE_P) % 2)
    c = Counter(items)
    return (len(items), len(c), sum(v * v for v in c.values()),
            sum(z * z for z in zs) // d)


def test_ams_f2_matches_python_replay(spark):
    from influxdb_ha_spark.operators.sketch import ams_f2
    rows = ([("a", f"u{i % 7}") for i in range(100)]
            + [("b", f"v{i % 3}") for i in range(50)])
    df = spark.createDataFrame(rows, "g string, item string")
    got = {r.g: r for r in ams_f2(df, "item", by=["g"], d=16).collect()}
    for gname in ("a", "b"):
        items = [it for gg, it in rows if gg == gname]
        n, ni, f2, est = _ams_replay(items, 16)
        r = got[gname]
        assert (r.n_rows, r.n_items, r.f2_exact, r.f2_est) == \
            (n, ni, f2, est)


def test_ams_f2_partition_shape_independent(spark):
    """Z_i is a plain sum — any partitioning folds to identical ints."""
    from influxdb_ha_spark.operators.sketch import ams_f2
    rows = [("k", f"x{i % 11}") for i in range(200)]
    df = spark.createDataFrame(rows, "g string, item string")
    a = ams_f2(df.repartition(1), "item", by=["g"], d=8).collect()
    b = ams_f2(df.repartition(13), "item", by=["g"], d=8).collect()
    assert a == b


def test_ams_f2_ungrouped_and_fast_path(spark):
    """Ungrouped output is one row; the xxhash64 fast path keeps the
    exact audit columns identical (only the estimate's sample of signs
    changes with the hash)."""
    from influxdb_ha_spark.operators.sketch import ams_f2
    df = spark.createDataFrame([(f"u{i % 5}",) for i in range(40)],
                               "item string")
    (md5_row,) = ams_f2(df, "item", d=8).collect()
    (fast_row,) = ams_f2(df, "item", d=8, hash_fn="fast").collect()
    n, ni, f2, est = _ams_replay([f"u{i % 5}" for i in range(40)], 8)
    assert (md5_row.n_rows, md5_row.n_items,
            md5_row.f2_exact, md5_row.f2_est) == (n, ni, f2, est)
    assert (fast_row.n_rows, fast_row.n_items, fast_row.f2_exact) == \
        (n, ni, f2)


def test_ams_f2_exact_audit_is_selfjoin_size(spark):
    """f2_exact IS the self-equi-join row count — the quantity the
    estimator approximates."""
    from influxdb_ha_spark.operators.sketch import ams_f2
    df = spark.createDataFrame([(f"u{i % 4}",) for i in range(30)],
                               "item string")
    (r,) = ams_f2(df, "item", d=4).collect()
    assert r.f2_exact == df.alias("a").join(
        df.alias("b"), F.col("a.item") == F.col("b.item")).count()


def test_ams_f2_validation(spark):
    from influxdb_ha_spark.operators.sketch import ams_f2
    df = spark.createDataFrame([("x",)], "item string")
    with pytest.raises(ValueError, match="d must be >= 1"):
        ams_f2(df, "item", d=0)


# -- histogram_rollup ---------------------------------------------------


def test_histogram_rollup_equals_single_pass(spark):
    """Cell-wise + merge of daily partials must reproduce the
    single-pass histogram quantiles exactly — estimates, n, and
    n_clamped included — for any bucket size."""
    from influxdb_ha_spark.operators.sketch import (histogram_quantiles,
                                                    histogram_rollup)
    D = 86_400_000_000_000
    rows = [("g", (i % 5) * D + i, float(i % 90) + 600.0 * (i % 37 == 0))
            for i in range(400)]          # some rows clamp above hi
    df = spark.createDataFrame(rows, "g string, time long, v double")
    single = histogram_quantiles(df, "v", by=["g"], lo=0.0, hi=128.0,
                                 bins=256, qs=(0.5, 0.9)).collect()
    for bucket_ns in (D, 7 * D):
        roll = histogram_rollup(df, "v", by=["g"], bucket_ns=bucket_ns,
                                lo=0.0, hi=128.0, bins=256,
                                qs=(0.5, 0.9)).collect()
        assert sorted((r.q, r.n, r.n_clamped, r.est) for r in roll) == \
            sorted((r.q, r.n, r.n_clamped, r.est) for r in single)
    one_day = {r.q: r.n_buckets for r in
               histogram_rollup(df, "v", by=["g"], bucket_ns=D,
                                lo=0.0, hi=128.0, bins=256,
                                qs=(0.5, 0.9)).collect()}
    assert set(one_day.values()) == {5}


def test_histogram_rollup_validation(spark):
    from influxdb_ha_spark.operators.sketch import histogram_rollup
    df = spark.createDataFrame([("g", 1, 1.0)],
                               "g string, time long, v double")
    with pytest.raises(ValueError, match="q must be in"):
        histogram_rollup(df, "v", by=["g"], qs=(0.0,))
    with pytest.raises(ValueError, match="bucket_ns"):
        histogram_rollup(df, "v", by=["g"], bucket_ns=0)


# -- bloom_semijoin ----------------------------------------------------


def test_bloom_semijoin_no_false_negatives_and_counts(spark):
    """Every true match passes the bloom (no false negatives); counts
    are exact; fp rate sits in the (1-e^{-dn/m})^d ballpark."""
    import math

    from influxdb_ha_spark.operators.sketch import bloom_semijoin
    big = spark.createDataFrame([(i % 500,) for i in range(4000)],
                                "k long")
    small = spark.createDataFrame([(i,) for i in range(0, 500, 7)],
                                  "k long")          # 72 keys
    (r,) = bloom_semijoin(big, small, "k", "k", m_bits=512,
                          hashes=4).collect()
    assert r.n_small_keys == 72
    assert r.n_big_rows == 4000
    exact = big.join(small.distinct(), "k", "left_semi").count()
    assert r.n_true_match == exact
    assert r.n_pass_bloom >= r.n_true_match          # no false negatives
    assert r.n_false_pos == r.n_pass_bloom - r.n_true_match
    pred = (1 - math.exp(-4 * 72 / 512)) ** 4
    got = r.n_false_pos / max(1, r.n_big_rows - r.n_true_match)
    assert got < 4 * pred + 0.05                     # calibration band


def test_bloom_semijoin_saturated_and_validation(spark):
    """A tiny bitmap saturates: everything passes (fp -> 1), still no
    wrong counts; validation rejects bad parameters."""
    import pytest

    from influxdb_ha_spark.operators.sketch import bloom_semijoin
    big = spark.createDataFrame([(i,) for i in range(200)], "k long")
    small = spark.createDataFrame([(i,) for i in range(100)], "k long")
    (r,) = bloom_semijoin(big, small, "k", "k", m_bits=64,
                          hashes=4).collect()
    assert r.n_pass_bloom >= r.n_true_match == 100
    with pytest.raises(ValueError, match="m_bits"):
        bloom_semijoin(big, small, "k", "k", m_bits=100)
    with pytest.raises(ValueError, match="hashes"):
        bloom_semijoin(big, small, "k", "k", hashes=0)


# -- kmv_difference ----------------------------------------------------


def test_kmv_difference_exhaustive_is_exact(spark):
    """Both groups below k: theta = full space and every estimate is
    the exact set arithmetic; containments are exact fractions."""
    from influxdb_ha_spark.operators.sketch import (HASH_SPACE,
                                                    kmv_difference)
    rows = [("a", v) for v in range(100)] + \
           [("b", v) for v in range(60, 160)]          # overlap 40
    df = spark.createDataFrame(rows, "g string, v long")
    (r,) = kmv_difference(df, "v", "g", "a", "b", k=256).collect()
    assert r.theta == HASH_SPACE
    assert (r.n_a, r.n_b, r.n_common) == (100, 100, 40)
    assert r.est_diff_ab == 60.0 and r.est_diff_ba == 60.0
    assert r.containment_ab == r.containment_ba == 0.4


def test_kmv_difference_consistency_with_setops(spark):
    """diff + intersection must reassemble the union estimate on the
    SAME theta — the three legs of the algebra agree by construction."""
    from influxdb_ha_spark.operators.sketch import (kmv_difference,
                                                    kmv_setops)
    rows = [("a", f"x{v}") for v in range(1200)] + \
           [("b", f"x{v}") for v in range(800, 2200)]
    df = spark.createDataFrame(rows, "g string, v string")
    (d,) = kmv_difference(df, "v", "g", "a", "b", k=128).collect()
    (s,) = kmv_setops(df, "v", "g", "a", "b", k=128).collect()
    assert d.theta == s.theta
    assert (d.n_a, d.n_b, d.n_common) == (s.n_a, s.n_b, s.n_common)
    # |A\B| + |B\A| + |A∩B| = |A∪B| in the raw (unrounded) estimator;
    # allow the three independent roundings to differ by <= 2 microunits
    lhs = d.est_diff_ab + d.est_diff_ba + s.est_intersection
    assert abs(lhs - s.est_union) < 3e-6


def test_kmv_difference_disjoint_and_subset(spark):
    from influxdb_ha_spark.operators.sketch import kmv_difference
    dis = [("a", v) for v in range(50)] + [("b", v + 100)
                                           for v in range(50)]
    (r,) = kmv_difference(
        spark.createDataFrame(dis, "g string, v long"),
        "v", "g", "a", "b").collect()
    assert r.n_common == 0 and r.containment_ab == 0.0
    sub = [("a", v) for v in range(30)] + [("b", v) for v in range(10)]
    (r2,) = kmv_difference(
        spark.createDataFrame(sub, "g string, v long"),
        "v", "g", "a", "b").collect()
    assert r2.containment_ba == 1.0        # B entirely inside A
    assert r2.est_diff_ba == 0.0
