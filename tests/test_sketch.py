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
