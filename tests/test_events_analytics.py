"""funnel / retention / permutation_entropy / canonical_select: the
logic gates the sf0.01 oracle rows can't exercise (strict-order funnel
gating, duplicate-cluster election, planted pattern distributions)."""

import math

from influxdb_ha_spark.operators.dedup import canonical_select
from influxdb_ha_spark.operators.timeseries import (funnel,
                                                    permutation_entropy,
                                                    retention)

from pyspark.sql import functions as F

H = 3_600_000_000_000
DAY = 24 * H


def test_funnel_strict_order_gating(spark):
    rows = [
        # u1 completes in order: signup@1, view@2, purchase@3
        (1, "signup", 1), (1, "view", 2), (1, "purchase", 3),
        # u2 views BEFORE signup: view@1, signup@2 -> stalls at signup
        (2, "view", 1), (2, "signup", 2), (2, "purchase", 1),
        # u3 signup+view, purchase before the view -> stalls at view
        (3, "signup", 10), (3, "view", 20), (3, "purchase", 15),
        # u4 never signs up
        (4, "view", 1), (4, "purchase", 2),
        # u5 same-timestamp events do NOT count (strictly after)
        (5, "signup", 7), (5, "view", 7), (5, "purchase", 8),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "time long")
    got = {r["step_name"]: (r["step"], r["entities"])
           for r in funnel(df, ["signup", "view", "purchase"],
                           by=["user_id"], on="time").collect()}
    assert got == {"signup": (0, 4),    # u1,u2,u3,u5
                   "view": (1, 2),      # u1, u3 (u5's view not strictly after)
                   "purchase": (2, 1)}  # u1 only


def test_funnel_counts_non_increasing_and_empty_steps(spark):
    df = spark.createDataFrame([(1, "signup", 1)],
                               "user_id long, event_type string, time long")
    out = funnel(df, ["signup", "view"], by=["user_id"], on="time").collect()
    got = {r["step_name"]: r["entities"] for r in out}
    assert got == {"signup": 1, "view": 0}   # absent step -> 0, row kept


def test_retention_triangle(spark):
    # u1 first seen day0, active day0/day1/day3; u2 first seen day1,
    # active day1/day3 (offset 2); two events same (user, day) dedup
    rows = [(1, 0), (1, 10), (1, DAY + 5), (1, 3 * DAY),
            (2, DAY), (2, DAY + 7), (2, 3 * DAY)]
    df = spark.createDataFrame(rows, "user_id long, time long")
    got = {(r["cohort_bucket"], r["offset"]): r["n_entities"]
           for r in retention(df, by=["user_id"], on="time",
                              bucket_ns=DAY).collect()}
    assert got == {(0, 0): 1, (0, 1): 1, (0, 3): 1,
                   (DAY, 0): 1, (DAY, 2): 1}


def test_retention_max_offset_cap(spark):
    rows = [(1, 0), (1, 9 * DAY)]
    df = spark.createDataFrame(rows, "user_id long, time long")
    got = retention(df, by=["user_id"], on="time", bucket_ns=DAY,
                    max_offset=5).collect()
    assert {(r["cohort_bucket"], r["offset"]) for r in got} == {(0, 0)}


def test_permutation_entropy_planted_signals(spark):
    # monotone series -> single pattern (a<=b<=c, a<=c -> code 7): H = 0
    mono = [("m", i * H, float(i)) for i in range(10)]
    # strict alternation -> exactly two patterns, equal counts: H = ln 2
    alt = [("z", i * H, float(i % 2)) for i in range(10)]
    df = spark.createDataFrame(mono + alt,
                               "tag string, time long, value double")
    out = {r["tag"]: r for r in
           permutation_entropy(df, by=["tag"], value_col="value",
                               bucket_ns=H).collect()}
    assert out["m"]["n_windows"] == 8 and out["m"]["n_patterns"] == 1
    assert out["m"]["h"] == 0.0
    assert out["z"]["n_patterns"] == 2
    assert abs(out["z"]["h"] - round(math.log(2), 6)) < 2e-6
    assert 0.0 <= out["z"]["h_norm"] <= 1.0


def test_canonical_select_cluster_election(spark):
    rows = [
        # cluster A: same token set, different order/punct; priorities
        # 2, 0, 1 -> doc 11 (prio 0) is canonical
        (10, "the quick brown fox", 2),
        (11, "Brown FOX -- the quick!", 0),
        (12, "quick the fox brown", 1),
        # cluster B: priority tie -> lowest id (20) wins
        (20, "hello world", 5), (21, "world hello", 5),
        # singleton
        (30, "lonely doc", 9),
        # null text is excluded entirely
        (40, None, 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, prio long")
    out = canonical_select(df, text_col="text", id_col="doc_id",
                           priority=F.col("prio"))
    got = {r["doc_id"]: (r["canonical_id"], r["is_canonical"])
           for r in out.collect()}
    assert got == {10: (11, False), 11: (11, True), 12: (11, False),
                   20: (20, True), 21: (20, False), 30: (30, True)}
    # exactly one canonical per cluster
    fps = {r["doc_id"]: r["fingerprint"] for r in out.collect()}
    assert fps[10] == fps[11] == fps[12] and fps[20] == fps[21]


def test_canonical_select_default_priority_is_lowest_id(spark):
    df = spark.createDataFrame([(2, "a b"), (1, "b a")],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["canonical_id"]
           for r in canonical_select(df).collect()}
    assert got == {1: 1, 2: 1}


def test_funnel_conversion_window(spark):
    # u1 converts within the window; u2's view comes 10h after signup
    # -> outside a 2h window
    rows = [(1, "signup", 0), (1, "view", H),
            (2, "signup", 0), (2, "view", 10 * H)]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "time long")
    got = {r["step_name"]: r["entities"]
           for r in funnel(df, ["signup", "view"], by=["user_id"],
                           on="time", within_ns=2 * H).collect()}
    assert got == {"signup": 2, "view": 1}
    # boundary: exactly at the window edge still counts (<=)
    got2 = {r["step_name"]: r["entities"]
            for r in funnel(df, ["signup", "view"], by=["user_id"],
                            on="time", within_ns=10 * H).collect()}
    assert got2 == {"signup": 2, "view": 2}


def test_user_paths_rank_and_ties(spark):
    from influxdb_ha_spark.operators.timeseries import user_paths
    rows = [
        # u1: 4 events, max_steps=3 prunes to first three by time
        (1, "a", 1), (1, "b", 2), (1, "c", 3), (1, "d", 4),
        # u2: same-timestamp tie orders lexicographically -> a>b
        (2, "b", 5), (2, "a", 5),
        # u3: identical path to u1's first three
        (3, "a", 9), (3, "b", 10), (3, "c", 11),
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "time long")
    got = {r["path"]: r["n_entities"]
           for r in user_paths(df, by=["user_id"], on="time",
                               max_steps=3).collect()}
    assert got == {"a>b>c": 2, "a>b": 1}
