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


def test_canonical_select_null_priority_sorts_last(spark):
    """r8 (ADVICE): a NULL priority (unranked source) must LOSE to every
    ranked copy — asc_nulls_last pinned, because Spark's bare ASC puts
    NULLs first while DuckDB's puts them last; and with ONLY null
    priorities the election degrades to lowest-id, never a crash."""
    rows = [(1, "same text here", None), (2, "here same text", 7),
            (3, "text here same", None)]
    df = spark.createDataFrame(rows, "doc_id long, text string, prio long")
    got = {r["doc_id"]: r["canonical_id"]
           for r in canonical_select(df, priority=F.col("prio")).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    df2 = spark.createDataFrame([(5, "x y", None), (4, "y x", None)],
                                "doc_id long, text string, prio long")
    got2 = {r["doc_id"]: r["canonical_id"]
            for r in canonical_select(df2, priority=F.col("prio")).collect()}
    assert got2 == {4: 4, 5: 4}


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


# -- property tests vs brute-force Python references ----------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_uids = st.integers(min_value=1, max_value=4)
_times = st.integers(min_value=0, max_value=20)
_types = st.sampled_from(["a", "b", "c"])
_events = st.lists(st.tuples(_uids, _types, _times), max_size=16)


def _ref_funnel(rows, steps, within=None):
    """Brute-force reference: t_i = min qualifying time given final
    t_{i-1}, per user."""
    users = {u for u, _, _ in rows}
    counts = [0] * len(steps)
    for u in users:
        ev = [(t, s) for uu, s, t in rows if uu == u]
        prev = None
        for i, step in enumerate(steps):
            if i == 0:
                cand = [t for t, s in ev if s == step]
            elif prev is None:
                cand = []
            else:
                cand = [t for t, s in ev if s == step and t > prev
                        and (within is None or t <= prev + within)]
            prev = min(cand) if cand else None
            if prev is not None:
                counts[i] += 1
    return counts


@settings(max_examples=15, deadline=None)
@given(rows=_events, within=st.one_of(st.none(),
                                      st.integers(min_value=1, max_value=8)))
def test_funnel_matches_reference(spark, rows, within):
    steps = ["a", "b", "c"]
    expect = _ref_funnel(rows, steps, within)
    if not rows:
        return
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "time long")
    got = {r["step"]: r["entities"]
           for r in funnel(df, steps, by=["user_id"], on="time",
                           within_ns=within).collect()}
    assert [got[i] for i in range(3)] == expect


@settings(max_examples=15, deadline=None)
@given(rows=st.lists(st.tuples(_uids, _times), max_size=16))
def test_retention_matches_reference(spark, rows):
    if not rows:
        return
    B = 5
    act = {(u, t // B * B) for u, t in rows}
    cohort = {}
    for u, b in act:
        cohort[u] = min(cohort.get(u, b), b)
    expect = {}
    for u, b in act:
        key = (cohort[u], (b - cohort[u]) // B)
        expect[key] = expect.get(key, 0) + 1
    df = spark.createDataFrame(rows, "user_id long, time long")
    got = {(r["cohort_bucket"], r["offset"]): r["n_entities"]
           for r in retention(df, by=["user_id"], on="time",
                              bucket_ns=B).collect()}
    assert got == expect


@settings(max_examples=15, deadline=None)
@given(rows=_events, k=st.integers(min_value=1, max_value=4))
def test_user_paths_matches_reference(spark, rows, k):
    from influxdb_ha_spark.operators.timeseries import user_paths
    if not rows:
        return
    by_user = {}
    for u, s, t in rows:
        by_user.setdefault(u, []).append((t, s))
    expect = {}
    for u, ev in by_user.items():
        path = ">".join(s for _, s in sorted(ev)[:k])
        expect[path] = expect.get(path, 0) + 1
    df = spark.createDataFrame(rows, "user_id long, event_type string, "
                                     "time long")
    got = {r["path"]: r["n_entities"]
           for r in user_paths(df, by=["user_id"], on="time",
                               max_steps=k).collect()}
    assert got == expect


def test_active_users_trailing_window(spark):
    from influxdb_ha_spark.operators.timeseries import active_users
    B = 5
    # u1 active buckets 0,5; u2 active bucket 5; u3 active bucket 20
    rows = [(1, 0), (1, 1), (1, 5), (2, 7), (3, 20)]
    df = spark.createDataFrame(rows, "user_id long, time long")
    got = {r["bucket"]: (r["dau"], r["wau"], r["stickiness"])
           for r in active_users(df, by=["user_id"], on="time",
                                 bucket_ns=B, window_buckets=2).collect()}
    # bucket 0: dau {u1}; wau window {-5,0}: {u1}
    assert got[0] == (1, 1, 1.0)
    # bucket 5: dau {u1,u2}; window {0,5}: {u1,u2} -> stickiness 1.0
    assert got[5] == (2, 2, 1.0)
    # bucket 20: only u3; prior window bucket 15 inactive -> wau {u3}
    assert got[20] == (1, 1, 1.0)
    # no row for silent bucket 10/15
    assert set(got) == {0, 5, 20}


@settings(max_examples=15, deadline=None)
@given(rows=st.lists(st.tuples(_uids, _times), max_size=16),
       w=st.integers(min_value=1, max_value=3))
def test_active_users_matches_reference(spark, rows, w):
    from influxdb_ha_spark.operators.timeseries import active_users
    if not rows:
        return
    B = 5
    act = {(u, t // B * B) for u, t in rows}
    days = {b for _, b in act}
    expect = {}
    for d in days:
        dau = {u for u, b in act if b == d}
        wau = {u for u, b in act if d - (w - 1) * B <= b <= d}
        expect[d] = (len(dau), len(wau))
    df = spark.createDataFrame(rows, "user_id long, time long")
    got = {r["bucket"]: (r["dau"], r["wau"])
           for r in active_users(df, by=["user_id"], on="time",
                                 bucket_ns=B, window_buckets=w).collect()}
    assert got == expect


def test_seasonal_anomalies_flags_spike_not_cycle(spark):
    """A strong diurnal cycle must NOT trip the detector (raw-value MAD
    would flag every peak); a planted spike on top of the cycle must."""
    from influxdb_ha_spark.operators.timeseries import seasonal_anomalies
    B = H
    period = 4
    pattern = [0.0, 50.0, 100.0, 50.0]          # aggressive cycle
    rows = []
    for i in range(periods := 12 * period):
        v = pattern[i % period]
        if i == 30:
            v += 500.0                           # the anomaly
        rows.append(("s", i * B, v))
    df = spark.createDataFrame(rows, "tag string, time long, value double")
    out = seasonal_anomalies(df, by=["tag"], value_col="value",
                             bucket_ns=B, period=period).collect()
    flagged = {r["bucket"] // B for r in out}
    assert 30 in flagged
    # the pure cycle rows adjacent to the spike's MA window may wobble;
    # far-away clean peaks must NOT be flagged
    assert not any(b < 25 or b > 35 for b in flagged), flagged


def test_active_users_null_entity_consistency(spark):
    """A NULL entity must count identically in DAU and WAU (the r7
    review found count_distinct silently skipping NULL keys, breaking
    dau <= wau)."""
    from influxdb_ha_spark.operators.timeseries import active_users
    B = 5
    rows = [(1, 0), (None, 0), (1, B)]
    df = spark.createDataFrame(rows, "user_id long, time long")
    got = {r["bucket"]: (r["dau"], r["wau"])
           for r in active_users(df, by=["user_id"], on="time",
                                 bucket_ns=B, window_buckets=2).collect()}
    assert got[0] == (2, 2)          # u1 + NULL both count
    assert got[B] == (1, 2)          # window {0,5}: u1, NULL
    assert all(d <= w for d, w in got.values())


@settings(max_examples=15, deadline=None)
@given(docs=st.lists(st.tuples(st.text(alphabet="ab ", max_size=10),
                               st.integers(min_value=0, max_value=3)),
                     max_size=8))
def test_canonical_select_matches_reference(spark, docs):
    import re
    rows = [(i, t, p) for i, (t, p) in enumerate(docs)]
    with_text = [(i, t, p) for i, t, p in rows]
    if not with_text:
        return
    fp = lambda t: tuple(sorted({w for w in re.split(  # noqa: E731
        r"[^a-z0-9]+", t.lower()) if w}))
    clusters = {}
    for i, t, p in with_text:
        clusters.setdefault(fp(t), []).append((p, i))
    expect = {}
    for ids in clusters.values():
        canon = min(ids)[1]
        for _, i in ids:
            expect[i] = canon
    df = spark.createDataFrame(rows, "doc_id long, text string, prio long")
    got = {r["doc_id"]: r["canonical_id"]
           for r in canonical_select(df, priority=F.col("prio")).collect()}
    assert got == expect
    # exactly one canonical per cluster
    canon_per_fp = {}
    for i, c in got.items():
        canon_per_fp.setdefault(expect[i], set()).add(c)
    assert all(len(v) == 1 for v in canon_per_fp.values())


def test_precedence_matrix_hand_checked(spark):
    """u1: a@1 b@5 c@9; u2: b@2 a@4; u3: a@3 a@8 b@3 -> tie on firsts.
    (a,b): u1 precedes, u2 does not, u3 tie -> n_precedes 1, n_both 3,
    and the tie appears in NEITHER direction."""
    from influxdb_ha_spark.operators.timeseries import precedence_matrix
    rows = [(1, 1, "a"), (1, 5, "b"), (1, 9, "c"),
            (2, 2, "b"), (2, 4, "a"),
            (3, 3, "a"), (3, 8, "a"), (3, 3, "b")]
    df = spark.createDataFrame(rows, "user_id long, time long, "
                               "event_type string")
    got = {(r.type_a, r.type_b): r for r in
           precedence_matrix(df).collect()}
    ab, ba = got[("a", "b")], got[("b", "a")]
    assert (ab.n_precedes, ab.n_both) == (1, 3)
    assert (ba.n_precedes, ba.n_both) == (1, 3)
    assert ab.n_precedes + ba.n_precedes < ab.n_both   # tie visible
    assert ab.share_ppm == 333333
    # (a, c): only u1 saw both, a first
    assert (got[("a", "c")].n_precedes, got[("a", "c")].n_both) == (1, 1)
    assert got[("c", "a")].n_precedes == 0
    # no self-pairs
    assert ("a", "a") not in got


def test_precedence_matrix_asymmetry_is_funnel_signal(spark):
    """Synthetic strict funnel view->click->buy for every user: the
    forward direction carries 100% share, the reverse 0."""
    from influxdb_ha_spark.operators.timeseries import precedence_matrix
    rows = []
    for u in range(10):
        rows += [(u, 10 * u + 1, "view"), (u, 10 * u + 2, "click"),
                 (u, 10 * u + 3, "buy")]
    df = spark.createDataFrame(rows, "user_id long, time long, "
                               "event_type string")
    got = {(r.type_a, r.type_b): r.share_ppm for r in
           precedence_matrix(df).collect()}
    assert got[("view", "click")] == 1000000
    assert got[("click", "view")] == 0
    assert got[("view", "buy")] == 1000000
