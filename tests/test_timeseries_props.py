"""Property tests: the distributed as-of join / interval join /
sequence packing agree with brute-force single-machine references on
arbitrary small inputs (hypothesis drives the shapes; Spark runs few
examples because each is a full job — the generator favors collisions:
tiny key/time domains so equal-time ties and empty keys actually occur).
"""

from hypothesis import given, settings, strategies as st

from influxdb_ha_spark.operators.pipeline import pack_sequences
from influxdb_ha_spark.operators.timeseries import asof_join, interval_join

keys = st.sampled_from(["a", "b"])
times = st.integers(min_value=0, max_value=20)


@settings(max_examples=12, deadline=None)
@given(left=st.lists(st.tuples(keys, times), max_size=8),
       right=st.lists(st.tuples(keys, times), max_size=6, unique=True))
def test_asof_matches_bruteforce(spark, left, right):
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k string, time long, lid long")
    rdf = spark.createDataFrame(right, "k string, time long") \
        .selectExpr("k", "time", "time * 10.0 AS value")
    got = {r["lid"]: (r["r_time"], r["r_value"])
           for r in asof_join(ldf, rdf, on="time", by=["k"],
                              value_cols=["value"]).collect()}
    for i, (k, t) in enumerate(left):
        cands = [rt for (rk, rt) in right if rk == k and rt <= t]
        want = ((max(cands), max(cands) * 10.0) if cands else (None, None))
        assert got[i] == want, (k, t, got[i], want)


@settings(max_examples=12, deadline=None)
@given(pts=st.lists(times, max_size=8),
       ivs=st.lists(st.tuples(times, times), max_size=5))
def test_bucketed_interval_join_matches_bruteforce(spark, pts, ivs):
    ivs = [(i, min(a, b), max(a, b)) for i, (a, b) in enumerate(ivs)]
    pdf = spark.createDataFrame([(t,) for t in pts], "time long")
    idf = spark.createDataFrame(ivs, "iv_id long, t_start long, t_end long")
    got = sorted((r["time"], r["iv_id"]) for r in
                 interval_join(pdf, idf, bucket=3).collect())
    want = sorted((t, i) for t in pts for (i, s, e) in ivs if s <= t <= e)
    assert got == want


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(st.text(alphabet="ab ", max_size=12), max_size=8),
       seq_len=st.integers(min_value=1, max_value=7))
def test_pack_sequences_matches_bruteforce(spark, docs, seq_len):
    df = spark.createDataFrame(list(enumerate(docs)),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["token_offset"],
                         r["first_seq"], r["last_seq"])
           for r in pack_sequences(df, seq_len=seq_len).collect()}
    off = 0
    for i, text in enumerate(docs):
        n = len(text.split())
        last_tok = off + n - 1 if n > 0 else off
        assert got[i] == (n, off, off // seq_len, last_tok // seq_len), \
            (i, text, got[i])
        off += n


def test_acf_matches_python_reference(spark):
    """Randomized series: ACF must match the direct Box-Jenkins formula
    computed in Python (float tolerance — the oracle gate covers bit
    exactness; this guards the *formula* against an oracle that merely
    replays a shared mistake, the LTTB lesson from round 4)."""
    import random

    from influxdb_ha_spark.operators.timeseries import acf

    rng = random.Random(3)
    B = 10 ** 9
    series = {"s1": [rng.uniform(0, 100) for _ in range(40)],
              "s2": [rng.uniform(-5, 5) for _ in range(25)]}
    rows = [(i * B + (7 if k == "s2" else 0), v, k)
            for k, vs in series.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {(r["tag"], r["lag"]): r["acf"] for r in
           acf(df, by=["tag"], value_col="value", bucket_ns=B,
               max_lag=5).collect()}
    for k, vs in series.items():
        xbar = sum(vs) / len(vs)
        den = sum((x - xbar) ** 2 for x in vs)
        for lag in range(1, 6):
            num = sum((vs[i] - xbar) * (vs[i + lag] - xbar)
                      for i in range(len(vs) - lag))
            assert abs(out[(k, lag)] - num / den) < 1e-5, (k, lag)


def test_cross_correlate_matches_python_reference(spark):
    import random

    from influxdb_ha_spark.operators.timeseries import cross_correlate

    rng = random.Random(9)
    B = 10 ** 9
    a = [rng.uniform(0, 10) for _ in range(30)]
    b = [rng.uniform(0, 10) for _ in range(30)]
    rows = ([(i * B, a[i], "a") for i in range(30)]
            + [(i * B, b[i], "b") for i in range(30)])
    df = spark.createDataFrame(rows, "time long, value double, k string")
    out = {r["lag"]: r["xcorr"] for r in
           cross_correlate(df, "a", "b", key_col="k", bucket_ns=B,
                           max_lag=3).collect()}
    abar, bbar = sum(a) / len(a), sum(b) / len(b)
    da = sum((x - abar) ** 2 for x in a) ** 0.5
    db = sum((x - bbar) ** 2 for x in b) ** 0.5
    for lag in range(-3, 4):
        num = sum((a[i] - abar) * (b[i + lag] - bbar)
                  for i in range(30) if 0 <= i + lag < 30)
        assert abs(out[lag] - num / da / db) < 1e-5, lag


def test_cusum_matches_python_reference(spark):
    """Randomized fold equality against a direct Python replay of
    Page's recurrence (guards operator + oracle against shared drift)."""
    import random

    from influxdb_ha_spark.operators.timeseries import cusum

    rng = random.Random(21)
    B = 10 ** 9
    vs = [rng.uniform(0, 40) for _ in range(60)]
    df = spark.createDataFrame([(i * B, v, "x") for i, v in enumerate(vs)],
                               "time long, value double, tag string")
    mu, k, h = 20.0, 3.0, 30.0
    got = sorted(cusum(df, by=["tag"], value_col="value", slack=k,
                       threshold=h, target=mu).collect(),
                 key=lambda r: r["time"])
    sp = sn = 0.0
    alarm = False
    for r, x in zip(got, vs):
        if alarm:
            sp = sn = 0.0
        sp = max(0.0, sp + (x - mu - k))
        sn = max(0.0, sn + (mu - x - k))
        alarm = sp > h or sn > h
        assert (r["s_pos"], r["s_neg"], r["alarm"]) == (sp, sn, alarm)
    assert any(r["alarm"] for r in got)


# --- BPE trainer property: arbitrary tiny corpora match the reference ---

def _ref_bpe(texts, n):
    from collections import Counter
    words = Counter(w for t in texts for w in t.split())
    vocab = {tuple(w) + ("</w>",): c for w, c in words.items()}
    merges = []
    for rank in range(1, n + 1):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, c))
        nv = {}
        for syms, cnt in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nv[tuple(out)] = nv.get(tuple(out), 0) + cnt
        vocab = nv
    return merges, {w: len(w) for w in vocab}  # syms tuples -> lengths


@given(st.lists(
    st.lists(st.text(alphabet="ab1", min_size=1, max_size=5),
             min_size=1, max_size=6).map(" ".join),
    min_size=1, max_size=4),
    st.integers(min_value=1, max_value=6))
@settings(max_examples=8, deadline=None)
def test_bpe_train_property(spark, texts, n_merges):
    """The tiny 'ab1' alphabet forces heavy pair collisions, overlap
    runs (aaa...), early merge exhaustion, and tie-breaks — the merge
    list must still equal the reference exactly."""
    from influxdb_ha_spark.operators.text import bpe_train
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe_train(df, n_merges=n_merges).collect()]
    want, _ = _ref_bpe(texts, n_merges)
    assert got == want


# --- trend-inference trio: tie-heavy series vs brute references ---

@given(st.lists(st.integers(0, 3).map(float), min_size=1, max_size=14))
@settings(max_examples=8, deadline=None)
def test_mann_kendall_and_pettitt_property(spark, vals):
    """Tiny integer-valued series force heavy ties: S, the tie-corrected
    variance path (via z), and Pettitt's exact U_t/K/argmax must all
    match brute-force references. min_size=1 pins the r5 verdict-#1
    contract: a pairless series reports s=0/z=0, never vanishes."""
    from influxdb_ha_spark.operators.timeseries import (mann_kendall,
                                                        pettitt_test)
    B = 10 ** 9
    n = len(vals)
    df = spark.createDataFrame(
        [(i * B, v, "s") for i, v in enumerate(vals)],
        "time long, value double, tag string")

    mk = mann_kendall(df, by=["tag"], value_col="value",
                      bucket_ns=B).collect()[0]
    s_ref = sum((vals[j] > vals[i]) - (vals[j] < vals[i])
                for i in range(n) for j in range(i + 1, n))
    assert mk["s"] == s_ref
    from collections import Counter
    tie = sum(t * (t - 1) * (2 * t + 5)
              for t in Counter(vals).values())
    var = (n * (n - 1) * (2 * n + 5) - tie) / 18.0
    if var > 0:
        z_ref = ((s_ref - 1) / var ** 0.5 if s_ref > 0 else
                 (s_ref + 1) / var ** 0.5 if s_ref < 0 else 0.0)
        assert abs(mk["z"] - z_ref) < 1e-6
    else:
        assert mk["z"] == 0.0

    pt = pettitt_test(df, by=["tag"], value_col="value",
                      bucket_ns=B).collect()[0]
    us = [sum((vals[j] > vals[i]) - (vals[j] < vals[i])
              for i in range(t + 1) for j in range(t + 1, n))
          for t in range(n)]
    k_ref = max(abs(u) for u in us)
    t_ref = min(t for t, u in enumerate(us) if abs(u) == k_ref)
    assert (pt["k"], pt["change_bucket"] // B, pt["u_at_k"]) == \
        (k_ref, t_ref, us[t_ref])


@given(st.lists(st.integers(0, 3).map(float), min_size=1, max_size=12),
       st.integers(min_value=2, max_value=6))
@settings(max_examples=8, deadline=None)
def test_seasonal_mk_property(spark, vals, period):
    """Seasonal MK S must equal the sum of per-season brute S, and z the
    integer-numerator Hirsch–Slack variance — including period >= n and
    n=1, where every season is pairless and the contract row is
    s=0/z=0/trend=false (the r5 silent-series-drop regression)."""
    from influxdb_ha_spark.operators.timeseries import seasonal_mann_kendall
    B = 10 ** 9
    df = spark.createDataFrame(
        [(i * B, v, "s") for i, v in enumerate(vals)],
        "time long, value double, tag string")
    rows = seasonal_mann_kendall(df, by=["tag"], value_col="value",
                                 bucket_ns=B, period=period).collect()
    assert len(rows) == 1          # output cardinality == |series|, always
    got = rows[0]
    from collections import Counter
    s_ref, vn, tc = 0, 0, 0
    for p in range(period):
        sv = [v for i, v in enumerate(vals) if i % period == p]
        np_ = len(sv)
        s_ref += sum((sv[j] > sv[i]) - (sv[j] < sv[i])
                     for i in range(np_) for j in range(i + 1, np_))
        vn += np_ * (np_ - 1) * (2 * np_ + 5)
        tc += sum(t * (t - 1) * (2 * t + 5)
                  for t in Counter(sv).values())
    assert got["s"] == s_ref
    var = (vn - tc) / 18.0
    if var > 0:
        z_ref = ((s_ref - 1) / var ** 0.5 if s_ref > 0 else
                 (s_ref + 1) / var ** 0.5 if s_ref < 0 else 0.0)
        assert abs(got["z"] - z_ref) < 1e-6
    else:
        assert got["z"] == 0.0 and not got["trend"]
