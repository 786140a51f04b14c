"""Property tests: BM25, SemDeDup semantic dedup and MAD outliers agree
with brute-force single-machine references on arbitrary small inputs.
Generators favor collisions (tiny vocab / integer-grid vectors) so ties,
empty docs and zero-MAD series actually occur."""

import math

from hypothesis import given, settings, strategies as st

from influxdb_ha_spark.operators.similarity import semantic_dedup
from influxdb_ha_spark.operators.text import bm25_topk
from influxdb_ha_spark.operators.timeseries import mad_outliers

words = st.sampled_from(["cat", "dog", "fish"])
texts = st.lists(words, max_size=6).map(" ".join)


def _bm25_ref(docs, qterms, k1=1.2, b=0.75):
    toks = {i: t.split() for i, t in docs}
    n = len(docs) or 1
    avgdl = sum(len(v) for v in toks.values()) / n
    scores = {}
    for i, t in docs:
        s = 0.0
        for q in sorted(set(qterms)):
            df_q = sum(1 for v in toks.values() if q in v)
            tf = float(toks[i].count(q))
            idf = math.log((n - df_q + 0.5) / (df_q + 0.5) + 1.0)
            s = s + idf * (tf * 2.2) / (tf + k1 * (1 - b + b * len(toks[i]) / avgdl)) \
                if avgdl else s
        if round(s, 6) > 0:
            scores[i] = round(s, 6)
    return scores


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(texts, min_size=1, max_size=6),
       q=st.lists(words, min_size=1, max_size=2))
def test_bm25_matches_bruteforce(spark, docs, q):
    rows = [(i, t) for i, t in enumerate(docs) if t.strip()]
    if not rows:
        return
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_topk(df, " ".join(q), k=100).collect()}
    want = _bm25_ref(rows, q)
    assert set(got) == set(want)
    for i in want:
        assert abs(got[i] - want[i]) < 1e-9, (i, got[i], want[i])


vec = st.tuples(st.integers(0, 3), st.integers(0, 3)).filter(
    lambda v: v != (0, 0))


@settings(max_examples=10, deadline=None)
@given(vs=st.lists(vec, min_size=1, max_size=7),
       eps=st.sampled_from([0.8, 0.95, 0.999]))
def test_semantic_dedup_matches_greedy_reference(spark, vs, eps):
    rows = [(i, [float(a), float(b)]) for i, (a, b) in enumerate(vs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])],
        "centroid_id long, embedding array<double>")

    def cos(a, b):
        dot = a[0] * b[0] + a[1] * b[1]
        return dot / (math.hypot(*a) * math.hypot(*b))

    # reference replay: assignment = argmax cosine, lowest centroid wins
    # ties; b removed iff any smaller-id same-cluster row >= eps
    cl = {}
    for i, v in rows:
        c0, c1 = cos(v, [1.0, 0.0]), cos(v, [0.0, 1.0])
        cl[i] = 0 if c0 >= c1 else 1
    want = [i for i, v in rows
            if not any(j < i and cl[j] == cl[i]
                       and round(cos(dict(rows)[j], v), 6) >= eps
                       for j, _ in rows)]
    got = sorted(r["vec_id"] for r in
                 semantic_dedup(df, cents, eps=eps).collect())
    assert got == sorted(want)
    # survivor invariant: no same-cluster survivor pair >= eps
    for a in got:
        for b in got:
            if a < b and cl[a] == cl[b]:
                assert round(cos(dict(rows)[a], dict(rows)[b]), 6) < eps


@settings(max_examples=10, deadline=None)
@given(vals=st.lists(st.integers(-5, 5).map(float), min_size=1, max_size=9),
       spike=st.booleans())
def test_mad_outliers_matches_reference(spark, vals, spike):
    if spike:
        vals = vals + [1000.0]
    df = spark.createDataFrame(
        [(i, "s", v) for i, v in enumerate(vals)],
        "time long, event_type string, value double")
    got = {r["time"]: (r["robust_z"], r["is_outlier"])
           for r in mad_outliers(df, by=["event_type"]).collect()}
    sv = sorted(vals)
    n = len(sv)
    med = sv[n // 2] if n % 2 else (sv[n // 2 - 1] + sv[n // 2]) / 2
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[n // 2] if n % 2 else (devs[n // 2 - 1] + devs[n // 2]) / 2
    for i, v in enumerate(vals):
        if mad == 0:
            assert got[i] == (None, False)
        else:
            # floor-form round, matching the operator's _fr exactly:
            # hypothesis found 0.6745*997/8 = 84.0595625 sitting ON the
            # .xxxxxx5 boundary, where Python round() and the engine's
            # deliberate floor(x*1e6+0.5) convention disagree
            z = math.floor(0.6745 * (v - med) / mad * 1e6 + 0.5) / 1e6
            assert abs(got[i][0] - z) < 1e-9
            assert got[i][1] == (abs(z) > 3.5)


def test_knn_graph_exact_when_all_buckets_probed(spark):
    """With nprobe = |centroids| every bucket is probed, so the graph
    must equal brute-force top-k exactly (tie-break: cosine desc, id
    asc on round-6 cosines) — checked against a Python reference."""
    import itertools
    import math
    import random

    from influxdb_ha_spark.operators.similarity import knn_graph

    rng = random.Random(11)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(30)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>")
    cent = df.where("vec_id < 2").selectExpr(
        "vec_id AS centroid_id", "embedding")
    out = knn_graph(df, cent, k=3, nprobe=2).collect()

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        return d / (math.sqrt(sum(x * x for x in a))
                    * math.sqrt(sum(x * x for x in b)))

    expect = {}
    for i in vecs:
        nb = sorted(((round(cos(vecs[i], vecs[j]), 6), -j) for j in vecs
                     if j != i), reverse=True)[:3]
        expect[i] = [(-j, c) for c, j in nb]
    got = {}
    for r in sorted(out, key=lambda r: (r["vec_id"], r["rank"])):
        got.setdefault(r["vec_id"], []).append(
            (r["neighbor_id"], r["cosine"]))
    assert got == expect


def test_knn_graph_partitions_by_bucket(spark):
    """With nprobe=1 a vector's candidates stay inside its home bucket:
    two well-separated clusters must never cross-link."""
    from influxdb_ha_spark.operators.similarity import knn_graph
    a = [[1.0, 0.0, float(i) * 0.01, 0.0] for i in range(5)]
    b = [[0.0, 1.0, 0.0, float(i) * 0.01] for i in range(5)]
    rows = [(i, v) for i, v in enumerate(a)] + \
           [(i + 5, v) for i, v in enumerate(b)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cent = spark.createDataFrame(
        [(0, a[0]), (1, b[0])], "centroid_id long, embedding array<double>")
    out = knn_graph(df, cent, k=2, nprobe=1).collect()
    for r in out:
        assert (r["vec_id"] < 5) == (r["neighbor_id"] < 5)


def test_pca_matches_numpy_reference(spark):
    """Trained components/eigenvalues and the distributed projection must
    match numpy PCA of the same data (sign-aligned; PCA components are
    defined up to sign)."""
    import random

    import numpy as np

    from influxdb_ha_spark.operators.similarity import pca_project, pca_train

    rng = random.Random(5)
    # anisotropic cloud: strong variance on a planted direction
    base = np.array([rng.gauss(0, 1) for _ in range(6)])
    X = np.array([[rng.gauss(0, 0.3) for _ in range(6)] for _ in range(80)])
    X += np.outer(np.array([rng.gauss(0, 3) for _ in range(80)]), base)
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>")
    comps, evals, mean, m = pca_train(df, k=3)

    mu = X.mean(axis=0)
    cov = (X - mu).T @ (X - mu) / len(X)
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    np.testing.assert_allclose(np.array(mean), mu, atol=1e-9)
    np.testing.assert_allclose(np.array(evals), w[order], rtol=1e-9)
    for got, want in zip(np.array(comps), v[:, order].T):
        aligned = want if abs(got @ want) == got @ want else -want
        np.testing.assert_allclose(got, aligned, atol=1e-8)
    assert m["trace_ok"] and m["orthonormal_ok"]
    assert m["explained_k"] >= m["axes_var_topk_micro"] / 1e6 - 1e-6

    proj = {r["vec_id"]: [r[f"pc{j}"] for j in range(3)]
            for r in pca_project(df, comps, mean).collect()}
    ref = (X - mu) @ np.array(comps).T
    for i in range(80):
        np.testing.assert_allclose(proj[i], ref[i], atol=1e-8)
