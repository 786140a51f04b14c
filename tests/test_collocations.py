"""pmi_collocations (operators/text.py) on a hand-counted corpus."""

import math

import pytest

from influxdb_ha_spark.operators.text import pmi_collocations


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_pmi_hand_counts(spark):
    # corpus: "a b" x 6 -> tokens: 6 docs of [a, b]
    # T = 12, B = 6, c_ab = 6, c_a = c_b = 6
    # PMI = ln 6 + 2 ln 12 - ln 6 - ln 6 - ln 6 = 2 ln 12 - 2 ln 6 = 2 ln 2
    df = _docs(spark, ["a b"] * 6)
    rows = pmi_collocations(df, min_count=5).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.w1, r.w2, r.n_pair, r.n_w1, r.n_w2) == ("a", "b", 6, 6, 6)
    assert r.pmi == pytest.approx(2 * math.log(2), abs=2e-6)


def test_pmi_support_floor(spark):
    # "c d" appears 3 times: below min_count=5 -> dropped
    df = _docs(spark, ["a b"] * 5 + ["c d"] * 3)
    got = {(r.w1, r.w2) for r in pmi_collocations(df, min_count=5).collect()}
    assert got == {("a", "b")}
    got4 = {(r.w1, r.w2) for r in pmi_collocations(df, min_count=3).collect()}
    assert got4 == {("a", "b"), ("c", "d")}


def test_pmi_negative_for_anti_collocation(spark):
    # x and y are frequent but never adjacent to each other more than
    # chance: "x x x x x" and "y y y y y" docs plus a few "x y" bridges
    df = _docs(spark, ["x x x x x"] * 4 + ["y y y y y"] * 4 + ["x y"] * 5)
    rows = {(r.w1, r.w2): r.pmi
            for r in pmi_collocations(df, min_count=5).collect()}
    # (x,x) within-doc repetition is a strong collocation; the sparse
    # x-y bridge scores below it
    assert rows[("x", "x")] > rows[("x", "y")]


def test_pmi_empty_corpus(spark):
    df = _docs(spark, [])
    assert pmi_collocations(df).count() == 0


def test_tfidf_keywords_hand_corpus(spark):
    import math
    from influxdb_ha_spark.operators.text import tfidf_keywords
    docs = _docs(spark, ["x apple apple banana", "x banana cherry",
                         "x cherry cherry cherry"])
    rows = tfidf_keywords(docs, k=5).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.token] = r
    # doc 0: apple tf=2 df=1 -> 2*ln3 ranks first
    top0 = min(by_doc[0].values(), key=lambda r: r.rank)
    assert top0.token == "apple" and top0.tf == 2 and top0.df == 1
    assert top0.tfidf == pytest.approx(2 * math.log(3), abs=2e-6)
    # 'x' appears in every doc -> idf = 0 -> tfidf exactly 0
    assert all(by_doc[d]["x"].tfidf == 0.0 for d in by_doc)
    # doc 2: cherry tf=3 df=2 -> 3*(ln3-ln2) top
    top2 = min(by_doc[2].values(), key=lambda r: r.rank)
    assert top2.token == "cherry"
    assert top2.tfidf == pytest.approx(3 * (math.log(3) - math.log(2)),
                                       abs=2e-6)


def test_tfidf_keywords_k_bound_and_empty(spark):
    from influxdb_ha_spark.operators.text import tfidf_keywords
    docs = _docs(spark, ["a b c d e f g h"])
    assert tfidf_keywords(docs, k=3).count() == 3
    assert tfidf_keywords(_docs(spark, []), k=3).count() == 0
