"""Hard evidence for the oracle-less fast-path dedup key (VERDICT r4 #4).

`doc_near_dups_fast` is ROWS_ONLY in the driver contract: its xxhash64
signature hashing has no DuckDB mirror. Its correctness evidence is this
pin instead: the exact-Jaccard VERIFY stage runs on every LSH candidate
pair, so the signature hash function can only affect LSH recall, never a
reported pair's jaccard value. On the sf0.01 gate data both hash choices
must surface the identical verified pair set as the fully oracle-gated
md5 twin `doc_near_dups`.
"""

import os

import pytest

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="gate data absent")
def test_fast_path_pairs_match_md5_twin(spark):
    import __spark_entry__ as entry

    qs = entry.queries()
    fast = {(r["id_a"], r["id_b"], r["jaccard"])
            for r in qs["doc_near_dups_fast"](spark, SF_DIR).collect()}
    md5 = {(r["id_a"], r["id_b"], r["jaccard"])
           for r in qs["doc_near_dups"](spark, SF_DIR).collect()}
    assert len(md5) > 0, "gate data should contain planted near-dups"
    assert fast == md5, (
        f"fast-only: {sorted(fast - md5)[:5]} md5-only: {sorted(md5 - fast)[:5]}")


def test_novelty_profile_hand_golden(spark):
    from influxdb_ha_spark.operators.dedup import novelty_profile
    docs = spark.createDataFrame(
        [(1, "a b c d"),        # shingles {abc, bcd} -> both novel
         (2, "a b c d"),        # exact clone -> nothing novel
         (3, "a b c x"),        # {abc(bcx owned by 1), bcx novel} -> 0.5
         (4, "a b"),            # < 3 tokens -> no shingles, NULL novelty
         (5, None)],            # NULL text excluded entirely
        "doc_id long, text string")
    rows = {r.doc_id: r for r in novelty_profile(docs).collect()}
    assert set(rows) == {1, 2, 3, 4}
    assert (rows[1].n_shingles, rows[1].n_novel, rows[1].novelty) == (2, 2, 1.0)
    assert (rows[2].n_shingles, rows[2].n_novel, rows[2].novelty) == (2, 0, 0.0)
    assert (rows[3].n_shingles, rows[3].n_novel, rows[3].novelty) == (2, 1, 0.5)
    assert (rows[4].n_shingles, rows[4].n_novel, rows[4].novelty) == (0, 0, None)
    # repeated shingles inside ONE doc count once (per-doc distinct)
    rep = spark.createDataFrame([(1, "a b c a b c a b c")],
                                "doc_id long, text string")
    r = novelty_profile(rep).collect()[0]
    # tokens a b c a b c a b c -> distinct 3-shingles {abc, bca, cab}
    assert r.n_shingles == 3 and r.n_novel == 3 and r.novelty == 1.0


def test_dedup_threshold_sweep_golden(spark):
    from influxdb_ha_spark.operators.dedup import dedup_threshold_sweep
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "alpha beta gamma delta epsilon zeta"),   # exact clone
         (3, "one two three four five six seven")],    # unrelated
        "doc_id long, text string")
    rows = {r.threshold: (r.n_pairs, r.n_docs)
            for r in dedup_threshold_sweep(docs).collect()}
    assert set(rows) == {0.5, 0.6, 0.7, 0.8, 0.9, 1.0}
    # identical docs: est_jaccard 1.0 -> the pair survives EVERY cutoff,
    # touching exactly docs {1, 2}; doc 3 never appears
    for t in rows:
        assert rows[t] == (1, 2), t


def test_setsim_exact_hand_checked(spark):
    """a={w1..w5}, b={w1..w4,x} -> inter 4, union 6, J=2/3: kept at
    t=3/5, dropped at t=7/10; c disjoint never pairs."""
    from influxdb_ha_spark.operators.dedup import setsim_exact_join
    docs = spark.createDataFrame(
        [(1, "w1 w2 w3 w4 w5"), (2, "w1 w2 w3 w4 x"),
         (3, "p q r s t")], "doc_id long, text string")
    got = setsim_exact_join(docs, t_num=3, t_den=5).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b, r.size_a, r.size_b, r.n_common) == \
        (1, 2, 5, 5, 4)
    assert r.jaccard == round(4 / 6, 6)
    assert setsim_exact_join(docs, t_num=7, t_den=10).count() == 0


def test_setsim_exact_lossless_vs_brute_force(spark):
    """Prefix filtering must return EXACTLY the brute-force pair set —
    the losslessness theorem checked on a corpus with duplicate
    clusters, subset docs, and singletons."""
    from pyspark.sql import functions as F

    from influxdb_ha_spark.operators.dedup import setsim_exact_join
    texts = {
        1: "alpha beta gamma delta epsilon",
        2: "alpha beta gamma delta zeta",
        3: "alpha beta gamma delta epsilon",     # clone of 1
        4: "alpha beta",                         # subset, fails size
        5: "one two three four five six",
        6: "one two three four five seven",
        7: "lonely",
    }
    docs = spark.createDataFrame(list(texts.items()),
                                 "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in
           setsim_exact_join(docs, t_num=7, t_den=10).collect()}
    # brute force in python
    toks = {i: set(t.split()) for i, t in texts.items()}
    want = set()
    for a in toks:
        for b in toks:
            if a < b:
                inter = len(toks[a] & toks[b])
                union = len(toks[a] | toks[b])
                if 10 * inter >= 7 * union:
                    want.add((a, b))
    assert got == want and (1, 3) in got


def test_setsim_exact_singleton_and_empty_docs(spark):
    """Single-token docs keep prefix 1 (identical singletons pair at
    J=1); empty-token docs are excluded entirely."""
    from influxdb_ha_spark.operators.dedup import setsim_exact_join
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "solo"), (3, "   "), (4, "!!!")],
        "doc_id long, text string")
    got = setsim_exact_join(docs, t_num=1, t_den=1).collect()
    assert len(got) == 1
    assert (got[0].id_a, got[0].id_b, got[0].jaccard) == (1, 2, 1.0)


def test_setsim_exact_validation(spark):
    from influxdb_ha_spark.operators.dedup import setsim_exact_join
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="t_num"):
        setsim_exact_join(docs, t_num=0, t_den=10)
    with pytest.raises(ValueError, match="t_num"):
        setsim_exact_join(docs, t_num=11, t_den=10)
