"""Corpus pipeline operators: chunking boundary semantics."""


def test_chunk_documents_boundaries(spark):
    from influxdb_ha_spark.operators.pipeline import chunk_documents
    import pytest as _pt
    docs = [
        (1, " ".join(f"w{i}" for i in range(10))),   # 10 toks: 2 chunks
        (2, "a b c"),                                 # short: 1 chunk
        (3, ""),                                      # zero toks: drops
        (4, None),                                    # null: drops
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=6, overlap=2).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"],
                                           r["chunk_text"]) for r in out}
    # doc1: stride 4, starts while <= 10-2=8 -> 1, 5 (start 9 excluded)
    assert got[(1, 0)] == (6, "w0 w1 w2 w3 w4 w5")
    assert got[(1, 1)] == (6, "w4 w5 w6 w7 w8 w9")   # 2-token overlap
    assert got[(2, 0)] == (3, "a b c")
    assert set(got) == {(1, 0), (1, 1), (2, 0)}
    with _pt.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(st.text(alphabet="ab ", max_size=30), max_size=6),
       chunk=st.integers(min_value=2, max_value=8),
       overlap=st.integers(min_value=0, max_value=3))
def test_chunk_documents_matches_reference(spark, texts, chunk, overlap):
    from influxdb_ha_spark.operators.pipeline import chunk_documents
    if overlap >= chunk:
        return
    import re
    stride = chunk - overlap
    expect = {}
    for i, tx in enumerate(texts):
        toks = [t for t in re.split(r"[^a-z0-9]+", tx.lower()) if t]
        if not toks:
            continue
        starts = range(0, max(1, len(toks) - overlap), stride)
        for ci, s0 in enumerate(starts):
            piece = toks[s0:s0 + chunk]
            expect[(i, ci)] = (len(piece), " ".join(piece))
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = chunk_documents(df, chunk_tokens=chunk, overlap=overlap).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["n_chunk_tokens"],
                                           r["chunk_text"]) for r in out}
    assert got == expect


def test_remove_boilerplate_c4_semantics(spark):
    from influxdb_ha_spark.operators.text import remove_boilerplate
    bp = "subscribe now"
    docs = [
        (1, f"unique alpha. {bp}. body one"),
        (2, f"{bp}. unique beta! also unique"),
        (3, f"unique gamma? {bp}"),
        (4, "Subscribe   NOW. fresh text"),   # case/space-folded match
        (5, ""),                               # empty -> 0/0/''
        (6, None),                             # null text drops entirely
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_boilerplate(df, max_df=2).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # the df=4 sentence is stripped everywhere, order preserved
    assert out[1]["clean_text"] == "unique alpha body one"
    assert out[2]["clean_text"] == "unique beta also unique"
    assert out[3]["clean_text"] == "unique gamma"
    assert out[4]["clean_text"] == "fresh text"
    assert (out[1]["n_sentences"], out[1]["n_kept"]) == (3, 2)
    assert (out[5]["n_sentences"], out[5]["n_kept"],
            out[5]["clean_text"]) == (0, 0, "")
    # below the threshold nothing is removed
    out2 = {r["doc_id"]: r for r in
            remove_boilerplate(df, max_df=10).collect()}
    assert out2[1]["n_kept"] == 3


@settings(max_examples=12, deadline=None)
@given(texts=st.lists(st.text(alphabet="ab.! ", max_size=25), max_size=6),
       max_df=st.integers(min_value=1, max_value=3))
def test_remove_boilerplate_matches_reference(spark, texts, max_df):
    from influxdb_ha_spark.operators.text import remove_boilerplate
    import re
    if not texts:
        return
    split = lambda t: re.split(r"[.!?]+\s+", t)   # noqa: E731
    key = lambda s: re.sub(r"\s+", " ", s.strip().lower())  # noqa: E731
    pieces = {i: [(idx, s) for idx, s in enumerate(split(t))
                  if s.strip()]
              for i, t in enumerate(texts)}
    dfreq = {}
    for i, ps in pieces.items():
        for k in {key(s) for _, s in ps}:
            dfreq[k] = dfreq.get(k, 0) + 1
    flagged = {k for k, c in dfreq.items() if c > max_df}
    expect = {}
    for i, ps in pieces.items():
        kept = [(idx, s.strip()) for idx, s in ps
                if key(s) not in flagged]
        expect[i] = (len(ps), len(kept),
                     " ".join(s for _, s in sorted(kept)))
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_sentences"], r["n_kept"], r["clean_text"])
           for r in remove_boilerplate(df, max_df=max_df).collect()}
    assert got == expect


def test_line_filter_c4_rules(spark):
    from influxdb_ha_spark.operators.text import line_filter
    docs = [
        (1, "a good long line here\nno\nhas { brace } in it\n"
            "contains Lorem Ipsum filler\nanother fine line yes"),
        (2, "   \n\n"),                       # only blanks -> 0/0/''
        (3, None),                             # drops
        (4, "Ends with punctuation.\nends without punctuation here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in line_filter(df, min_words=3).collect()}
    assert set(out) == {1, 2, 4}
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (5, 2)
    assert out[1]["clean_text"] == ("a good long line here "
                                    "another fine line yes")
    assert (out[2]["n_lines"], out[2]["n_kept"],
            out[2]["clean_text"]) == (0, 0, "")
    # strict C4 terminal-punctuation rule
    strict = {r["doc_id"]: r for r in
              line_filter(df, min_words=3,
                          require_terminal_punct=True).collect()}
    assert strict[4]["n_kept"] == 1
    assert strict[4]["clean_text"] == "Ends with punctuation."


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(st.text(alphabet="abe.! iy", max_size=30),
                      max_size=6))
def test_readability_matches_reference(spark, texts):
    from influxdb_ha_spark.operators.text import readability
    import re
    if not texts:
        return
    expect = {}
    for i, t in enumerate(texts):
        toks = [w for w in re.split(r"[^a-z0-9]+", t.lower()) if w]
        n_w = len(toks)
        n_s = max(1, len(re.findall(r"[.!?]+", t)))
        syl = sum(max(1, len(re.findall(r"[aeiouy]+", w))) for w in toks)
        if n_w:
            wps, spw = n_w / n_s, syl / n_w
            import math
            r6 = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # noqa: E731
            fl = r6(206.835 - 1.015 * wps - 84.6 * spw)
            fk = r6(0.39 * wps + 11.8 * spw - 15.59)
        else:
            fl = fk = None
        expect[i] = (n_w, n_s, syl, fl, fk)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_words"], r["n_sentences"], r["n_syllables"],
                         r["flesch"], r["fk_grade"])
           for r in readability(df).collect()}
    assert got == expect


def test_quality_sample_threshold_semantics(spark):
    from influxdb_ha_spark.operators.pipeline import quality_sample
    import pytest as _pt
    docs = [(i, ("the and of to in is that it was for "
                 "good words here" * (i + 1))[:200]) for i in range(6)]
    docs.append((99, None))                     # null text drops
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = quality_sample(df, keep_frac=0.5).collect()
    ids = {r["doc_id"] for r in out}
    assert 99 not in ids and len(out) == 6
    thr = {r["threshold"] for r in out}
    assert len(thr) == 1                        # one global threshold
    for r in out:
        assert r["keep"] == (r["quality"] >= r["threshold"])
    assert any(r["keep"] for r in out) and len(out) > 0
    # keep_frac=1.0 keeps everything (threshold = min)
    all_keep = quality_sample(df, keep_frac=1.0).collect()
    assert all(r["keep"] for r in all_keep)
    with _pt.raises(ValueError):
        quality_sample(df, keep_frac=0.0)


def test_ngram_counts_totals_and_df(spark):
    from influxdb_ha_spark.operators.pipeline import ngram_counts
    docs = [(1, "a b a b a b"),    # 'a b' x3, 'b a' x2 in doc 1
            (2, "a b c"),          # 'a b' x1, 'b c' x1
            (3, None)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["gram"]: (r["n_total"], r["n_docs"])
           for r in ngram_counts(df, n=2, min_count=2).collect()}
    assert got == {"a b": (4, 2), "b a": (2, 1)}   # 'b c' below floor


def test_shard_assign_deterministic_permutation(spark):
    """Same input -> identical (shard, pos) across partitionings; every
    id appears once; pos is 1..n_shard within each shard; a different
    salt yields a different permutation."""
    from influxdb_ha_spark.operators.pipeline import shard_assign
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r.doc_id: (r.shard, r.pos) for r in
         shard_assign(df.repartition(1), shards=4).collect()}
    b = {r.doc_id: (r.shard, r.pos) for r in
         shard_assign(df.repartition(13), shards=4).collect()}
    assert a == b and len(a) == 200
    from collections import Counter
    per_shard = Counter(s for s, _ in a.values())
    for s, n in per_shard.items():
        got_pos = sorted(p for sh, p in a.values() if sh == s)
        assert got_pos == list(range(1, n + 1))
    salted = {r.doc_id: (r.shard, r.pos) for r in
              shard_assign(df, shards=4, salt="epoch2:").collect()}
    assert salted != a


def test_shard_assign_fast_path_and_validation(spark):
    import pytest

    from influxdb_ha_spark.operators.pipeline import shard_assign
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    fast = shard_assign(df, shards=4, hash_fn="fast").collect()
    assert len(fast) == 50
    with pytest.raises(ValueError, match="shards"):
        shard_assign(df, shards=0)
    with pytest.raises(ValueError, match="hash_fn"):
        shard_assign(df, hash_fn="sha9000")
