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
