"""LLM-pipeline operator tests: dedup, similarity, text, multimodal."""

import pytest
from pyspark.sql import functions as F

from influxdb_ha_spark.operators import (
    attach_binary_payload, binary_metadata, brute_force_topk, decode_image_stub,
    exact_dedup, fingerprint_dedup, ivf_topk, minhash_candidates,
    minhash_near_duplicates, minhash_signatures, simhash)
from influxdb_ha_spark.operators.text import (
    fingerprint, language_id, quality_score, text_stats, token_count)


@pytest.fixture(scope="module")
def docs(spark):
    base = ("the quick brown fox jumps over the lazy dog and runs far away "
            "today while the sun shines bright over the green valley and the "
            "river flows gently past the old stone bridge near the village")
    rows = [
        (1, base),
        (2, base),                              # exact dup of 1
        (3, base + " suffix"),                  # near-dup of 1 (high jaccard)
        (4, "completely different content about spark query planning engines"),
        (5, "Dog lazy the over jumps fox brown quick the!"),  # reordered words
        (6, "a b"),                             # too short to shingle
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = exact_dedup(docs)
    assert out.count() == 5  # 1&2 collapse
    kept = {r["doc_id"] for r in out.collect()}
    assert 1 in kept and 2 not in kept


def test_fingerprint_dedup(docs):
    out = fingerprint_dedup(docs).collect()
    by_id = {r["doc_id"]: r["n_docs"] for r in out}
    assert by_id[1] == 2  # doc 2 joins doc 1's fingerprint group


def test_minhash_near_dups(docs):
    sigs = minhash_signatures(docs)
    assert sigs.where(F.col("doc_id") == 6).count() == 0  # too short
    assert sigs.first()["signature"].__len__() == 16
    nd = minhash_near_duplicates(docs, threshold=0.5)
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in nd.collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5
    assert not any(4 in p for p in pairs)


def test_simhash_similar_docs_close(docs):
    out = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    assert out[1] == out[2]
    ham_13 = bin(out[1] ^ out[3]).count("1")
    ham_14 = bin(out[1] ^ out[4]).count("1")
    assert ham_13 < ham_14  # near-dup closer than unrelated


def test_brute_force_and_ivf(spark):
    emb = spark.createDataFrame(
        [(i, [float(i == j) for j in range(4)]) for i in range(4)] +
        [(10, [1.0, 0.1, 0.0, 0.0])],
        "vec_id long, embedding array<double>")
    q = emb.where(F.col("vec_id") == 10)
    top = brute_force_topk(emb, q, k=2).collect()
    assert top[0]["neighbor_id"] == 0  # axis-0 vector is nearest
    cent = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding")
    ivf = ivf_topk(emb, q, cent, k=2, nprobe=1).collect()
    assert ivf[0]["neighbor_id"] == 0


def test_text_operators(docs):
    tc = {r["doc_id"]: r["n_tokens"] for r in token_count(docs).collect()}
    assert tc[6] == 2
    st = text_stats(docs).where(F.col("doc_id") == 5).first()
    assert st["punct_ratio"] > 0
    q = {r["doc_id"]: r["quality"] for r in quality_score(docs).collect()}
    assert q[1] > q[6]  # real sentence beats "a b"
    lang = language_id(docs).where(F.col("doc_id") == 1).first()["lang_pred"]
    assert lang == "en"
    fp = fingerprint(docs).collect()
    by_id = {r["doc_id"]: r["fingerprint"] for r in fp}
    assert by_id[1] == by_id[2]


def test_multimodal_plumbing(docs):
    mm = attach_binary_payload(docs, "text")
    assert dict(mm.dtypes)["payload"] == "binary"
    meta = binary_metadata(mm).first()
    assert meta["n_bytes"] > 0 and meta["sniffed_format"] == "unknown"
    # text-only payloads carry no image header → decode_ok false everywhere
    dec = decode_image_stub(mm)
    rows = dec.collect()
    assert len(rows) == 6 and not any(r["decode_ok"] for r in rows)


def test_image_header_roundtrip(docs):
    """synthesize → parse is a real round-trip: dimensions/format/channels
    parsed from the PNG/JPEG/GIF bytes equal the generating arithmetic."""
    from influxdb_ha_spark.operators.multimodal import (
        parse_image_header, synthesize_image_payload)
    mm = synthesize_image_payload(docs, "text")
    sniffed = binary_metadata(mm).select("doc_id", "sniffed_format").collect()
    assert {r["sniffed_format"] for r in sniffed} == {"png", "jpeg", "gif"}
    body_len = {r["doc_id"]: r["n"] for r in docs.selectExpr(
        "doc_id", "octet_length(encode(text, 'utf-8')) AS n").collect()}
    for r in decode_image_stub(mm).collect():
        assert r["decode_ok"], r
        assert r["width"] == r["doc_id"] % 4096 + 1
        assert r["height"] == body_len[r["doc_id"]] % 4096 + 1
        want_fmt = ["png", "jpeg", "gif"][r["doc_id"] % 3]
        assert r["format"] == want_fmt
        assert r["channels"] == (4 if want_fmt == "png" else 3)
    # parser rejects junk rather than guessing
    assert parse_image_header(b"not an image at all") is None
    assert parse_image_header(b"\xff\xd8\xff\xe0\x00\x04ab") is None


def test_wav_roundtrip(docs):
    """synthesize_wav → parse_wav → RMS is a real DSP round-trip: the
    chunk walk recovers the header fields and the windowed RMS of the
    ±amp square wave equals amp exactly."""
    import math

    from influxdb_ha_spark.operators.multimodal import (
        audio_features, parse_wav, synthesize_wav_payload)
    wav = synthesize_wav_payload(docs)
    raw = bytes(wav.where("doc_id = 3").first()["payload"])
    parsed = parse_wav(raw)
    assert parsed is not None
    rate, ch, bits, pcm = parsed
    assert (rate, ch, bits) == (8000, 1, 16)
    assert len(pcm) == (3 % 50 + 20) * 4
    amp = (3 * 97) % 30000 + 1000
    want = math.floor(amp / 32768.0 * 1e6 + 0.5) / 1e6
    feats = audio_features(wav).where("doc_id = 3").collect()
    assert len(feats) == math.ceil((3 % 50 + 20) * 2 / 16)
    assert all(r["energy"] == want and r["sample_rate"] == 8000
               for r in feats)
    assert parse_wav(b"RIFFxxxxJUNK") is None
    assert parse_wav(b"") is None


def test_gif_frame_walk(docs):
    """synthesize_gif_animation → parse_gif_frames walks the real block
    structure: frame count and per-frame dims match the synthesis."""
    from influxdb_ha_spark.operators.multimodal import (
        frame_sample, parse_gif_frames, synthesize_gif_animation)
    gif = synthesize_gif_animation(docs)
    raw = bytes(gif.where("doc_id = 5").first()["payload"])
    frames = parse_gif_frames(raw)
    assert frames is not None and len(frames) == 5 % 10 + 1
    assert frames[0] == (5 % 256 + 1, (5 * 7) % 256 + 1)
    # extension blocks are skipped, truncated payloads rejected
    with_ext = raw[:13] + b"\x21\xf9\x04ABCD\x00" + raw[13:]
    assert parse_gif_frames(with_ext) == frames
    assert parse_gif_frames(raw[:20]) is None
    assert parse_gif_frames(b"GIF89a") is None
    out = {r["doc_id"]: r for r in frame_sample(gif, every_n=2).collect()}
    assert out[5]["n_frames"] == 6 and out[5]["frame_w"] == 6


def test_dedup_apply(docs):
    """The materialized dedup keeps each cluster's min id + singletons:
    docs 1,2,3 form a near-dup cluster (1 survives), everything else
    passes through."""
    from influxdb_ha_spark.operators.dedup import (dedup_apply,
                                                   minhash_near_duplicates)
    pairs = minhash_near_duplicates(docs, threshold=0.7)
    clustered = {r["id_a"] for r in pairs.collect()} | \
                {r["id_b"] for r in pairs.collect()}
    assert {1, 2, 3} <= clustered
    kept = sorted(r["doc_id"] for r in dedup_apply(docs, pairs).collect())
    assert 1 in kept and 2 not in kept and 3 not in kept
    assert set(kept) | {2, 3} == {r["doc_id"] for r in docs.collect()}


def test_bmp_resize_roundtrip(docs):
    """synthesize_bmp → parse_bmp → resize_image is END-TO-END real: the
    parsed raster equals the generating pattern (through bottom-up row
    storage and 4-byte stride padding) and the nearest-neighbor resample
    matches a closed-form recomputation."""
    from influxdb_ha_spark.operators.multimodal import (
        parse_bmp, resize_image, synthesize_bmp_payload)
    bmp = synthesize_bmp_payload(docs)
    raw = bytes(bmp.where("doc_id = 5").first()["payload"])
    parsed = parse_bmp(raw)
    assert parsed is not None
    w, h, px = parsed
    assert (w, h) == (5 % 16 + 4, 5 % 12 + 3)
    for yy in range(h):
        for xx in range(w):
            assert px[yy, xx, 0] == (xx * 7 + yy * 13 + 5) % 256
    out = {r["doc_id"]: r for r in
           resize_image(bmp, target=(8, 8)).collect()}
    r5 = out[5]
    xs = [(x * w) // 8 for x in range(8)]
    ys = [(y * h) // 8 for y in range(8)]
    vals = [(sx * 7 + sy * 13 + 5) % 256 for sy in ys for sx in xs]
    assert r5["mean_px"] == round(sum(vals) / len(vals), 6)
    assert r5["corner_px"] == (xs[-1] * 7 + ys[-1] * 13 + 5) % 256
    assert len(out) == 6
    # malformed payloads rejected, not guessed
    assert parse_bmp(b"BMshort") is None
    assert parse_bmp(b"\x00" * 60) is None
    assert parse_bmp(raw[:40]) is None


def test_minhash_candidates_truncation_flag(docs):
    sigs = minhash_signatures(docs)
    cands = minhash_candidates(sigs, max_bucket=2)
    assert "truncated" in cands.columns


def test_cosine_near_dup_lsh_finds_planted_pairs(spark):
    """Plant 5 near-duplicate vector pairs among 100 random vectors; the
    LSH path must recover exactly the planted pairs (verified cosine makes
    precision exact; recall is checked empirically here)."""
    import random
    from influxdb_ha_spark.operators import similarity as S
    rng = random.Random(3)
    rows = []
    for i in range(100):
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)]))
    for j in range(5):  # ids 100+j are tiny perturbations of ids j
        base = rows[j][1]
        rows.append((100 + j, [x + rng.gauss(0, 0.01) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = S.cosine_near_dup_pairs(df, threshold=0.95).collect()
    found = {(r.id_a, r.id_b) for r in out}
    assert found == {(j, 100 + j) for j in range(5)}
    for r in out:
        assert r.cosine >= 0.99


def test_kmeans_centroids_separates_blobs(spark):
    """Lloyd's k-means recovers two well-separated clusters."""
    import random
    from influxdb_ha_spark.operators import similarity as S
    rng = random.Random(11)
    rows = []
    for i in range(40):
        center = 10.0 if i % 2 == 0 else -10.0
        rows.append((i, [center + rng.gauss(0, 0.5) for _ in range(8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = S.kmeans_centroids(df, k=2, iters=4)
    got = sorted(sum(c) / len(c) for c in
                 [r["embedding"] for r in cents.collect()])
    assert got[0] < -9 and got[1] > 9
    # and the trained centroids drive ivf_topk end-to-end
    out = S.ivf_topk(df, df.limit(2), cents, k=3, nprobe=1)
    assert out.count() == 6


def test_connected_components(spark):
    from influxdb_ha_spark.operators.dedup import connected_components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (9, 3)], "id_a long, id_b long")
    out = {r["doc_id"]: r["cluster"]
           for r in connected_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5}


def test_pipeline_ops(docs, spark):
    """Corpus pipeline ops: decontamination finds planted overlap; the
    hash split and stratified sample are deterministic and exact."""
    from influxdb_ha_spark.operators.pipeline import (
        decontaminate, stratified_sample, train_test_split)

    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string")
    tr = spark.createDataFrame(
        [(1, "the quick brown fox went home"),    # shares 'the quick brown'…
         (2, "completely unrelated text about spark jobs")],
        "doc_id long, text string")
    hits = {r["doc_id"]: r["n_shared_shingles"]
            for r in decontaminate(tr, ev).collect()}
    assert 1 in hits and hits[1] >= 2
    assert 2 not in hits

    sp = train_test_split(docs)
    rows = dict(sp.groupBy("split").count().collect())
    assert set(rows) <= {"train", "test"} and sum(rows.values()) == docs.count()
    # deterministic: same assignment on re-run
    assert sorted(sp.collect()) == sorted(train_test_split(docs).collect())

    strat = spark.createDataFrame(
        [(i, f"s{i % 3}", "x") for i in range(30)],
        "doc_id long, source string, text string")
    samp = stratified_sample(strat, n_per_stratum=4)
    per = dict(samp.groupBy("source").count().collect())
    assert per == {"s0": 4, "s1": 4, "s2": 4}
    assert sorted(samp.collect()) == sorted(
        stratified_sample(strat.repartition(7), n_per_stratum=4).collect())


def test_decontaminate_bloom_exact(docs, spark):
    """The bloom-prefiltered operator returns exactly the exact
    operator's rows — including with a deliberately tiny bitmap whose FP
    rate approaches 1 (every false positive must die in the verify
    stage), and with an eval set producing zero contamination."""
    from influxdb_ha_spark.operators.pipeline import (decontaminate,
                                                      decontaminate_bloom)

    ev = docs.where("doc_id IN (1, 5)")
    tr = docs.where("doc_id NOT IN (1, 5)")
    want = sorted(map(tuple, decontaminate(tr, ev).collect()))
    got = sorted(map(tuple, decontaminate_bloom(tr, ev).collect()))
    assert got == want and want    # non-degenerate: overlap exists
    # 64-bit bitmap → near-total false positives → still exact
    tiny = sorted(map(tuple, decontaminate_bloom(
        tr, ev, m_bits=64, hashes=2).collect()))
    assert tiny == want
    # disjoint eval set → empty either way
    ev2 = spark.createDataFrame(
        [(9, "zz yy xx ww vv uu tt ss rr qq pp")],
        "doc_id long, text string")
    assert decontaminate_bloom(tr, ev2).count() == 0


def test_pack_sequences(spark):
    """Concat-and-chunk packing: offsets are the exclusive prefix sum in
    id order; first/last sequence indices follow from integer division."""
    from influxdb_ha_spark.operators.pipeline import pack_sequences

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, " ".join("w" * 1 for _ in range(6))),
         (4, "x")],
        "doc_id long, text string")
    out = {r["doc_id"]: (r["n_tokens"], r["token_offset"],
                         r["first_seq"], r["last_seq"])
           for r in pack_sequences(docs, seq_len=4).collect()}
    # tokens: 3, 2, 6, 1 → offsets 0, 3, 5, 11
    assert out[1] == (3, 0, 0, 0)    # tokens 0-2 in seq 0
    assert out[2] == (2, 3, 0, 1)    # tokens 3-4 straddle seqs 0/1
    assert out[3] == (6, 5, 1, 2)    # tokens 5-10 straddle seqs 1/2
    assert out[4] == (1, 11, 2, 2)
    # deterministic on any partitioning
    assert out == {r["doc_id"]: (r["n_tokens"], r["token_offset"],
                                 r["first_seq"], r["last_seq"])
                   for r in pack_sequences(docs.repartition(5),
                                           seq_len=4).collect()}


def test_pii_scrub(spark):
    from influxdb_ha_spark.operators.pipeline import pii_scrub

    df = spark.createDataFrame(
        [(1, "mail a@b.com and c.d@e.org ip 10.0.0.1 tel 555-1234 end"),
         (2, "clean text only")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (2, 1, 1)
    assert out[1]["scrubbed"] == \
        "mail <EMAIL> and <EMAIL> ip <IP> tel <PHONE> end"
    assert out[2]["scrubbed"] == "clean text only"


def test_repetition_and_quality_filter(spark):
    from influxdb_ha_spark.operators.text import (
        quality_filter, repetition_stats)

    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam"),           # one repeated 2-gram
         (2, "all words here are fully distinct")],
        "doc_id long, text string")
    rep = {r["doc_id"]: r for r in repetition_stats(df, k=2).collect()}
    assert rep[1]["n_grams"] == 4 and rep[1]["n_distinct_grams"] == 1
    assert rep[1]["dup_gram_frac"] == 0.75 and rep[1]["top_gram_frac"] == 1.0
    assert rep[2]["dup_gram_frac"] == 0.0

    good = ("the cat and the dog went to the old market in the town square "
            "and it was a fine day for everyone there")
    qf = {r["doc_id"]: r["keep"] for r in quality_filter(
        spark.createDataFrame([(1, good), (2, "too short"),
                               (3, "%% ((( ^^^ &&& %% ))) ^^ && %% (( ^ &")],
                              "doc_id long, text string")).collect()}
    assert qf == {1: True, 2: False, 3: False}


def test_salted_agg(spark):
    """Salted two-phase aggregation equals the plain groupBy, on any
    partitioning; non-algebraic fns are rejected."""
    import pytest as _pytest

    from influxdb_ha_spark.operators.util import salted_agg

    df = spark.createDataFrame(
        [("hot", float(i % 7)) for i in range(500)] + [("cold", 3.0)],
        "k string, v double").repartition(13)
    got = {r["k"]: (r["total"], r["n"], r["mx"], r["mn"]) for r in
           salted_agg(df, ["k"], {"total": ("sum", "v"), "n": ("count", "v"),
                                  "mx": ("max", "v"), "mn": ("min", "v")},
                      salt=8).collect()}
    want = {r["k"]: (r["total"], r["n"], r["mx"], r["mn"]) for r in
            df.groupBy("k").agg(
                F.sum("v").alias("total"), F.count("v").alias("n"),
                F.max("v").alias("mx"), F.min("v").alias("mn")).collect()}
    assert got == want
    with _pytest.raises(ValueError):
        salted_agg(df, ["k"], {"m": ("avg", "v")})


def test_lm_score(spark):
    """Unigram LM: common-token docs score higher; tokens outside the
    vocab hit the 0.5/total floor and count as OOV."""
    import math

    from influxdb_ha_spark.operators.text import lm_score

    df = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a a a"), (3, "zzz qqq")],
        "doc_id long, text string")
    # corpus: a×7, b×1, zzz×1, qqq×1 → total 10; vocab_size=2 keeps {a, b}
    out = {r["doc_id"]: r for r in lm_score(df, vocab_size=2).collect()}
    la, lb, fl = math.log(7 / 10), math.log(1 / 10), math.log(0.5 / 10)
    assert abs(out[1]["lm_score"] - (3 * la + lb) / 4) < 1e-12
    assert abs(out[2]["lm_score"] - la) < 1e-12
    assert abs(out[3]["lm_score"] - fl) < 1e-12
    assert out[1]["oov_frac"] == 0.0 and out[3]["oov_frac"] == 1.0
    assert out[2]["lm_score"] > out[1]["lm_score"] > out[3]["lm_score"]


def test_dim_stats_and_normalize(spark):
    from influxdb_ha_spark.operators.similarity import dim_stats, l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 2.0]), (3, [0.0, 0.0])],
        "vec_id long, embedding array<float>")
    st = {r["dim"]: r for r in dim_stats(df).collect()}
    assert st[0]["dim_min"] == 0.0 and st[0]["dim_max"] == 3.0
    assert st[1]["dim_mean"] == 2.0 and st[1]["n"] == 3

    nz = {r["vec_id"]: r for r in l2_normalize(df).collect()}
    assert nz[1]["norm"] == 5.0
    assert nz[1]["embedding"] == [0.6, 0.8]
    assert nz[3]["norm"] == 0.0 and nz[3]["embedding"] == [0.0, 0.0]


def test_scalar_quantize(spark):
    from influxdb_ha_spark.operators.similarity import scalar_quantize

    df = spark.createDataFrame(
        [(1, [0.0, 5.0]), (2, [10.0, 5.0]), (3, [5.0, 5.0])],
        "vec_id long, embedding array<float>")
    q = {r["vec_id"]: r["qvec"] for r in scalar_quantize(df).collect()}
    # dim0 range [0,10]: 0→0, 10→clamped 255, 5→floor(0.5*256)=128
    assert q[1][0] == 0 and q[2][0] == 255 and q[3][0] == 128
    # dim1 constant → 0 everywhere
    assert [q[i][1] for i in (1, 2, 3)] == [0, 0, 0]


def test_pq_encode_and_topk(spark):
    """PQ invariants: codes are m ints < k, identical vectors share codes,
    and a planted exact duplicate of a query is its rank-1 neighbor after
    the exact re-rank."""
    import random

    from influxdb_ha_spark.operators.similarity import (pq_encode, pq_topk,
                                                        pq_train)
    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(40)]
    rows.append((100, list(rows[0][1])))          # exact dup of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train(df, m=2, k=4, iters=2)
    assert len(books) == 2 and len(books[0]) == 4 and len(books[0][0]) == 4
    codes = {r["vec_id"]: list(r["codes"]) for r in pq_encode(df, books).collect()}
    assert len(codes) == 41
    assert all(len(c) == 2 and all(0 <= x < 4 for x in c)
               for c in codes.values())
    assert codes[0] == codes[100]                 # identical vecs, same codes
    q = df.where("vec_id = 0")
    top = pq_topk(df, q, books, k=3).orderBy("rank").collect()
    assert top[0]["neighbor_id"] == 100 and top[0]["cosine"] == 1.0
    assert [r["rank"] for r in top] == [1, 2, 3]


def test_weighted_sample(spark):
    from influxdb_ha_spark.operators.pipeline import weighted_sample

    df = spark.createDataFrame(
        [(i, f"s{i % 2}", "x") for i in range(200)],
        "doc_id long, source string, text string")
    full = weighted_sample(df, rates={"s0": 1.0, "s1": 0.5})
    per = dict(full.groupBy("source").count().collect())
    assert per["s0"] == 100            # rate 1.0 keeps everything
    assert 20 <= per.get("s1", 0) < 100  # ~50, loose bound
    # deterministic under repartitioning
    assert sorted(full.collect()) == sorted(
        weighted_sample(df.repartition(9),
                        rates={"s0": 1.0, "s1": 0.5}).collect())
    assert weighted_sample(df, rates={}).count() == 0  # default rate 0


def test_token_budget_mixture(spark):
    """Budget-derived rates: a source whose target exceeds its supply
    caps at keep-everything; a fractional target keeps ~the budgeted
    token share; weight-0 sources keep nothing but STAY in the report;
    all deterministic under repartitioning (integer hash thresholds)."""
    from influxdb_ha_spark.operators.pipeline import token_budget_mixture

    df = spark.createDataFrame(
        [(i, f"s{i % 3}", "tok " * 10) for i in range(300)]
        + [(900, "s0", None)],                      # null text excluded
        "doc_id long, source string, text string")
    # each source: 100 docs x 10 tokens = 1000 tokens supply
    out = token_budget_mixture(df, {"s0": 0.8, "s1": 0.2},
                               total_tokens=2500)
    rows = out.collect()
    assert len(rows) == 300                         # report cardinality
    kept_tokens = {s: 0 for s in ("s0", "s1", "s2")}
    for r in rows:
        assert r["n_tokens"] == 10
        if r["keep"]:
            kept_tokens[r["source"]] += r["n_tokens"]
    assert kept_tokens["s0"] == 1000   # target 2000 > supply 1000: cap
    assert 300 <= kept_tokens["s1"] <= 700   # target 500 of 1000, ~half
    assert kept_tokens["s2"] == 0      # unweighted source: present, 0
    assert sorted(map(tuple, rows)) == sorted(map(tuple, token_budget_mixture(
        df.repartition(7), {"s0": 0.8, "s1": 0.2},
        total_tokens=2500).collect()))


def test_assign_centroids_size_gate_paths_agree(spark, monkeypatch):
    """Above LITERAL_TERM_CAP the assignment must switch to the
    executor-broadcast Arrow path and produce the same assignments the
    literal-SQL path does (incl. the zero-vector → first-centroid
    fallback and the first-max = lowest-id tie-break)."""
    import random
    from influxdb_ha_spark.operators import similarity as S
    rng = random.Random(19)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(80)]
    rows.append((80, [0.0] * 16))  # zero-norm → all-NaN sims → centroid[0]
    rows.append((81, rows[3][1]))  # exact clone of a centroid vector
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, rows[i][1]) for i in range(6)],
        "centroid_id int, embedding array<double>")

    lit = {r["vec_id"]: r["centroid_id"]
           for r in S.assign_centroids(df, cents).collect()}
    # 6 × 16 = 96 terms: force the gate over by shrinking the cap
    monkeypatch.setattr(S, "LITERAL_TERM_CAP", 10)
    arrow = {r["vec_id"]: r["centroid_id"]
             for r in S.assign_centroids(df, cents).collect()}
    assert arrow == lit
    assert arrow[80] == 0 and arrow[81] == 3


def test_knn_graph_size_gate_paths_agree(spark, monkeypatch):
    """Above LITERAL_TERM_CAP knn_graph's probe lists must come from
    the Arrow top-nprobe path (r12 — the old ivf_topk fallback pushed
    N·C rows through a window, N²/64 under the C ∝ N contract) and the
    graph must equal the literal-SQL path row for row, including the
    (cosine DESC, neighbor_id ASC) ranking and the zero-norm row's
    lowest-id probe fallback."""
    import random
    from influxdb_ha_spark import cache
    from influxdb_ha_spark.operators import similarity as S
    rng = random.Random(29)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(80)]
    rows.append((80, [0.0] * 16))  # zero-norm → all-NaN sims
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(i, rows[7 * i][1]) for i in range(6)],
        "centroid_id int, embedding array<double>")

    lit = sorted(map(tuple, S.knn_graph(df, cents, k=3,
                                        nprobe=2).collect()))
    cache.release()  # drop the literal keyed generation between paths
    monkeypatch.setattr(S, "LITERAL_TERM_CAP", 10)
    arrow = sorted(map(tuple, S.knn_graph(df, cents, k=3,
                                          nprobe=2).collect()))
    cache.release()
    assert arrow == lit
    assert len(arrow) > 0


def test_pq_encode_size_gate_paths_agree(spark, monkeypatch):
    """pq_encode's Arrow fallback yields the same codes as the literal
    SQL path (first-min tie-break preserved)."""
    import random
    from influxdb_ha_spark.operators import similarity as S
    rng = random.Random(23)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = S.pq_train(df, m=4, k=4, iters=2)
    lit = {r["vec_id"]: list(r["codes"])
           for r in S.pq_encode(df, books).collect()}
    monkeypatch.setattr(S, "LITERAL_TERM_CAP", 10)
    arrow = {r["vec_id"]: list(r["codes"])
             for r in S.pq_encode(df, books).collect()}
    assert arrow == lit
    # and pq_train itself still converges through the gated argmin
    books2 = S.pq_train(df, m=4, k=4, iters=2)
    assert len(books2) == 4 and all(len(b) == 4 for b in books2)


def test_png_roundtrip_all_filters(spark):
    """synthesize_png_payload → parse_png must reproduce the closed-form
    raster exactly. ids 0..9 sweep h%5 phases so every scanline filter
    type (None/Sub/Up/Average/Paeth) is exercised; corrupted CRC and
    truncated streams are rejected, not guessed."""
    import numpy as np
    from influxdb_ha_spark.operators.multimodal import (
        parse_png, synthesize_png_payload)
    df = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    out = {r["doc_id"]: bytes(r["payload"])
           for r in synthesize_png_payload(df).collect()}
    assert len(out) == 10
    for i, raw in out.items():
        p = parse_png(raw)
        assert p is not None, f"id {i} failed to parse"
        w, h, px = p
        assert (w, h) == (i % 14 + 5, i % 10 + 4)
        x, y = np.arange(w), np.arange(h)
        want = ((x[None, :] * 7 + y[:, None] * 13 + i) % 256).astype(np.uint8)
        assert (px[:, :, 0] == want).all() and (px[:, :, 2] == want).all()
    raw = out[3]
    # flip one IDAT byte → CRC check must reject
    bad = bytearray(raw)
    bad[50] ^= 0xFF
    assert parse_png(bytes(bad)) is None
    assert parse_png(raw[:30]) is None
    assert parse_png(b"\x89PNG\r\n\x1a\nxxxx") is None


def test_resize_image_codec_sniff(spark):
    """resize_image dispatches BMP vs PNG by magic bytes in one pass and
    produces the closed-form resample stats for both."""
    from influxdb_ha_spark.operators import multimodal as MM
    df = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    mixed = (MM.synthesize_bmp_payload(df)
             .unionByName(MM.synthesize_png_payload(
                 df.selectExpr("doc_id + 100 AS doc_id"))))
    got = {r["doc_id"]: r for r in MM.resize_image(mixed, target=(4, 4)).collect()}
    assert len(got) == 8
    assert got[1]["width"] == 1 % 16 + 4         # BMP dims formula
    assert got[101]["width"] == 101 % 14 + 5     # PNG dims formula
    for i in (2, 102):
        w, h = got[i]["width"], got[i]["height"]
        xs = [(x * w) // 4 for x in range(4)]
        ys = [(y * h) // 4 for y in range(4)]
        base = i if i < 100 else i
        vals = [(sx * 7 + sy * 13 + base) % 256 for sy in ys for sx in xs]
        assert got[i]["mean_px"] == round(sum(vals) / len(vals), 6)


def test_containment_finds_doc_in_doc(spark):
    """A small doc fully contained in a big one has low Jaccard but
    containment 1.0 — the containment path must find it, and the plain
    jaccard path at the same threshold must NOT."""
    from influxdb_ha_spark.operators.dedup import (
        containment_near_duplicates, minhash_near_duplicates)
    words = [f"w{i}" for i in range(60)]
    big = " ".join(words)
    small = " ".join(words[:12])  # exact prefix → all its shingles in big
    other = " ".join(f"x{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, big), (2, small), (3, other)], "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r for r in
           containment_near_duplicates(df, threshold=0.9).collect()}
    assert (1, 2) in got
    assert got[(1, 2)]["cont_b"] == 1.0 and got[(1, 2)]["cont_a"] < 0.9
    jac = minhash_near_duplicates(df, threshold=0.9).collect()
    assert not [r for r in jac if (r["id_a"], r["id_b"]) == (1, 2)]


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """On planted near-identical docs the slot-match estimate must be
    high; signatures are 16 slots so estimates are multiples of 1/16."""
    from influxdb_ha_spark.operators.dedup import minhash_jaccard_estimate
    base = " ".join(f"w{i}" for i in range(50))
    near = " ".join(f"w{i}" for i in range(49)) + " zz"
    df = spark.createDataFrame(
        [(1, base), (2, base), (3, near)], "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["est_jaccard"]
           for r in minhash_jaccard_estimate(df).collect()}
    assert got[(1, 2)] == 1.0          # identical docs: every slot matches
    assert got.get((1, 3), 0) >= 0.5   # near-dup: most slots match
    for v in got.values():
        assert abs(v * 16 - round(v * 16)) < 1e-9


def test_semantic_dedup_greedy_within_cluster(spark):
    """SemDeDup keep rule: within a cluster the earlier id survives and
    later near-copies drop; near-identical vectors in DIFFERENT clusters
    both survive (cluster-blindness is the documented recall trade-off)."""
    from influxdb_ha_spark.operators.similarity import semantic_dedup
    c0, c1 = [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]
    rows = [
        (1, [0.9, 0.1, 0.0, 0.0]),   # cluster 0, kept (earliest)
        (2, [0.9, 0.1, 0.0, 0.01]),  # cluster 0, ~copy of 1 -> dropped
        (3, [0.1, 0.9, 0.0, 0.0]),   # cluster 1, kept
        (4, [0.1, 0.9, 0.0, 0.01]),  # cluster 1, ~copy of 3 -> dropped
        (5, [0.0, 0.0, 1.0, 0.0]),   # cluster 0 or 1, orthogonal -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, c0), (1, c1)], "centroid_id long, embedding array<double>")
    kept = sorted(r["vec_id"]
                  for r in semantic_dedup(df, cents, eps=0.99).collect())
    assert kept == [1, 3, 5]
    # across clusters the same eps does NOT dedup: 2 assigned to cluster 1
    # by a centroid swap keeps both 1 and 2
    kept_hi = sorted(r["vec_id"]
                     for r in semantic_dedup(df, cents, eps=0.999999).collect())
    assert kept_hi == [1, 2, 3, 4, 5]


def test_bm25_topk_ranking(spark):
    """BM25 sanity: matching more/rarer query terms ranks higher; docs
    matching nothing are excluded; tf saturates (k1) so term-stuffing
    can't beat a second distinct term; hand-computed score matches."""
    import math

    from influxdb_ha_spark.operators.text import bm25_topk
    docs = [
        (1, "rust compiler borrow checker"),       # both rare terms
        (2, "rust rust rust rust rust rust"),      # stuffed single term
        (3, "python compiler bytecode"),           # one term
        (4, "java garbage collector"),             # no terms
        (5, "the rust book"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = bm25_topk(df, "rust compiler", k=10).collect()
    got = {r["doc_id"]: r["score"] for r in out}
    assert 4 not in got                      # zero-score excluded
    assert got[1] == max(got.values())       # two terms beat stuffing
    ranked = [r["doc_id"] for r in out]
    assert ranked[0] == 1
    # hand-computed doc 3: tf(compiler)=1, dl=3, N=5, df(compiler)=2,
    # avgdl = (4+6+3+3+3)/5
    avgdl = 19 / 5
    idf_c = math.log((5 - 2 + 0.5) / (2 + 0.5) + 1.0)
    exp3 = idf_c * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 3 / avgdl))
    assert got[3] == pytest.approx(exp3, abs=1e-6)
    with pytest.raises(ValueError):
        bm25_topk(df, "!!!")


def test_prototypicality_keep_flag(spark):
    """Closest-to-centroid rows score highest and are pruned first;
    percentile ranks within the cluster, ties broken on id."""
    from influxdb_ha_spark.operators.similarity import prototypicality
    rows = [
        (1, [1.0, 0.0]),        # proto 1.0 -> most prototypical
        (2, [0.9, 0.4358899]),  # ~0.9
        (3, [0.6, 0.8]),        # 0.6
        (4, [0.0, 1.0]),        # 0.0 vs centroid 0... goes to c1
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0])], "centroid_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in
           prototypicality(df, cents, prune_frac=0.25).collect()}
    assert out[1]["proto"] == 1.0 and out[1]["pctl"] == 1.0
    assert not out[1]["keep"]                 # top 25% pruned
    assert out[3]["keep"] and out[4]["keep"]
    assert out[4]["pctl"] == 0.25


def test_ivfpq_topk_probes_and_reranks(spark):
    """IVF+PQ composite: neighbors come only from probed buckets, and
    the exact rerank orders them by true cosine."""
    from influxdb_ha_spark.operators import similarity as S
    import numpy as np
    rng = np.random.RandomState(7)
    # two well-separated clusters in 8-d
    rows = []
    for i in range(40):
        base = np.zeros(8)
        base[0 if i % 2 == 0 else 4] = 10.0
        rows.append((i, [float(x) for x in base + rng.rand(8)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, rows[0][1]), (1, rows[1][1])],
        "centroid_id long, embedding array<double>")
    books = S.pq_train(df, m=2, k=8, iters=2)
    out = S.ivfpq_topk(df, df.where(F.col("vec_id") < 2), cents, books,
                       k=3, nprobe=1).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for qid, rs in by_q.items():
        assert len(rs) == 3
        # nprobe=1 on separated clusters: neighbors share the query's
        # parity (same cluster), and ranks follow cosine desc
        assert all(r["neighbor_id"] % 2 == qid % 2 for r in rs)
        cs = [r["cosine"] for r in sorted(rs, key=lambda r: r["rank"])]
        assert cs == sorted(cs, reverse=True)


def test_mmr_rerank_diversifies(spark):
    """MMR vs plain top-k: with two tight candidate clusters, plain
    top-k fills with the closer cluster's near-duplicates; MMR at
    lam=0.5 must interleave the second cluster."""
    from influxdb_ha_spark.operators import similarity as S
    rows = [(0, [1.0, 0.0, 0.0])]                      # the query
    # clusters on opposite sides of the query: A slightly more relevant
    # (plain top-k returns only A); B's redundancy to A (~0.78) is far
    # below its relevance (~0.93), so MMR's second pick flips to B
    for i in range(1, 5):
        rows.append((i, [0.95, 0.30, 0.001 * i]))
    for i in range(5, 9):
        rows.append((i, [0.93, -0.36, 0.001 * i]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") == 0)
    plain = [r["neighbor_id"] for r in sorted(
        S.brute_force_topk(df, q, k=4).collect(), key=lambda r: r["rank"])]
    assert all(n in (1, 2, 3, 4) for n in plain)        # all one cluster
    mmr = sorted(S.mmr_rerank(df, q, k=4, pool=8, lam=0.5).collect(),
                 key=lambda r: r["rank"])
    picked = [r["neighbor_id"] for r in mmr]
    assert len(picked) == 4 and len(set(picked)) == 4
    assert picked[0] in (1, 2, 3, 4)                    # most relevant first
    assert picked[1] in (5, 6, 7, 8)                    # diversity kicks in
    assert [r["rank"] for r in mmr] == [1, 2, 3, 4]
    # lam=1.0 degenerates to relevance order = plain top-k set
    rel = {r["neighbor_id"] for r in
           S.mmr_rerank(df, q, k=4, pool=8, lam=1.0).collect()}
    assert rel == set(plain)


def test_substring_duplicates_finds_verbatim_run(spark):
    """Planted verbatim overlap: docs 1/2 share an exact 12-token run
    (different surroundings), doc 3 shares only 3 tokens — below
    min_run_tokens. The diagonal run-merge must report the FULL shared
    length, not just that some k-span matched."""
    from influxdb_ha_spark.operators import dedup as D
    run = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    rows = [
        (1, "intro one two " + run + " outro red blue"),
        (2, "totally different start " + run),
        (3, "alpha bravo charlie nothing else here matches at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.substring_duplicates(df, k=4, min_run_tokens=10,
                                 max_df=50).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["max_run_tokens"] == 12
    assert r["n_runs"] == 1
    # raising the threshold above the run length removes the pair
    assert D.substring_duplicates(df, k=4, min_run_tokens=13,
                                  max_df=50).count() == 0


def test_deadman_and_gap_report(spark):
    """Planted liveness: series 'a' reports up to t=100s, 'b' stops at
    t=40s; with now anchored at the global newest point (100s) and a
    30s threshold only 'b' is dead. The same data has one 35s silence
    inside 'a' — gap_report must return exactly that interval."""
    from influxdb_ha_spark.operators.timeseries import deadman, gap_report
    S = 10 ** 9
    rows = [("a", 0 * S), ("a", 10 * S), ("a", 45 * S), ("a", 70 * S),
            ("a", 100 * S),
            ("b", 5 * S), ("b", 20 * S), ("b", 40 * S)]
    df = spark.createDataFrame(rows, "event_type string, time long")
    dm = {r["event_type"]: r for r in
          deadman(df, by=["event_type"], threshold_ns=30 * S).collect()}
    assert not dm["a"]["dead"] and dm["a"]["age_ns"] == 0
    assert dm["b"]["dead"] and dm["b"]["age_ns"] == 60 * S
    assert dm["a"]["n_points"] == 5 and dm["b"]["n_points"] == 3
    # explicit wall-clock now overrides the anchor
    dm2 = {r["event_type"]: r["dead"] for r in
           deadman(df, by=["event_type"], threshold_ns=30 * S,
                   now_ns=200 * S).collect()}
    assert dm2 == {"a": True, "b": True}
    gaps = gap_report(df, by=["event_type"], min_gap_ns=30 * S).collect()
    assert [(g["event_type"], g["gap_start"], g["gap_end"], g["gap_ns"])
            for g in gaps] == [("a", 10 * S, 45 * S, 35 * S)]


def test_dsir_scores_rank_target_like_docs(spark):
    """DSIR: docs sharing the target domain's n-grams must outscore
    out-of-domain docs; empty docs score 0 with 0 features."""
    from influxdb_ha_spark.operators.pipeline import dsir_scores
    rows = [
        (1, "spark sql join shuffle partition spark sql join", "t"),
        (2, "spark sql aggregate join shuffle spark", "t"),
        (3, "cat dog fish bird cow horse cat dog", "r"),
        (4, "dog fish cow bird horse fish cat", "r"),
        (5, "spark sql join shuffle", "r"),      # target-like raw doc
        (6, "cat dog fish bird", "r"),           # raw-like raw doc
        (7, "", "r"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, dom string")
    out = {r["doc_id"]: r for r in
           dsir_scores(df, "dom = 't'", n_buckets=64).collect()}
    assert out[5]["dsir_logratio"] > out[6]["dsir_logratio"]
    assert out[5]["dsir_logratio"] > 0 > out[6]["dsir_logratio"]
    assert out[7]["n_feats"] == 0 and out[7]["dsir_logratio"] == 0.0
    # n_feats = unigrams + bigrams
    assert out[5]["n_feats"] == 4 + 3


def test_acf_periodic_signal(spark):
    """A period-4 sawtooth has ACF exactly 1 at lag 4 (biased estimator
    scaled by pair count) and strongly negative at the half period."""
    from influxdb_ha_spark.operators.timeseries import acf
    B = 10 ** 9  # 1s buckets
    rows = [(i * B, float([0, 1, 0, -1][i % 4]), "s") for i in range(64)]
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {r["lag"]: r for r in
           acf(df, on="time", by=["tag"], value_col="value",
               bucket_ns=B, max_lag=4).collect()}
    assert out[4]["n_pairs"] == 60
    # biased-estimator peak: num has 60 of the 64 denominator terms
    assert abs(out[4]["acf"] - 60 / 64) < 1e-9
    assert out[2]["acf"] < -0.8   # anti-phase at the half period
    assert abs(out[1]["acf"]) < 0.1  # quarter period ~ orthogonal


def test_cross_correlate_finds_shift(spark):
    """b = a delayed by 3 buckets → xcorr peaks at lag +3 with r ≈ 1."""
    import random
    from influxdb_ha_spark.operators.timeseries import cross_correlate
    B = 10 ** 9
    rng = random.Random(7)
    sig = [rng.uniform(-1, 1) for _ in range(80)]
    rows = [(i * B, sig[i], "a") for i in range(80)] + \
           [((i + 3) * B, sig[i], "b") for i in range(80)]
    df = spark.createDataFrame(rows, "time long, value double, k string")
    out = {r["lag"]: r["xcorr"] for r in
           cross_correlate(df, "a", "b", key_col="k", on="time",
                           value_col="value", bucket_ns=B,
                           max_lag=4).collect()}
    assert out[3] == max(out.values()) and out[3] > 0.9
    assert all(abs(v) < 0.35 for l, v in out.items() if l != 3)


def test_acf_requires_series_key(spark):
    from influxdb_ha_spark.operators.timeseries import acf
    df = spark.createDataFrame([(0, 1.0)], "time long, value double")
    with pytest.raises(ValueError, match="series key"):
        acf(df, by=[])


def test_text_cluster_assign_groups_by_vocabulary(spark):
    """Docs sharing a seed doc's vocabulary assign to that seed's
    centroid; tf_vectors slots hold exact token counts."""
    from influxdb_ha_spark.operators.text import cluster_assign, tf_vectors
    rows = [
        (0, "spark shuffle join partition spark"),
        (1, "violin cello oboe harp violin cello"),
        (2, "spark join shuffle shuffle"),
        (3, "harp oboe cello"),
        (4, "spark partition join"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["centroid_id"] for r in
           cluster_assign(df, k=2, n_buckets=32).collect()}
    assert out == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0}
    tf = tf_vectors(df, n_buckets=32).where("doc_id = 0").first()
    assert tf["n_tokens"] == 5
    assert sum(tf["tf"]) == 5.0 and max(tf["tf"]) == 2.0  # 'spark' x2


def test_cluster_assign_sparse_ids_and_small_corpus(spark):
    """Seeds are the k LOWEST ids (orderBy.limit, not `id < k`): sparse
    non-zero-based ids must still yield exactly k centroids; a corpus
    smaller than k fails loudly; an empty centroid frame raises in
    assign_centroids rather than building an empty argmax (r5 advice)."""
    import pytest
    from influxdb_ha_spark.operators.similarity import assign_centroids
    from influxdb_ha_spark.operators.text import cluster_assign
    rows = [(100, "spark shuffle join"), (205, "violin cello oboe"),
            (310, "spark join join"), (447, "cello oboe harp")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["centroid_id"] for r in
           cluster_assign(df, k=2, n_buckets=32).collect()}
    # the old `id < k` form found ZERO seeds here; now 100 and 205 seed
    assert set(out.values()) == {100, 205}
    assert out == {100: 100, 205: 205, 310: 100, 447: 205}
    with pytest.raises(ValueError, match="only 4 documents"):
        cluster_assign(df, k=9, n_buckets=32)
    empty = spark.createDataFrame([], "centroid_id long, embedding array<double>")
    with pytest.raises(ValueError, match="centroid frame is empty"):
        assign_centroids(df.limit(1), empty)


def test_cusum_detects_planted_shift(spark):
    """Baseline at the target mean never alarms; a sustained +shift
    drives S+ past the threshold within ceil(h/(shift-k)) points, then
    both sides reset."""
    from influxdb_ha_spark.operators.timeseries import cusum
    S = 10 ** 9
    rows = ([(i * S, 10.0, "a") for i in range(20)]
            + [((20 + i) * S, 22.0, "a") for i in range(10)])
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = sorted(cusum(df, by=["tag"], value_col="value", slack=2.0,
                       threshold=50.0, target=10.0).collect(),
                 key=lambda r: r["time"])
    pre = [r for r in out if r["time"] < 20 * S]
    assert all(r["s_pos"] == 0.0 and not r["alarm"] for r in pre)
    # shift contributes 22-10-2 = 10/point -> alarm at the 6th point
    alarms = [r["time"] // S for r in out if r["alarm"]]
    assert alarms[0] == 25
    post = {r["time"] // S: r["s_pos"] for r in out}
    assert post[26] == 10.0  # reset then one fresh increment


def test_token_entropy_closed_forms(spark):
    """Uniform tokens -> H = ln(n), H_norm = 1; single repeated token ->
    0; empty -> 0 with n=0."""
    import math
    from influxdb_ha_spark.operators.text import token_entropy
    rows = [(1, "a b c d"), (2, "x x x x"), (3, ""),
            (4, "a a b b")]  # 2 tokens x2 -> H = ln(2)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in token_entropy(df).collect()}
    assert abs(out[1]["entropy"] - math.log(4)) < 1e-6
    assert out[1]["entropy_norm"] == 1.0
    assert out[2]["entropy"] == 0.0 and out[2]["entropy_norm"] == 0.0
    assert out[3]["n_tokens"] == 0 and out[3]["entropy"] == 0.0
    assert abs(out[4]["entropy"] - math.log(2)) < 1e-6
    assert out[4]["n_distinct"] == 2


def test_linear_trend_exact_line_and_r2(spark):
    """A perfect line recovers slope/intercept with r2 = 1; a constant
    series reports slope 0, r2 = 0; noise keeps r2 < 1."""
    from influxdb_ha_spark.operators.timeseries import linear_trend
    B = 10 ** 9
    rows = ([(i * B, 3.5 * i + 7.0, "line") for i in range(30)]
            + [(i * B, 42.0, "flat") for i in range(10)]
            + [(i * B, 5.0 * i + (1.0 if i % 2 else -1.0), "noisy")
               for i in range(20)])
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {r["tag"]: r for r in
           linear_trend(df, by=["tag"], value_col="value",
                        bucket_ns=B).collect()}
    assert out["line"]["slope_per_bucket"] == 3.5
    assert out["line"]["intercept"] == 7.0
    assert out["line"]["r2"] == 1.0
    assert out["flat"]["slope_per_bucket"] == 0.0
    assert out["flat"]["r2"] == 0.0 and out["flat"]["intercept"] == 42.0
    assert abs(out["noisy"]["slope_per_bucket"] - 5.0) < 0.02
    assert 0.9 < out["noisy"]["r2"] < 1.0


def test_bpe_train_matches_reference_implementation(spark):
    """Full merge list equals a direct Python implementation of
    Sennrich's algorithm (same (count desc, pair asc) tie-break) on a
    corpus with repeats, merges that chain, and 'aaa' overlap runs."""
    from collections import Counter

    from influxdb_ha_spark.operators.text import bpe_train

    texts = ["low lower lowest low low", "new newer newest new",
             "low newer low", "aaa aaaa aa baaab"]

    def ref_bpe(texts, n):
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
                    if (i < len(syms) - 1 and syms[i] == a
                            and syms[i + 1] == b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nv[tuple(out)] = nv.get(tuple(out), 0) + cnt
            vocab = nv
        return merges

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["pair_count"])
           for r in bpe_train(df, n_merges=10).collect()]
    assert got == ref_bpe(texts, 10)


def test_bpe_encode_counts(spark):
    """Encode uses the trained segmentation: with enough merges the
    training words compress below char count; unseen words fall back to
    chars + end-mark."""
    from influxdb_ha_spark.operators.text import bpe_encode_counts, bpe_train
    train = spark.createDataFrame(
        [(1, "aaaa aaaa aaaa bb bb")], "doc_id long, text string")
    merges, vocab = bpe_train(train, n_merges=4, return_vocab=True)
    v = {r["w"]: r["n_tokens"] for r in vocab.collect()}
    assert v["aaaa"] < 5   # merged below the 4-chars + </w> baseline
    apply_df = spark.createDataFrame(
        [(7, "aaaa zz")], "doc_id long, text string")
    out = bpe_encode_counts(apply_df, vocab).collect()[0]
    assert out["n_words"] == 2
    assert out["n_bpe_tokens"] == v["aaaa"] + 3  # 'zz' -> z z </w>


def test_acf_xcorr_constant_series_zero_not_null(spark):
    """A constant series has zero centered energy: the guard must emit
    0.0 (not NULL/NaN) on every lag — the cross-engine parity case."""
    from influxdb_ha_spark.operators.timeseries import acf, cross_correlate
    B = 10 ** 9
    rows = ([(i * B, 5.0, "flat") for i in range(10)]
            + [(i * B, float(i % 3), "live") for i in range(10)])
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = acf(df, by=["tag"], value_col="value", bucket_ns=B,
              max_lag=2).collect()
    flat = [r for r in out if r["tag"] == "flat"]
    assert flat and all(r["acf"] == 0.0 for r in flat)
    xc = cross_correlate(df, "flat", "live", key_col="tag", bucket_ns=B,
                         max_lag=1).collect()
    assert xc and all(r["xcorr"] == 0.0 for r in xc)


def test_cusum_duplicate_timestamps_deterministic(spark):
    """Duplicate (series, time) rows fold in (time, value) order on any
    partitioning — repeated runs give identical carries."""
    from influxdb_ha_spark.operators.timeseries import cusum
    S = 10 ** 9
    rows = [(0, 10.0, "a"), (S, 30.0, "a"), (S, 2.0, "a"), (2 * S, 10.0, "a")]
    outs = []
    for parts in (1, 4):
        df = spark.createDataFrame(rows, "time long, value double, tag string") \
            .repartition(parts)
        outs.append(sorted(
            (r["time"], r["s_pos"], r["s_neg"], r["alarm"]) for r in
            cusum(df, by=["tag"], value_col="value", slack=1.0,
                  threshold=100.0, target=10.0).collect()))
    assert outs[0] == outs[1]
    # value-ascending at the tied second: 2.0 folds before 30.0
    sp_after = dict((t, p) for t, p, *_ in outs[0])
    assert sp_after[S] == 19.0  # max(0, 0+(2-11))=0 then 0+(30-11)=19


def test_linear_trend_long_span_exact_index(spark):
    """A 10-year hourly span (>2^53 ns) must keep exact bucket indices:
    a perfect line still recovers slope exactly (the double-division
    formulation truncated off-by-one here)."""
    from influxdb_ha_spark.operators.timeseries import linear_trend
    H = 3_600_000_000_000
    t0 = 1_500_000_000_000_000_000
    idx = [0, 1, 87_660, 87_661]  # ~10 years apart
    rows = [(t0 + i * H, 2.0 * i + 1.0, "s") for i in idx]
    out = linear_trend(
        spark.createDataFrame(rows, "time long, value double, tag string"),
        by=["tag"], value_col="value", bucket_ns=H).collect()[0]
    assert out["slope_per_bucket"] == 2.0
    assert out["intercept"] == 1.0 and out["r2"] == 1.0


def test_theil_sen_robust_to_outliers(spark):
    """An exact line plus one wild outlier: Theil-Sen recovers the true
    slope exactly while OLS is dragged off it; matches a brute-force
    Python median-of-slopes reference; the bucket cap raises loudly."""
    import statistics

    from influxdb_ha_spark.operators.timeseries import (linear_trend,
                                                        theil_sen_trend)
    B = 10 ** 9
    vals = [3.0 * i + 2.0 for i in range(21)]
    vals[20] = 1e6  # wild outlier at the end: max slope leverage
    df = spark.createDataFrame(
        [(i * B, v, "s") for i, v in enumerate(vals)],
        "time long, value double, tag string")
    ts = theil_sen_trend(df, by=["tag"], value_col="value",
                         bucket_ns=B).collect()[0]
    assert ts["slope_per_bucket"] == 3.0
    assert ts["intercept"] == 2.0
    assert ts["n_pairs"] == 21 * 20 // 2
    ols = linear_trend(df, by=["tag"], value_col="value",
                       bucket_ns=B).collect()[0]
    assert abs(ols["slope_per_bucket"] - 3.0) > 1000  # OLS dragged away

    # random series: match the direct definition
    import random
    rng = random.Random(13)
    vals = [rng.uniform(0, 50) for _ in range(15)]
    df2 = spark.createDataFrame(
        [(i * B, round(v, 6), "r") for i, v in enumerate(vals)],
        "time long, value double, tag string")
    got = theil_sen_trend(df2, by=["tag"], value_col="value",
                          bucket_ns=B).collect()[0]
    slopes = [(vals[j] - vals[i]) / (j - i)
              for i in range(15) for j in range(i + 1, 15)]
    want = statistics.median([round(s, 10) for s in slopes])
    assert abs(got["slope_per_bucket"] - want) < 1e-5

    import pytest as _pytest
    with _pytest.raises(ValueError, match="quadratic in buckets"):
        theil_sen_trend(df, by=["tag"], value_col="value", bucket_ns=B,
                        max_buckets=5)


def test_mann_kendall_closed_forms(spark):
    """Strictly increasing series: S = n(n-1)/2, trend flagged;
    constant series: S = 0, full tie correction zeroes the variance,
    z = 0, no trend; alternating series: |z| small, no trend."""
    from influxdb_ha_spark.operators.timeseries import mann_kendall
    B = 10 ** 9
    rows = ([(i * B, float(i), "up") for i in range(20)]
            + [(i * B, 7.0, "flat") for i in range(20)]
            + [(i * B, float(i % 2), "alt") for i in range(20)])
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {r["tag"]: r for r in
           mann_kendall(df, by=["tag"], value_col="value",
                        bucket_ns=B).collect()}
    n = 20
    assert out["up"]["s"] == n * (n - 1) // 2
    var = n * (n - 1) * (2 * n + 5) / 18.0
    want_z = (out["up"]["s"] - 1) / var ** 0.5
    assert abs(out["up"]["z"] - want_z) < 1e-6 and out["up"]["trend"]
    assert out["flat"]["s"] == 0 and out["flat"]["z"] == 0.0
    assert not out["flat"]["trend"]
    assert not out["alt"]["trend"] and abs(out["alt"]["z"]) < 1.0


def test_seasonal_mk_ignores_cycle_catches_drift(spark):
    """A pure diurnal cycle (period 4 here) must NOT flag a trend under
    seasonal MK (within each season the values are constant -> S = 0),
    while the same cycle plus monotonic drift must."""
    from influxdb_ha_spark.operators.timeseries import (
        mann_kendall, seasonal_mann_kendall)
    B = 10 ** 9
    cyc = [10.0, 50.0, 90.0, 30.0]
    rows = ([(i * B, cyc[i % 4], "cycle") for i in range(40)]
            + [(i * B, cyc[i % 4] + 0.5 * i, "drift") for i in range(40)])
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {r["tag"]: r for r in
           seasonal_mann_kendall(df, by=["tag"], value_col="value",
                                 bucket_ns=B, period=4).collect()}
    assert out["cycle"]["s"] == 0 and not out["cycle"]["trend"]
    assert out["drift"]["trend"] and out["drift"]["s"] == 4 * 45
    # per-season all-pairs increasing: 4 seasons x C(10,2) = 180 = S
    # sanity: plain MK on the pure cycle sees a nonzero S (the cycle
    # pollutes cross-season pairs) — the seasonal form removes exactly
    # that term
    mk = {r["tag"]: r for r in
          mann_kendall(df, by=["tag"], value_col="value",
                       bucket_ns=B).collect()}
    assert mk["cycle"]["s"] != 0


def test_pettitt_finds_planted_shift(spark):
    """A level shift at position 15 of 30: U_t peaks at the boundary,
    the change bucket is located exactly, and the exact U_t matches a
    brute-force double-loop reference; a pure-noise series is not
    flagged."""
    import math
    import random

    from influxdb_ha_spark.operators.timeseries import pettitt_test
    B = 10 ** 9
    rng = random.Random(17)
    shifted = [round(rng.uniform(0, 1), 6) for _ in range(15)] + \
              [round(rng.uniform(5, 6), 6) for _ in range(15)]
    noise = [round(rng.uniform(0, 1), 6) for _ in range(30)]
    rows = ([(i * B, v, "shift") for i, v in enumerate(shifted)]
            + [(i * B, v, "noise") for i, v in enumerate(noise)])
    df = spark.createDataFrame(rows, "time long, value double, tag string")
    out = {r["tag"]: r for r in
           pettitt_test(df, by=["tag"], value_col="value",
                        bucket_ns=B).collect()}

    def brute(vals):
        n = len(vals)
        us = []
        for t in range(n):
            us.append(sum((vals[j] > vals[i]) - (vals[j] < vals[i])
                          for i in range(t + 1) for j in range(t + 1, n)))
        k = max(abs(u) for u in us)
        t_star = min(t for t, u in enumerate(us) if abs(u) == k)
        return k, t_star, us[t_star]

    for tag, vals in (("shift", shifted), ("noise", noise)):
        k, t_star, u = brute(vals)
        r = out[tag]
        assert (r["k"], r["change_bucket"] // B, r["u_at_k"]) == \
            (k, t_star, u), tag
        e = math.floor(-6.0 * k * k / (30.0 ** 3 + 30.0 ** 2) * 1e6
                       + 0.5) / 1e6
        assert r["log_p_exponent"] == e
    assert out["shift"]["shift"] and out["shift"]["change_bucket"] == 14 * B
    assert not out["noise"]["shift"]
