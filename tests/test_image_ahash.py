"""image_ahash / image_near_dup (operators/multimodal.py)."""

from pyspark.sql import functions as F

from influxdb_ha_spark.operators import multimodal as MM


def _docs(spark, ids):
    return spark.createDataFrame([(i, "x") for i in ids],
                                 "doc_id long, text string")


def _ref_ahash(doc_id):
    """Closed-form mirror of the synthesized-PNG pixel formula."""
    w, h = doc_id % 14 + 5, doc_id % 10 + 4
    vals = [(((x * w) // 8) * 7 + ((y * h) // 8) * 13 + doc_id) % 256
            for y in range(8) for x in range(8)]
    total = sum(vals)
    code = 0
    for y in range(8):
        for x in range(8):
            if vals[y * 8 + x] * 64 > total:
                code |= 1 << (y * 8 + x)
    return code


def test_ahash_matches_closed_form_through_real_codec(spark):
    ids = [0, 1, 7, 13, 70, 123]
    png = MM.synthesize_png_payload(_docs(spark, ids))
    rows = {r.doc_id: r for r in MM.image_ahash(png).collect()}
    assert set(rows) == set(ids)
    for i in ids:
        code = _ref_ahash(i)
        assert rows[i].ahash_hi == code >> 32
        assert rows[i].ahash_lo == code & 0xFFFFFFFF
        assert rows[i].n_set == bin(code).count("1")


def test_near_dup_equals_brute_force(spark):
    ids = list(range(0, 200, 3))
    png = MM.synthesize_png_payload(_docs(spark, ids))
    ah = MM.image_ahash(png)
    res = MM.image_near_dup(ah, max_hamming=3).collect()
    got = {(r.id_a, r.id_b): r.hamming for r in res}
    codes = {i: _ref_ahash(i) for i in ids}
    want = {}
    for a in ids:
        for b in ids:
            if a < b:
                d = bin(codes[a] ^ codes[b]).count("1")
                if d <= 3:
                    want[(a, b)] = d
    assert got == want
    # no band bucket holds >200 of these 67 images, so nothing truncates
    # and the capped generation IS the pigeonhole-exact result
    assert all(not r.truncated for r in res)


def test_near_dup_hot_bucket_capped_not_quadratic(spark):
    # 500 IDENTICAL aHash codes — the monochrome/template-corpus case the
    # r7 verdict flagged: every band bucket holds all 500 ids. The cap
    # must slice each bucket to its 200 smallest ids (C(200,2) = 19900
    # pairs, flagged truncated) instead of emitting C(500,2) = 124 750.
    rows = [(i, 0x12345678, 0x9ABCDEF0, 32) for i in range(500)]
    ah = spark.createDataFrame(
        rows, "doc_id long, ahash_hi long, ahash_lo long, n_set long")
    res = MM.image_near_dup(ah, max_hamming=3).collect()
    assert len(res) == 19900
    assert all(r.truncated and r.hamming == 0 for r in res)
    # deterministic smallest-ids slice: only ids < 200 survive the cap
    assert max(max(r.id_a, r.id_b) for r in res) == 199


def test_near_dup_identical_images_zero_distance(spark):
    # ids congruent mod lcm(14,10,256)=8960 share w, h AND pixel values
    ids = [5, 5 + 8960]
    png = MM.synthesize_png_payload(_docs(spark, ids))
    rows = MM.image_near_dup(MM.image_ahash(png), max_hamming=3).collect()
    assert len(rows) == 1 and rows[0].hamming == 0


def test_ahash_skips_undecodable(spark):
    df = spark.createDataFrame([(1, bytearray(b"not an image"))],
                               "doc_id long, payload binary")
    assert MM.image_ahash(df).count() == 0
