"""Property tests for the from-scratch baseline JPEG codec (r5).

The decoder (`parse_jpeg`) is a general baseline decoder; the encoder
shares only the ITU T.81 spec with it (forward DCT + quantization +
Huffman vs entropy decode + dequant + inverse DCT — mutually inverse
operations, not shared code paths). Three property layers:

1. Constant 8×8 blocks with DC quantizer step 8 round-trip BIT-EXACTLY
   (only a DC coefficient survives; round(8(v−128)/8)·8/8+128 = v) —
   this is the invariant the SQL oracle for `mm_jpeg_px` relies on.
2. ARBITRARY rasters with an all-ones quant table round-trip within the
   analytic error bound of the float DCT pair (each quantized
   coefficient is off by ≤0.5, so any pixel is off by
   ≤ 0.5·(Σ_u|C_u|)² < 8; empirically ≤2).
3. Structural rejection: truncated streams, progressive SOF, subsampled
   components and garbage all return None.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from influxdb_ha_spark.operators.multimodal import (
    encode_jpeg_gray, encode_jpeg_rgb, encode_jpeg_rgb_420, parse_jpeg)


@settings(max_examples=60, deadline=None)
@given(i=st.integers(min_value=0, max_value=10**9),
       bw=st.integers(min_value=1, max_value=5),
       bh=st.integers(min_value=1, max_value=4))
def test_constant_blocks_roundtrip_exactly(i, bw, bh):
    w, h = bw * 8, bh * 8
    bxs = np.arange(w) // 8
    bys = np.arange(h) // 8
    px = ((bxs[None, :] * 17 + bys[:, None] * 29 + i) % 256).astype(np.uint8)
    out = parse_jpeg(encode_jpeg_gray(px))
    assert out is not None
    pw, ph, got = out
    assert (pw, ph) == (w, h)
    assert (got[:, :, 0] == px).all()
    assert (got[:, :, 1] == px).all() and (got[:, :, 2] == px).all()


@settings(max_examples=60, deadline=None)
@given(data=st.data(),
       w=st.integers(min_value=1, max_value=20),
       h=st.integers(min_value=1, max_value=16))
def test_arbitrary_gray_roundtrip_bounded_error(data, w, h):
    px = np.array(data.draw(st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=w * h, max_size=w * h)), dtype=np.uint8).reshape(h, w)
    out = parse_jpeg(encode_jpeg_gray(px, qtable=np.ones(64, dtype=int)))
    assert out is not None
    pw, ph, got = out
    assert (pw, ph) == (w, h)
    assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 4


@settings(max_examples=30, deadline=None)
@given(data=st.data(),
       w=st.integers(min_value=1, max_value=14),
       h=st.integers(min_value=1, max_value=12))
def test_rgb_roundtrip_bounded_error(data, w, h):
    px = np.array(data.draw(st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=w * h * 3, max_size=w * h * 3)),
        dtype=np.uint8).reshape(h, w, 3)
    out = parse_jpeg(encode_jpeg_rgb(px, qtable=np.ones(64, dtype=int)))
    assert out is not None
    pw, ph, got = out
    assert (pw, ph) == (w, h)
    # color transform adds one more rounding layer on each side
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 6


@settings(max_examples=30, deadline=None)
@given(data=st.data(),
       w=st.integers(min_value=1, max_value=12),
       h=st.integers(min_value=1, max_value=10))
def test_rgb_420_roundtrip_bounded_error_on_2x2_cells(data, w, h):
    """4:2:0 (r6): color constant per 2x2 cell, so the chroma box
    downsample and the decoder's replication upsample are mutually
    exact — the residual error is the same DCT/quant/color-rounding
    budget as the 4:4:4 test."""
    cells = np.array(data.draw(st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=w * h * 3, max_size=w * h * 3)),
        dtype=np.uint8).reshape(h, w, 3)
    px = np.repeat(np.repeat(cells, 2, axis=0), 2, axis=1)
    out = parse_jpeg(encode_jpeg_rgb_420(px, qtable=np.ones(64, dtype=int)))
    assert out is not None
    pw, ph, got = out
    assert (pw, ph) == (2 * w, 2 * h)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 8


@settings(max_examples=30, deadline=None)
@given(data=st.data(),
       w=st.integers(min_value=1, max_value=21),
       h=st.integers(min_value=1, max_value=19))
def test_rgb_420_neutral_chroma_arbitrary_dims(data, w, h):
    """4:2:0 at ARBITRARY (odd, non-MCU-aligned) dims: r=g=b makes
    chroma exactly 128 everywhere (downsample/upsample exact), while
    the luma plane carries arbitrary content through the interleaved
    2x2-luma MCU walk and the 16-pixel MCU edge padding."""
    g = np.array(data.draw(st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=w * h, max_size=w * h)), dtype=np.uint8).reshape(h, w)
    px = np.repeat(g[:, :, None], 3, axis=2)
    out = parse_jpeg(encode_jpeg_rgb_420(px, qtable=np.ones(64, dtype=int)))
    assert out is not None
    pw, ph, got = out
    assert (pw, ph) == (w, h)
    assert np.abs(got.astype(int) - px.astype(int)).max() <= 8


@settings(max_examples=20, deadline=None)
@given(data=st.data(),
       w=st.integers(min_value=1, max_value=10),
       h=st.integers(min_value=1, max_value=16))
def test_422_and_440_asymmetric_sampling_roundtrip(data, w, h):
    """Asymmetric factors (4:2:2 = 2x1 luma, and 4:4:0 = 1x2) exercise
    the rx != ry replication upsample and non-square MCU geometry the
    2x2 test can't reach. Colors constant per 2-pixel cell along the
    subsampled axis keep the chroma path exact."""
    from influxdb_ha_spark.operators.multimodal import _encode_jpeg_planes

    cells = np.array(data.draw(st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=w * h, max_size=w * h)), dtype=np.uint8).reshape(h, w)
    for axis, sampling in ((1, [(2, 1), (1, 1), (1, 1)]),    # 4:2:2
                           (0, [(1, 2), (1, 1), (1, 1)])):   # 4:4:0
        g = np.repeat(cells, 2, axis=axis).astype(float)
        gw, gh = g.shape[1], g.shape[0]
        half = cells.astype(float)    # exact half-res chroma plane
        raw = _encode_jpeg_planes(
            [g, half * 0 + 128.0, half * 0 + 128.0], gw, gh,
            qtable=np.ones(64, dtype=int), sampling=sampling)
        out = parse_jpeg(raw)
        assert out is not None
        pw, ph, got = out
        assert (pw, ph) == (gw, gh)
        assert np.abs(got[:, :, 1].astype(int)
                      - g.astype(int)).max() <= 8, (axis, sampling)


def test_rejects_malformed():
    px = np.zeros((8, 8), dtype=np.uint8)
    raw = encode_jpeg_gray(px)
    assert parse_jpeg(raw) is not None
    assert parse_jpeg(raw[:len(raw) // 2]) is None     # truncated entropy
    assert parse_jpeg(raw[:10]) is None                # header only
    assert parse_jpeg(b"\x00\x01") is None             # wrong magic
    # progressive SOF (0xC2) must be rejected, not misdecoded
    prog = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert parse_jpeg(prog) is None
    # 2x2 factors on a SINGLE-component scan: per T.81 A.2.2 a
    # non-interleaved scan ignores sampling factors — must still decode
    sub = bytearray(raw)
    sof = raw.index(b"\xff\xc0")
    sub[sof + 11] = 0x22                               # comp 1 H/V
    assert parse_jpeg(bytes(sub)) is not None
    # >2x sampling factors (unsupported) rejected, not misdecoded
    sub[sof + 11] = 0x33
    assert parse_jpeg(bytes(sub)) is None
    sub[sof + 11] = 0x13
    assert parse_jpeg(bytes(sub)) is None
    # every mid-scan truncation of a multi-block image must return None,
    # even when the synthesized zero-bits happen to parse (r5 review:
    # the overrun flag, not the unreachable pos>len check)
    big = encode_jpeg_gray(
        (np.arange(24 * 24, dtype=np.uint8) % 251).reshape(24, 24))
    sos = big.index(b"\xff\xda")
    for cut in range(sos + 14, len(big) - 2, 7):
        assert parse_jpeg(big[:cut]) is None, cut


def test_dc_prediction_across_blocks_and_byte_stuffing():
    """A gradient image exercises non-zero DC diffs across many blocks;
    values near 255 with small quantizers produce 0xFF entropy bytes,
    exercising the stuffing path on both sides."""
    x = np.arange(48)
    y = np.arange(40)
    px = np.clip(x[None, :] * 5 + y[:, None] * 2, 0, 255).astype(np.uint8)
    out = parse_jpeg(encode_jpeg_gray(px, qtable=np.ones(64, dtype=int)))
    assert out is not None
    pw, ph, got = out
    assert (pw, ph) == (48, 40)
    assert np.abs(got[:, :, 0].astype(int) - px.astype(int)).max() <= 4
