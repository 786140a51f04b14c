"""Property test: parse_png must invert a reference PNG encoder for
ARBITRARY rasters and per-scanline filter choices — not just the fixed
synthesis pattern. The encoder here is written from the PNG spec
(filters applied to raw ints, mod-256), independently of the decoder's
numpy reconstruction."""

import zlib

import numpy as np
from hypothesis import given, settings, strategies as st

from influxdb_ha_spark.operators.multimodal import _paeth, parse_png

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (len(data).to_bytes(4, "big") + tag + data
            + zlib.crc32(tag + data).to_bytes(4, "big"))


def encode_png(px: np.ndarray, filters: list[int]) -> bytes:
    """Reference encoder: px is h×w×3 uint8, filters one per scanline."""
    h, w, _ = px.shape
    raw = px.reshape(h, w * 3).astype(int)
    lines = []
    prev = [0] * (w * 3)
    for y in range(h):
        cur = list(raw[y])
        f = filters[y]
        out = []
        for k in range(w * 3):
            left = cur[k - 3] if k >= 3 else 0
            up = prev[k]
            ul = prev[k - 3] if k >= 3 else 0
            pred = {0: 0, 1: left, 2: up, 3: (left + up) // 2,
                    4: _paeth(left, up, ul)}[f]
            out.append((cur[k] - pred) % 256)
        lines.append(bytes([f]) + bytes(out))
        prev = cur
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    return (_PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines)))
            + _chunk(b"IEND", b""))


@settings(max_examples=150, deadline=None)
@given(data=st.data(),
       w=st.integers(min_value=1, max_value=12),
       h=st.integers(min_value=1, max_value=10))
def test_parse_png_inverts_any_encoding(data, w, h):
    px = np.array(data.draw(st.lists(
        st.integers(min_value=0, max_value=255),
        min_size=w * h * 3, max_size=w * h * 3)),
        dtype=np.uint8).reshape(h, w, 3)
    filters = data.draw(st.lists(st.integers(min_value=0, max_value=4),
                                 min_size=h, max_size=h))
    out = parse_png(encode_png(px, filters))
    assert out is not None
    pw, ph, got = out
    assert (pw, ph) == (w, h)
    assert (got == px).all()
