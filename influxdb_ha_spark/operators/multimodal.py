"""Multimodal columns: image/audio/video as opaque `binary` payloads with
typed metadata, processed via Arrow-batched Pandas UDFs.

Image *metadata* decode is REAL: `synthesize_image_payload` builds valid
PNG/JPEG/GIF byte prefixes (PNG IHDR with correct CRC32, JPEG APP0+SOF0
marker stream, GIF logical screen descriptor) and `decode_image_metadata`
parses them back with pure-stdlib byte arithmetic — no imaging library
needed, exactly how exiftool-style header sniffers work.

Audio and video are REAL at the container level too: `synthesize_wav_payload`
emits valid RIFF/WAVE bytes whose PCM body is chunk-walked and RMS-analyzed
with numpy (`audio_features`); `synthesize_gif_animation` emits multi-frame
GIFs whose block structure (descriptors, sub-block chains, extensions) is
genuinely walked to enumerate frames (`frame_sample`).

Pixel rasterization is REAL on the uncompressed path: `synthesize_bmp_payload`
emits valid 24-bit BMPs (bottom-up rows, stride alignment) that
`resize_image` parses and nearest-neighbor-resamples with numpy — no imaging
library. PNG is now fully real too: its compression is stdlib `zlib`, so
`synthesize_png_payload` emits spec-valid truecolor PNGs (CRC'd chunks,
zlib-deflated IDAT, all five scanline filter types) and `parse_png`
inflates, un-filters (Sub/Up/Average/Paeth reconstruction) and rasterizes
them — `resize_image` sniffs the codec by magic bytes and resamples either.
JPEG is real too (r5): `encode_jpeg_gray`/`synthesize_jpeg_payload` emit
spec-valid baseline JFIF streams (FDCT, quantization, canonical Huffman
entropy coding with byte stuffing) and `parse_jpeg` is a general baseline
decoder — marker walk, DQT/DHT parse, Huffman entropy decode with RSTn
handling, interleaved-MCU subsampling (4:4:4 / 4:2:2 / 4:2:0 / 4:4:0 —
any 1-2x factor mix, box upsample), dequant, float IDCT, JFIF
YCbCr→RGB. Progressive and >2x-sampled streams return None (documented
limitation).

Scale shape: payloads stay in their partitions end-to-end (map-only); the
Arrow transfer batches rows so per-row Python overhead is amortized; metadata
extraction that doesn't need the codec (sizes, digests, magic bytes) is pure
column expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .util import ensure_min_parallelism

# Schema for decoded image metadata (what a real PIL/OpenCV decode would emit).
DECODED_SCHEMA = ("doc_id long, width int, height int, channels int, "
                  "format string, decode_ok boolean")


def attach_binary_payload(df: DataFrame, src_col: str, id_col: str = "doc_id",
                          media_type: str = "image/png") -> DataFrame:
    """Model a multimodal table: opaque binary payload + typed metadata.

    In production the payload comes off object storage; here we derive it
    from an existing column so the pipeline is runnable on the testdata.
    """
    payload = F.encode(F.col(src_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.octet_length(payload).alias("payload_bytes"),
        F.md5(F.col(src_col).cast("string")).alias("payload_md5"))


def _be(col_or_int, nbytes: int) -> Column:
    """Integer → big-endian binary of `nbytes` (hex-pad-unhex, JVM-side)."""
    c = col_or_int if isinstance(col_or_int, Column) else F.lit(col_or_int)
    return F.unhex(F.lpad(F.hex(c), 2 * nbytes, "0"))


def _le2(c: Column) -> Column:
    """Integer → 2-byte little-endian binary."""
    return F.concat(_be(c % 256, 1), _be((c / 256).cast("int") % 256, 1))


def synthesize_image_payload(df: DataFrame, src_col: str,
                             id_col: str = "doc_id") -> DataFrame:
    """Opaque binary image column with a VALID format header.

    Format rotates by id (png/jpeg/gif); dimensions are derived from the
    row (width = id % 4096 + 1, height = utf8-byte-length % 4096 + 1) so a
    header *parser* can be verified against the generating arithmetic.
    The header prefixes are structurally real:

    - PNG: 8-byte signature, IHDR length+type, 4-byte BE width/height,
      bit-depth 8 / color-type 6 (RGBA), correct CRC32 over the chunk.
    - JPEG: SOI, a full JFIF APP0 segment, then SOF0 with 2-byte BE
      height/width and 3 components.
    - GIF: GIF89a + 2-byte LE logical-screen width/height.

    The source text follows as the (undecodable) "pixel data" so payload
    sizes stay realistic. Entirely column expressions — no Python.
    """
    body = F.encode(F.col(src_col), "utf-8")
    w = (F.col(id_col) % 4096 + 1).cast("int")
    h = (F.octet_length(body) % 4096 + 1).cast("int")
    fmt = F.col(id_col) % 3  # 0=png 1=jpeg 2=gif

    ihdr_data = F.concat(F.encode(F.lit("IHDR"), "utf-8"), _be(w, 4),
                         _be(h, 4), F.unhex(F.lit("0806000000")))
    png = F.concat(F.unhex(F.lit("89504E470D0A1A0A")),
                   F.unhex(F.lit("0000000D")), ihdr_data,
                   _be(F.crc32(ihdr_data), 4))
    jpeg = F.concat(
        F.unhex(F.lit("FFD8")),                       # SOI
        F.unhex(F.lit("FFE000104A46494600010100000100010000")),  # APP0/JFIF
        F.unhex(F.lit("FFC0001108")),                 # SOF0, len 17, 8-bit
        _be(h, 2), _be(w, 2),
        F.unhex(F.lit("03012200021101031101")))       # 3 components
    gif = F.concat(F.encode(F.lit("GIF89a"), "utf-8"),
                   _le2(w), _le2(h), F.unhex(F.lit("000000")))

    header = F.when(fmt == 0, png).when(fmt == 1, jpeg).otherwise(gif)
    media = (F.when(fmt == 0, "image/png").when(fmt == 1, "image/jpeg")
             .otherwise("image/gif"))
    payload = F.concat(header, body)
    return df.select(F.col(id_col), payload.alias("payload"),
                     media.alias("media_type"),
                     F.octet_length(payload).alias("payload_bytes"))


# pure-stdlib header parsing (the real metadata decode) ---------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_header(raw: bytes) -> tuple[int, int, int, str] | None:
    """(width, height, channels, format) from PNG/JPEG/GIF header bytes,
    or None if the payload isn't one of those. stdlib-only byte
    arithmetic: PNG IHDR at fixed offsets, JPEG SOFn marker scan, GIF
    logical screen descriptor."""
    if len(raw) >= 26 and raw[:8] == _PNG_SIG and raw[12:16] == b"IHDR":
        w = int.from_bytes(raw[16:20], "big")
        h = int.from_bytes(raw[20:24], "big")
        channels = _PNG_CHANNELS.get(raw[25], 3)
        return w, h, channels, "png"
    if len(raw) >= 4 and raw[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(raw) and raw[i] == 0xFF:
            marker = raw[i + 1]
            if marker in _SOF_MARKERS:
                h = int.from_bytes(raw[i + 5:i + 7], "big")
                w = int.from_bytes(raw[i + 7:i + 9], "big")
                return w, h, raw[i + 9], "jpeg"
            if 0xD0 <= marker <= 0xD9:  # RST/SOI/EOI: no length field
                i += 2
                continue
            i += 2 + int.from_bytes(raw[i + 2:i + 4], "big")
        return None
    if len(raw) >= 10 and raw[:6] in (b"GIF87a", b"GIF89a"):
        w = int.from_bytes(raw[6:8], "little")
        h = int.from_bytes(raw[8:10], "little")
        return w, h, 3, "gif"
    return None


def binary_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Codec-free metadata: byte length, digest, magic-byte sniff — pure
    column expressions, no Python."""
    p = F.col(payload_col)
    magic = F.hex(F.substring(p, 1, 4))
    sniffed = (F.when(magic.startswith("89504E47"), "png")
               .when(magic.startswith("FFD8FF"), "jpeg")
               .when(magic.startswith("47494638"), "gif")
               .when(magic.startswith("52494646"), "riff")
               .otherwise("unknown"))
    return (df.withColumn("n_bytes", F.octet_length(p))
            .withColumn("sniffed_format", sniffed))


def decode_image_metadata(df: DataFrame, id_col: str = "doc_id",
                          payload_col: str = "payload",
                          real_codec: bool = True) -> DataFrame:
    """Image metadata decode via `mapInPandas` — REAL header parsing.

    Dimensions/channels/format come from `parse_image_header` (stdlib byte
    arithmetic over PNG/JPEG/GIF headers); payloads that aren't one of
    those formats yield decode_ok=false with zeroed dimensions. This is
    the metadata half of what PIL.Image.open does; swap the parser call
    for a full rasterizing decoder when pixel data is needed —
    the mapInPandas batch shape, schema, and partitioning are identical.
    (`real_codec` is kept for API compat; both values take the real
    header-parse path now.)
    """
    del real_codec

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_header(bytes(b)) if b is not None else None
                      for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": [p[0] if p else 0 for p in parsed],
                "height": [p[1] if p else 0 for p in parsed],
                "channels": [p[2] if p else 0 for p in parsed],
                "format": [p[3] if p else None for p in parsed],
                "decode_ok": [p is not None for p in parsed],
            })

    return (ensure_min_parallelism(df).select(id_col, payload_col)
            .mapInPandas(decode, DECODED_SCHEMA))


# Backwards-compatible alias (the decode is no longer a stub).
decode_image_stub = decode_image_metadata


# --- animated GIF: synthesis + REAL block-structure frame walk -------------

def _hexbe(c, nbytes: int) -> Column:
    """Integer → big-endian hex string of `nbytes` bytes."""
    col = c if isinstance(c, Column) else F.lit(c)
    return F.lpad(F.hex(col), 2 * nbytes, "0")


def _hexle2(c) -> Column:
    col = c if isinstance(c, Column) else F.lit(c)
    return F.concat(_hexbe(col % 256, 1),
                    _hexbe((col / 256).cast("int") % 256, 1))


def _hexle4(c) -> Column:
    col = c if isinstance(c, Column) else F.lit(c)
    return F.concat(_hexle2(col % 65536), _hexle2((col / 65536).cast("int")))


def synthesize_gif_animation(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Multi-frame GIF payload with structurally REAL block framing:
    GIF89a signature, logical screen descriptor, then `n_frames` image
    blocks (0x2C image descriptor + LZW-min-code byte + one data sub-block
    + terminator) and the 0x3B trailer. Frame pixel data is filler, but
    every offset a block walker needs is correct, so a real parser must
    actually walk sub-block chains to count frames. n_frames = id%10+1,
    frame size = (id%256+1) × ((id*7)%256+1). Pure column expressions."""
    n_frames = (F.col(id_col) % 10 + 1).cast("int")
    w = (F.col(id_col) % 256 + 1).cast("int")
    h = ((F.col(id_col) * 7) % 256 + 1).cast("int")
    frame_hex = F.concat(
        F.lit("2C"), F.lit("0000"), F.lit("0000"),      # separator, left, top
        _hexle2(w), _hexle2(h), F.lit("00"),            # size, no local table
        F.lit("02"),                                    # LZW min code size
        F.lit("04"), F.lit("DEADBEEF"),                 # one 4-byte sub-block
        F.lit("00"))                                    # sub-block terminator
    payload_hex = F.concat(
        F.lit("474946383961"),                          # "GIF89a"
        _hexle2(w), _hexle2(h), F.lit("000000"),        # LSD, no global table
        F.repeat(frame_hex, n_frames),
        F.lit("3B"))                                    # trailer
    return df.select(F.col(id_col), F.unhex(payload_hex).alias("payload"),
                     F.lit("image/gif").alias("media_type"))


def parse_gif_frames(raw: bytes) -> list[tuple[int, int]] | None:
    """Walk a GIF's block structure and return per-frame (width, height) —
    the frame-enumeration half of a video decoder, stdlib-only. Handles
    global/local color tables, extension blocks, and sub-block chains;
    returns None on malformed payloads."""
    if len(raw) < 14 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    flags = raw[10]
    pos = 13
    if flags & 0x80:                       # global color table
        pos += 3 * (2 << (flags & 7))
    frames: list[tuple[int, int]] = []
    try:
        while pos < len(raw):
            b = raw[pos]
            if b == 0x2C:                  # image descriptor
                fw = int.from_bytes(raw[pos + 5:pos + 7], "little")
                fh = int.from_bytes(raw[pos + 7:pos + 9], "little")
                lflags = raw[pos + 9]
                pos += 10
                if lflags & 0x80:          # local color table
                    pos += 3 * (2 << (lflags & 7))
                pos += 1                   # LZW min code size
                while raw[pos] != 0:       # data sub-block chain
                    pos += 1 + raw[pos]
                pos += 1
                frames.append((fw, fh))
            elif b == 0x21:                # extension: label + sub-blocks
                pos += 2
                while raw[pos] != 0:
                    pos += 1 + raw[pos]
                pos += 1
            elif b == 0x3B:                # trailer
                return frames
            else:
                return None
    except IndexError:
        return None
    return frames


FRAMES_SCHEMA = ("doc_id long, frame_index int, frame_w int, frame_h int, "
                 "n_frames int")


def frame_sample(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload",
                 every_n: int = 10) -> DataFrame:
    """Frame sampling over animated-GIF payloads: REAL block-walk frame
    enumeration (`parse_gif_frames`) inside `mapInPandas`, emitting every
    `every_n`-th frame. Map-only, Arrow-batched; unparseable payloads are
    skipped (dead-letter path). Swap the walker for a video demuxer when
    codecs are available — schema and batch shape stay identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_index", "frame_w",
                                    "frame_h", "n_frames")}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                frames = parse_gif_frames(bytes(b)) if b is not None else None
                if not frames:
                    continue
                for fi in range(0, len(frames), every_n):
                    rows["doc_id"].append(i)
                    rows["frame_index"].append(fi)
                    rows["frame_w"].append(frames[fi][0])
                    rows["frame_h"].append(frames[fi][1])
                    rows["n_frames"].append(len(frames))
            yield pd.DataFrame(rows)

    return (ensure_min_parallelism(df).select(id_col, payload_col)
            .mapInPandas(run, FRAMES_SCHEMA))


RESIZED_SCHEMA = ("doc_id long, width long, height long, out_w long, "
                  "out_h long, scale_x double, scale_y double")


def resize_plan(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload",
                target: tuple = (256, 256)) -> DataFrame:
    """Resize planning via `mapInPandas`: REAL header-parsed source
    dimensions + the scale factors a resampler would apply. The pixel
    resample itself needs a rasterizing codec (absent here) — plug
    PIL.Image.resize into the loop; schema and batch shape stay
    identical. Unparseable payloads are skipped (a real pipeline's
    dead-letter path)."""
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "out_w",
                                    "out_h", "scale_x", "scale_y")}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                p = parse_image_header(bytes(b)) if b is not None else None
                if p is None:
                    continue
                w, h = p[0], p[1]
                rows["doc_id"].append(i)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_w"].append(tw)
                rows["out_h"].append(th)
                rows["scale_x"].append(round(tw / w, 6))
                rows["scale_y"].append(round(th / h, 6))
            yield pd.DataFrame(rows)

    return (ensure_min_parallelism(df).select(id_col, payload_col)
            .mapInPandas(run, RESIZED_SCHEMA))


# Backwards-compatible alias (source dims are now really parsed).
resize_stub = resize_plan


# --- BMP: full raster synthesis + REAL nearest-neighbor pixel resample -----
# BMP (BITMAPFILEHEADER + BITMAPINFOHEADER + uncompressed 24-bit BGR rows,
# bottom-up, 4-byte row alignment) needs no compression codec, so with it
# the resize path becomes END-TO-END REAL: synthesized full raster → header
# + pixel parse → numpy nearest-neighbor resample — no imaging library.

def synthesize_bmp_payload(df: DataFrame,
                           id_col: str = "doc_id") -> DataFrame:
    """VALID uncompressed 24-bit BMP per row. Dimensions derive from the
    id (w = id%16+4, h = id%12+3) and the deterministic pixel pattern
    pixel(x, y) = (x*7 + y*13 + id) % 256 (replicated to B,G,R) gives the
    resampler a closed-form oracle. Rows are written bottom-up with
    4-byte stride alignment — the format's real quirks, exercised by the
    parser."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = i % 16 + 4, i % 12 + 3
                x, y = np.arange(w), np.arange(h)
                gray = ((x[None, :] * 7 + y[:, None] * 13 + i) % 256
                        ).astype(np.uint8)                # h×w, top-down
                bgr = np.repeat(gray[:, :, None], 3, axis=2)
                stride = (w * 3 + 3) // 4 * 4
                rows = np.zeros((h, stride), dtype=np.uint8)
                rows[:, :w * 3] = bgr.reshape(h, w * 3)
                body = rows[::-1].tobytes()               # bottom-up
                hdr = (b"BM" + (54 + len(body)).to_bytes(4, "little")
                       + b"\x00\x00\x00\x00" + (54).to_bytes(4, "little")
                       + (40).to_bytes(4, "little")
                       + w.to_bytes(4, "little") + h.to_bytes(4, "little")
                       + (1).to_bytes(2, "little")
                       + (24).to_bytes(2, "little")
                       + (0).to_bytes(4, "little")
                       + len(body).to_bytes(4, "little")
                       + (2835).to_bytes(4, "little") * 2
                       + (0).to_bytes(4, "little") * 2)
                ids.append(i)
                payloads.append(hdr + body)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (ensure_min_parallelism(df).select(id_col)
            .mapInPandas(run, "doc_id long, payload binary"))


def parse_bmp(raw: bytes):
    """(width, height, pixels h×w×3 top-down uint8) or None. Pure stdlib
    header walk + one numpy reshape; handles bottom-up storage and row
    stride padding; rejects non-24bpp / compressed variants."""
    import numpy as np
    if len(raw) < 54 or raw[:2] != b"BM":
        return None
    off = int.from_bytes(raw[10:14], "little")
    w = int.from_bytes(raw[18:22], "little", signed=True)
    h = int.from_bytes(raw[22:26], "little", signed=True)
    bpp = int.from_bytes(raw[28:30], "little")
    comp = int.from_bytes(raw[30:34], "little")
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    stride = (w * 3 + 3) // 4 * 4
    n = stride * abs(h)
    if off + n > len(raw):
        return None
    body = np.frombuffer(raw, dtype=np.uint8, count=n, offset=off)
    px = body.reshape(abs(h), stride)[:, :w * 3].reshape(abs(h), w, 3)
    if h > 0:
        px = px[::-1]                                    # → top-down
    return w, abs(h), px


# --- PNG: spec-valid synthesis + REAL inflate/un-filter decode -------------
# PNG's only codec is DEFLATE — stdlib zlib — so unlike JPEG the full
# decode is expressible with no imaging dependency: chunk walk (CRC-checked)
# → zlib.decompress(IDAT) → per-scanline filter reconstruction (the five
# spec filters: None/Sub/Up/Average/Paeth) → h×w×3 raster.

def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): nearest of left/up/up-left to the
    initial estimate a + b − c, ties broken left, up, up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def synthesize_png_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """VALID truecolor (8-bit RGB) PNG per row, compressed with stdlib
    zlib. Dimensions derive from the id (w = id%14+5, h = id%10+4) and the
    pixel pattern px(x, y) = (x*7 + y*13 + id) % 256 (replicated to R,G,B)
    gives the decoder a closed-form oracle. Each scanline is written with
    filter type (y + id) % 5, so every one of the five spec filters —
    including Paeth — is round-tripped, and every chunk carries its real
    CRC32."""
    import zlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def chunk(tag: bytes, data: bytes) -> bytes:
            return (len(data).to_bytes(4, "big") + tag + data
                    + zlib.crc32(tag + data).to_bytes(4, "big"))

        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = i % 14 + 5, i % 10 + 4
                x, y = np.arange(w), np.arange(h)
                gray = ((x[None, :] * 7 + y[:, None] * 13 + i) % 256
                        ).astype(np.uint8)
                rgb = np.repeat(gray[:, :, None], 3, axis=2)  # h×w×3
                raw = rgb.reshape(h, w * 3).astype(np.int32)
                lines = []
                prev = np.zeros(w * 3, dtype=np.int32)
                for yy in range(h):
                    cur = raw[yy]
                    left = np.concatenate([[0, 0, 0], cur[:-3]])
                    upleft = np.concatenate([[0, 0, 0], prev[:-3]])
                    f = (yy + i) % 5
                    if f == 0:
                        out = cur
                    elif f == 1:
                        out = cur - left
                    elif f == 2:
                        out = cur - prev
                    elif f == 3:
                        out = cur - (left + prev) // 2
                    else:
                        pred = np.array([_paeth(int(a), int(b), int(c))
                                         for a, b, c in
                                         zip(left, prev, upleft)])
                        out = cur - pred
                    lines.append(bytes([f])
                                 + (out % 256).astype(np.uint8).tobytes())
                    prev = cur
                ihdr = (w.to_bytes(4, "big") + h.to_bytes(4, "big")
                        + bytes([8, 2, 0, 0, 0]))  # 8-bit, truecolor
                payload = (_PNG_SIG + chunk(b"IHDR", ihdr)
                           + chunk(b"IDAT", zlib.compress(b"".join(lines)))
                           + chunk(b"IEND", b""))
                ids.append(i)
                payloads.append(payload)
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (ensure_min_parallelism(df).select(id_col)
            .mapInPandas(run, "doc_id long, payload binary"))


def parse_png(raw: bytes):
    """(width, height, pixels h×w×3 top-down uint8) or None — a REAL PNG
    decode: CRC-checked chunk walk, zlib inflate of the concatenated IDAT
    stream, and per-scanline reconstruction of all five filter types.
    Accepts 8-bit truecolor (color type 2) and grayscale (0),
    non-interlaced; anything else (palette, alpha, 16-bit, Adam7, bad CRC,
    short stream) returns None rather than guessing."""
    import zlib

    import numpy as np
    if len(raw) < 45 or raw[:8] != _PNG_SIG:
        return None
    pos, w = 8, None
    idat = []
    try:
        while pos + 12 <= len(raw):
            ln = int.from_bytes(raw[pos:pos + 4], "big")
            tag = raw[pos + 4:pos + 8]
            data = raw[pos + 8:pos + 8 + ln]
            if len(data) != ln:
                return None
            crc = int.from_bytes(raw[pos + 8 + ln:pos + 12 + ln], "big")
            if zlib.crc32(tag + data) != crc:
                return None
            if tag == b"IHDR":
                w = int.from_bytes(data[0:4], "big")
                h = int.from_bytes(data[4:8], "big")
                depth, ctype, interlace = data[8], data[9], data[12]
                if depth != 8 or ctype not in (0, 2) or interlace != 0:
                    return None
                ch = 3 if ctype == 2 else 1
            elif tag == b"IDAT":
                idat.append(data)
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if w is None or not idat or w <= 0 or h <= 0:
            return None
        body = zlib.decompress(b"".join(idat))
    except (zlib.error, IndexError):
        return None
    rowlen = 1 + w * ch
    if len(body) != rowlen * h:
        return None
    fl = np.frombuffer(body, dtype=np.uint8).reshape(h, rowlen)
    recon = np.zeros((h, w * ch), dtype=np.uint8)
    prev = np.zeros(w * ch, dtype=np.int32)
    for yy in range(h):
        f, line = int(fl[yy, 0]), fl[yy, 1:].astype(np.int32)
        if f == 0:
            cur = line
        elif f == 2:
            cur = (line + prev) % 256
        elif f == 1:
            # Sub: recon[i] = filt[i] + recon[i−bpp] — a per-channel
            # cumulative sum; uint8 accumulate wraps mod 256 natively
            cur = np.add.accumulate(
                line.astype(np.uint8).reshape(w, ch), axis=0,
                dtype=np.uint8).reshape(w * ch).astype(np.int32)
        elif f in (3, 4):
            # Average/Paeth depend on the just-reconstructed left pixel —
            # inherently sequential within the scanline
            cur = np.empty(w * ch, dtype=np.int32)
            for k in range(w * ch):
                left = int(cur[k - ch]) if k >= ch else 0
                up = int(prev[k])
                ul = int(prev[k - ch]) if k >= ch else 0
                pred = (left + up) // 2 if f == 3 else _paeth(left, up, ul)
                cur[k] = (int(line[k]) + pred) % 256
        else:
            return None
        recon[yy] = cur.astype(np.uint8)
        prev = cur
    px = recon.reshape(h, w, ch)
    if ch == 1:
        px = np.repeat(px, 3, axis=2)
    return w, h, px


def _parse_raster(raw: bytes):
    """Codec dispatch by magic bytes: BMP, PNG and baseline JPEG all
    decode to the same (w, h, h×w×3) raster contract; unknown containers
    → None."""
    if raw[:2] == b"BM":
        return parse_bmp(raw)
    if raw[:8] == _PNG_SIG:
        return parse_png(raw)
    if raw[:2] == b"\xff\xd8":
        return parse_jpeg(raw)
    return None


RESIZE_PX_SCHEMA = ("doc_id long, width long, height long, out_w long, "
                    "out_h long, mean_px double, corner_px long")


def resize_image(df: DataFrame, id_col: str = "doc_id",
                 payload_col: str = "payload",
                 target: tuple = (8, 8)) -> DataFrame:
    """REAL pixel resample: parse the BMP raster, nearest-neighbor
    index-map to `target` (src = (dst*src_dim)//dst_dim — pure integer
    arithmetic, mirrorable in the SQL oracle), and emit resample
    statistics (mean of the resized raster + its bottom-right pixel).
    Map-only Arrow batches; unparseable payloads are skipped (dead-letter
    path). The codec is sniffed per payload by magic bytes — uncompressed
    BMP and zlib-inflated PNG both land on the same raster contract."""
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "out_w",
                                    "out_h", "mean_px", "corner_px")}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                p = _parse_raster(bytes(b)) if b is not None else None
                if p is None:
                    continue
                w, h, px = p
                xs = (np.arange(tw) * w) // tw
                ys = (np.arange(th) * h) // th
                res = px[ys][:, xs]                       # th×tw×3
                rows["doc_id"].append(int(i))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_w"].append(tw)
                rows["out_h"].append(th)
                rows["mean_px"].append(round(float(res.mean()), 6))
                rows["corner_px"].append(int(res[-1, -1, 0]))
            yield pd.DataFrame(rows)

    return (ensure_min_parallelism(df).select(id_col, payload_col)
            .mapInPandas(run, RESIZE_PX_SCHEMA))


# --- WAV/PCM: synthesis + REAL RIFF parse and RMS DSP ----------------------

def synthesize_wav_payload(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """VALID RIFF/WAVE payload per row: canonical header (PCM, mono,
    8 kHz, 16-bit) + a real PCM body — a square wave alternating ±amp with
    amp = (id*97)%30000+1000 over (id%50+20) sample pairs. Every chunk
    size field is correct, so a real RIFF parser round-trips it, and the
    square wave gives the DSP a closed-form check: RMS == amp exactly.
    Pure column expressions (hex-assembled, one unhex)."""
    amp = ((F.col(id_col) * 97) % 30000 + 1000).cast("int")
    n_pat = (F.col(id_col) % 50 + 20).cast("int")       # sample pairs
    data_size = n_pat * 4                               # bytes (2 × int16)
    pcm_hex = F.repeat(F.concat(_hexle2(amp), _hexle2(65536 - amp)), n_pat)
    payload_hex = F.concat(
        F.lit("52494646"), _hexle4(data_size + 36),     # "RIFF", riff size
        F.lit("57415645"),                              # "WAVE"
        F.lit("666D7420"), _hexle4(16),                 # "fmt ", chunk size
        _hexle2(1), _hexle2(1),                         # PCM, mono
        _hexle4(8000), _hexle4(16000),                  # rate, byte rate
        _hexle2(2), _hexle2(16),                        # align, bits
        F.lit("64617461"), _hexle4(data_size),          # "data", size
        pcm_hex)
    return df.select(F.col(id_col), F.unhex(payload_hex).alias("payload"),
                     F.lit("audio/wav").alias("media_type"))


def parse_wav(raw: bytes) -> tuple[int, int, int, bytes] | None:
    """(sample_rate, channels, bits, pcm_bytes) from a RIFF/WAVE payload by
    walking the chunk list — the real container parse, stdlib-only."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    rate = channels = bits = None
    pcm = None
    pos = 12
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        size = int.from_bytes(raw[pos + 4:pos + 8], "little")
        body = raw[pos + 8:pos + 8 + size]
        if cid == b"fmt " and size >= 16:
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)       # chunks are word-aligned
    if rate is None or pcm is None:
        return None
    return rate, channels, bits, pcm


AUDIO_SCHEMA = "doc_id long, window int, sample_rate int, energy double"


def audio_features(df: DataFrame, id_col: str = "doc_id",
                   payload_col: str = "payload",
                   window_samples: int = 16) -> DataFrame:
    """Windowed RMS energy over REAL parsed PCM: RIFF chunk walk →
    int16 samples → per-window sqrt(mean(x²)), normalized to [0,1] by the
    int16 full scale and rounded with the cross-engine floor convention.
    Map-only, Arrow-batched; non-WAV payloads are skipped."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np
        for pdf in batches:
            rows = {"doc_id": [], "window": [], "sample_rate": [],
                    "energy": []}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                parsed = parse_wav(bytes(b)) if b is not None else None
                if parsed is None:
                    continue
                rate, _ch, _bits, pcm = parsed
                samples = np.frombuffer(pcm, dtype="<i2").astype(np.float64)
                for w in range(0, max(1, len(samples)), window_samples):
                    seg = samples[w:w + window_samples]
                    if not len(seg):
                        break
                    rms = math.sqrt(float(np.mean(seg * seg))) / 32768.0
                    rows["doc_id"].append(i)
                    rows["window"].append(w // window_samples)
                    rows["sample_rate"].append(rate)
                    rows["energy"].append(
                        math.floor(rms * 1_000_000 + 0.5) / 1_000_000)
            yield pd.DataFrame(rows)

    return (ensure_min_parallelism(df).select(id_col, payload_col)
            .mapInPandas(run, AUDIO_SCHEMA))


# --- Baseline JPEG: from-scratch encoder + decoder (ITU T.81) --------------
# JPEG's entropy layer is pure bit arithmetic and its transform layer is an
# 8×8 DCT — both expressible with stdlib + numpy, no imaging library. The
# encoder below emits spec-valid baseline JFIF streams (SOI/APP0/DQT/SOF0/
# DHT/SOS/EOI, byte-stuffed entropy data, canonical Huffman tables built
# from BITS/HUFFVAL like Annex C) and `parse_jpeg` is a REAL general
# baseline decoder: marker walk, DQT/DHT/SOF0/SOS parsing, canonical
# Huffman entropy decode with 0xFF00 unstuffing and RSTn handling, DC
# prediction, interleaved-MCU subsampling (any 1-2x h/v factor mix: 4:4:4,
# 4:2:2, 4:2:0, 4:4:0; box upsample), dequantization, float IDCT, level
# shift, and JFIF YCbCr→RGB for 3-component scans. Progressive and
# >2x-sampled streams return None rather than guessing (documented
# limitation; the reference's surface is metadata-level only —
# syncing/importer.go has no pixel path).

_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Huffman table specs as (BITS counts-by-length, HUFFVAL symbol list).
# Validity only requires a canonical prefix code (Annex C); these compact
# tables cover every symbol the encoder can emit: DC categories 0-11 (all
# 4-bit codes), AC EOB/ZRL + all (run, size) pairs for size 1-10 (all
# 8-bit codes). Both leave the all-ones code unassigned.
_JPEG_DC_SPEC = ([0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
                 list(range(12)))
_JPEG_AC_SPEC = ([0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0],
                 [0x00, 0xF0] + [(r << 4) | s
                                 for r in range(16) for s in range(1, 11)])


def _jpeg_canonical_codes(counts, symbols):
    """Annex C code assignment: (symbol -> (code, length))."""
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _dct_basis():
    import numpy as np
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    c[0, :] /= np.sqrt(2.0)
    return c  # C @ B @ C.T = FDCT;  C.T @ F @ C = IDCT


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:      # byte stuffing
                    self.buf.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self) -> bytes:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


def _jpeg_category(v: int) -> int:
    return 0 if v == 0 else abs(v).bit_length()


def _encode_jpeg_planes(planes, w: int, h: int, qtable=None,
                        sampling=None) -> bytes:
    """Spec-valid baseline JFIF encode of 1 (grayscale) or 3 (YCbCr)
    planes: edge-padded 8×8 blocks, float FDCT, quantization, zigzag,
    per-component DC prediction, canonical-Huffman entropy coding with
    byte stuffing. All components share quant/Huffman table 0.

    `sampling` is an optional per-component (h, v) factor list (default
    all (1,1) = the original 4:4:4 walk, whose bitstream is unchanged);
    planes must arrive PRE-DOWNSAMPLED to ceil(w*h_i/hmax) x
    ceil(h*v_i/vmax). Blocks are emitted in interleaved-MCU order
    (T.81 A.2.3), matching _jpeg_scan's reader."""
    import numpy as np
    if qtable is None:
        qtable = np.full(64, 8, dtype=np.int32)   # DC step 8: constant
    q = np.asarray(qtable, dtype=np.int32).reshape(8, 8)   # blocks exact
    nc = len(planes)
    if sampling is None:
        sampling = [(1, 1)] * nc
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for px, (hi, vi) in zip(planes, sampling):
        cw = (w * hi + hmax - 1) // hmax          # component resolution
        ch = (h * vi + vmax - 1) // vmax
        p = np.empty((mcuy * vi * 8, mcux * hi * 8), dtype=np.float64)
        p[:ch, :cw] = px
        p[ch:, :cw] = p[ch - 1:ch, :cw]           # edge replication
        p[:, cw:] = p[:, cw - 1:cw]
        padded.append(p)
    C = _dct_basis()
    dc_codes = _jpeg_canonical_codes(*_JPEG_DC_SPEC)
    ac_codes = _jpeg_canonical_codes(*_JPEG_AC_SPEC)
    bits = _BitWriter()
    preds = [0] * nc

    def put_block(ci, by, bx):
        blk = padded[ci][by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] - 128.0
        fq = np.rint(C @ blk @ C.T / q).astype(np.int64)
        zz = [int(fq.flat[_JPEG_ZIGZAG[k]]) for k in range(64)]
        diff, preds[ci] = zz[0] - preds[ci], zz[0]
        t = _jpeg_category(diff)
        code, ln = dc_codes[t]
        bits.put(code, ln)
        if t:
            bits.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]     # ZRL
                bits.put(code, ln)
                run -= 16
            s = _jpeg_category(zz[k])
            code, ln = ac_codes[(run << 4) | s]
            bits.put(code, ln)
            v = zz[k]
            bits.put(v if v >= 0 else v + (1 << s) - 1, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]         # EOB
            bits.put(code, ln)

    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(nc):
                hi, vi = sampling[ci]
                for v_ in range(vi):
                    for h_ in range(hi):
                        put_block(ci, my * vi + v_, mx * hi + h_)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") \
            + body

    zz_q = bytes(int(q.flat[_JPEG_ZIGZAG[k]]) for k in range(64))
    dqt = seg(0xDB, b"\x00" + zz_q)
    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    sof_comps = b"".join(
        bytes([c + 1, (sampling[c][0] << 4) | sampling[c][1], 0])
        for c in range(nc))
    sof0 = seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
               + bytes([nc]) + sof_comps)
    dht = seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_SPEC[0])
              + bytes(_JPEG_DC_SPEC[1])
              + bytes([0x10]) + bytes(_JPEG_AC_SPEC[0])
              + bytes(_JPEG_AC_SPEC[1]))
    sos_comps = b"".join(bytes([c + 1, 0x00]) for c in range(nc))
    sos = seg(0xDA, bytes([nc]) + sos_comps + bytes([0, 63, 0]))
    return (b"\xff\xd8" + app0 + dqt + sof0 + dht + sos + bits.flush()
            + b"\xff\xd9")


def encode_jpeg_gray(px, qtable=None) -> bytes:
    """Baseline JFIF encode of an h×w uint8 grayscale raster."""
    h, w = px.shape
    return _encode_jpeg_planes([px], w, h, qtable)


def encode_jpeg_rgb(px, qtable=None) -> bytes:
    """Baseline JFIF encode of an h×w×3 uint8 RGB raster via the forward
    JFIF color transform (BT.601 YCbCr), 4:4:4 — the inverse of
    parse_jpeg's output conversion."""
    r = px[:, :, 0].astype(float)
    g = px[:, :, 1].astype(float)
    b = px[:, :, 2].astype(float)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    h, w = px.shape[:2]
    return _encode_jpeg_planes([y, cb, cr], w, h, qtable)


def _box2(p):
    """2x2 box-average downsample with edge replication to even dims —
    the inverse of _jpeg_scan's replication upsample (exact on 2x2-
    constant regions)."""
    import numpy as np
    h, w = p.shape
    if h % 2:
        p = np.vstack([p, p[-1:, :]])
    if w % 2:
        p = np.hstack([p, p[:, -1:]])
    return (p[0::2, 0::2] + p[0::2, 1::2]
            + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0


def encode_jpeg_rgb_420(px, qtable=None) -> bytes:
    """Baseline JFIF 4:2:0 encode — the common camera/phone chroma
    layout (r6, closing the r5 'subsampled' scope gap): full-resolution
    luma with 2x2 sampling factors, chroma 2x2 box-averaged to half
    resolution with 1x1 factors, interleaved-MCU entropy order."""
    r = px[:, :, 0].astype(float)
    g = px[:, :, 1].astype(float)
    b = px[:, :, 2].astype(float)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    h, w = px.shape[:2]
    return _encode_jpeg_planes([y, _box2(cb), _box2(cr)], w, h, qtable,
                               sampling=[(2, 2), (1, 1), (1, 1)])


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops at any
    non-RST marker. RSTn markers byte-align and are consumed by reset()."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.pos = pos
        self.acc = 0
        self.n = 0
        self.done = False
        self.overrun = False   # a bit was requested past the real data

    def _fill(self) -> None:
        if self.pos >= len(self.d):
            self.done = True
            return
        b = self.d[self.pos]
        if b == 0xFF:
            nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else None
            if nxt == 0x00:
                self.pos += 2
            else:                          # a real marker: stop
                self.done = True
                return
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
            if self.done:
                # synthesized bit: the stream is exhausted. Flag it so
                # the scan-level truncation check fires even when the
                # synthetic zeros happen to parse (r5 review: the old
                # `br.pos > len(raw)` check was unreachable — pos never
                # exceeds len).
                self.overrun = True
                return 0
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def at_rst(self):
        """If positioned at an RSTn marker, consume it and return n."""
        self.acc, self.n = 0, 0            # byte-align
        if (self.pos + 1 < len(self.d) and self.d[self.pos] == 0xFF
                and 0xD0 <= self.d[self.pos + 1] <= 0xD7):
            m = self.d[self.pos + 1] & 7
            self.pos += 2
            self.done = False
            return m
        return None


def _huff_decode(br: _BitReader, table: dict) -> int | None:
    code, ln = 0, 0
    while ln < 16:
        code = (code << 1) | br.bit()
        ln += 1
        if br.done:
            return None
        sym = table.get((code, ln))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def parse_jpeg(raw: bytes):
    """(width, height, pixels h×w×3 top-down uint8) or None — a REAL
    baseline JPEG decode: marker walk, DQT/DHT parsing (multi-table
    segments, 8/16-bit quantizers), canonical Huffman entropy decode with
    byte-unstuffing and RSTn predictor resets, dequantization, float
    IDCT, level shift, and JFIF YCbCr→RGB. Grayscale and 3-component
    color at any 1-2x sampling-factor mix (4:4:4 / 4:2:2 / 4:2:0 /
    4:4:0, interleaved MCUs, box chroma upsample); progressive,
    >2x-sampled, arithmetic-coded or truncated streams return None
    rather than guessing."""
    import numpy as np
    if len(raw) < 4 or raw[0:2] != b"\xff\xd8":
        return None
    qtables: dict[int, "np.ndarray"] = {}
    htables: dict[tuple[int, int], dict] = {}
    comps = None
    w = h = 0
    restart_interval = 0
    pos = 2
    try:
        while pos + 4 <= len(raw):
            if raw[pos] != 0xFF:
                return None
            marker = raw[pos + 1]
            if marker == 0xD9:             # EOI before SOS
                return None
            ln = int.from_bytes(raw[pos + 2:pos + 4], "big")
            body = raw[pos + 4:pos + 2 + ln]
            if len(body) != ln - 2:
                return None
            if marker == 0xDB:             # DQT (possibly several tables)
                i = 0
                while i < len(body):
                    prec, tid = body[i] >> 4, body[i] & 15
                    i += 1
                    n = 64 * (2 if prec else 1)
                    vals = body[i:i + n]
                    if len(vals) != n:
                        return None
                    arr = np.zeros(64, dtype=np.int64)
                    for k in range(64):
                        v = (int.from_bytes(vals[2 * k:2 * k + 2], "big")
                             if prec else vals[k])
                        arr[_JPEG_ZIGZAG[k]] = v
                    qtables[tid] = arr.reshape(8, 8)
                    i += n
            elif marker == 0xC4:           # DHT (possibly several tables)
                i = 0
                while i < len(body):
                    cls, tid = body[i] >> 4, body[i] & 15
                    counts = list(body[i + 1:i + 17])
                    nsym = sum(counts)
                    syms = list(body[i + 17:i + 17 + nsym])
                    if len(syms) != nsym:
                        return None
                    codes = _jpeg_canonical_codes(counts, syms)
                    htables[(cls, tid)] = {(c, l): s
                                           for s, (c, l) in codes.items()}
                    i += 17 + nsym
            elif marker == 0xC0 or marker == 0xC1:   # baseline SOF
                h = int.from_bytes(body[1:3], "big")
                w = int.from_bytes(body[3:5], "big")
                nc = body[5]
                if nc not in (1, 3):
                    return None
                comps = []
                for c in range(nc):
                    cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                    hi, vi = hv >> 4, hv & 15
                    if hi not in (1, 2) or vi not in (1, 2):
                        return None        # only 1-2x sampling factors
                    if nc == 1:
                        # non-interleaved single-component scan: the MCU
                        # is ONE data unit and the component is full-res
                        # regardless of declared factors (T.81 A.2.2)
                        hi = vi = 1
                    comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None                # progressive/arithmetic/etc.
            elif marker == 0xDD:           # DRI
                restart_interval = int.from_bytes(body[0:2], "big")
            elif marker == 0xDA:           # SOS: entropy data follows
                if comps is None or w <= 0 or h <= 0:
                    return None
                ns = body[0]
                if ns != len(comps):
                    return None
                by_id = {c["id"]: c for c in comps}
                order = []
                for c in range(ns):
                    cid, tda = body[1 + 2 * c:3 + 2 * c]
                    comp = by_id.get(cid)
                    if comp is None:
                        return None
                    comp["dc"] = htables.get((0, tda >> 4))
                    comp["ac"] = htables.get((1, tda & 15))
                    comp["q"] = qtables.get(comp["tq"])
                    if comp["dc"] is None or comp["ac"] is None \
                            or comp["q"] is None:
                        return None
                    order.append(comp)
                return _jpeg_scan(raw, pos + 2 + ln, order, w, h,
                                  restart_interval)
            pos += 2 + ln
    except (IndexError, ValueError):
        return None
    return None


def _decode_jpeg_block(br, comp):
    """One 8x8 data unit: DC diff + AC run-lengths -> dequant -> IDCT.
    Returns the spatial block (pre level-shift add of 128) or None."""
    import numpy as np
    coef = np.zeros(64, dtype=np.int64)
    t = _huff_decode(br, comp["dc"])
    if t is None or t > 11:
        return None
    diff = _extend(br.bits(t), t) if t else 0
    coef[0] = diff                      # caller adds the predictor
    k = 1
    while k < 64:
        sym = _huff_decode(br, comp["ac"])
        if sym is None:
            return None
        if sym == 0x00:        # EOB
            break
        if sym == 0xF0:        # ZRL
            k += 16
            continue
        k += sym >> 4
        s = sym & 15
        if k > 63 or s == 0:
            return None
        coef[_JPEG_ZIGZAG[k]] = _extend(br.bits(s), s)
        k += 1
    return coef


def _jpeg_scan(raw, pos, comps, w, h, restart_interval):
    import numpy as np
    C = _dct_basis()
    # interleaved MCU geometry (T.81 A.2.3): hmax*8 x vmax*8 pixels per
    # MCU; each component contributes h x v data units per MCU at its
    # OWN (subsampled) resolution. The 1x1-everywhere case degenerates
    # to the per-block walk this decoder shipped with in r5.
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                       dtype=np.float64) for c in comps]
    br = _BitReader(raw, pos)
    preds = [0] * len(comps)
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu and mcu % restart_interval == 0:
                if br.at_rst() is None:
                    return None
                preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                for v_ in range(comp["v"]):
                    for h_ in range(comp["h"]):
                        coef = _decode_jpeg_block(br, comp)
                        if coef is None:
                            return None
                        preds[ci] += int(coef[0])
                        coef[0] = preds[ci]
                        fq = coef.reshape(8, 8) * comp["q"]
                        blk = C.T @ fq @ C + 128.0
                        by = my * comp["v"] + v_
                        bx = mx * comp["h"] + h_
                        planes[ci][by * 8:by * 8 + 8,
                                   bx * 8:bx * 8 + 8] = blk
            mcu += 1
    if br.overrun:                     # truncated inside the scan
        return None
    # bring every component to full resolution: pixel replication (box
    # upsample — the simplest conforming choice; T.81 does not mandate a
    # filter), then crop the MCU padding
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1:
            p = np.repeat(p, ry, axis=0)
        if rx > 1:
            p = np.repeat(p, rx, axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return w, h, np.repeat(g[:, :, None], 3, axis=2)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    px = np.stack([r, g, b], axis=2)
    return w, h, np.clip(np.rint(px), 0, 255).astype(np.uint8)


def synthesize_jpeg420_payload(df: DataFrame, id_col: str = "doc_id"
                               ) -> DataFrame:
    """VALID baseline 4:2:0 JFIF per row (encode_jpeg_rgb_420): 16-aligned
    dims (w = (id%3+2)*16, h = (id%2+2)*16), every 16×16 MACROBLOCK a
    constant gray (r=g=b = (mx*23 + my*31 + id) % 256). r=g=b makes the
    BT.601 chroma exactly 128 (its box downsample and the decoder's
    replication upsample are both identity on the constant plane), the
    16×16-constant luma splits into four constant 8×8 blocks per MCU,
    and with DC quantizer step 8 the whole lossy interleaved-MCU round
    trip is bit-exact — giving the SUBSAMPLED codec path the same
    closed-form SQL oracle contract as synthesize_jpeg_payload's 4:4:4
    path (r6; mm_jpeg_px precedent)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = (i % 3 + 2) * 16, (i % 2 + 2) * 16
                mx = np.arange(w) // 16
                my = np.arange(h) // 16
                g = ((mx[None, :] * 23 + my[:, None] * 31 + i) % 256
                     ).astype(np.uint8)
                px = np.repeat(g[:, :, None], 3, axis=2)
                ids.append(i)
                payloads.append(encode_jpeg_rgb_420(px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (ensure_min_parallelism(df).select(id_col)
            .mapInPandas(run, "doc_id long, payload binary"))


def synthesize_jpeg_payload(df: DataFrame, id_col: str = "doc_id"
                            ) -> DataFrame:
    """VALID baseline JFIF per row, encoded from scratch (encode_jpeg_gray).
    Dimensions are 8-aligned (w = (id%4+2)*8, h = (id%3+2)*8) and every
    8×8 block is CONSTANT with value (bx*17 + by*29 + id) % 256 — constant
    blocks carry only a DC coefficient, and with DC quantizer step 8 the
    round-trip  round(8(v−128)/8)·8/8 + 128 = v  is bit-exact, so the
    lossy codec gets a closed-form SQL oracle. The entropy layer is still
    fully general (Huffman, byte stuffing, DC prediction across blocks)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            ids, payloads = [], []
            for i in pdf[id_col]:
                i = int(i)
                w, h = (i % 4 + 2) * 8, (i % 3 + 2) * 8
                bx = np.arange(w) // 8
                by = np.arange(h) // 8
                px = ((bx[None, :] * 17 + by[:, None] * 29 + i) % 256
                      ).astype(np.uint8)
                ids.append(i)
                payloads.append(encode_jpeg_gray(px))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return (ensure_min_parallelism(df).select(id_col)
            .mapInPandas(run, "doc_id long, payload binary"))


AHASH_SCHEMA = ("doc_id long, width long, height long, ahash_hi long, "
                "ahash_lo long, n_set long")


def image_ahash(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload") -> DataFrame:
    """Perceptual average-hash (aHash) over REAL decoded rasters: decode
    the payload (BMP/PNG/JPEG via the codec dispatch), nearest-neighbor
    resample to 8×8 grayscale (channel 0 — the synthetic rasters are
    gray by construction; a production corpus would luma-weight), and
    set bit (y·8 + x) iff the pixel strictly exceeds the 8×8 mean. The
    threshold compares v·64 > Σv in EXACT integers, so the 64-bit code
    is engine-reproducible bit-for-bit; it is emitted as two unsigned
    32-bit halves (ahash_hi = bits 32..63) because a bare BIGINT would
    go negative when bit 63 is set and signed-shift semantics differ
    across engines. n_set = popcount, the code's darkness profile.

    Map-only Arrow batches (the resize_image shape); undecodable
    payloads are skipped (dead-letter convention).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height",
                                    "ahash_hi", "ahash_lo", "n_set")}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                p = _parse_raster(bytes(b)) if b is not None else None
                if p is None:
                    continue
                w, h, px = p
                xs = (np.arange(8) * w) // 8
                ys = (np.arange(8) * h) // 8
                flat = px[ys][:, xs][:, :, 0].astype(np.int64).ravel()
                total = int(flat.sum())
                code = 0
                for idx, v in enumerate(flat):
                    if int(v) * 64 > total:
                        code |= 1 << idx
                rows["doc_id"].append(int(i))
                rows["width"].append(w)
                rows["height"].append(h)
                rows["ahash_hi"].append(code >> 32)
                rows["ahash_lo"].append(code & 0xFFFFFFFF)
                rows["n_set"].append(bin(code).count("1"))
            yield pd.DataFrame(rows)

    return (ensure_min_parallelism(df).select(id_col, payload_col)
            .mapInPandas(run, AHASH_SCHEMA))


def image_near_dup(ahashes: DataFrame, max_hamming: int = 3,
                   id_col: str = "doc_id",
                   max_bucket: int = 200) -> DataFrame:
    """Near-duplicate IMAGE pairs by aHash Hamming distance ≤
    `max_hamming`, via banded LSH: the 64-bit code splits into four
    16-bit bands; two codes within Hamming distance 3 must agree on at
    least one band (pigeonhole: 4 bands, ≤3 differing bits), so the
    band-bucket join is EXACT candidate generation for the default
    threshold — the doc_simhash_near discipline, but over decoded
    pixels instead of token sets. Raising max_hamming past 3 weakens
    the guarantee to approximate (documented; add bands to restore it).

    Hot-bucket cap (r8, the minhash_candidates mechanics at
    dedup.py:110-153): bucket membership lists are sorted and sliced at
    `max_bucket` docs, so a monochrome or template-heavy corpus — many
    images sharing a 16-bit band value — emits at most max_bucket²/2
    pairs per bucket instead of going quadratic. Capped buckets are
    flagged, not silently dropped: the `truncated` column marks every
    pair at least one of whose generating buckets was capped, and the Hamming-≤3
    EXACTNESS guarantee is conditional on no bucket truncating (a
    truncated=true anywhere means recall may be partial for members
    beyond the cap). The slice keeps the max_bucket SMALLEST ids
    (sort_array), a deterministic choice both engines reproduce.

    Shape at scale: only (id, band_idx, band_value) rides the bucket
    shuffle (three longs); candidate pairs dedup on the (a, b) key;
    hashes join back for the exact popcount verify. No all-pairs
    anything and no uncapped self-join — the brute-force form exists
    only in tests.
    """
    a = ahashes.select(F.col(id_col).alias("__id"),
                       F.col("ahash_hi").alias("__hi"),
                       F.col("ahash_lo").alias("__lo"))
    bands = a.select(
        "__id",
        F.explode(F.array(
            F.struct(F.lit(0).alias("bi"),
                     (F.col("__lo") % 65536).alias("bv")),
            F.struct(F.lit(1).alias("bi"),
                     F.expr("__lo div 65536").alias("bv")),
            F.struct(F.lit(2).alias("bi"),
                     (F.col("__hi") % 65536).alias("bv")),
            F.struct(F.lit(3).alias("bi"),
                     F.expr("__hi div 65536").alias("bv")),
        )).alias("b")).select("__id", "b.bi", "b.bv")
    buckets = (bands.groupBy("bi", "bv")
               .agg(F.sort_array(F.collect_list("__id")).alias("ids"),
                    F.count("*").alias("n")))
    capped = buckets.where(F.col("n") > 1).select(
        "bi", "bv",
        F.slice("ids", 1, max_bucket).alias("ids"),
        (F.col("n") > max_bucket).alias("truncated"))
    # pairs within a bucket: upper triangle over the capped list (the
    # minhash_candidates posexplode × slice shape)
    p = F.explode(F.transform(
        F.sequence(F.lit(1), F.size("ids") - 1),
        lambda i: F.struct(
            F.element_at("ids", i).alias("a"),
            F.slice("ids", i + 1, F.size("ids") - i).alias("rest"))))
    pairs = (capped.select(p.alias("p"), "truncated")
             .select(F.col("p.a").alias("id_a"),
                     F.explode("p.rest").alias("id_b"), "truncated"))
    cand = pairs.groupBy("id_a", "id_b").agg(
        F.max("truncated").alias("truncated"))
    ha = a.select(F.col("__id").alias("id_a"), F.col("__hi").alias("__hi_a"),
                  F.col("__lo").alias("__lo_a"))
    hb = a.select(F.col("__id").alias("id_b"), F.col("__hi").alias("__hi_b"),
                  F.col("__lo").alias("__lo_b"))
    ham = (F.bit_count(F.expr("__hi_a ^ __hi_b"))
           + F.bit_count(F.expr("__lo_a ^ __lo_b"))).cast("long")
    return (cand.join(ha, "id_a").join(hb, "id_b")
            .select("id_a", "id_b", ham.alias("hamming"), "truncated")
            .where(F.col("hamming") <= F.lit(int(max_hamming))))
