"""Multimodal columns: image/audio/video as opaque `binary` payloads with
typed metadata, processed via Arrow-batched Pandas UDFs.

Image *metadata* decode is REAL: `synthesize_image_payload` builds valid
PNG/JPEG/GIF byte prefixes (PNG IHDR with correct CRC32, JPEG APP0+SOF0
marker stream, GIF logical screen descriptor) and `decode_image_metadata`
parses them back with pure-stdlib byte arithmetic — no imaging library
needed, exactly how exiftool-style header sniffers work. Pixel-level
decode (rasterization), video frame decode, and audio DSP would need
codecs the container doesn't ship, so those bodies remain deterministic
fakes behind real `mapInPandas` plumbing, clearly marked `_stub`.

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


def frame_sample_stub(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload",
                      every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.

    The decoder is stubbed (frame count derived from payload size); the
    explode-to-frames shape — the part that matters for partitioning and
    downstream batch processing — is real.
    """
    n_frames = (F.octet_length(F.col(payload_col)) / F.lit(16)).cast("int")
    idx = F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n))
    return (df.select(id_col, payload_col)
            .withColumn("frame_index", F.explode(idx))
            .withColumn("frame_md5",
                        F.md5(F.concat(F.col(payload_col).cast("string"),
                                       F.col("frame_index").cast("string")))))


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


AUDIO_SCHEMA = "doc_id long, window int, energy double"


def audio_features_stub(df: DataFrame, id_col: str = "doc_id",
                        payload_col: str = "payload",
                        window_bytes: int = 64) -> DataFrame:
    """Audio feature-extraction plumbing: one row per fixed-size window with
    a deterministic fake energy value (digest-derived). The windowing
    explode — the shape that matters for partitioning at 100 TB of audio —
    is real; plug an actual DSP/torchaudio call into the body."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = {"doc_id": [], "window": [], "energy": []}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                raw = bytes(b)
                n = max(1, len(raw) // window_bytes)
                for w in range(n):
                    hx = hashlib.md5(raw + str(w).encode()).hexdigest()
                    rows["doc_id"].append(i)
                    rows["window"].append(w)
                    rows["energy"].append(
                        int(hx[:8], 16) % 1_000_000 / 1_000_000)
            yield pd.DataFrame(rows)

    return (ensure_min_parallelism(df).select(id_col, payload_col)
            .mapInPandas(run, AUDIO_SCHEMA))
