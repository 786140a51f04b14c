"""Multimodal columns: image/audio/video as opaque `binary` payloads with
typed metadata, processed via Arrow-batched Pandas UDFs.

The container has no image/audio libraries, so the *decode* step is stubbed
(deterministic fake decode keyed on the payload hash, or NotImplementedError
for the real-codec path) — but the Spark-side plumbing is real and tested:
schemas, partitioning, `mapInPandas` batch iteration, and the UDF signatures
are exactly what a real decoder would slot into.

Scale shape: payloads stay in their partitions end-to-end (map-only); the
Arrow transfer batches rows so per-row Python overhead is amortized; metadata
extraction that doesn't need the codec (sizes, digests, magic bytes) is pure
column expressions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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


def decode_image_stub(df: DataFrame, id_col: str = "doc_id",
                      payload_col: str = "payload",
                      real_codec: bool = False) -> DataFrame:
    """Decode-and-measure via `mapInPandas` — the real-operator plumbing.

    With `real_codec=True` this raises NotImplementedError where PIL would be
    called (the container has no imaging libs); the default path produces a
    deterministic fake decode (dimensions derived from the payload digest) so
    tests can assert the batch shape, schema, and distribution behavior.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            if real_codec:
                raise NotImplementedError(
                    "image codec not available in this environment; "
                    "plug PIL.Image.open here")
            digests = [hashlib.md5(bytes(b)).digest() if b is not None else None
                       for b in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col],
                "width": [(d[0] << 8 | d[1]) % 4096 + 1 if d else 0 for d in digests],
                "height": [(d[2] << 8 | d[3]) % 4096 + 1 if d else 0 for d in digests],
                "channels": [3 if d else 0 for d in digests],
                "format": ["fake" if d else None for d in digests],
                "decode_ok": [d is not None for d in digests],
            })

    return df.select(id_col, payload_col).mapInPandas(decode, DECODED_SCHEMA)


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


def resize_stub(df: DataFrame, id_col: str = "doc_id",
                payload_col: str = "payload",
                target: tuple = (256, 256)) -> DataFrame:
    """Image-resize plumbing via `mapInPandas`: fake-decode dimensions
    (digest-derived, same convention as decode_image_stub), compute the
    scale factors a real resampler would use. Swap the body for
    PIL.Image.resize when a codec is present — schema and batch shape
    stay identical."""
    tw, th = target

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "out_w",
                                    "out_h", "scale_x", "scale_y")}
            for i, b in zip(pdf[id_col], pdf[payload_col]):
                if b is None:
                    continue
                d = hashlib.md5(bytes(b)).digest()
                w = (d[0] << 8 | d[1]) % 4096 + 1
                h = (d[2] << 8 | d[3]) % 4096 + 1
                rows["doc_id"].append(i)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_w"].append(tw)
                rows["out_h"].append(th)
                rows["scale_x"].append(round(tw / w, 6))
                rows["scale_y"].append(round(th / h, 6))
            yield pd.DataFrame(rows)

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


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

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_SCHEMA)
