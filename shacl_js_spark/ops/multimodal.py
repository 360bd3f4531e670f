"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as Arrow-
batched mapInPandas stages.

Decode status:
  * image — REAL: payloads are actual P6 PPM files; decode_image parses the
    header + RGB plane with numpy (no external codec needed).
  * audio — REAL: payloads are actual RIFF/WAVE PCM16 files; decode_audio
    parses them with the stdlib `wave` module.
  * video — STUB: no container/codec parseable without external libs;
    _decode_fake produces a deterministic pseudo-signal and a real decoder
    (pyav frame sampling) raises NotImplementedError at the marked point.

The plan shape (mapInPandas over binary columns, metadata pushdown, per-batch
vectorization) is identical for all three — swapping in PIL/pyav is a
one-function change.
"""

from __future__ import annotations

import hashlib
import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),          # image | audio | video
        StructField("payload", BinaryType()),        # opaque encoded bytes
        StructField("width", IntegerType()),         # typed metadata
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("feature", ArrayType(FloatType())),  # extracted embedding
    ]
)

FEATURE_DIM = 8


SAMPLE_RATE = 8000


def _det_bytes(seed: str, n: int) -> bytes:
    """n deterministic bytes from an md5 chain over the seed."""
    out = bytearray()
    block = seed.encode()
    while len(out) < n:
        block = hashlib.md5(block).digest()
        out.extend(block)
    return bytes(out[:n])


def encode_ppm(seed: str, width: int, height: int) -> bytes:
    """A real P6 PPM image with deterministic RGB content."""
    return f"P6\n{width} {height}\n255\n".encode() + _det_bytes(seed, width * height * 3)


def encode_wav(seed: str, duration_ms: int, rate: int = SAMPLE_RATE) -> bytes:
    """A real RIFF/WAVE file (PCM16 mono) with deterministic samples."""
    n = max(1, rate * duration_ms // 1000)
    pcm = np.frombuffer(_det_bytes(seed, n * 2), dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_image(payload: bytes) -> np.ndarray:
    """REAL P6 PPM parse -> float32 (h, w, 3)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    w, h = (int(x) for x in parts[1].split())
    raw = np.frombuffer(parts[3][: w * h * 3], dtype=np.uint8)
    return raw.astype(np.float32).reshape(h, w, 3)


def decode_audio(payload: bytes) -> np.ndarray:
    """REAL WAV parse (stdlib wave) -> float32 samples in [-1, 1]."""
    with wave.open(io.BytesIO(payload), "rb") as w:
        frames = w.readframes(w.getnframes())
    return np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0


def synth_media_table(docs_spans: DataFrame) -> DataFrame:
    """Build the binary media table from the interleaved documents' media
    spans.  Image/audio payloads are REAL encoded files (PPM / WAV) built in
    an Arrow-batched mapInPandas stage; video payloads stay opaque bytes.
    Real ingestion would read object-store blobs instead."""
    media = (
        docs_spans.select(F.explode("spans").alias("span"))
        .filter(F.col("span.kind") != "text")
        .select(
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.kind").alias("kind"),
        )
        .distinct()
    )
    h = F.abs(F.xxhash64("media_ref"))
    meta = media.select(
        "media_ref",
        "kind",
        (F.pmod(h, F.lit(48)) + 16).cast("int").alias("width"),
        (F.pmod(h, F.lit(27)) + 9).cast("int").alias("height"),
        (F.pmod(h, F.lit(160)) + 40).cast("int").alias("duration_ms"),
    )

    def encode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for ref, kind, w, hh, ms in zip(
                pdf["media_ref"], pdf["kind"], pdf["width"], pdf["height"], pdf["duration_ms"]
            ):
                if kind == "image":
                    payloads.append(encode_ppm(ref, int(w), int(hh)))
                elif kind == "audio":
                    payloads.append(encode_wav(ref, int(ms)))
                else:  # video: opaque container bytes (no stdlib codec)
                    payloads.append(_det_bytes(ref, 256))
            pdf = pdf.assign(payload=payloads)
            yield pdf[["media_ref", "kind", "payload", "width", "height", "duration_ms"]]

    return meta.mapInPandas(encode_batches, schema=MEDIA_SCHEMA)


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode for video only: deterministic pseudo-signal from the
    payload bytes.  A real implementation samples frames via pyav — raise
    NotImplementedError here when wiring that in."""
    if kind != "video":
        raise NotImplementedError(f"_decode_fake is video-only, got {kind!r}")
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float32)


def decode(payload: bytes, kind: str) -> np.ndarray:
    if kind == "image":
        return decode_image(payload).ravel()
    if kind == "audio":
        return decode_audio(payload)
    if kind == "video":
        return _decode_fake(payload, kind)
    raise NotImplementedError(f"decode for kind={kind!r} not implemented")


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: mapInPandas over binary payloads.
    Batch shape: whole Arrow record batches in, one feature row out per
    media item — the vectorized path a real decoder would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                sig = decode(payload, kind)
                # fixed-dim pooled feature: mean over FEATURE_DIM strides
                chunks = np.array_split(sig, FEATURE_DIM)
                feats.append([float(np.round(c.mean(), 4)) if len(c) else 0.0 for c in chunks])
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int32"),
                    "feature": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video into frame timestamps
    (decode itself stubbed).  Pure Column ops — the expansion is map-side."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_ref",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
