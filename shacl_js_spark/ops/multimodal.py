"""Multimodal column plumbing: image/audio/video as opaque binary columns with
typed metadata; decode / feature-extract / resize / frame-sample as Arrow-
batched mapInPandas stages.

The actual codecs are NOT in this container, so the decode step is stubbed
behind a deterministic fake (kind-dependent synthetic payloads) while the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch shape —
is real and tested.  Swapping `_decode_fake` for PIL/torchaudio/pyav is a
one-function change; the plan shape (mapInPandas over binary columns,
metadata pushdown, per-batch vectorization) is what matters at 100 TB.
"""

from __future__ import annotations

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


def synth_media_table(docs_spans: DataFrame) -> DataFrame:
    """Build the binary media table from the interleaved documents' media
    spans — payload is a deterministic fake encoding (bytes of the ref hash),
    metadata is hash-derived.  Real ingestion would read object-store blobs."""
    media = (
        docs_spans.select(F.explode("spans").alias("span"))
        .filter(F.col("span.kind") != "text")
        .select(
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.kind").alias("kind"),
        )
        .distinct()
    )
    h = F.xxhash64("media_ref")
    return media.select(
        "media_ref",
        "kind",
        F.encode(F.sha2(F.col("media_ref"), 256), "utf-8").cast("binary").alias("payload"),
        (F.pmod(h, F.lit(1920)) + 64).cast("int").alias("width"),
        (F.pmod(h, F.lit(1080)) + 64).cast("int").alias("height"),
        (F.pmod(h, F.lit(60000)) + 1000).cast("int").alias("duration_ms"),
    )


def _decode_fake(payload: bytes, kind: str) -> np.ndarray:
    """STUB decode: deterministic pseudo-signal from the payload bytes.
    Replace with PIL.Image.open / soundfile.read / pyav frame sampling when
    codecs are available (raise NotImplementedError to make that explicit)."""
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"decode for kind={kind!r} not implemented")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    return arr


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: mapInPandas over binary payloads.
    Batch shape: whole Arrow record batches in, one feature row out per
    media item — the vectorized path a real decoder would use."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                sig = _decode_fake(payload, kind)
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
