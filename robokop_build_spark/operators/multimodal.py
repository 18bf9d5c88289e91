"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The decode step is STUBBED (no image/audio libraries in this container):
`decode_media` raises NotImplementedError unless `fake=True`, in which case
a deterministic md5-derived pseudo-decode stands in. Everything Spark-side —
schema, partitioning, UDF signature, Arrow batch shape — is real and tested,
so swapping in PIL/ffmpeg later touches exactly one function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, span_pos int, media_ref string, media_type string, "
    "payload binary, width int, height int"
)
FEATURE_DIM = 32
FEATURE_SCHEMA = f"doc_id string, span_pos int, media_ref string, feature array<float>"


def attach_media_payloads(spans: DataFrame) -> DataFrame:
    """Media spans (kind image/table) → rows with an opaque binary payload +
    typed metadata. In production the payload is read from object storage by
    ref; here it is derived deterministically from the ref (same schema,
    same batch shape)."""
    media = spans.filter(F.col("kind").isin("image", "table"))
    return media.select(
        "doc_id",
        "span_pos",
        "media_ref",
        F.when(F.col("kind") == "image", F.lit("image/png"))
        .otherwise(F.lit("application/table"))
        .alias("media_type"),
        F.to_binary(F.md5("media_ref"), F.lit("hex")).alias("payload"),
        (F.pmod(F.xxhash64("media_ref"), F.lit(1920)) + F.lit(16)).cast("int").alias("width"),
        (F.pmod(F.xxhash64("media_ref", "doc_id"), F.lit(1080)) + F.lit(16))
        .cast("int")
        .alias("height"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs PIL/ffmpeg (not in this container).

    fake=True returns a deterministic pseudo-decode so the distributed
    plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "media decode requires an image/audio library not present in "
            "this environment; pass fake=True for the deterministic stand-in"
        )
    h = hashlib.md5(payload).digest()
    return np.frombuffer(h * 8, dtype=np.uint8).astype(np.float32)


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: the real
    pattern for image embedding / frame sampling at scale (decode swaps in
    for the stub; batching, schema and partitioning are unchanged)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mt in zip(pdf["payload"], pdf["media_type"]):
                raw = decode_media(bytes(payload), mt, fake=fake)
                vec = raw[:FEATURE_DIM].astype(np.float32)
                n = float(np.linalg.norm(vec)) or 1.0
                feats.append((vec / n).tolist())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "span_pos": pdf["span_pos"],
                    "media_ref": pdf["media_ref"],
                    "feature": feats,
                }
            )

    return media.select(
        "doc_id", "span_pos", "media_ref", "media_type", "payload"
    ).mapInPandas(run, schema=FEATURE_SCHEMA)
