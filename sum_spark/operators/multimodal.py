"""Multimodal column operators: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas functions via
mapInPandas.

No reference analog (the reference is vectors-only); this is the
LLM-pipeline extension for mixed-modality training data. The Spark-side
plumbing — schema, partitioning, UDF signatures, batch iteration — is
real and tested; the actual codec calls (PIL/ffmpeg/soundfile) are not in
this environment, so decoding is gated: ``decoder='strict'`` raises
NotImplementedError at the call site, ``decoder='fake'`` runs a
deterministic stand-in (md5-seeded) that exercises the identical batch
shapes end to end.

Scale notes: binary payloads ride the same parquet scan as everything
else (no side files); per-batch processing bounds memory by the Arrow
batch size (spark.sql.execution.arrow.maxRecordsPerBatch), and feature
extraction is a map-only stage — no shuffle until the downstream
aggregation/join the caller adds.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# Canonical multimodal asset schema: one row per asset.
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("content", BinaryType(), True),  # opaque encoded payload
        StructField("mime", StringType(), True),
        StructField("meta", MapType(StringType(), StringType()), True),
    ]
)

FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real codec: md5-seeded pseudo-signal.
    Stable across processes/partitions, so tests can assert exact values."""
    seed = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.random(dim, dtype=np.float64).astype(np.float32)


def extract_features(
    assets: DataFrame, decoder: str = "strict", dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + featurize each asset into a float vector column.

    Output: (asset_id, modality, feature array<float>, n_bytes long).
    The mapInPandas stage is map-only (no shuffle); a real deployment
    swaps ``_fake_decode`` for the codec and keeps every other line.
    """
    if decoder not in ("strict", "fake"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "strict":
                raise NotImplementedError(
                    "image/audio codecs are not available in this environment; "
                    "use decoder='fake' for the deterministic stand-in"
                )
            feats = [_fake_decode(c, dim) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "feature": feats,
                    "n_bytes": pdf["content"].map(lambda b: len(b or b"")).astype("int64"),
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("modality", StringType()),
            StructField("feature", ArrayType(FloatType())),
            StructField("n_bytes", LongType()),
        ]
    )
    return assets.mapInPandas(batches, schema=schema)


def resize_images(
    assets: DataFrame, width: int, height: int, decoder: str = "strict"
) -> DataFrame:
    """Resize stage for image assets. With the fake decoder the 'resized'
    payload is a deterministic function of (content, w, h) with the right
    plumbing: binary in -> binary out, map-only."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "strict":
                raise NotImplementedError("PIL not available; use decoder='fake'")
            out = pdf.copy()
            out["content"] = [
                hashlib.md5((c or b"") + f"{width}x{height}".encode()).digest()
                for c in pdf["content"]
            ]
            out["meta"] = [
                {**(m or {}), "w": str(width), "h": str(height)} for m in pdf["meta"]
            ]
            yield out

    return assets.where(F.col("modality") == "image").mapInPandas(
        batches, schema=ASSET_SCHEMA
    )


def sample_frames(
    videos: DataFrame, every_n_bytes: int = 64, decoder: str = "strict"
) -> DataFrame:
    """Frame-sampling stage for video assets: one output row per sampled
    frame (explode-shaped: map stage with fan-out, still no shuffle).
    The fake decoder treats every ``every_n_bytes`` slice as a 'frame'."""

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_no", IntegerType()),
            StructField("frame", BinaryType()),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if decoder == "strict":
                raise NotImplementedError("ffmpeg not available; use decoder='fake'")
            ids, nos, frames = [], [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                data = content or b""
                for i in range(0, max(len(data), 1), every_n_bytes):
                    ids.append(aid)
                    nos.append(i // every_n_bytes)
                    frames.append(bytes(data[i : i + every_n_bytes]))
            yield pd.DataFrame({"asset_id": ids, "frame_no": nos, "frame": frames})

    return videos.where(F.col("modality") == "video").mapInPandas(batches, schema=schema)
