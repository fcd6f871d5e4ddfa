"""Multimodal column operators: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched pandas functions via
mapInPandas.

No reference analog (the reference is vectors-only); this is the
LLM-pipeline extension for mixed-modality training data. The Spark-side
plumbing — schema, partitioning, UDF signatures, batch iteration — is
real and tested; the actual codec libraries (PIL/av/soundfile) may be absent,
so decoding is gated by a call-time try-import: ``decoder='strict'``
uses the real codec when the library imports and raises
NotImplementedError only when it doesn't; ``decoder='auto'`` falls back
to the deterministic stand-in instead of raising; ``decoder='fake'``
always runs the stand-in (md5-seeded) that exercises the identical
batch shapes end to end. The same code lights up unchanged in a
codec-equipped environment.

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


def _try_import(name: str):
    """Call-time codec import — evaluated inside the executor task, so a
    codec installed on the cluster lights up without code changes."""
    try:
        return __import__(name)
    except ImportError:
        return None


def _real_feature(modality: str, payload: bytes, dim: int) -> np.ndarray | None:
    """Decode + featurize with a real codec; None when no codec applies
    (caller decides strict-raise vs fake-fallback). Preference order per
    modality: the installed library (PIL / soundfile) first, then the
    engine-own dependency-free decoders (functions/codecs.py) for the
    formats they cover (PNG, WAV) — so strict mode performs a REAL
    decode even in a library-free environment."""
    from sum_spark.functions import codecs

    data = payload or b""
    if modality == "image":
        pil = _try_import("PIL.Image")
        if pil is not None:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(data)).convert("L").resize((dim, dim))
            arr = np.asarray(img, dtype=np.float32) / 255.0
            return arr.mean(axis=0)  # column means -> dim-length signature
        if codecs.is_png(data):
            grey = codecs.png_to_grey(codecs.decode_png(data))
            small = codecs.resize_nearest(grey, dim, dim)
            return small.mean(axis=0).astype(np.float32)
        if codecs.is_jpeg(data):
            grey = codecs.png_to_grey(codecs.decode_jpeg(data))
            small = codecs.resize_nearest(grey, dim, dim)
            return small.mean(axis=0).astype(np.float32)
        return None
    if modality == "audio":
        sf = _try_import("soundfile")
        mono = None
        if sf is not None:
            import io

            samples, _rate = sf.read(io.BytesIO(data), dtype="float32", always_2d=True)
            mono = samples.mean(axis=1)
        elif codecs.is_wav(data):
            mono, _rate = codecs.decode_wav(data)
        if mono is None:
            return None
        if mono.size == 0:
            return np.zeros(dim, dtype=np.float32)
        bins = np.array_split(mono, dim)
        return np.array([b.mean() if b.size else 0.0 for b in bins], dtype=np.float32)
    if modality == "video" and codecs.is_avi(data):
        # engine-own MJPEG AVI: per-frame luminance signatures averaged
        # over time — the temporal twin of the image feature.
        frames = [
            codecs.resize_nearest(codecs.png_to_grey(fr), dim, dim).mean(axis=0)
            for fr in codecs.decode_avi_frames(data)
        ]
        return np.mean(frames, axis=0).astype(np.float32)
    # other video codecs and unknown modalities have no decode here
    return None


def extract_features(
    assets: DataFrame, decoder: str = "strict", dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + featurize each asset into a float vector column.

    Output: (asset_id, modality, feature array<float>, n_bytes long).
    The mapInPandas stage is map-only (no shuffle); a real deployment
    swaps ``_fake_decode`` for the codec and keeps every other line.
    """
    if decoder not in ("strict", "fake", "auto"):
        raise ValueError(f"unknown decoder {decoder!r}")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for modality, content in zip(pdf["modality"], pdf["content"]):
                if decoder == "strict":
                    # strict surfaces decode errors; only codec ABSENCE
                    # falls through to the NotImplementedError below
                    real = _real_feature(modality, content, dim)
                elif decoder == "auto":
                    # auto is the documented crawl-scale fallback: a
                    # payload that LOOKS decodable but isn't (a non-MJPEG
                    # AVI, truncated bytes) degrades to the deterministic
                    # stand-in instead of failing the pipeline (ADVICE
                    # r6). Catch breadth matters: the engine-own codecs
                    # normalize to ValueError, but PIL raises OSError
                    # and soundfile/PyAV raise RuntimeError-family
                    # errors — auto's contract is "never fail the batch
                    # on one bad payload", so any decode error degrades
                    try:
                        real = _real_feature(modality, content, dim)
                    except Exception:
                        real = None
                else:
                    real = None
                if real is not None:
                    feats.append(real.astype(np.float32))
                elif decoder == "strict":
                    raise NotImplementedError(
                        f"no codec importable for modality {modality!r}; "
                        "use decoder='auto' or 'fake' for the deterministic "
                        "stand-in"
                    )
                else:
                    feats.append(_fake_decode(content, dim))
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

    def _resize_one(content: bytes) -> bytes:
        from sum_spark.functions import codecs

        if _try_import("PIL.Image") is not None:
            import io

            from PIL import Image

            img = Image.open(io.BytesIO(content or b"")).resize((width, height))
            buf = io.BytesIO()
            img.save(buf, format="PNG")
            return buf.getvalue()
        if codecs.is_png(content or b""):
            # engine-own PNG path: real decode -> nearest resample -> re-encode
            arr = codecs.decode_png(content)
            return codecs.encode_png(codecs.resize_nearest(arr, width, height))
        if codecs.is_jpeg(content or b""):
            # engine-own JFIF path: real decode (baseline OR progressive)
            # -> nearest resample -> re-encode (quality 90 keeps
            # thumbnails crisp)
            arr = codecs.decode_jpeg(content)
            return codecs.encode_jpeg(
                codecs.resize_nearest(arr, width, height), quality=90
            )
        if decoder == "strict":
            raise NotImplementedError(
                "no codec for this payload (PIL absent and not a PNG/JPEG); "
                "use decoder='auto'/'fake'"
            )
        return hashlib.md5((content or b"") + f"{width}x{height}".encode()).digest()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            if decoder == "fake":
                out["content"] = [
                    hashlib.md5((c or b"") + f"{width}x{height}".encode()).digest()
                    for c in pdf["content"]
                ]
            else:
                out["content"] = [_resize_one(c) for c in pdf["content"]]
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

    def _real_frames(aid, data: bytes):
        import io

        import av

        with av.open(io.BytesIO(data)) as container:
            for i, frame in enumerate(container.decode(video=0)):
                yield aid, i, frame.to_ndarray().tobytes()

    def _avi_frames(aid, data: bytes):
        # engine-own MJPEG-in-AVI path: RIFF walk + per-frame baseline
        # JPEG decode (functions/codecs) — a REAL video decode with no
        # libraries; frames emit as raw (H, W, C) uint8 bytes, matching
        # the PyAV branch's to_ndarray().tobytes() contract.
        from sum_spark.functions import codecs

        for i, arr in enumerate(codecs.decode_avi_frames(data)):
            yield aid, i, arr.tobytes()

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from sum_spark.functions import codecs

        have_av = _try_import("av") is not None
        for pdf in it:
            ids, nos, frames = [], [], []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                data = content or b""

                def chunked():
                    return (
                        (aid, i // every_n_bytes, bytes(data[i : i + every_n_bytes]))
                        for i in range(0, max(len(data), 1), every_n_bytes)
                    )

                rows = None
                if decoder in ("strict", "auto"):
                    gen = None
                    if have_av:
                        gen = _real_frames(aid, data)
                    elif codecs.is_avi(data):
                        gen = _avi_frames(aid, data)
                    if gen is not None:
                        if decoder == "strict":
                            rows = list(gen)  # decode errors surface
                        else:
                            # auto: a RIFF container that isn't MJPEG
                            # (XviD/DivX is common in a crawl) degrades to
                            # the byte-chunker instead of failing the whole
                            # pipeline (ADVICE r6); PyAV's decode errors
                            # are RuntimeError-family, not OSError, so
                            # auto catches any decode failure
                            try:
                                rows = list(gen)
                            except Exception:
                                rows = None
                    elif decoder == "strict":
                        # Strict mode refuses rather than silently faking.
                        raise NotImplementedError(
                            "no codec for this payload (PyAV absent and not "
                            "an MJPEG AVI); use decoder='auto'/'fake'"
                        )
                if rows is None:
                    rows = list(chunked())
                for a, n, fr in rows:
                    ids.append(a)
                    nos.append(n)
                    frames.append(fr)
            yield pd.DataFrame({"asset_id": ids, "frame_no": nos, "frame": frames})

    return videos.where(F.col("modality") == "video").mapInPandas(batches, schema=schema)


def make_assets(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic documents -> assets mapping (for tests and the
    driver-checked query): the utf-8 bytes of the text act as the opaque
    payload, modality cycles by id. Real deployments read actual encoded
    media into the same (asset_id, modality, content, mime, meta) shape."""
    modality = (
        F.when(F.col(id_col) % 3 == 0, F.lit("image"))
        .when(F.col(id_col) % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        F.col(id_col).alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.create_map(F.lit("origin"), F.lit("documents")).alias("meta"),
    )


def asset_stats(assets: DataFrame) -> DataFrame:
    """Binary-payload statistics via the same Arrow-batched mapInPandas
    path the codecs use: byte length and md5 of each opaque payload —
    values an external engine can verify exactly, unlike decoded
    features. Map-only; no shuffle.

    Output: (asset_id, modality, n_bytes, content_md5).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = [b or b"" for b in pdf["content"]]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pd.Series([len(b) for b in payloads], dtype="int64"),
                    "content_md5": [hashlib.md5(b).hexdigest() for b in payloads],
                }
            )

    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("modality", StringType()),
            StructField("n_bytes", LongType()),
            StructField("content_md5", StringType()),
        ]
    )
    return assets.mapInPandas(batches, schema=schema)
