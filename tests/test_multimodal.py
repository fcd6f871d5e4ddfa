"""Multimodal plumbing tests: binary columns through mapInPandas stages,
with the deterministic fake decoder (real codecs are stubbed per the
environment contract)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from sum_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        Row(asset_id=1, modality="image", content=b"\x89PNG fake bytes 1", mime="image/png", meta={"w": "640"}),
        Row(asset_id=2, modality="image", content=b"\x89PNG fake bytes 2", mime="image/png", meta={}),
        Row(asset_id=3, modality="audio", content=b"RIFF fake wav", mime="audio/wav", meta={}),
        Row(asset_id=4, modality="video", content=bytes(range(200)), mime="video/mp4", meta={}),
        Row(asset_id=5, modality="image", content=None, mime=None, meta=None),
    ]
    return spark.createDataFrame(rows, M.ASSET_SCHEMA)


def test_strict_decoder_raises(assets):
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        M.extract_features(assets, decoder="strict").collect()


def test_extract_features_shapes(assets):
    out = M.extract_features(assets, decoder="fake").orderBy("asset_id")
    rows = out.collect()
    assert [r["asset_id"] for r in rows] == [1, 2, 3, 4, 5]
    assert all(len(r["feature"]) == M.FEATURE_DIM for r in rows)
    assert rows[0]["n_bytes"] == 17
    assert rows[4]["n_bytes"] == 0  # NULL content -> empty payload


def test_extract_features_deterministic(assets):
    a = M.extract_features(assets, decoder="fake").orderBy("asset_id").collect()
    b = M.extract_features(assets, decoder="fake").orderBy("asset_id").collect()
    assert [r["feature"] for r in a] == [r["feature"] for r in b]


def test_resize_images_only_images(assets):
    out = M.resize_images(assets, 32, 32, decoder="fake").orderBy("asset_id")
    rows = out.collect()
    assert [r["asset_id"] for r in rows] == [1, 2, 5]
    assert rows[0]["meta"]["w"] == "32" and rows[0]["meta"]["h"] == "32"
    # Deterministic function of (content, target size):
    again = M.resize_images(assets, 32, 32, decoder="fake").orderBy("asset_id").collect()
    assert [r["content"] for r in rows] == [r["content"] for r in again]


def test_sample_frames_fanout(assets):
    frames = M.sample_frames(assets, every_n_bytes=64, decoder="fake").orderBy(
        "asset_id", "frame_no"
    )
    rows = frames.collect()
    # 200-byte 'video' -> 4 slices of 64/64/64/8
    assert [r["frame_no"] for r in rows] == [0, 1, 2, 3]
    assert len(rows[0]["frame"]) == 64 and len(rows[3]["frame"]) == 8


def test_asset_stats_md5_and_bytes(spark):
    import hashlib

    docs = spark.createDataFrame(
        [(0, "hello world"), (1, ""), (2, "a b c")], "doc_id long, text string"
    )
    out = {r["asset_id"]: r for r in M.asset_stats(M.make_assets(docs)).collect()}
    assert out[0]["modality"] == "image"
    assert out[1]["modality"] == "audio"
    assert out[2]["modality"] == "video"
    for i, t in [(0, "hello world"), (1, ""), (2, "a b c")]:
        assert out[i]["n_bytes"] == len(t.encode())
        assert out[i]["content_md5"] == hashlib.md5(t.encode()).hexdigest()


# --- real-codec strict mode -------------------------------------------------
# The environment contract bakes no image libraries in; these tests run the
# REAL PIL decode path (decoder='strict') wherever PIL is importable and are
# SKIPPED (never faked) where it is not. The PNG fixture is built with pure
# stdlib (zlib + struct) so the input side needs no library either way.


def _make_png(width: int, height: int) -> bytes:
    """Minimal valid 8-bit grayscale PNG with a deterministic gradient."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = b"".join(
        b"\x00" + bytes((x * 255 // max(1, width - 1)) for x in range(width))
        for _y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@pytest.fixture(scope="module")
def real_png_assets(spark):
    rows = [
        Row(asset_id=10, modality="image", content=_make_png(8, 4),
            mime="image/png", meta={}),
        Row(asset_id=11, modality="image", content=_make_png(5, 5),
            mime="image/png", meta={}),
    ]
    return spark.createDataFrame(rows, M.ASSET_SCHEMA)


def test_strict_decodes_real_png(real_png_assets):
    pytest.importorskip("PIL")
    rows = (
        M.extract_features(real_png_assets, decoder="strict")
        .orderBy("asset_id")
        .collect()
    )
    assert [r["asset_id"] for r in rows] == [10, 11]
    for r in rows:
        assert len(r["feature"]) == M.FEATURE_DIM
        # Real decode: grayscale means normalized to [0, 1].
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # The gradient must survive the real decode: the right half of the
    # column means clearly brighter than the left, and dark-to-bright
    # end-to-end (resampling overshoot-tolerant — bicubic may ring at
    # edges, so no strict per-column monotonicity). The md5-seeded fake
    # is uniform noise and has no such structure.
    f = rows[0]["feature"]
    half = len(f) // 2
    assert sum(f[half:]) > sum(f[:half]) + 0.5
    assert f[-1] > f[0] + 0.3
    # And strict must differ from the fake stand-in on the same bytes.
    fake = (
        M.extract_features(real_png_assets, decoder="fake")
        .orderBy("asset_id")
        .collect()
    )
    assert rows[0]["feature"] != fake[0]["feature"]


def test_strict_resize_real_png_roundtrip(real_png_assets):
    PIL = pytest.importorskip("PIL")
    import io

    from PIL import Image

    rows = (
        M.resize_images(real_png_assets, 3, 2, decoder="strict")
        .orderBy("asset_id")
        .collect()
    )
    assert [r["asset_id"] for r in rows] == [10, 11]
    for r in rows:
        img = Image.open(io.BytesIO(r["content"]))
        assert img.size == (3, 2)
        assert r["meta"]["w"] == "3" and r["meta"]["h"] == "2"


def test_strict_resize_handles_progressive_jpeg(spark):
    """The strict image path must decode PROGRESSIVE JPEG assets (SOF2)
    with zero libraries, and — because progressive and baseline share
    the quantization — resizing a progressive asset must produce the
    BYTE-IDENTICAL thumbnail of its baseline twin."""
    import numpy as np

    from sum_spark.functions import codecs

    img = (np.add.outer(np.arange(12), np.arange(20)) % 200).astype(np.uint8)
    rows = [
        Row(asset_id=20, modality="image",
            content=codecs.encode_jpeg(img, quality=85),
            mime="image/jpeg", meta={}),
        Row(asset_id=21, modality="image",
            content=codecs.encode_jpeg_progressive(img, quality=85),
            mime="image/jpeg", meta={}),
    ]
    assets = spark.createDataFrame(rows, M.ASSET_SCHEMA)
    out = {
        r["asset_id"]: r["content"]
        for r in M.resize_images(assets, 5, 4, decoder="strict").collect()
    }
    assert set(out) == {20, 21}
    assert out[20] == out[21]
    decoded = codecs.decode_jpeg(out[21])
    assert decoded.shape[:2] == (4, 5)


def test_auto_falls_back_on_non_mjpeg_avi(spark):
    """ADVICE r6: auto mode is the documented crawl-scale fallback — a
    RIFF/AVI container whose frames aren't MJPEG (XviD/DivX) must degrade
    to the deterministic stand-in, not fail the pipeline; strict still
    surfaces the decode error."""
    import struct

    from sum_spark.functions import codecs

    body = b"00dc" + struct.pack("<I", 16) + b"XVIDnotajpeg!!!!"
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    assert codecs.is_avi(payload)
    rows = [Row(asset_id=9, modality="video", content=payload, mime="video/avi", meta={})]
    df = spark.createDataFrame(rows, M.ASSET_SCHEMA)

    with pytest.raises(Exception, match="ValueError|JPEG|SOI"):
        M.sample_frames(df, every_n_bytes=8, decoder="strict").collect()
    got = M.sample_frames(df, every_n_bytes=8, decoder="auto").collect()
    want = M.sample_frames(df, every_n_bytes=8, decoder="fake").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want)) and got

    with pytest.raises(Exception, match="ValueError|JPEG|SOI"):
        M.extract_features(df, decoder="strict").collect()
    a = M.extract_features(df, decoder="auto").collect()[0]["feature"]
    b = M.extract_features(df, decoder="fake").collect()[0]["feature"]
    assert a == b
