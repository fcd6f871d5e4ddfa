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
