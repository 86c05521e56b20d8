"""Multimodal plumbing tests: the decode step is stubbed (no imaging libs in
this container) but the Spark-side schema/batching/partitioning is real."""

import pytest
from pyspark.sql import functions as F

from vanna_financial_knowledge_graph_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("m1", "image", bytearray(b"\x00\x01\x02\x03" * 8), "image/png", 4, 4, 0),
        ("m2", "image", bytearray(b""), "image/png", 0, 0, 0),
        ("m3", "video", bytearray(b"\xff" * 10), "video/mp4", 0, 0, 3500),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_feature_extraction_shape(media):
    got = {r["media_id"]: r for r in MM.extract_media_features(media, dim=8).collect()}
    assert set(got) == {"m1", "m2", "m3"}
    assert got["m1"]["n_bytes"] == 32
    assert len(got["m1"]["feature"]) == 8
    assert sum(got["m1"]["feature"]) == pytest.approx(1.0, abs=1e-6)
    assert got["m2"]["feature"] == [0.0] * 8


def test_decode_is_stubbed_not_silent(media):
    rows = MM.extract_media_features(media).collect()
    assert all(not r["decode_ok"] for r in rows)
    assert all(r["error"] and "not installed" in r["error"] for r in rows)


def test_video_frame_sampling(media):
    frames = MM.sample_video_frames(media, every_ms=1000).collect()
    assert {r["media_id"] for r in frames} == {"m3"}
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000, 3000]


def test_feature_deterministic(media):
    a = sorted(map(str, MM.extract_media_features(media).collect()))
    b = sorted(map(str, MM.extract_media_features(media).collect()))
    assert a == b
