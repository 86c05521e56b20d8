"""Multimodal tests: native pure-NumPy PNG decode (round 5) plus the loud
byte-histogram fallback for formats that still need imaging libs. The PNG
fixtures are built by a minimal encoder below (stdlib zlib + struct), so the
decoder is tested against an independent implementation of the spec."""

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from vanna_financial_knowledge_graph_spark.operators import multimodal as MM


def _encode_png(img: np.ndarray, color_type: int, filters=None) -> bytes:
    """Minimal PNG writer (8-bit, non-interlaced) used as the independent
    reference for _decode_png; `filters` cycles per scanline so every
    filter type (None/Sub/Up/Average/Paeth) gets exercised."""
    h, w, c = img.shape

    def chunk(ctype: bytes, data: bytes) -> bytes:
        body = ctype + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b""
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int64)
        f = filters[y % len(filters)] if filters else 0
        a = np.concatenate([np.zeros(c, np.int64), line[:-c]]) if w * c > c else np.zeros(w * c, np.int64)
        cc = np.concatenate([np.zeros(c, np.int64), prev[:-c]]) if w * c > c else np.zeros(w * c, np.int64)
        if f == 0:
            enc = line
        elif f == 1:
            enc = (line - a) % 256
        elif f == 2:
            enc = (line - prev) % 256
        elif f == 3:
            enc = (line - (a + prev) // 2) % 256
        else:  # Paeth
            p = a + prev - cc
            pa, pb, pc = np.abs(p - a), np.abs(p - prev), np.abs(p - cc)
            pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, prev, cc))
            enc = (line - pred) % 256
        raw += bytes([f]) + bytes(enc.astype(np.uint8))
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _test_image(h: int, w: int, c: int) -> np.ndarray:
    return (np.arange(h * w * c, dtype=np.int64) * 37 % 251).astype(
        np.uint8
    ).reshape(h, w, c)


@pytest.mark.parametrize("color_type,c", [(0, 1), (2, 3), (4, 2), (6, 4)])
@pytest.mark.parametrize(
    "filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]]
)
def test_png_decode_roundtrip(color_type, c, filters):
    img = _test_image(7, 5, c)
    decoded = MM._decode_png(_encode_png(img, color_type, filters))
    assert decoded.shape == img.shape
    assert np.array_equal(decoded, img)


def test_png_unsupported_variants_raise():
    img = _test_image(2, 2, 3)
    png = bytearray(_encode_png(img, 2))
    png[24] = 16  # bit depth byte inside IHDR
    with pytest.raises(NotImplementedError):
        MM._decode_png(bytes(png))
    with pytest.raises(ValueError):
        MM._decode_png(b"\x89PNG\r\n\x1a\njunk")


@pytest.fixture(scope="module")
def media(spark):
    png_rgb = _encode_png(_test_image(6, 4, 3), 2, [0, 1, 2, 3, 4])
    rows = [
        ("m1", "image", bytearray(b"\x00\x01\x02\x03" * 8), "image/jpeg", 4, 4, 0),
        ("m2", "image", bytearray(b""), "image/jpeg", 0, 0, 0),
        ("m3", "video", bytearray(b"\xff" * 10), "video/mp4", 0, 0, 3500),
        ("m4", "image", bytearray(png_rgb), "image/png", 4, 6, 0),
    ]
    return spark.createDataFrame(rows, MM.MEDIA_SCHEMA)


def test_feature_extraction_shape(media):
    got = {r["media_id"]: r for r in MM.extract_media_features(media, dim=8).collect()}
    assert set(got) == {"m1", "m2", "m3", "m4"}
    assert got["m1"]["n_bytes"] == 32
    assert len(got["m1"]["feature"]) == 8
    assert sum(got["m1"]["feature"]) == pytest.approx(1.0, abs=1e-6)
    assert got["m2"]["feature"] == [0.0] * 8


def test_png_decodes_in_spark_path(media):
    got = {r["media_id"]: r for r in MM.extract_media_features(media).collect()}
    m4 = got["m4"]
    assert m4["decode_ok"] and m4["error"] is None
    expected = MM._image_feature(_test_image(6, 4, 3), 16)
    assert m4["feature"] == pytest.approx(expected, abs=1e-6)
    # feature = 4 channel means + 12-bin luminance histogram (sums to 1)
    assert len(m4["feature"]) == 16
    assert sum(m4["feature"][4:]) == pytest.approx(1.0, abs=1e-6)


def test_non_png_falls_back_loudly(media):
    rows = MM.extract_media_features(media).collect()
    fallback = [r for r in rows if r["media_id"] != "m4"]
    assert all(not r["decode_ok"] for r in fallback)
    assert all(r["error"] and "not installed" in r["error"] for r in fallback)


def test_corrupt_png_falls_back(spark):
    png = bytearray(_encode_png(_test_image(3, 3, 3), 2))
    png[-20] ^= 0xFF  # corrupt IDAT
    media = spark.createDataFrame(
        [("bad", "image", png, "image/png", 3, 3, 0)], MM.MEDIA_SCHEMA
    )
    (row,) = MM.extract_media_features(media).collect()
    assert not row["decode_ok"] and row["error"]
    assert len(row["feature"]) == 16  # byte-histogram fallback


def test_video_frame_sampling(media):
    frames = MM.sample_video_frames(media, every_ms=1000).collect()
    assert {r["media_id"] for r in frames} == {"m3"}
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000, 3000]


def test_feature_deterministic(media):
    a = sorted(map(str, MM.extract_media_features(media).collect()))
    b = sorted(map(str, MM.extract_media_features(media).collect()))
    assert a == b
