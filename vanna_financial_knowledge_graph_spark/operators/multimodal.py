"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as binary columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched mapInPandas
stages. PNG images decode NATIVELY (pure stdlib-zlib + NumPy unfiltering —
no imaging libs needed, round-5 de-stub); other formats (JPEG, audio,
video) still need PIL/cv2/ffmpeg, absent in this container, and fall back
to a deterministic byte-histogram feature with `decode_ok=false` so the
downstream plumbing (schema, batch shape, partitioning) is exercised
end-to-end either way. tests/test_multimodal.py drives both paths with
hand-built PNG fixtures.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("decode_ok", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (PNG spec §11.2.2)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _decode_png(payload: bytes) -> np.ndarray:
    """Pure-Python/NumPy PNG decode -> (H, W, C) uint8.

    Supports the overwhelmingly common on-disk shape: 8-bit depth,
    grayscale/RGB/gray+alpha/RGBA, non-interlaced. Chunk walk + zlib
    inflate + per-scanline filter reconstruction (None/Sub/Up/Average/
    Paeth, PNG spec §9). Palette/16-bit/interlaced raise
    NotImplementedError and fall back to the byte-histogram feature.
    """
    import struct
    import zlib

    if len(payload) < 8 or payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # chunk header + data + CRC
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    w, h, depth, color, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG variant unsupported (depth={depth} color={color} "
            f"interlace={interlace}); only 8-bit non-interlaced "
            "gray/RGB/LA/RGBA decode natively"
        )
    nch = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    stride = w * nch
    if len(raw) != (stride + 1) * h:
        raise ValueError("PNG scanline data has wrong length")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = lines[:, 0]
    out = np.zeros((h, stride), dtype=np.int64)
    bpp = nch  # bytes per pixel at depth 8
    zero = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(ftypes[y])
        rec = lines[y, 1:].astype(np.int64)
        prev = out[y - 1] if y > 0 else zero
        # Reconstruction is vectorized per scanline (the round-5 review
        # flagged the original per-BYTE Python loop): None/Up are whole-row
        # ops; Sub is an exact per-channel-lane cumulative sum mod 256;
        # Average/Paeth carry a true left-pixel dependency, so they loop
        # over the W pixels with the bpp channel lanes vectorized —
        # O(W) numpy steps, never O(W*C) Python iterations.
        if f == 0:  # None
            pass
        elif f == 2:  # Up
            rec = (rec + prev) & 0xFF
        elif f == 1:  # Sub: rec[i] = enc[i] + rec[i-1] per lane -> cumsum
            rec = (rec.reshape(w, bpp).cumsum(axis=0) & 0xFF).reshape(stride)
        elif f == 3:  # Average
            e2, p2 = rec.reshape(w, bpp), prev.reshape(w, bpp)
            o2 = np.empty((w, bpp), dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            for i in range(w):
                left = (e2[i] + (left + p2[i]) // 2) & 0xFF
                o2[i] = left
            rec = o2.reshape(stride)
        elif f == 4:  # Paeth
            e2, p2 = rec.reshape(w, bpp), prev.reshape(w, bpp)
            o2 = np.empty((w, bpp), dtype=np.int64)
            left = np.zeros(bpp, dtype=np.int64)
            upleft = np.zeros(bpp, dtype=np.int64)
            for i in range(w):
                up = p2[i]
                p = left + up - upleft
                pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                )
                left = (e2[i] + pred) & 0xFF
                o2[i] = left
                upleft = up
            rec = o2.reshape(stride)
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
    return out.astype(np.uint8).reshape(h, w, nch)


def _decode_image(payload: bytes) -> np.ndarray:
    """Decode an image payload to (H, W, C) uint8. PNG decodes natively
    (above); other formats need PIL/cv2 (absent in this container) and
    raise NotImplementedError so callers fall back to the byte-histogram
    feature. Swap in `PIL.Image.open(BytesIO(payload))` for full-format
    coverage on a cluster with imaging libs installed."""
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    raise NotImplementedError(
        "non-PNG image decode requires PIL/cv2 (not installed)"
    )


def _image_feature(img: np.ndarray, dim: int = 16) -> list[float]:
    """Deterministic pixel-level feature for decoded images: 4 per-channel
    means (zero-padded, /255) + a (dim-4)-bin luminance histogram,
    all NumPy-vectorized."""
    h, w, c = img.shape
    px = img.astype(np.float64)
    means = np.zeros(4)
    means[:c] = px.mean(axis=(0, 1)) / 255.0
    lum = px.mean(axis=2).ravel()
    nbins = max(dim - 4, 1)
    idx = np.minimum((lum / 256.0 * nbins).astype(np.int64), nbins - 1)
    hist = np.bincount(idx, minlength=nbins).astype(np.float64) / max(lum.size, 1)
    return [float(x) for x in np.concatenate([means, hist])[:dim]]


def _byte_histogram_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic fallback feature: normalized modular byte histogram —
    a stable per-payload signature the downstream similarity/dedup
    operators can consume. One np.bincount per payload (the round-4 review
    flagged the old per-byte Python loop)."""
    if not payload:
        return [0.0] * dim
    arr = np.frombuffer(payload, dtype=np.uint8)
    counts = np.bincount(arr % dim, minlength=dim)[:dim]
    return [float(c) / float(arr.size) for c in counts]


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """media table -> per-item feature rows (Arrow-batched, partition-
    preserving: one narrow mapInPandas, no shuffle). PNG payloads decode
    to real pixel features (decode_ok=true); anything else falls back to
    the byte histogram with the decode error recorded."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    img = _decode_image(payload)
                    ok, err = True, None
                    feat = _image_feature(img, dim)
                except Exception as e:  # noqa: BLE001 — any decode failure falls back
                    ok, err = False, f"{type(e).__name__}: {e}"
                    feat = _byte_histogram_feature(payload, dim)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": len(payload),
                        "feature": feat,
                        "decode_ok": ok,
                        "error": err,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FEATURE_SCHEMA.fields]
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        _run, schema=FEATURE_SCHEMA
    )


def sample_video_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing: emits (media_id, frame_ts_ms) rows from the
    duration metadata — the real decoder slots into the same shape."""
    from pyspark.sql import functions as F

    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.coalesce(F.col("duration_ms"), F.lit(0)) - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
