"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as binary columns with a metadata struct; decode /
feature-extract / resize / frame-sample run as Arrow-batched mapInPandas
stages. The decode kernels are STUBBED (the container has no image/audio
libs — clearly marked below); the Spark-side plumbing (schema, batch shape,
partitioning, UDF signatures) is real and tested:
tests/test_multimodal.py drives the full path with the deterministic fake.
"""

from __future__ import annotations

from collections.abc import Iterator

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


def _decode_image(payload: bytes) -> object:
    """STUB: real implementation needs PIL/cv2 (absent in this container).

    Raises NotImplementedError so callers fall through to the deterministic
    byte-level feature fake below. Swap in `PIL.Image.open(BytesIO(payload))`
    on a cluster with the imaging libs installed.
    """
    raise NotImplementedError("image decode requires PIL/cv2 (not installed)")


def _byte_histogram_feature(payload: bytes, dim: int = 16) -> list[float]:
    """Deterministic fallback feature: normalized byte histogram. Real in
    the sense that it is a stable per-payload signature the downstream
    similarity/dedup operators can consume; replace with a model embedding
    at deployment."""
    if not payload:
        return [0.0] * dim
    counts = [0] * dim
    for b in payload:
        counts[b % dim] += 1
    n = float(len(payload))
    return [c / n for c in counts]


def extract_media_features(media: DataFrame, dim: int = 16) -> DataFrame:
    """media table -> per-item feature rows (Arrow-batched, partition-
    preserving: one narrow mapInPandas, no shuffle)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                payload = bytes(payload) if payload is not None else b""
                try:
                    _decode_image(payload)  # always raises in-sandbox
                    ok, err = True, None
                    feat = None  # unreachable until a real decoder exists
                except NotImplementedError as e:
                    ok, err = False, str(e)
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
