"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition sizing, Arrow batch
shape, UDF signatures — is real and tested; the actual codec step is
stubbed behind `_decode_payload` with a deterministic fake (this
container has no image/audio libraries), clearly marked. Swapping the
fake for Pillow/librosa/pyav changes ONE function; every seam around
it stays.

Batch shape contract: `mapInPandas` receives pandas DataFrames of
~`spark.sql.execution.arrow.maxRecordsPerBatch` rows; with media blobs
of B bytes, executor-python memory per batch is rows×B — size
maxRecordsPerBatch so batches stay under a few hundred MB at
production blob sizes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, duration_ms int"
)

FEATURE_DIM = 16


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = sha256-derived bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
        rows.append((i, kind, bytearray(payload), 64 + i % 32, 48 + i % 24, 1000 + i))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """STUB: real codecs (Pillow / librosa / pyav) are not in this
    container. Deterministic fake: FEATURE_DIM floats derived from the
    payload bytes — stable across runs/partitions, which is what the
    plumbing tests need. Replace this function (only) for production.
    """
    try:
        import PIL.Image  # noqa: F401  — would be the real path

        raise NotImplementedError("real decode not wired in this build")
    except ImportError:
        pass
    h = hashlib.sha256(payload).digest()
    arr = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64)
    return arr / 65535.0


def extract_features(media: DataFrame) -> DataFrame:
    """(media_id, kind, features: array<double>) via mapInPandas.

    The kernel is per-batch vectorized at the row level (one decode per
    blob — decoding is inherently per-item) but the Spark plumbing is
    columnar: Arrow in, Arrow out, no driver involvement.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_payload(bytes(p), k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "features": feats,
                }
            )

    # Column-prune BEFORE the Python boundary: Arrow UDFs are opaque to
    # Catalyst pruning, so select explicitly.
    return media.select("media_id", "kind", "payload").mapInPandas(
        kernel, schema="media_id long, kind string, features array<double>"
    )


def frame_sample(media: DataFrame, every_ms: int = 250) -> DataFrame:
    """Explode 'video' rows into sampled frame stubs:
    (media_id, frame_idx, ts_ms). Pure JVM — the frame *index* math
    needs no decoding; payload slicing happens downstream in
    extract_features over the exploded rows."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.posexplode(
            F.sequence(F.lit(0), (F.col("duration_ms") / every_ms).cast("int"))
        ).alias("frame_idx", "tick"),
    ).select(
        "media_id", "frame_idx", (F.col("tick") * every_ms).alias("ts_ms")
    )
