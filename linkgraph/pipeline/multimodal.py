"""Multimodal columns: image/audio/video as opaque binary columns with
typed metadata, decoded inside Arrow-batched Python kernels.

Decode status (honest inventory):

- **REAL decoders, no codec libraries needed** (pure bytes + numpy):
  - image: binary PPM (P6) — header parse + raw RGB frombuffer.
  - audio: RIFF/WAVE, PCM16 mono — header parse + int16 frombuffer.
  - video: `PPMV` raw-frame container (magic + frame count + N
    concatenated P6 frames) — the uncompressed-intermediate layout a
    real pipeline uses between codec decode and feature extraction.
- **Codec formats (JPEG/PNG/MP3/H.264)** require Pillow/librosa/pyav,
  which this container does not ship: `_decode_payload` detects their
  magic bytes and raises NotImplementedError at the clearly-marked
  seam — swapping in the real codec changes ONE branch; every seam
  around it (schema, pruning, batch shape, feature contract) is real
  and tested against the lib-free formats.

Batch shape contract: `mapInPandas` receives pandas DataFrames of
~`spark.sql.execution.arrow.maxRecordsPerBatch` rows; with media blobs
of B bytes, executor-python memory per batch is rows×B — size
maxRecordsPerBatch so batches stay under a few hundred MB at
production blob sizes. Columns are pruned BEFORE the Python boundary
(Arrow UDFs are opaque to Catalyst pruning).
"""

from __future__ import annotations

import struct
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

AUDIO_RATE = 8000  # synth sample rate (Hz)


# --------------------------------------------------------------- encoders
# (used by synth_media and tests; also documents the byte layouts)


def encode_ppm(pixels: np.ndarray) -> bytes:
    """pixels: uint8 array (h, w, 3) → binary PPM (P6)."""
    h, w, _ = pixels.shape
    return f"P6\n{w} {h}\n255\n".encode() + pixels.astype(np.uint8).tobytes()


def encode_wav_pcm16(samples: np.ndarray, rate: int = AUDIO_RATE) -> bytes:
    """samples: int16 mono → minimal RIFF/WAVE container."""
    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def encode_ppmv(frames: list[np.ndarray]) -> bytes:
    """frames: list of (h, w, 3) uint8 arrays → PPMV raw-frame video."""
    body = b"".join(encode_ppm(f) for f in frames)
    return b"PPMV" + struct.pack("<I", len(frames)) + body


def synth_media(spark: SparkSession, n: int = 64) -> DataFrame:
    """Deterministic media table with REAL decodable payloads: P6
    images, PCM16 WAV audio, PPMV raw-frame video. No RNG — content is
    a pure function of media_id, so tests/golden runs reproduce."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h, dur = 64 + i % 32, 48 + i % 24, 1000 + i
        if kind == "image":
            base = (np.arange(h * w * 3, dtype=np.int64) * (2654435761 + i)) % 256
            payload = encode_ppm(base.reshape(h, w, 3).astype(np.uint8))
        elif kind == "audio":
            t = np.arange(int(AUDIO_RATE * dur / 1000.0), dtype=np.float64)
            wave = np.sin(2 * np.pi * (100.0 + i) * t / AUDIO_RATE)
            payload = encode_wav_pcm16((wave * 12000).astype(np.int16))
        else:
            fw, fh = 16, 12
            frames = []
            for f_i in range(4):
                base = (np.arange(fh * fw * 3, dtype=np.int64) * (31 + i) + 7 * f_i) % 256
                frames.append(base.reshape(fh, fw, 3).astype(np.uint8))
            payload = encode_ppmv(frames)
        rows.append((i, kind, bytearray(payload), w, h, dur))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --------------------------------------------------------------- decoders


def _parse_ppm_header(payload: bytes) -> tuple[int, int, int]:
    """(width, height, pixel_data_offset) of a P6 payload."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    # header = magic, width, height, maxval — whitespace separated
    parts, pos = [], 2
    while len(parts) < 3:
        while payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment line
            pos = payload.index(b"\n", pos) + 1
            continue
        end = pos
        while not payload[end : end + 1].isspace():
            end += 1
        parts.append(int(payload[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = parts
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return w, h, pos


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) → uint8 (h, w, 3). Pure bytes, no codec lib."""
    w, h, pos = _parse_ppm_header(payload)
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return raw.reshape(h, w, 3)


def _decode_ppm_at(payload: bytes, start: int) -> tuple[np.ndarray, int]:
    """(frame, next_offset) for the P6 image starting at `start`.
    Only the small header is sliced; pixel data comes straight out of
    the original buffer via frombuffer(offset=...) — no per-frame copy
    of the remaining payload (PPMV videos would otherwise pay
    O(frames × bytes) memcpy in the executor-Python hot path)."""
    w, h, pos = _parse_ppm_header(payload[start : start + 128])
    raw = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=start + pos)
    return raw.reshape(h, w, 3), start + pos + h * w * 3


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    """Minimal RIFF/WAVE PCM16 mono reader → (float64 samples in
    [-1, 1], sample_rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    (fmt_size,) = struct.unpack_from("<I", payload, 16)
    audio_fmt, channels, rate = struct.unpack_from("<HHI", payload, 20)
    if audio_fmt != 1 or channels != 1:
        raise ValueError("only PCM16 mono supported by the lib-free decoder")
    pos = 20 + fmt_size
    while payload[pos : pos + 4] != b"data":
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        pos += 8 + sz
    (data_size,) = struct.unpack_from("<I", payload, pos + 4)
    raw = np.frombuffer(payload, dtype="<i2", count=data_size // 2, offset=pos + 8)
    return raw.astype(np.float64) / 32768.0, rate


def decode_ppmv(payload: bytes) -> list[np.ndarray]:
    """PPMV raw-frame video → list of uint8 (h, w, 3) frames."""
    if payload[:4] != b"PPMV":
        raise ValueError("not a PPMV payload")
    (n_frames,) = struct.unpack_from("<I", payload, 4)
    frames, pos = [], 8
    for _ in range(n_frames):
        frame, pos = _decode_ppm_at(payload, pos)
        frames.append(frame)
    return frames


_CODEC_MAGIC = {
    b"\xff\xd8\xff": "jpeg",
    b"\x89PNG": "png",
    b"ID3": "mp3",
    b"\x00\x00\x00": "mp4/h264",
}


def _image_features(img: np.ndarray) -> np.ndarray:
    h, w, _ = img.shape
    rgb = img.reshape(-1, 3).astype(np.float64) / 255.0
    gray = rgb.mean(axis=1)
    hist, _ = np.histogram(gray, bins=8, range=(0.0, 1.0))
    return np.concatenate(
        [
            [w / 1000.0, h / 1000.0],
            rgb.mean(axis=0),
            rgb.std(axis=0),
            hist / max(gray.size, 1),
        ]
    )


def _audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    n = max(samples.size, 1)
    rms = float(np.sqrt(np.mean(samples**2))) if samples.size else 0.0
    zcr = float(np.mean(np.abs(np.diff(np.signbit(samples))))) if samples.size > 1 else 0.0
    peak = float(np.max(np.abs(samples))) if samples.size else 0.0
    spec = np.abs(np.fft.rfft(samples))
    bands = (
        [float(b.sum()) / n for b in np.array_split(spec, 4)]
        if spec.size >= 4
        else [0.0] * 4
    )
    hist, _ = np.histogram(np.abs(samples), bins=8, range=(0.0, 1.0))
    return np.concatenate([[n / rate, rms, zcr, peak], bands, hist / n])


def _video_features(frames: list[np.ndarray]) -> np.ndarray:
    means = np.stack(
        [f.reshape(-1, 3).astype(np.float64).mean(axis=0) / 255.0 for f in frames]
    )
    motion = (
        float(np.abs(np.diff(means, axis=0)).mean()) if len(frames) > 1 else 0.0
    )
    first_gray = frames[0].reshape(-1, 3).astype(np.float64).mean(axis=1) / 255.0
    hist, _ = np.histogram(first_gray, bins=8, range=(0.0, 1.0))
    return np.concatenate(
        [
            [len(frames) / 100.0],
            means.mean(axis=0),
            means.std(axis=0),
            hist / max(first_gray.size, 1),
            [motion],
        ]
    )


def _decode_payload(payload: bytes, kind: str) -> np.ndarray:
    """Decode one blob → FEATURE_DIM float64 features.

    Lib-free formats decode for real; codec formats raise at THIS seam
    (the one branch to replace with Pillow/librosa/pyav in a container
    that ships them)."""
    for magic, name in _CODEC_MAGIC.items():
        if payload[: len(magic)] == magic:
            raise NotImplementedError(
                f"{name} requires a codec library not present in this "
                "build; wire Pillow/librosa/pyav in here"
            )
    if kind == "image":
        return _image_features(decode_ppm(payload))
    if kind == "audio":
        return _audio_features(*decode_wav_pcm16(payload))
    if kind == "video":
        return _video_features(decode_ppmv(payload))
    raise ValueError(f"unknown media kind {kind!r}")


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


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """(media_id, payload) with every 'image' payload resized to
    (out_w, out_h) by nearest-neighbor — a real resize over the
    lib-free PPM path, same mapInPandas shape as extract_features."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                img = decode_ppm(bytes(p))
                h, w, _ = img.shape
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                out.append(bytearray(encode_ppm(img[yi][:, xi])))
            yield pd.DataFrame({"media_id": pdf["media_id"], "payload": out})

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "payload")
        .mapInPandas(kernel, schema="media_id long, payload binary")
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
