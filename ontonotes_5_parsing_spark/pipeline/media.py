"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, processed by Arrow-batched pandas UDFs over
`mapInPandas`.

The container has no image/audio codecs, so the *decode* step is a
deterministic synthetic codec: payloads generated here carry a tiny
header (magic, dims/rate) followed by pseudo-pixel/sample bytes derived
from xxhash-free seeded arithmetic; `decode_*` parses that header and
materializes the array. A real deployment swaps `_decode_image_bytes` /
`_decode_audio_bytes` for PIL/libsndfile calls behind the same UDF
signature — the Spark-side plumbing (schema, partitioning, batch shape)
is identical and is what the tests pin down. Attempting to decode a
non-synthetic payload raises NotImplementedError (clearly-marked stub).
"""

from __future__ import annotations

import struct
from datetime import datetime, timedelta
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_IMG_MAGIC = b"SIMG"
_AUD_MAGIC = b"SAUD"
_VID_MAGIC = b"SVID"

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("captured_ts", T.TimestampType(), True),
    ]
)

#
# Alongside the float features, the UDFs emit the *exact integer
# aggregates* they derive from (px_sum / sq_sum): integers survive the
# Arrow float32 roundtrip losslessly, so the driver's DuckDB oracle can
# re-derive them independently from the raw payload bytes (hex-parse in
# SQL) and hash-compare — a true cross-engine decode check.
IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("n_channels", T.IntegerType(), False),
        T.StructField("px_sum", T.LongType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("mean_intensity", T.FloatType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sample_rate", T.IntegerType(), False),
        T.StructField("n_samples", T.IntegerType(), False),
        T.StructField("sq_sum", T.LongType(), False),
        T.StructField("rms", T.FloatType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

VIDEO_FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("fps", T.IntegerType(), False),
        T.StructField("ts_offset_sec", T.FloatType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("px_sum", T.LongType(), False),
        T.StructField("n_px", T.LongType(), False),
        T.StructField("mean_intensity", T.FloatType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)


# ---------------------------------------------------------------------------
# synthetic codec (deterministic; stands in for PIL/soundfile)
# ---------------------------------------------------------------------------
def encode_image(media_id: int, width: int, height: int, channels: int = 3) -> bytes:
    rng = np.random.RandomState(media_id % (2**31))
    pixels = rng.randint(0, 256, size=width * height * channels, dtype=np.uint8)
    return _IMG_MAGIC + struct.pack("<III", width, height, channels) + pixels.tobytes()


def encode_audio(media_id: int, sample_rate: int, n_samples: int) -> bytes:
    rng = np.random.RandomState((media_id * 7919) % (2**31))
    samples = (rng.standard_normal(n_samples) * 1000).astype(np.int16)
    return _AUD_MAGIC + struct.pack("<II", sample_rate, n_samples) + samples.tobytes()


def _decode_image_bytes(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    if payload[:4] != _IMG_MAGIC:
        raise NotImplementedError(
            "real image decoding (PIL/turbojpeg) is stubbed in this container; "
            "only the synthetic SIMG codec is available"
        )
    width, height, channels = struct.unpack("<III", payload[4:16])
    pixels = np.frombuffer(payload[16:], dtype=np.uint8)
    return width, height, channels, pixels


def encode_video(
    media_id: int, n_frames: int, width: int, height: int, fps: int = 10
) -> bytes:
    """Grayscale frame stack: header (n_frames, w, h, fps) + frame bytes."""
    rng = np.random.RandomState((media_id * 104729) % (2**31))
    frames = rng.randint(0, 256, size=n_frames * width * height, dtype=np.uint8)
    return (
        _VID_MAGIC
        + struct.pack("<IIII", n_frames, width, height, fps)
        + frames.tobytes()
    )


def _decode_video_bytes(payload: bytes) -> tuple[int, int, int, int, np.ndarray]:
    if payload[:4] != _VID_MAGIC:
        raise NotImplementedError(
            "real video decoding (ffmpeg/pyav) is stubbed in this container; "
            "only the synthetic SVID codec is available"
        )
    n_frames, width, height, fps = struct.unpack("<IIII", payload[4:20])
    frames = np.frombuffer(payload[20:], dtype=np.uint8).reshape(
        n_frames, height, width
    )
    return n_frames, width, height, fps, frames


def _decode_audio_bytes(payload: bytes) -> tuple[int, int, np.ndarray]:
    if payload[:4] != _AUD_MAGIC:
        raise NotImplementedError(
            "real audio decoding (libsndfile) is stubbed in this container; "
            "only the synthetic SAUD codec is available"
        )
    sample_rate, n_samples = struct.unpack("<II", payload[4:12])
    samples = np.frombuffer(payload[12:], dtype=np.int16)
    return sample_rate, n_samples, samples


# ---------------------------------------------------------------------------
# table builder
# ---------------------------------------------------------------------------
def media_df(spark: SparkSession, n_items: int, partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic media table, generated executor-side."""
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 4)
    ids = spark.range(0, n_items, 1, partitions).withColumnRenamed("id", "media_id")
    base = datetime(2025, 3, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid % 3 == 0:
                    kind = "audio"
                    payload = encode_audio(mid, 16000, 2048 + (mid % 5) * 512)
                elif mid % 6 == 5:
                    kind = "video"
                    payload = encode_video(
                        mid, 8 + (mid % 3) * 4, 16 + (mid % 2) * 8, 12
                    )
                else:
                    kind = "image"
                    payload = encode_image(mid, 32 + (mid % 4) * 16, 24 + (mid % 3) * 8)
                rows.append(
                    {
                        "media_id": mid,
                        "url": f"https://media.example.com/{kind}/{mid}",
                        "kind": kind,
                        "payload": payload,
                        "captured_ts": base + timedelta(seconds=mid),
                    }
                )
            yield pd.DataFrame(rows)

    return ids.mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# feature extraction (Arrow-batched; numpy-vectorized inside)
# ---------------------------------------------------------------------------
_EMBED_DIM = 16


def _embed(values: np.ndarray) -> list[float]:
    """Deterministic fixed-dim embedding: per-chunk means of the signal,
    standing in for a real model forward pass."""
    if len(values) == 0:
        return [0.0] * _EMBED_DIM
    chunks = np.array_split(values.astype(np.float64), _EMBED_DIM)
    return [float(round(c.mean() if len(c) else 0.0, 4)) for c in chunks]


def image_features(media: DataFrame) -> DataFrame:
    """Decode + feature-extract images (batch-shaped for a GPU model:
    one pandas batch in → one feature frame out)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                width, height, channels, pixels = _decode_image_bytes(bytes(payload))
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": width,
                        "height": height,
                        "n_channels": channels,
                        "px_sum": int(pixels.sum(dtype=np.int64)),
                        "n_px": int(pixels.size),
                        "mean_intensity": float(round(pixels.mean(), 3)),
                        "embedding": _embed(pixels),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter("kind = 'image'").select("media_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


def audio_features(media: DataFrame) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                sample_rate, n_samples, samples = _decode_audio_bytes(bytes(payload))
                rms = float(round(np.sqrt((samples.astype(np.float64) ** 2).mean()), 3))
                rows.append(
                    {
                        "media_id": int(mid),
                        "sample_rate": sample_rate,
                        "n_samples": n_samples,
                        "sq_sum": int((samples.astype(np.int64) ** 2).sum()),
                        "rms": rms,
                        "embedding": _embed(samples),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter("kind = 'audio'").select("media_id", "payload").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def sample_frames(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Frame sampling: decode each video, keep every k-th frame (plus
    frame 0), emit one feature row per sampled frame — the UDTF-shaped
    media op (1 video row → N frame rows through mapInPandas, Arrow
    batching preserved across the explosion, same shape as the
    parse_document stage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames, width, height, fps, frames = _decode_video_bytes(
                    bytes(payload)
                )
                for idx in range(0, n_frames, every_k):
                    frame = frames[idx]
                    rows.append(
                        {
                            "media_id": int(mid),
                            "frame_idx": idx,
                            "fps": fps,
                            "ts_offset_sec": float(round(idx / fps, 4)),
                            "width": width,
                            "height": height,
                            "px_sum": int(frame.sum(dtype=np.int64)),
                            "n_px": int(frame.size),
                            "mean_intensity": float(round(frame.mean(), 3)),
                            "embedding": _embed(frame.ravel()),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.filter("kind = 'video'").select("media_id", "payload").mapInPandas(
        run, schema=VIDEO_FRAMES_SCHEMA
    )


def resize_images(media: DataFrame, max_side: int = 16) -> DataFrame:
    """Deterministic nearest-neighbor 'resize' of the synthetic codec —
    the plumbing (binary in → binary out, metadata updated) matches a
    real thumbnailer."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, url, kind, payload, ts in zip(
                pdf["media_id"], pdf["url"], pdf["kind"], pdf["payload"], pdf["captured_ts"]
            ):
                width, height, channels, pixels = _decode_image_bytes(bytes(payload))
                scale = max(1, max(width, height) // max_side)
                img = pixels.reshape(height, width, channels)
                small = img[::scale, ::scale, :]
                new_h, new_w = small.shape[0], small.shape[1]
                new_payload = (
                    _IMG_MAGIC
                    + struct.pack("<III", new_w, new_h, channels)
                    + small.tobytes()
                )
                rows.append(
                    {
                        "media_id": int(mid),
                        "url": url,
                        "kind": kind,
                        "payload": new_payload,
                        "captured_ts": ts,
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter("kind = 'image'").mapInPandas(run, schema=MEDIA_SCHEMA)
