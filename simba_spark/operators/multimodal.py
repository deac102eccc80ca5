"""Multimodal column plumbing (north_star): image/audio/video payloads
as opaque ``binary`` columns with typed metadata structs.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub: ``mode='fake'`` produces deterministic synthetic
features (so the Spark-side plumbing — schema, batching, partitioning —
is fully real and testable), ``mode='real'`` raises NotImplementedError
at the point where a codec (PIL/ffmpeg) would be called.

All heavy per-row work runs through Arrow-batched ``mapInPandas`` —
the right shape for a 100 TB pipeline: one Python worker per partition,
columnar transfer, no per-row pickling.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical multimodal schema fragment: payload + typed metadata
BLOB_META_SCHEMA = (
    "media_type string, byte_size long, content_hash string"
)

IMAGE_FEATURE_SCHEMA = (
    "width int, height int, channels int, mean_luma double"
)


def attach_blob(
    df: DataFrame, src_col: str, media_type: str = "application/octet-stream",
    blob_col: str = "blob",
) -> DataFrame:
    """Pack an existing column into the canonical (blob, meta) layout.
    In production the blob arrives from the source (parquet binary /
    object store); here any column can be cast for testing."""
    blob = F.encode(F.col(src_col).cast("string"), "utf-8")
    return df.withColumn(blob_col, blob).withColumn(
        "blob_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(blob).cast("long").alias("byte_size"),
            F.md5(blob).alias("content_hash"),
        ),
    )


def blob_stats(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Cheap JVM-side stats on binary payloads — no Python involved."""
    return df.withColumn("byte_size", F.octet_length(F.col(blob_col)).cast("long")) \
             .withColumn("content_hash", F.md5(F.col(blob_col)))


def _fake_decode(payload: bytes) -> dict:
    """Deterministic synthetic 'decode': metadata derived from the
    content hash, so tests are stable and distribution-independent."""
    h = hashlib.md5(payload or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "channels": 1 + h[2] % 3,
        "mean_luma": round(h[3] / 255.0, 6),
    }


def decode_image_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    mode: str = "fake",
    batch_hint: int = 1024,
) -> DataFrame:
    """Extract per-image features: (id, width, height, channels,
    mean_luma). ``mode='real'`` is the integration point for a codec
    library and intentionally unimplemented in this container."""
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode: {mode}")
    schema = f"{id_col} long, {IMAGE_FEATURE_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/opencv — not in this "
                    "container; plug the codec in here"
                )
            feats = [_fake_decode(b) for b in pdf[blob_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    mode: str = "fake",
) -> DataFrame:
    """Resize stub: emits (id, resized_blob, width, height). The fake
    mode re-hashes the payload with the target box (deterministic bytes
    of plausible size); ``mode='real'`` is the PIL/opencv integration
    point. The Spark-side shape — binary in, binary out through Arrow
    batches — is the real contract a codec implementation inherits."""
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode: {mode}")
    schema = f"{id_col} long, resized_blob binary, width int, height int"
    tw, th = int(target_w), int(target_h)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real resize requires PIL/opencv — not in this "
                    "container; plug the codec in here"
                )
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[blob_col]):
                seed = hashlib.md5(
                    (payload or b"") + tw.to_bytes(4, "big") + th.to_bytes(4, "big")
                ).digest()
                # deterministic pseudo-pixels, ~3 bytes/pixel capped
                body = (seed * (1 + (tw * th * 3) // len(seed)))[: tw * th * 3]
                rows.append((rid, bytearray(body), tw, th))
            yield pd.DataFrame(
                rows, columns=[id_col, "resized_blob", "width", "height"]
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def extract_audio_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    mode: str = "fake",
) -> DataFrame:
    """Audio feature stub: (id, duration_s, sample_rate, rms). Fake
    derives stable values from the content hash; ``mode='real'`` is the
    soundfile/ffmpeg integration point."""
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode: {mode}")
    schema = f"{id_col} long, duration_s double, sample_rate int, rms double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real audio decode requires soundfile/ffmpeg — not in "
                    "this container; plug the decoder in here"
                )
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[blob_col]):
                h = hashlib.md5(payload or b"").digest()
                rows.append(
                    (
                        rid,
                        round(1.0 + h[5] / 8.0, 3),
                        (8000, 16000, 44100, 48000)[h[6] % 4],
                        round(h[7] / 255.0, 6),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "duration_s", "sample_rate", "rms"]
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    every_n: int = 10,
    mode: str = "fake",
) -> DataFrame:
    """Frame-sampling stub for video payloads: emits (id, frame_idx,
    frame_hash) rows — one row per sampled frame. Deterministic fake
    derives a synthetic frame count from the payload hash."""
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode: {mode}")
    schema = f"{id_col} long, frame_idx int, frame_hash string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if mode == "real":
                raise NotImplementedError(
                    "real frame extraction requires ffmpeg — not in this "
                    "container; plug the demuxer in here"
                )
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[blob_col]):
                h = hashlib.md5(payload or b"").digest()
                n_frames = 30 + h[4] % 240
                for idx in range(0, n_frames, every_n):
                    fh = hashlib.md5((payload or b"") + idx.to_bytes(4, "big")).hexdigest()
                    rows.append((rid, idx, fh))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_hash"])

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)
