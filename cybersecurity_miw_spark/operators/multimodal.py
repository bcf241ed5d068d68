"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition sizing, Arrow-batched
UDF signatures, frame/chunk explosion — is real and tested; the
actual media decoding is stubbed (the image/audio libraries are not
in this container) behind ``DECODERS``: a deterministic fake decoder
is wired in by default so pipelines are end-to-end runnable, and a
real decoder (PIL/librosa/ffmpeg) drops in without touching the
plan.

Design for 100 TB of media:

* binary payloads stay opaque; metadata (codec, dims, duration) is
  columnar so pruning/filtering never touches the bytes;
* decode/feature-extract runs in ``mapInPandas`` — Arrow batches, one
  python worker per core, no per-row pickling;
* frame sampling explodes into (media_id, frame_no, feature) rows
  sized by ``spark.sql.files.maxPartitionBytes`` so a 4 GB video
  cannot pin an executor.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", LongType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def _fake_decode(payload: bytes, frames: int, dim: int) -> list[list[float]]:
    """Deterministic stand-in for a media decoder: derives ``frames``
    feature vectors from the payload bytes. Replace via DECODERS."""
    out = []
    n = len(payload) or 1
    for f in range(frames):
        vec = [
            float(payload[(f * dim + d) % n]) / 255.0 if payload else 0.0
            for d in range(dim)
        ]
        out.append(vec)
    return out


def _real_decode(payload: bytes, frames: int, dim: int) -> list[list[float]]:
    raise NotImplementedError(
        "media decoding libraries (PIL/librosa/ffmpeg) are not available "
        "in this environment; register one in DECODERS to enable"
    )


DECODERS: dict[str, Callable[[bytes, int, int], list[list[float]]]] = {
    "fake": _fake_decode,
    "real": _real_decode,
}


def documents_as_media(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Adapter used by tests/bench: treat document text bytes as an
    opaque payload with metadata — exercising the binary-column path
    without real media files."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def extract_features(
    df: DataFrame,
    frames: int = 4,
    dim: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """media rows → (media_id, frame_no, feature) via mapInPandas.
    Arrow-batched; each output row is one sampled frame's feature
    vector."""
    decode = DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                feats = decode(bytes(payload or b""), frames, dim)
                for fno, vec in enumerate(feats):
                    rows.append((int(mid), fno, vec))
            yield pd.DataFrame(rows, columns=["media_id", "frame_no", "feature"])

    return df.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Columnar metadata aggregation — never touches payload bytes, so
    Parquet column pruning skips the heavy column entirely."""
    return df.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.avg("n_bytes").alias("avg_bytes"),
        F.max("n_bytes").alias("max_bytes"),
    )


def _fake_resize(payload: bytes, w: int, h: int) -> bytes:
    """Deterministic stand-in for an image/frame resize: cycle the
    payload bytes to exactly w*h bytes. Replace via TRANSFORMS."""
    n = w * h
    if not payload:
        return b"\x00" * n
    reps = n // len(payload) + 1
    return (payload * reps)[:n]


def _real_resize(payload: bytes, w: int, h: int) -> bytes:
    raise NotImplementedError(
        "media libraries (PIL/ffmpeg) are not available in this "
        "environment; register a real resize in TRANSFORMS to enable"
    )


TRANSFORMS: dict[str, Callable[[bytes, int, int], bytes]] = {
    "fake": _fake_resize,
    "real": _real_resize,
}


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    transform: str = "fake",
) -> DataFrame:
    """media rows → same schema with ``payload`` resized to
    width×height and ``n_bytes`` updated — the batch resize stage of a
    multimodal ingest pipeline. mapInPandas over the full MEDIA_SCHEMA
    (Arrow batches; the bytes never hit the driver); the actual pixel
    work is pluggable via TRANSFORMS like the feature decoder."""
    fn = TRANSFORMS[transform]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                fn(bytes(p or b""), width, height) for p in pdf["payload"]
            ]
            pdf["n_bytes"] = [len(p) for p in pdf["payload"]]
            yield pdf

    return df.mapInPandas(run, MEDIA_SCHEMA)
