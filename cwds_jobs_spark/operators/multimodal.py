"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with
a metadata struct; decode / feature-extract / resize / frame-sample run
as Arrow-batched ``mapInPandas`` stages.  The actual codecs are NOT in
this container, so the decode kernel is stubbed: ``decoder="fake"``
produces deterministic features from the bytes (real Spark plumbing —
schema, batching, partitioning — is exercised end-to-end);
``decoder="real"`` raises ``NotImplementedError`` where Pillow/ffmpeg
would be called on a production cluster.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("mime", T.StringType(), True),
    ]
)

FEATURE_DIM = 16


def synth_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary payload from sha2).

    ``kind`` and ``content`` are pure functions of ``media_id`` with
    DuckDB twins (``id % 3``, ``sha256``) so the feature pipeline can
    be oracled end-to-end; the remaining metadata columns use xxhash64
    (cheaper, not part of any oracled projection).
    """
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.sha2(F.concat(F.lit("blob"), F.col("id").cast("string")), 256)
        .cast("binary")
        .alias("content"),
        (F.abs(F.xxhash64("id", F.lit(seed + 1))) % 1920 + 1).cast("int").alias("width"),
        (F.abs(F.xxhash64("id", F.lit(seed + 2))) % 1080 + 1).cast("int").alias("height"),
        (F.abs(F.xxhash64("id", F.lit(seed + 3))) % 600000).cast("long").alias("duration_ms"),
        F.lit("application/octet-stream").alias("mime"),
    )


def _fake_features(blobs: pd.Series) -> pd.DataFrame:
    feats = []
    for b in blobs:
        if b is None:
            feats.append([0.0] * FEATURE_DIM)
            continue
        arr = np.frombuffer(bytes(b)[: FEATURE_DIM * 4].ljust(FEATURE_DIM * 4, b"\0"), dtype=np.uint32)
        feats.append((arr % 1000).astype(np.float64) / 1000.0)
    return feats


def extract_features(
    df: DataFrame, decoder: str = "fake", batch_hint: int = 256
) -> DataFrame:
    """binary content → array<double> feature vector via mapInPandas."""

    def run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            if decoder == "real":
                raise NotImplementedError(
                    "real decode needs Pillow/torchcodec/ffmpeg — not in "
                    "this container; deploy-side kernel goes here"
                )
            out = pdf[["media_id", "kind"]].copy()
            out["features"] = _fake_features(pdf["content"])
            yield out

    return df.mapInPandas(
        run, schema="media_id long, kind string, features array<double>"
    )


def resize_images(df: DataFrame, w: int, h: int, decoder: str = "fake") -> DataFrame:
    """Image resize stage (stub kernel; real plumbing + schema)."""

    def run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            if decoder == "real":
                raise NotImplementedError("Pillow resize goes here")
            out = pdf[["media_id"]].copy()
            out["content"] = pdf["content"]  # fake: pass-through bytes
            out["width"] = w
            out["height"] = h
            yield out

    return df.filter(F.col("kind") == "image").mapInPandas(
        run, schema="media_id long, content binary, width int, height int"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """Video → frame rows (1 row per sampled timestamp).

    Frame-timestamp expansion is native (``sequence`` + ``explode`` —
    codegen, no Python); only the per-frame decode kernel runs in
    mapInPandas.  The sampled timestamps are the multiples of
    ``every_ms`` in ``[0, duration_ms)``.
    """
    frames = (
        df.filter(F.col("kind") == "video")
        .filter(F.coalesce(F.col("duration_ms"), F.lit(0)) > 0)
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.col("duration_ms") - 1,
                    F.lit(int(every_ms)).cast("long"),
                )
            ).alias("frame_ts_ms"),
            "content",
        )
    )

    def run(parts: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in parts:
            if decoder == "real":
                raise NotImplementedError("ffmpeg frame sampling goes here")
            out = pdf[["media_id", "frame_ts_ms"]].copy()
            # stub decode kernel: first 16 payload bytes stand in for
            # the decoded frame (real kernel is per-item ffmpeg work)
            out["frame"] = [bytes(b or b"")[:16] for b in pdf["content"]]
            yield out

    return frames.mapInPandas(
        run, schema="media_id long, frame_ts_ms long, frame binary"
    )
