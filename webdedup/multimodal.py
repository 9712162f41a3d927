"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns with a metadata struct;
decode/feature-extraction run as Arrow-batched ``mapInPandas`` kernels so
payload bytes never round-trip through per-row Python. The actual codec step
is STUBBED (no image/audio libraries in this container): ``decoder=None``
uses a deterministic fake (byte-stat features) so the Spark-side plumbing —
schema, batch shape, partition sizing — is real and tested; plugging a real
codec is a one-function swap.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, LongType, StringType, StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),      # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", LongType(), True),
        StructField("height", LongType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("features", ArrayType(FloatType()), False),
    ]
)


def fake_decode(payload: bytes, dim: int = 16):
    """Deterministic stand-in for a real decoder: byte-histogram features.

    Replace with e.g. PIL/torchvision decode; the mapInPandas harness,
    batching, and schema do not change.
    """
    import numpy as np

    if payload is None or len(payload) == 0:
        return np.zeros(dim, dtype=np.float32)
    b = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(b, bins=dim, range=(0, 256))
    return (hist / max(1, b.size)).astype(np.float32)


def extract_features(
    media: DataFrame,
    decoder: Callable | None = None,
    dim: int = 16,
    batch_rows: int = 256,
) -> DataFrame:
    """media(MEDIA_SCHEMA) → (media_id, n_bytes, features) via mapInPandas.

    Binary payloads are large: keep Arrow batches small (batch_rows) so an
    executor never holds more than batch_rows payloads in memory — at 100 TB
    the input should be repartitioned so each task reads O(100 MB) of
    payload (spark.sql.files.maxPartitionBytes governs the scan side).
    """
    dec = decoder or (lambda p: fake_decode(p, dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [dec(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": [0 if p is None else len(p) for p in pdf["payload"]],
                    "features": feats,
                }
            )

    src = media.select("media_id", "payload")
    return src.mapInPandas(run, FEATURE_SCHEMA)


def media_dedup_exact(media: DataFrame) -> DataFrame:
    """Exact payload dedup: (fingerprint, n_members, rep_id) — md5 over
    binary, the byte-level analogue of the text fingerprint collapse."""
    return (
        media.groupBy(F.md5("payload").alias("fingerprint"))
        .agg(F.count("*").alias("n_members"), F.min("media_id").alias("rep_id"))
        .where(F.col("n_members") > 1)
    )


def sample_frames(video: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled timestamp.

    Decode is stubbed (NotImplementedError in strict mode); the exploded
    (media_id, frame_ts_ms) plan is the real Spark-side contract.
    """
    return (
        video.where(F.col("kind") == "video")
        .where(F.col("duration_ms").isNotNull())
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
            ).alias("frame_ts_ms"),
        )
    )
