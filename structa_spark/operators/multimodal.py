"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The Spark-side contract is real and tested — schemas, Arrow-batched
``mapInPandas`` pipelines, partition sizing — while the actual codec
work is stubbed behind ``DecodeUnavailable`` / deterministic fakes
(the image/audio libraries are not in this container). Swapping in
PIL/torchaudio/ffmpeg later changes only the inner function body, not
the distributed shape of the pipeline.

Batch-shape guidance for 100 TB: binary payloads dominate partition
size, so size ``spark.sql.files.maxPartitionBytes`` for the *decoded*
footprint (decoded RGB is ~10-50x the JPEG bytes), and prefer
``spark.sql.execution.arrow.maxRecordsPerBatch`` around 64-256 for
image batches so a batch fits executor memory.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("format", T.StringType()),       # jpeg | png | ...
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
])

AUDIO_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
    T.StructField("codec", T.StringType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
    T.StructField("feat_dim", T.IntegerType()),
])


class DecodeUnavailable(NotImplementedError):
    """Raised by the real-decode path: codec libraries not present."""


def _fake_decode_feature(payload: bytes, dim: int) -> list:
    """Deterministic stand-in for decode+embed: a dim-length feature
    derived from payload bytes (stable across runs/engines). Marks the
    seam where PIL/torchvision would produce real features."""
    if payload is None:
        return [0.0] * dim
    acc = 2166136261
    out = []
    for i in range(dim):
        b = payload[i % len(payload)] if payload else 0
        acc = (acc ^ (b + i)) * 16777619 % (1 << 32)
        out.append(((acc % 2000003) / 1000001.5) - 1.0)
    return out


def extract_features(df: DataFrame, dim: int = 16,
                     payload_col: str = "payload",
                     id_col: str = "media_id",
                     real_decode: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` keeps the binary data executor-side in Arrow
    batches; only the (id, feature) pairs come out — the pattern for
    any decode/resize/frame-sample stage.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if real_decode:
                raise DecodeUnavailable(
                    "codec libraries not available in this environment")
            feats = [
                _fake_decode_feature(p, dim) for p in pdf[payload_col]
            ]
            yield pd.DataFrame({
                "media_id": pdf[id_col],
                "feature": feats,
                "feat_dim": dim,
            })

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10,
                  id_col: str = "media_id",
                  n_frames_col: str = "n_frames") -> DataFrame:
    """Frame-sampling plumbing for video rows: emits (media_id,
    frame_idx) for every n-th frame — pure column ops (sequence +
    explode), the decode itself happens downstream per frame."""
    return (df.select(
        F.col(id_col),
        F.explode(F.sequence(
            F.lit(0),
            F.greatest(F.col(n_frames_col) - 1, F.lit(0)),
            F.lit(every_n))).alias("frame_idx")))


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests: payload bytes derived
    from the id (no codec needed)."""
    rows = []
    for i in range(n):
        payload = bytes([(i * 31 + j * 7 + seed) % 256
                         for j in range(128 + (i % 64))])
        rows.append((i, payload, "jpeg", 64 + i % 32, 48 + i % 24))
    return spark.createDataFrame(rows, IMAGE_SCHEMA)
