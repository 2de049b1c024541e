"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step is STUBBED (no image/audio libraries in this container —
``NotImplementedError`` unless the deterministic fake is requested), but
everything Spark-side is real and tested: the schema contract, the
Arrow batch shape through ``mapInPandas``, partition-preserving
narrowness, and the metadata extraction.

At 100 TB the shape matters more than the decode: binaries must never
cross a shuffle (all ops here are narrow — mapInPandas over the scan),
and feature extraction emits small fixed-size vectors so downstream
shuffles carry features, not media.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (opaque bytes + metadata)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        rng = np.random.default_rng(seed + i)
        kind = kinds[i % 3]
        data = rng.integers(0, 256, size=int(rng.integers(64, 512))).astype(
            np.uint8
        ).tobytes()
        rows.append(
            (
                i, kind, f"application/x-fake-{kind}",
                int(rng.integers(16, 4096)) if kind != "audio" else None,
                int(rng.integers(16, 4096)) if kind != "audio" else None,
                int(rng.integers(100, 600000)) if kind != "image" else None,
                bytearray(data),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "media_id long, kind string, n_bytes long, features array<float>"
)


def extract_features(
    df: DataFrame, use_fake_decoder: bool = False
) -> DataFrame:
    """Decode + featurize media binaries via ``mapInPandas``.

    Real decoders (PIL/ffmpeg/torchaudio) are not installed in this
    container; the Spark-side plumbing — Arrow batch iteration, binary
    handling, fixed-dim float output — is identical for a real decoder.
    ``use_fake_decoder=True`` substitutes a deterministic
    hash-of-bytes featurizer so the pipeline is testable end to end.
    """

    def run(batches):
        for pdf in batches:
            feats = []
            for blob in pdf["data"]:
                feats.append(_decode_and_featurize(bytes(blob), use_fake_decoder))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(len).astype("int64"),
                    "features": feats,
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def _decode_and_featurize(blob: bytes, use_fake: bool) -> list[float]:
    if not use_fake:
        raise NotImplementedError(
            "media decoding requires PIL/ffmpeg — not available in this "
            "container; pass use_fake_decoder=True for the deterministic "
            "test featurizer"
        )
    # deterministic fake: FEATURE_DIM floats from the sha256 of the bytes
    digest = hashlib.sha256(blob).digest()
    arr = np.frombuffer(digest[: FEATURE_DIM * 2], dtype=np.uint16)
    return (arr.astype(np.float32) / 65535.0).tolist()


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes per-row frame timestamps
    (metadata only — JVM-side sequence; the actual frame decode would
    run in the stubbed decoder).  Demonstrates how per-frame fan-out
    stays declarative: one row per sampled frame, no Python."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("duration_ms"), F.lit(every_ms)
                )
            ).alias("frame_ts_ms"),
        )
    )
