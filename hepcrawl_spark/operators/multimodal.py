"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, partitioning, mapInPandas batch shape,
Arrow transfer) is real and tested; the actual codec work is stubbed behind
``DECODERS`` because no image/audio libraries exist in this container — a
deployment drops in PIL/torchaudio/decord implementations without touching
the plan shape.

Design rules for 100 TB of media:
- binary payloads never enter a shuffle: all feature extraction is
  mapInPandas (narrow), outputs are small typed rows; joins happen on the
  extracted metadata, not the bytes.
- ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds the bytes held
  per Arrow batch; media tables should also set a small
  ``parquet.block.size`` and partition by (modality, date).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),  # image|audio|video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("meta_width", IntegerType(), True),
        StructField("meta_height", IntegerType(), True),
        StructField("meta_duration_ms", IntegerType(), True),
    ]
)

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("sha_prefix", StringType(), True),
        StructField("feature", ArrayType(FloatType()), True),
        StructField("error", StringType(), True),
    ]
)


def _decode_image(payload: bytes) -> np.ndarray:
    """Real deployments: PIL.Image.open -> resize -> np array."""
    raise NotImplementedError("image codec not available in this container")


def _decode_audio(payload: bytes) -> np.ndarray:
    raise NotImplementedError("audio codec not available in this container")


def _decode_video_frames(payload: bytes) -> np.ndarray:
    raise NotImplementedError("video codec not available in this container")


def _deterministic_fake_feature(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic stand-in feature so the pipeline is testable end-to-end
    without codecs: bytes -> chunked sums, normalized."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    pad = (-len(arr)) % dim
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    chunks = arr.reshape(dim, -1).sum(axis=1).astype(np.float32)
    norm = np.linalg.norm(chunks)
    return chunks / norm if norm else chunks


DECODERS = {
    "image": _decode_image,
    "audio": _decode_audio,
    "video": _decode_video_frames,
}


def extract_features(
    media: DataFrame, use_fake_decoder: bool = True, dim: int = 8
) -> DataFrame:
    """mapInPandas feature extraction over media rows.

    Narrow (no shuffle); binary stays on the executor; output rows are small.
    ``use_fake_decoder=True`` routes every modality through the
    deterministic stand-in; False calls the real (stubbed) codecs and
    produces error rows with NotImplementedError until codecs are installed.
    """
    import hashlib

    def _feature(payload: bytes, modality: str):
        try:
            if use_fake_decoder:
                feat = _deterministic_fake_feature(payload, dim)
            else:
                feat = DECODERS[modality](payload).astype(np.float32).ravel()[:dim]
            return feat.astype(np.float32).tolist(), None
        except NotImplementedError as exc:
            return None, f"NotImplementedError: {exc}"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar, no iterrows: only the inherently per-payload work
        # (sha256, codec call) runs per element, via comprehensions over
        # the raw column arrays
        for pdf in it:
            payloads = [p if p is not None else b"" for p in pdf["payload"]]
            feats, errs = (
                zip(*(_feature(p, m) for p, m in zip(payloads, pdf["modality"])))
                if len(pdf)
                else ((), ())
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "modality": pdf["modality"].to_numpy(),
                    "n_bytes": np.fromiter(
                        (len(p) for p in payloads), dtype=np.int64, count=len(payloads)
                    ),
                    "sha_prefix": [
                        hashlib.sha256(p).hexdigest()[:16] for p in payloads
                    ],
                    "feature": list(feats),
                    "error": list(errs),
                }
            )

    return media.mapInPandas(batches, FEATURES_SCHEMA)


def synthesize_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    df = spark.range(0, n)
    modality = (
        F.when(F.col("id") % 3 == 0, "image")
        .when(F.col("id") % 3 == 1, "audio")
        .otherwise("video")
    )
    payload = F.encode(
        F.repeat(F.concat(F.lit("blob"), F.col("id").cast("string")), 64), "UTF-8"
    )
    return df.select(
        F.col("id").alias("media_id"),
        modality.alias("modality"),
        F.lit("application/octet-stream").alias("mime"),
        payload.alias("payload"),
        F.lit(640).alias("meta_width"),
        F.lit(480).alias("meta_height"),
        (F.col("id") % 1000).cast("int").alias("meta_duration_ms"),
    )
