"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video are opaque `binary` columns with a typed metadata struct.
The Spark-side plumbing (schema, partition-friendly batching, Arrow UDF
signatures, deterministic fake decode for tests) is real; the actual codec
calls are stubbed behind clearly-marked hooks because no media libraries
exist in this container — swap `_decode_image_bytes` for a PIL/ffmpeg call
and nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),     # image | audio | video
        StructField("mime", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), False),
    ]
)

# feature is array<double>: the fake decode computes in float64 so the
# DuckDB differential oracle (same bytes, same double arithmetic) matches
# bit-for-bit; a real embedding extractor would downcast to float32 at the
# sink, not mid-pipeline.
FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("feature", ArrayType(DoubleType(), False), False),
        StructField("decode_ok", StringType(), False),
    ]
)


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = hash-derived bytes."""
    df = spark.range(0, n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3).cast("int") + 1,
    )
    payload = F.unhex(
        F.concat(
            F.md5(F.concat(F.col("id").cast("string"), F.lit(seed))),
            F.md5(F.concat(F.lit("p2"), F.col("id").cast("string"))),
        )
    )
    return df.select(
        F.col("id").alias("media_id"),
        kind.alias("kind"),
        F.concat(kind, F.lit("/raw")).alias("mime"),
        F.when(kind == "image", ((F.col("id") % 8) * 64 + 64).cast("int")).alias("width"),
        F.when(kind == "image", ((F.col("id") % 5) * 64 + 64).cast("int")).alias("height"),
        F.when(kind != "image", ((F.col("id") % 30) * 1000).cast("int") + 1000).alias(
            "duration_ms"
        ),
        payload.alias("payload"),
    )


def _decode_image_bytes(payload: bytes) -> np.ndarray:
    """STUB: real decode (PIL.Image.open / ffmpeg) is unavailable in this
    container. Deterministic fake: payload bytes -> 8-dim float feature.
    Raises NotImplementedError for non-fake use via decode_strict()."""
    arr = np.frombuffer(payload[:32], dtype=np.uint8).astype(np.float64)
    if arr.size < 32:
        arr = np.pad(arr, (0, 32 - arr.size))
    return arr.reshape(8, 4).mean(axis=1) / 255.0


def decode_strict(payload: bytes) -> np.ndarray:
    raise NotImplementedError(
        "real image/audio decode requires PIL/ffmpeg, not present in this "
        "environment; use the deterministic fake path (extract_features)"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    mapInPandas so each task processes whole record batches (payloads never
    pass through the driver); output schema is fixed/declared."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload in pdf["payload"]:
                try:
                    feats.append([float(x) for x in _decode_image_bytes(bytes(payload))])
                    oks.append("ok")
                except Exception as exc:  # decode failures are data, not errors
                    feats.append([0.0] * 8)
                    oks.append(f"error:{type(exc).__name__}")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "feature": feats, "decode_ok": oks}
            )

    return media.select("media_id", "payload").mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expand each video row into frame
    timestamps (decode itself stubbed). Pure expression — the expensive
    decode would hang off this exploded plan."""
    v = media.where(F.col("kind") == "video")
    return v.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0), F.col("duration_ms"), F.lit(every_ms)
            )
        ).alias("frame_ts_ms"),
    )
