"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The image/audio codec libraries are not available in this container, so the
decode step is STUBBED behind ``decode_stub`` (a deterministic fake that
derives metadata from the payload bytes) — the Spark-side plumbing (schema,
partitioning, UDF signature, batch shape) is real and tested. Swap
``_decode_payload`` for a real decoder (PIL/ffmpeg) on a cluster image.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

__all__ = ["MEDIA_SCHEMA", "MEDIA_FEATURES_SCHEMA", "decode_media", "sample_frames"]

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),      # image | audio | video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
])

MEDIA_FEATURES_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha1", StringType()),
    StructField("width", IntegerType()),       # stubbed: derived deterministically
    StructField("height", IntegerType()),
    StructField("duration_sec", DoubleType()),
    StructField("feature", ArrayType(DoubleType())),  # 8-dim byte-histogram embedding
    StructField("error", StringType()),
])


def _decode_payload(kind: str, payload: bytes) -> dict:
    """STUB decode. Real image/audio decoding (resize, frame-sample, spectro)
    is NotImplemented in this container; this deterministic fake preserves
    the exact schema and batch shape a real decoder would produce."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty media payload (real decoder would raise)")
    digest = hashlib.sha1(payload).digest()
    width = 64 + digest[0] % 192 if kind in ("image", "video") else None
    height = 64 + digest[1] % 192 if kind in ("image", "video") else None
    duration = round(digest[2] / 16.0, 3) if kind in ("audio", "video") else None
    hist = [0] * 8
    for b in payload[:4096]:
        hist[b >> 5] += 1
    total = sum(hist) or 1
    return {
        "width": width, "height": height, "duration_sec": duration,
        "feature": [round(h / total, 6) for h in hist],
    }


def _media_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        rows = []
        for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
            row = {"media_id": media_id, "kind": kind,
                   "n_bytes": len(payload) if payload is not None else 0,
                   "sha1": hashlib.sha1(payload).hexdigest() if payload else None,
                   "width": None, "height": None, "duration_sec": None,
                   "feature": None, "error": None}
            try:
                row.update(_decode_payload(kind, bytes(payload) if payload is not None else b""))
            except NotImplementedError as e:
                row["error"] = str(e)
            rows.append(row)
        yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields])


def decode_media(media_df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Binary media -> typed features. Salted repartition on media_id hash
    (large blobs skew exactly like large documents)."""
    spark = media_df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism * 2
    salted = media_df.repartition(n, F.xxhash64("media_id"))
    return salted.mapInPandas(_media_batches, schema=MEDIA_FEATURES_SCHEMA)


def sample_frames(media_df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Frame-sampling plumbing for video: emits (media_id, frame_no) rows;
    the pixel decode itself is the stub above."""
    return (
        media_df.where(F.col("kind") == "video")
        .select("media_id", F.explode(F.sequence(F.lit(0), F.lit(every_nth * 4), F.lit(every_nth))).alias("frame_no"))
    )
