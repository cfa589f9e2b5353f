"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

Decode is REAL for container-free formats (pure numpy/stdlib — no codec
libraries needed): BMP (24/32-bit uncompressed) and PNM (P5/P6) images with
mean-channel + gray-histogram features and nearest-neighbor thumbnailing,
and WAV (PCM) audio with RMS / zero-crossing / FFT-band features.
Compressed codecs (JPEG/PNG/MP3/MP4...) are STUBBED behind
``NotImplementedError`` — those libraries are not in this container — and
surface as per-row ``error`` values, never job failures. The Spark-side
plumbing (schema, salted partitioning, UDF signature, Arrow batch shape) is
identical for both paths, so swapping in PIL/ffmpeg on a cluster image
touches only ``_decode_payload``.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, DoubleType, IntegerType, LongType, StringType,
    StructField, StructType,
)

__all__ = [
    "MEDIA_SCHEMA", "MEDIA_FEATURES_SCHEMA", "decode_media", "sample_frames",
    "decode_bmp", "decode_wav", "make_bmp", "make_wav",
]

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
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_sec", DoubleType()),
    StructField("feature", ArrayType(DoubleType())),  # 8-dim modality embedding
    StructField("error", StringType()),
])


# ---------------------------------------------------------------------------
# Real decoders (uncompressed formats, numpy/stdlib only)
# ---------------------------------------------------------------------------


def make_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes (test/corpus
    generator twin of decode_bmp)."""
    h, w, _ = pixels.shape
    row_size = (w * 3 + 3) & ~3
    img_size = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].tobytes()  # BGR order
        rows.append(row + b"\x00" * (row_size - len(row)))
    return header + info + b"".join(rows)


def decode_bmp(data: bytes) -> tuple[int, int, np.ndarray]:
    """BMP bytes -> (width, height, (h, w, 3) uint8 RGB). 24/32-bit
    uncompressed BITMAPINFOHEADER only."""
    if data[:2] != b"BM" or len(data) < 54:
        raise NotImplementedError("not a BMP payload")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BMP core-header variant not supported")
    w, h_raw = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(f"BMP compression={compression} bpp={bpp} not supported")
    h = abs(h_raw)
    nch = bpp // 8
    row_size = (w * nch + 3) & ~3
    buf = np.frombuffer(data, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = buf.reshape(h, row_size)[:, : w * nch].reshape(h, w, nch)
    if h_raw > 0:
        rows = rows[::-1]  # stored bottom-up
    rgb = rows[:, :, 2::-1] if nch >= 3 else rows  # BGR(A) -> RGB
    return w, h, np.ascontiguousarray(rgb[:, :, :3])


def thumbnail(pixels: np.ndarray, size: int = 8) -> np.ndarray:
    """Nearest-neighbor resize to (size, size, 3) — the 'resize' stage of an
    image pipeline, pure striding."""
    h, w = pixels.shape[:2]
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return pixels[ys][:, xs]


def make_wav(samples: np.ndarray, framerate: int = 8000) -> bytes:
    """float array in [-1, 1] -> 16-bit mono PCM WAV bytes."""
    import io
    import wave

    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2").tobytes()
    bio = io.BytesIO()
    with wave.open(bio, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(pcm)
    return bio.getvalue()


def decode_wav(data: bytes) -> tuple[float, int, np.ndarray]:
    """WAV bytes -> (duration_sec, framerate, float mono samples). PCM only
    (stdlib wave rejects compressed WAV)."""
    import io
    import wave

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError("not a WAV payload")
    with wave.open(io.BytesIO(data), "rb") as wf:
        n, fr, sw, ch = wf.getnframes(), wf.getframerate(), wf.getsampwidth(), wf.getnchannels()
        raw = wf.readframes(n)
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"WAV sample width {sw} not supported")
    if ch > 1:
        samples = samples.reshape(-1, ch).mean(axis=1)
    return (n / fr if fr else 0.0), fr, samples


def _image_features(rgb: np.ndarray) -> list[float]:
    """8-dim: mean R/G/B (normalized), gray std, 4-bin gray histogram."""
    px = rgb.astype(np.float64) / 255.0
    gray = px.mean(axis=2)
    hist, _ = np.histogram(gray, bins=4, range=(0.0, 1.0))
    hist = hist / max(1, gray.size)
    return [round(float(v), 6) for v in
            (px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean(),
             gray.std(), *hist)]


def _audio_features(samples: np.ndarray) -> list[float]:
    """8-dim: RMS, zero-crossing rate, 6 log-spaced FFT band energies."""
    if samples.size == 0:
        return [0.0] * 8
    rms = float(np.sqrt((samples**2).mean()))
    zcr = float((np.diff(np.signbit(samples)) != 0).mean()) if samples.size > 1 else 0.0
    spec = np.abs(np.fft.rfft(samples[:4096])) ** 2
    bands = np.array_split(spec[1:], 6)
    total = sum(float(b.sum()) for b in bands) or 1.0
    return [round(v, 6) for v in
            (rms, zcr, *[float(b.sum()) / total for b in bands])]


def _decode_payload(kind: str, payload: bytes) -> dict:
    """Dispatch on magic bytes; compressed codecs raise NotImplementedError
    (recorded as per-row errors — the honest stub boundary)."""
    if payload is None or len(payload) == 0:
        raise NotImplementedError("empty media payload")
    if payload[:2] == b"BM":
        w, h, rgb = decode_bmp(payload)
        thumb = thumbnail(rgb)  # exercises the resize stage
        return {"width": int(w), "height": int(h), "duration_sec": None,
                "feature": _image_features(thumb)}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        dur, _fr, samples = decode_wav(payload)
        return {"width": None, "height": None, "duration_sec": round(dur, 3),
                "feature": _audio_features(samples)}
    if payload[:2] in (b"P5", b"P6"):
        # PNM: ASCII header then raw samples
        parts = payload.split(maxsplit=4)
        w, h = int(parts[1]), int(parts[2])
        return {"width": w, "height": h, "duration_sec": None,
                "feature": [round(b / 255.0, 6) for b in payload[-8:]]}
    raise NotImplementedError(
        f"{kind}: compressed codec not available in this container "
        f"(magic {payload[:4]!r}); plug PIL/ffmpeg into _decode_payload"
    )


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
            except Exception as e:  # corrupt container: data, not a crash
                row["error"] = f"decode failed: {type(e).__name__}: {e}"
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
    pixel decode of video containers remains behind the stub boundary."""
    return (
        media_df.where(F.col("kind") == "video")
        .select("media_id", F.explode(F.sequence(F.lit(0), F.lit(every_nth * 4), F.lit(every_nth))).alias("frame_no"))
    )
