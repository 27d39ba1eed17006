"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode is REAL for the container formats whose codecs need nothing beyond
the stdlib (PNG/BMP/WAV via texoo_spark.mediacodec: chunk grammar, CRCs,
zlib inflate, scanline de-filtering); entropy-coded formats (JPEG/MP3/MP4)
raise NotImplementedError — plug PIL/opencv/ffmpeg into decode_image /
decode_audio on a cluster that has them. The Spark-side plumbing is the
same either way: schemas, partition-preserving mapInPandas over binary
columns, batch shapes, and the feature-extraction contract.

At 100 TB the rules encoded here matter:
- binary payloads ride in their own column; metadata filters (mime, width,
  duration) push down to parquet scans without touching bytes;
- decode/resize/frame-sample run via mapInPandas so one Python process
  streams Arrow batches without JVM round-trips per row;
- spark.sql.execution.arrow.maxRecordsPerBatch must be sized against
  payload bytes (10k rows x 1MB images would OOM the worker: media tables
  use a smaller batch size, see MEDIA_BATCH_ROWS).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, FloatType,
                               IntegerType, LongType, StringType, StructField,
                               StructType)

MEDIA_BATCH_ROWS = 256  # Arrow batch sizing for ~MB-scale payloads

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
    StructField("payload", BinaryType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),
    StructField("sha256", StringType()),
    StructField("n_bytes", LongType()),
    StructField("features", ArrayType(FloatType())),
])


def decode_image(payload: bytes) -> np.ndarray:
    """Image payload bytes -> (H, W, C) uint8 via the stdlib+numpy codecs
    (PNG, BMP, baseline JPEG — dispatched on magic bytes). Formats beyond
    those (WebP, AVIF, progressive JPEG, ...) need a codec library not
    present in this environment; plug PIL/opencv in here on a real
    cluster."""
    from texoo_spark import mediacodec
    if payload[:8] == mediacodec.PNG_SIG:
        return mediacodec.decode_png(payload)
    if payload[:2] == b"BM":
        return mediacodec.decode_bmp(payload)
    if payload[:2] == b"\xFF\xD8":
        from texoo_spark.jpegcodec import decode_jpeg
        return decode_jpeg(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from texoo_spark.gifcodec import decode_gif
        return decode_gif(payload)
    raise NotImplementedError(
        "no codec for this image format in this environment "
        "(stdlib codecs cover PNG, BMP, GIF and baseline JPEG)")


def decode_audio(payload: bytes) -> np.ndarray:
    """Audio payload bytes -> (n_samples, channels) int16 via the RIFF/WAV
    PCM codec. Entropy-coded formats (MP3/AAC/...) need a library not in
    this environment."""
    from texoo_spark import mediacodec
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return mediacodec.decode_wav(payload)[0]
    raise NotImplementedError(
        "no codec for this audio format in this environment "
        "(stdlib codec covers RIFF/WAV PCM)")


def fake_decode(payload: bytes, dims: int = 16) -> np.ndarray:
    """Deterministic stand-in for decode+feature-extract: a content-derived
    feature vector (sha256 -> floats). Keeps the pipeline end-to-end
    testable; swap for a real model via the same signature."""
    h = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((h * ((dims * 4) // len(h) + 1))[:dims * 4],
                        dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_media_features(media: DataFrame,
                           dims: int = 16,
                           decode=fake_decode) -> DataFrame:
    """payload binary -> (sha256, n_bytes, features) via mapInPandas.

    The iterator-of-batches form streams: no batch is ever fully
    materialized twice, and payload bytes never cross back to the JVM."""
    def run(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            feats = [decode(p, dims).tolist() if p is not None else None
                     for p in payloads]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "mime": pdf["mime"],
                "sha256": [hashlib.sha256(p or b"").hexdigest()
                           for p in payloads],
                "n_bytes": [len(p or b"") for p in payloads],
                "features": feats,
            })

    return media.mapInPandas(run, FEATURE_SCHEMA)


DECODE_STATS_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("mime", StringType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("v_count", LongType()),
    StructField("v_mean", DoubleType()),
    StructField("v_first", DoubleType()),
    StructField("v_last", DoubleType()),
])

_DECODE_STATS_COLS = [f.name for f in DECODE_STATS_SCHEMA.fields]


def decode_media_stats(media: DataFrame) -> DataFrame:
    """Decode payload binary through the REAL container codecs
    (mediacodec: PNG chunk walk + inflate + de-filter, BMP, RIFF/WAV PCM)
    and report per-row value statistics: width, height, value count,
    mean, first and last decoded value.

    Per-row-independent Arrow-batched map — no shuffle, payload bytes
    never return to the JVM. At 100 TB this is the decode stage of an
    image/audio curation funnel; the stats contract is what downstream
    quality filters key on."""
    from texoo_spark.mediacodec import decode_features

    def run(batches):
        for pdf in batches:
            rows = [dict(media_id=int(i), mime=m,
                         **decode_features(m, bytes(p)))
                    for i, m, p in zip(pdf["media_id"], pdf["mime"],
                                       pdf["payload"])]
            yield pd.DataFrame(rows, columns=_DECODE_STATS_COLS)

    return (media.select("media_id", "mime", "payload")
            .mapInPandas(run, DECODE_STATS_SCHEMA))


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame sampling plan: expands (media_id, duration_ms) into one
    row per sampled frame timestamp WITHOUT touching payload bytes (the
    decode of each frame happens downstream, payload joined back by
    media_id only for the frames kept)."""
    from pyspark.sql import functions as F
    return (media
            .filter(F.col("mime").startswith("video/"))
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0),
                        F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                        F.lit(every_ms))).alias("frame_ts_ms")))


def synthetic_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests/bench (payload bytes are a
    pure function of media_id)."""
    from pyspark.sql import functions as F
    mimes = ["image/png", "audio/wav", "video/mp4"]
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (i % 7 + 1)
        rows.append((i, mimes[i % 3], 64 + i, 48 + i,
                     1000 * (i % 5 + 1), bytearray(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA) \
        .withColumn("payload", F.col("payload").cast("binary"))
