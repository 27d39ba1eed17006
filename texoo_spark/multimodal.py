"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Decode is REAL for PNG/BMP/GIF/RIFF-WAV (texoo_spark.mediacodec /
gifcodec: chunk grammar, CRCs, zlib inflate, scanline de-filtering, LZW),
baseline JPEG (texoo_spark.jpegcodec: full T.81 Huffman+IDCT path) and
the MP4 container (texoo_spark.mp4box: ISO-BMFF box walk + sample
tables — frame byte ranges without decoding). Codec BITSTREAMS inside
MP4 samples (H.264/AAC) and MP3/WebP/AVIF stay NotImplementedError —
plug PIL/opencv/ffmpeg in on a cluster that has them. The Spark-side
plumbing is identical either way: schemas, partition-preserving
mapInPandas over binary columns, batch shapes, feature contracts.

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
    """Audio payload bytes -> (n_samples, channels) PCM via the RIFF/WAV
    or FLAC codecs (flaccodec: full rice/fixed/LPC baseline decode).
    Perceptual formats (MP3/AAC/...) need a library not in this
    environment."""
    from texoo_spark import mediacodec
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return mediacodec.decode_wav(payload)[0]
    if payload[:4] == b"fLaC":
        from texoo_spark.flaccodec import decode_flac
        return decode_flac(payload)[0]
    raise NotImplementedError(
        "no codec for this audio format in this environment "
        "(stdlib codecs cover RIFF/WAV PCM and FLAC)")


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


MP4_SAMPLE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("sample_idx", IntegerType()),
    StructField("dts_ms", LongType()),
    StructField("offset", LongType()),
    StructField("size", IntegerType()),
    StructField("is_sync", IntegerType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", LongType()),
])

_MP4_SAMPLE_COLS = [f.name for f in MP4_SAMPLE_SCHEMA.fields]


def parse_mp4_samples(media: DataFrame) -> DataFrame:
    """(media_id, payload) -> one row per video sample from the REAL
    ISO-BMFF sample tables (mp4box.parse_mp4: stts/stsz/stsc/stco/co64/
    stss/tkhd/mdhd). Emits metadata ONLY — byte slicing happens
    downstream, JVM-side, against the payload column; at 100 TB the
    parse reads just the moov byte range (typically <1% of the file),
    so this stage is IO-bound on index bytes, not video bytes."""
    from texoo_spark.mp4box import parse_mp4

    def run(batches):
        for pdf in batches:
            out = {c: [] for c in _MP4_SAMPLE_COLS}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                movie = parse_mp4(bytes(payload))
                for trk in movie.tracks:
                    if trk.handler != "vide" or not trk.timescale:
                        continue
                    scale = trk.timescale / 1000.0
                    for i, (dts, off, sz) in enumerate(zip(
                            trk.sample_dts, trk.sample_offsets,
                            trk.sample_sizes)):
                        out["media_id"].append(int(mid))
                        out["sample_idx"].append(i)
                        out["dts_ms"].append(int(dts / scale))
                        out["offset"].append(int(off))
                        out["size"].append(int(sz))
                        out["is_sync"].append(int(trk.is_sync(i)))
                        out["width"].append(int(trk.width))
                        out["height"].append(int(trk.height))
                        out["duration_ms"].append(
                            int(trk.duration / scale))
            yield pd.DataFrame(out, columns=_MP4_SAMPLE_COLS)

    return (media.select("media_id", "payload")
            .mapInPandas(run, MP4_SAMPLE_SCHEMA))


def sample_sync_frames(samples: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling selection over a parsed sample table: for each
    target timestamp (0, every_ms, 2*every_ms, ... < duration) keep the
    LATEST sync sample at-or-before it (the seek-to-keyframe rule every
    video pipeline uses), deduped.

    Closed form instead of a target join: a sync sample covers targets
    in [dts, next_sync_dts), so it is selected iff the first every_ms
    multiple at-or-after its dts lands inside that window (clipped to
    the duration). ONE keyed window (lead over the sync samples per
    media) + a filter — one exchange, no explode, no self-join, and the
    sample table is scanned once."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    w = Window.partitionBy("media_id").orderBy("sample_idx")
    syncs = samples.filter(F.col("is_sync") == 1)
    nxt = F.lead("dts_ms").over(w)
    window_end = F.least(F.coalesce(nxt, F.col("duration_ms")),
                         F.col("duration_ms"))
    first_target = (F.ceil(F.col("dts_ms") / F.lit(int(every_ms)))
                    * F.lit(int(every_ms))).cast("long")
    return (syncs.withColumn("_end", window_end)
            .filter(first_target < F.col("_end"))
            .select(*_MP4_SAMPLE_COLS))


def slice_frame_bytes(frames: DataFrame, media: DataFrame) -> DataFrame:
    """Join sampled frames back to the payload column and slice each
    frame's byte range JVM-side (binary substring — payload bytes never
    enter Python). Adds frame_sha256/frame_bytes columns."""
    from pyspark.sql import functions as F
    sliced = F.expr(
        "substring(payload, cast(offset + 1 as int), size)")
    return (frames.join(media.select("media_id", "payload"), "media_id")
            .withColumn("frame_bytes", sliced)
            .withColumn("frame_sha256", F.sha2(F.col("frame_bytes"), 256))
            .drop("payload"))


def decode_jpeg_frame_stats(sliced: DataFrame) -> DataFrame:
    """Decode SAMPLED Motion-JPEG frames (the frame_bytes column
    slice_frame_bytes produced) through the real T.81 baseline decoder
    and report pixel statistics. Runs AFTER frame sampling, so only the
    selected keyframes' bytes — not whole videos — cross into Python,
    one Arrow batch at a time; per-row independent, no shuffle."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                                   StructField, StructType)

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("dts_ms", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("v_count", LongType()),
        StructField("v_mean", DoubleType()),
        StructField("v_first", DoubleType()),
        StructField("v_last", DoubleType()),
    ])

    def run(batches):
        from texoo_spark.jpegcodec import decode_jpeg
        for pdf in batches:
            out = {f.name: [] for f in schema.fields}
            for mid, dts, payload in zip(pdf["media_id"], pdf["dts_ms"],
                                         pdf["frame_bytes"]):
                img = decode_jpeg(bytes(payload))
                flat = img[:, :, 0].astype("float64").ravel()
                out["media_id"].append(int(mid))
                out["dts_ms"].append(int(dts))
                out["width"].append(int(img.shape[1]))
                out["height"].append(int(img.shape[0]))
                out["v_count"].append(int(flat.size))
                out["v_mean"].append(float(flat.mean()))
                out["v_first"].append(float(flat[0]))
                out["v_last"].append(float(flat[-1]))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return (sliced.select("media_id", "dts_ms", "frame_bytes")
            .mapInPandas(run, schema))


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
