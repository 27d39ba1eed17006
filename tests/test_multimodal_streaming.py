"""Multimodal plumbing + streaming extraction tests."""

import os

import pytest
from pyspark.sql import functions as F

pytestmark = pytest.mark.spark


@pytest.fixture(scope="session")
def spark():
    from texoo_spark.session import get_spark
    s = get_spark("texoo-mm-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


def test_decode_unknown_formats_stay_stubbed():
    """Formats without a hermetic codec stay honest NotImplementedError
    (PNG/BMP/WAV/baseline-JPEG now dispatch to the real stdlib codecs —
    tests/test_mediacodec.py, tests/test_jpegcodec.py)."""
    from texoo_spark.multimodal import decode_audio, decode_image
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxWEBPVP8 ")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3 mp3")


def test_decode_media_stats_spark(spark):
    """The real-codec decode lane: synth payloads -> decode_media_stats
    round trip inside Spark, stats match the generator's closed forms."""
    from texoo_spark.mediacodec import synth_media_payload
    from texoo_spark.multimodal import decode_media_stats
    rows = []
    for i in range(16):
        mime, payload = synth_media_payload(i)
        rows.append((i, mime, bytearray(payload)))
    media = spark.createDataFrame(
        rows, "media_id long, mime string, payload binary")
    got = {r.media_id: r for r in decode_media_stats(media).collect()}
    assert len(got) == 16
    for i in range(16):
        r = got[i]
        if i % 4 == 2:
            want = "audio/flac" if (i // 4) % 2 else "audio/wav"
            assert r.mime == want and r.height == 1
            assert r.v_mean == -8.0
        elif i % 4 == 3:  # grayscale JPEG: exact flat-block round trip
            assert r.mime == "image/jpeg"
            assert r.v_count == r.width * r.height
            assert r.v_first == float(i % 200)
        else:
            assert r.mime.startswith("image/")
            assert r.v_count == r.width * r.height * 3
            assert r.v_mean == 127.5


def test_media_feature_extraction(spark):
    from texoo_spark.multimodal import extract_media_features, synthetic_media
    media = synthetic_media(spark, n=24)
    feats = extract_media_features(media, dims=8).collect()
    assert len(feats) == 24
    by_id = {r.media_id: r for r in feats}
    assert all(len(r.features) == 8 for r in feats)
    assert by_id[0].n_bytes == 32  # one sha256 block
    # deterministic: same payload -> same features on rerun
    feats2 = extract_media_features(media, dims=8).collect()
    assert {r.media_id: r.features for r in feats2} == \
        {r.media_id: r.features for r in feats}


def test_metadata_filter_prunes_without_payload(spark, tmp_path):
    """Metadata predicates must reach the parquet scan (PushedFilters) and
    must not require reading payload bytes (column pruning)."""
    from texoo_spark.multimodal import synthetic_media
    path = str(tmp_path / "media")
    synthetic_media(spark, n=24).write.parquet(path)
    df = spark.read.parquet(path).filter(F.col("mime") == "image/png") \
        .select("media_id", "width")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "pushed" in plan.lower()
    assert "payload" not in plan  # pruned
    assert df.count() == 8


def test_frame_sample_plan(spark):
    from texoo_spark.multimodal import frame_sample_plan, synthetic_media
    media = synthetic_media(spark, n=12)
    frames = frame_sample_plan(media, every_ms=1000).collect()
    vids = {r.media_id for r in frames}
    assert all(m % 3 == 2 for m in vids)  # only video/mp4 rows
    one = sorted(r.frame_ts_ms for r in frames if r.media_id == 2)
    assert one == [0, 1000, 2000]  # duration 3000ms sampled at 1s


def test_embedding_near_dups(spark):
    import numpy as np
    from texoo_spark.dedup import embedding_near_dups
    rng = np.random.RandomState(1)
    base = rng.randn(20, 16).astype(np.float32)
    rows = [(i, v.tolist()) for i, v in enumerate(base)]
    # add near-dup copies (tiny perturbation) with ids +100
    rows += [(i + 100, (v + rng.randn(16).astype(np.float32) * 0.01).tolist())
             for i, v in enumerate(base[:5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = embedding_near_dups(df, min_cosine=0.98).collect()
    found = {(p.id_a, p.id_b) for p in pairs}
    assert {(i, i + 100) for i in range(5)} <= found
    assert all(p.cosine >= 0.98 for p in pairs)


def test_stream_extract_available_now(spark, tmp_path):
    from texoo_spark.streaming import run_stream_once
    inp = str(tmp_path / "in")
    outp = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    df = spark.createDataFrame(
        [("c", 0, "user", "First sentence. Second sentence here.", None,
          None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    df.write.parquet(inp)
    run_stream_once(spark, inp, outp, ckpt)
    out = spark.read.parquet(outp).collect()
    assert len(out) == 1
    assert out[0].n_sentences == 2
    # rerun: checkpoint remembers consumed files -> nothing new appended
    run_stream_once(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == 1
    # new file arrives -> only the new turn is processed
    df2 = spark.createDataFrame(
        [("c", 1, "assistant", "Third sentence.", None, None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    df2.write.mode("append").parquet(inp)
    run_stream_once(spark, inp, outp, ckpt)
    assert spark.read.parquet(outp).count() == 2
