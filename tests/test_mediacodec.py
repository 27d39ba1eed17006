"""Real stdlib-only media codec tests: PNG/BMP/WAV round trips, error
paths, closed-form stats of the deterministic payload generator, and the
Spark decode_media_stats lane."""

import struct
import zlib

import numpy as np
import pytest

from texoo_spark.mediacodec import (PNG_SIG, decode_bmp, decode_features,
                                    decode_png, decode_wav, make_bmp,
                                    make_png, make_wav, synth_media_payload)


def _grad(h, w, c, seed=7):
    """Deterministic texture: gradient + pseudo-noise so the Paeth/Average
    predictors take every branch."""
    rng = np.random.RandomState(seed)
    base = (np.arange(h)[:, None] * 3 + np.arange(w)[None, :] * 5) % 256
    img = (base[:, :, None] + rng.randint(0, 64, size=(h, w, c))) % 256
    return img.astype(np.uint8)


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_png_round_trip_all_filters(channels):
    # height 10 > 5 so the row % 5 filter cycle covers every filter type
    # at least twice, incl. Paeth rows that depend on reconstructed rows
    img = _grad(10, 7, channels)
    out = decode_png(make_png(img))
    assert out.shape == (10, 7, channels)
    np.testing.assert_array_equal(out, img)


def test_png_two_dim_input_becomes_grayscale():
    img = _grad(6, 5, 1)[:, :, 0]
    out = decode_png(make_png(img))
    np.testing.assert_array_equal(out[:, :, 0], img)


def test_png_crc_error_detected():
    data = bytearray(make_png(_grad(5, 5, 3)))
    # flip one byte inside the IDAT body (after sig+IHDR chunk)
    idat_at = data.index(b"IDAT")
    data[idat_at + 10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_png_rejects_non_png_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF not a png")
    # hand-build a 16-bit-depth IHDR: supported=False path
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with pytest.raises(ValueError, match="unsupported"):
        decode_png(PNG_SIG + chunk)


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def test_bmp_round_trip_with_row_padding():
    # width 5 -> 15-byte rows padded to 16: exercises the pad logic
    img = _grad(4, 5, 3)
    out = decode_bmp(make_bmp(img))
    np.testing.assert_array_equal(out, img)


def test_bmp_top_down_and_32bit():
    # hand-build a top-down (negative height) 32-bit BMP
    h, w = 3, 2
    img = _grad(h, w, 4)
    body = bytearray()
    for r in range(h):  # top-down: rows in image order
        body += img[r][:, [2, 1, 0, 3]].tobytes()  # RGBA -> BGRA
    off = 14 + 40
    data = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off)
            + struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0,
                          len(body), 0, 0, 0, 0) + bytes(body))
    np.testing.assert_array_equal(decode_bmp(data), img)


def test_bmp_rejects_compressed():
    data = bytearray(make_bmp(_grad(2, 2, 3)))
    struct.pack_into("<I", data, 30, 1)  # biCompression = BI_RLE8
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(data))


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

def test_wav_round_trip_pcm16_mono():
    s = (np.sin(np.arange(500) / 10.0) * 20000).astype(np.int16)
    out, rate = decode_wav(make_wav(s, rate=16000))
    assert rate == 16000
    np.testing.assert_array_equal(out[:, 0], s)


def test_wav_unknown_chunks_skipped_and_stereo():
    # hand-build: LIST chunk (odd length -> word-align pad) before fmt,
    # stereo 16-bit
    s = np.arange(-6, 6, dtype="<i2").reshape(-1, 2)
    pcm = s.tobytes()
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = (b"WAVE"
            + b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # padded odd chunk
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    data = b"RIFF" + struct.pack("<I", len(body)) + body
    out, rate = decode_wav(data)
    assert rate == 8000 and out.shape == (6, 2)
    np.testing.assert_array_equal(out, np.asarray(s))


def test_wav_8bit_pcm():
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    pcm = bytes([0, 128, 255])
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    out, _ = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    np.testing.assert_array_equal(out[:, 0], [-32768, 0, 32512])


def test_wav_rejects_non_wav():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS whatever")


# ---------------------------------------------------------------------------
# Deterministic payload generator: decoded stats match the closed forms
# the SQL oracle states (the hermetic media_features 'decoded' lane)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("media_id", list(range(0, 48)) + [97, 113, 119])
def test_synth_payload_closed_form_stats(media_id):
    mime, payload = synth_media_payload(media_id)
    stats = decode_features(mime, payload)
    kind, g = media_id % 4, media_id // 4
    if kind in (0, 1):
        assert mime == ("image/png" if kind == 0 else "image/bmp")
        w, h = 16 * (1 + g % 2), 16 * (1 + g % 3)
        assert (stats["width"], stats["height"]) == (w, h)
        assert stats["v_count"] == w * h * 3
        assert stats["v_mean"] == 127.5  # W*H multiple of 256: exact
        assert stats["v_first"] == media_id % 200
        assert stats["v_last"] == ((h - 1) * w + w - 1 + media_id % 200) % 256
    elif kind == 2:
        # g parity picks the container; FLAC is lossless so every stat
        # below is container-independent
        assert mime == ("audio/flac" if g % 2 else "audio/wav")
        n = 256 * (8 + g % 5)
        assert (stats["width"], stats["height"]) == (n, 1)
        assert stats["v_count"] == n
        assert stats["v_mean"] == -8.0  # n multiple of 256: exact
        assert stats["v_first"] == (media_id % 128 - 128) * 16
        assert stats["v_last"] == ((media_id % 128 + 255) % 256 - 128) * 16
    else:  # grayscale baseline JPEG, flat 8x8 blocks: bit-exact round trip
        assert mime == "image/jpeg"
        w, h = 16 * (1 + g % 2), 16 * (1 + g % 3)
        nb = (w // 8) * (h // 8)
        mp = media_id % 200
        vals = [(16 * b + mp) % 256 for b in range(nb)]
        assert (stats["width"], stats["height"]) == (w, h)
        assert stats["v_count"] == w * h  # 1 channel
        assert stats["v_mean"] == sum(vals) / nb
        assert stats["v_first"] == vals[0]
        assert stats["v_last"] == vals[-1]


def test_decode_features_rejects_unknown_mime():
    with pytest.raises(ValueError, match="no codec"):
        decode_features("video/mp4", b"\x00")


def test_multimodal_dispatch():
    """decode_image/decode_audio route magic bytes to the real codecs
    (incl. baseline JPEG) and stay honest NotImplementedError for formats
    with no hermetic codec."""
    from texoo_spark.jpegcodec import make_jpeg
    from texoo_spark.multimodal import decode_audio, decode_image
    img = _grad(5, 4, 3)
    np.testing.assert_array_equal(decode_image(make_png(img)), img)
    np.testing.assert_array_equal(decode_image(make_bmp(img)), img)
    s = np.arange(10, dtype=np.int16)
    np.testing.assert_array_equal(
        decode_audio(make_wav(s))[:, 0], s)
    flat = np.full((8, 8), 77, np.uint8)
    np.testing.assert_array_equal(
        decode_image(make_jpeg(flat, quality=100))[:, :, 0], flat)
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFFxxxxWEBP webp magic")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3 mp3 magic bytes")
