"""Baseline JPEG codec (texoo_spark.jpegcodec, ITU-T T.81).

Exactness tier: flat-8x8-block images at quality 100 round-trip
bit-exactly (the property the media_features oracle states in closed
form). Lossy tier: arbitrary images round-trip within normal DCT
quantization error, asserted via PSNR. Structure tier: restart markers,
4:2:0 MCU interleave, 16-bit DQT, and the rejection surface (progressive,
truncated, non-JPEG).
"""

import numpy as np
import pytest

from texoo_spark.jpegcodec import (QT_LUMA, ZZ, _quality_table, decode_jpeg,
                                   make_flat_block_jpeg, make_jpeg)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return float("inf") if mse == 0 else 10 * np.log10(255.0 ** 2 / mse)


def _grad(h, w, c=None):
    base = (np.arange(h)[:, None] * 7 + np.arange(w)[None, :] * 13) % 256
    if c is None:
        return base.astype(np.uint8)
    return np.stack([(base + 40 * i) % 256 for i in range(c)],
                    axis=2).astype(np.uint8)


# ---------------------------------------------------------------------------
# Exact tier
# ---------------------------------------------------------------------------

def test_flat_block_roundtrip_bit_exact():
    vals = np.array([[0, 16, 255], [129, 7, 200]], dtype=np.uint8)
    out = decode_jpeg(make_flat_block_jpeg(vals))
    assert out.shape == (16, 24, 1)
    expect = np.repeat(np.repeat(vals, 8, 0), 8, 1)
    np.testing.assert_array_equal(out[:, :, 0], expect)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_flat_block_exact_any_values(seed):
    rng = np.random.RandomState(seed)
    vals = rng.randint(0, 256, size=(4, 5), dtype=np.uint8)
    out = decode_jpeg(make_flat_block_jpeg(vals))[:, :, 0]
    np.testing.assert_array_equal(out, np.repeat(np.repeat(vals, 8, 0), 8, 1))


def test_constant_color_image_exact_444_and_420():
    img = np.empty((24, 40, 3), np.uint8)
    img[:] = (200, 30, 90)
    for sub in [(1, 1), (2, 2)]:
        out = decode_jpeg(make_jpeg(img, quality=90, subsample=sub))
        np.testing.assert_array_equal(out, img)


def test_quality_100_tables_are_unit():
    assert np.all(_quality_table(QT_LUMA, 100) == 1)
    assert np.array_equal(_quality_table(QT_LUMA, 50), QT_LUMA)
    assert _quality_table(QT_LUMA, 1).max() == 255


# ---------------------------------------------------------------------------
# Lossy tier: real images within DCT quantization error
# ---------------------------------------------------------------------------

def test_gray_gradient_high_quality_psnr():
    img = _grad(40, 56)
    out = decode_jpeg(make_jpeg(img, quality=95))
    assert out.shape == (40, 56, 1)
    assert _psnr(img, out[:, :, 0]) > 35


def test_rgb_444_roundtrip_psnr():
    img = _grad(32, 48, 3)
    out = decode_jpeg(make_jpeg(img, quality=92))
    assert out.shape == (32, 48, 3)
    assert _psnr(img, out) > 30


def test_rgb_420_subsampled_roundtrip():
    # smooth chroma so 2x2 box filter + replication loses little
    h, w = 32, 32
    y = np.linspace(40, 210, h)[:, None] * np.ones((1, w))
    img = np.stack([y, y * 0.8 + 20, np.full((h, w), 90.0)],
                   axis=2).astype(np.uint8)
    out = decode_jpeg(make_jpeg(img, quality=92, subsample=(2, 2)))
    assert out.shape == img.shape
    assert _psnr(img, out) > 30


def test_non_multiple_of_8_dimensions():
    img = _grad(13, 21)
    out = decode_jpeg(make_jpeg(img, quality=95))
    assert out.shape == (13, 21, 1)
    assert _psnr(img, out[:, :, 0]) > 30


def test_quality_monotone():
    img = _grad(24, 24)
    p = [_psnr(img, decode_jpeg(make_jpeg(img, quality=q))[:, :, 0])
         for q in (30, 70, 98)]
    assert p[0] < p[1] < p[2]


# ---------------------------------------------------------------------------
# Structure tier
# ---------------------------------------------------------------------------

def test_restart_markers_do_not_change_pixels():
    img = _grad(40, 40)
    plain = decode_jpeg(make_jpeg(img, quality=85))
    data = make_jpeg(img, quality=85, restart_interval=3)
    assert b"\xFF\xDD" in data          # DRI present
    assert b"\xFF\xD0" in data          # at least one RST0
    np.testing.assert_array_equal(decode_jpeg(data), plain)


def test_restart_markers_color_420():
    img = _grad(32, 48, 3)
    plain = decode_jpeg(make_jpeg(img, quality=85, subsample=(2, 2)))
    rst = decode_jpeg(make_jpeg(img, quality=85, subsample=(2, 2),
                                restart_interval=1))
    np.testing.assert_array_equal(rst, plain)


def test_16bit_dqt_accepted():
    """Rewrite the 8-bit DQT segment as 16-bit precision (Pq=1); the
    decoder must parse it and produce identical pixels."""
    img = _grad(16, 16)
    data = bytearray(make_jpeg(img, quality=80))
    i = data.find(b"\xFF\xDB")
    assert i >= 0
    body = bytes(data[i + 5:i + 69])          # 64 8-bit zigzag entries
    wide = b"".join(bytes([0, v]) for v in body)
    seg16 = (b"\xFF\xDB" + (2 + 1 + 128).to_bytes(2, "big")
             + bytes([0x10]) + wide)
    out = bytes(data[:i]) + seg16 + bytes(data[i + 69:])
    np.testing.assert_array_equal(decode_jpeg(out), decode_jpeg(bytes(data)))


def test_rejects_non_jpeg_and_truncation():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"PNG not jpeg")
    data = make_jpeg(_grad(16, 16), quality=80)
    with pytest.raises(ValueError):
        decode_jpeg(data[:len(data) // 2])


def test_rejects_progressive():
    data = bytearray(make_jpeg(_grad(16, 16)))
    i = data.find(b"\xFF\xC0")
    data[i + 1] = 0xC2                        # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(bytes(data))


def test_zigzag_is_a_permutation():
    assert sorted(ZZ.tolist()) == list(range(64))
    # spec spot checks (T.81 figure 5)
    assert ZZ[0] == 0 and ZZ[1] == 1 and ZZ[2] == 8 and ZZ[63] == 63
