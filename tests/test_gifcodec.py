"""GIF LZW codec (texoo_spark.gifcodec): lossless round trips including
code-width growth, dictionary overflow + CLEAR, interlacing, and the
KwKwK decode case."""

import numpy as np
import pytest

from texoo_spark.gifcodec import (decode_gif, lzw_decode, lzw_encode,
                                  make_gif)


def _paletted(h, w, ncolors, seed=0):
    rng = np.random.RandomState(seed)
    palette = rng.randint(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.randint(0, ncolors, size=(h, w))
    return palette[idx]


def test_lzw_roundtrip_simple():
    data = bytes([0, 1, 2, 1, 0, 2, 2, 2, 1, 0] * 7)
    assert bytes(lzw_decode(lzw_encode(data, 2), 2)) == data


def test_lzw_kwkwk_case():
    # aaa...a triggers code == next-slot immediately
    data = b"\x00" * 50
    assert bytes(lzw_decode(lzw_encode(data, 2), 2)) == data


@pytest.mark.parametrize("n", [300, 5000, 60000])
def test_lzw_roundtrip_through_width_growth(n):
    """Streams long enough to push the dictionary through every code
    width (9..12 bits for min_code_size 8) and past 4096 (CLEAR)."""
    rng = np.random.RandomState(n)
    data = rng.randint(0, 256, size=n, dtype=np.uint8).tobytes()
    assert bytes(lzw_decode(lzw_encode(data, 8), 8)) == data


def test_gif_roundtrip_exact():
    img = _paletted(23, 31, 17)
    out = decode_gif(make_gif(img))
    np.testing.assert_array_equal(out, img)


def test_gif_roundtrip_256_colors():
    img = _paletted(64, 64, 256, seed=3)
    np.testing.assert_array_equal(decode_gif(make_gif(img)), img)


def test_gif_two_color_small_code_size():
    img = np.zeros((9, 13, 3), np.uint8)
    img[::2, ::3] = (255, 10, 0)
    np.testing.assert_array_equal(decode_gif(make_gif(img)), img)


def test_gif_interlaced_roundtrip():
    img = _paletted(37, 16, 29, seed=5)
    data = make_gif(img, interlace=True)
    np.testing.assert_array_equal(decode_gif(data), img)
    # and interlacing actually changed the stored stream
    assert data != make_gif(img, interlace=False)


def test_gif_skips_extension_blocks():
    img = _paletted(8, 8, 4, seed=7)
    data = bytearray(make_gif(img))
    # splice a graphic-control extension right before the image descriptor
    i = data.index(0x2C, 13)
    gce = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    data = bytes(data[:i]) + gce + bytes(data[i:])
    np.testing.assert_array_equal(decode_gif(data), img)


def test_gif_rejects_bad_inputs():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"JFIF nope")
    img = _paletted(8, 8, 4)
    data = make_gif(img)
    with pytest.raises(ValueError):
        decode_gif(data[:20])
    i = np.arange(32 * 32)
    many = np.stack([i % 256, (i // 256) % 256, np.zeros_like(i)],
                    axis=1).astype(np.uint8).reshape(32, 32, 3)
    assert len(np.unique(many.reshape(-1, 3), axis=0)) > 256
    with pytest.raises(ValueError, match="distinct colors"):
        make_gif(many)


def test_multimodal_dispatch_gif():
    from texoo_spark.multimodal import decode_image
    img = _paletted(12, 12, 9, seed=9)
    np.testing.assert_array_equal(decode_image(make_gif(img)), img)
