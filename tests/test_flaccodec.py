"""FLAC codec tests: lossless encode/decode round trips, STREAMINFO MD5
verification, CRC checks, and hand-crafted streams for the decoder-only
paths the encoder never emits (LPC subframes, stereo decorrelation,
wasted bits, escaped + multi-partition residuals, 5-bit rice)."""

import hashlib
import struct

import numpy as np
import pytest

from texoo_spark import flaccodec as fc


def _round_trip(pcm, rate=8000, blocksize=4096):
    enc = fc.encode_flac(pcm, rate, blocksize=blocksize)
    dec, got_rate = fc.decode_flac(enc)
    ref = pcm if pcm.ndim == 2 else pcm[:, None]
    assert got_rate == rate
    assert dec.shape == ref.shape
    assert (dec == ref).all()
    return enc


def test_round_trip_shapes_and_signals():
    rng = np.random.default_rng(7)
    _round_trip(np.zeros(1000, dtype=np.int16))
    _round_trip(np.full(5000, -123, dtype=np.int16))
    _round_trip((np.arange(9000) % 4001 - 2000).astype(np.int16))
    _round_trip(rng.integers(-32768, 32768, 7333).astype(np.int16))
    _round_trip((10_000 * np.sin(np.arange(12_000) * 0.01))
                .astype(np.int16))
    _round_trip(np.array([5], dtype=np.int16))
    _round_trip(np.stack([
        (1000 * np.sin(np.arange(5000) * 0.02)).astype(np.int16),
        rng.integers(-500, 500, 5000).astype(np.int16)], axis=1))


def test_compression_beats_raw_on_smooth_signals():
    pcm = (10_000 * np.sin(np.arange(20_000) * 0.01)).astype(np.int16)
    enc = _round_trip(pcm)
    assert len(enc) < 0.3 * pcm.size * 2


def test_md5_and_crc_detect_corruption():
    pcm = (np.arange(4000) % 997 - 498).astype(np.int16)
    enc = bytearray(fc.encode_flac(pcm))
    # flip one bit inside frame data (past the 4+4+34+16 byte prefix)
    enc[70] ^= 0x40
    with pytest.raises(ValueError):
        fc.decode_flac(bytes(enc))


def test_bad_magic_rejected():
    with pytest.raises(ValueError):
        fc.decode_flac(b"fLaX" + b"\x00" * 50)


# -- hand-crafted frames for decoder-only feature coverage -------------


def _stream(channels, bps, total, frame_bits):
    """Wrap hand-written frame payload bits into a minimal stream."""
    si = fc._BitWriter()
    si.write(4096, 16), si.write(4096, 16)
    si.write(0, 24), si.write(0, 24)
    si.write(8000, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(total, 36)
    streaminfo = si.bytes() + b"\x00" * 16          # md5 zero: skip check
    out = bytearray(b"fLaC")
    out += bytes([0x80]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    out += frame_bits
    return bytes(out)


def _frame_header(w, chan_code, blocksize_code=6, blocksize_minus1=None,
                  variable=False, number=0):
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(1 if variable else 0, 1)
    w.write(blocksize_code, 4)
    w.write(0, 4)
    w.write(chan_code, 4)
    w.write(fc._SAMPLE_SIZE_CODES[16], 3)
    w.write(0, 1)
    fc._write_coded_number(w, number)
    if blocksize_code == 6:
        w.write(blocksize_minus1, 8)
    elif blocksize_code == 7:
        w.write(blocksize_minus1, 16)
    w.align()


def _finish_frame(hdr_writer, body_writer):
    hdr = hdr_writer.bytes()
    body_writer.align()
    framed = hdr + bytes([fc._crc8(hdr)]) + body_writer.bytes()
    return framed + struct.pack(">H", fc._crc16(framed))


def _verbatim(w, samples, bps):
    w.write(0, 1), w.write(1, 6), w.write(0, 1)
    for s in samples:
        w.write(int(s), bps)


def test_decode_lpc_subframe():
    """LPC order 2, coefs [3,-1] shift 1: s[i] = r + ((3*s[i-1] -
    s[i-2]) >> 1), residuals rice-coded with the 5-bit method."""
    n = 16
    resid = [1, -2, 3, 0, -1, 2, -3, 1, 0, 2, -2, 1, 4, -4]
    s = [10, 12]
    for r in resid:
        s.append(r + ((3 * s[-1] - s[-2]) >> 1))
    h = fc._BitWriter()
    _frame_header(h, chan_code=0, blocksize_minus1=n - 1)
    b = fc._BitWriter()
    b.write(0, 1)
    b.write(32 + (2 - 1), 6)                        # LPC order 2
    b.write(0, 1)
    b.write(10, 16), b.write(12, 16)                # warmup
    b.write(4 - 1, 4)                               # precision 4
    b.write(1, 5)                                   # shift +1
    b.write(3, 4), b.write(-1 & 0xF, 4)             # coefs
    b.write(1, 2)                                   # 5-bit rice method
    b.write(0, 4)                                   # partition order 0
    b.write(1, 5)                                   # rice param 1
    for r in resid:
        zig = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
        b.write_unary(zig >> 1)
        b.write(zig & 1, 1)
    payload = _stream(1, 16, n, _finish_frame(h, b))
    dec, _ = fc.decode_flac(payload)
    assert dec[:, 0].tolist() == s


def _stereo_case(chan_code, sub_a, sub_b, expect_lr):
    n = len(expect_lr)
    h = fc._BitWriter()
    _frame_header(h, chan_code=chan_code, blocksize_minus1=n - 1)
    b = fc._BitWriter()
    bps_a = 16 + (1 if chan_code == 9 else 0)
    bps_b = 16 + (1 if chan_code in (8, 10) else 0)
    _verbatim(b, sub_a, bps_a)
    _verbatim(b, sub_b, bps_b)
    payload = _stream(2, 16, n, _finish_frame(h, b))
    dec, _ = fc.decode_flac(payload)
    assert dec.tolist() == expect_lr


def test_decode_stereo_decorrelation_modes():
    left = [100, -50, 3, 32767]
    right = [90, -60, 7, -32768]
    side = [l - r for l, r in zip(left, right)]
    mid = [(l + r) >> 1 for l, r in zip(left, right)]
    lr = [[l, r] for l, r in zip(left, right)]
    _stereo_case(8, left, side, lr)                  # left/side
    _stereo_case(9, side, right, lr)                 # right/side
    _stereo_case(10, mid, side, lr)                  # mid/side
    # independent 2-channel for completeness
    _stereo_case(1, left, right, lr)


def test_decode_wasted_bits_and_escape_partition():
    """A constant subframe with 3 wasted bits and a verbatim-ish fixed
    subframe whose residual partition escapes to 6-bit raw."""
    n = 8
    h = fc._BitWriter()
    _frame_header(h, chan_code=1, blocksize_minus1=n - 1)
    b = fc._BitWriter()
    # ch0: CONSTANT with wasted=3 -> value written at 13 bits, <<3 out
    b.write(0, 1), b.write(0, 6), b.write(1, 1)
    b.write_unary(2)                                 # wasted-1 = 2
    b.write(-5 & 0x1FFF, 13)
    # ch1: FIXED order 0, escaped partition, 6-bit raw residuals
    vals = [1, -2, 5, -6, 31, -32, 0, 7]
    b.write(0, 1), b.write(8, 6), b.write(0, 1)
    b.write(0, 2)                                    # 4-bit rice method
    b.write(0, 4)                                    # po 0
    b.write(0xF, 4)                                  # escape
    b.write(6, 5)                                    # 6-bit raw
    for v in vals:
        b.write(v & 0x3F, 6)
    payload = _stream(2, 16, n, _finish_frame(h, b))
    dec, _ = fc.decode_flac(payload)
    assert dec[:, 0].tolist() == [-5 << 3] * n
    assert dec[:, 1].tolist() == vals


def test_decode_multi_partition_residual_and_variable_blocking():
    """Partition order 2 (4 partitions, different rice params) under the
    variable blocking strategy with a large coded sample number."""
    n = 16
    vals = list(range(-8, 8))
    h = fc._BitWriter()
    _frame_header(h, chan_code=0, blocksize_minus1=n - 1, variable=True,
                  number=1_000_000)
    b = fc._BitWriter()
    b.write(0, 1), b.write(8, 6), b.write(0, 1)      # FIXED order 0
    b.write(0, 2)
    b.write(2, 4)                                    # po=2 -> 4 partitions
    for p in range(4):
        param = p % 3
        b.write(param, 4)
        for v in vals[p * 4:(p + 1) * 4]:
            zig = (v << 1) if v >= 0 else ((-v) << 1) - 1
            b.write_unary(zig >> param)
            if param:
                b.write(zig & ((1 << param) - 1), param)
    payload = _stream(1, 16, n, _finish_frame(h, b))
    dec, _ = fc.decode_flac(payload)
    assert dec[:, 0].tolist() == vals


# -- property suite (derandomized) -------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None, derandomize=True)
@given(st.lists(st.integers(min_value=-32768, max_value=32767),
                min_size=1, max_size=3000),
       st.sampled_from([256, 1024, 4096]),
       st.integers(min_value=1, max_value=2))
def test_property_lossless(samples, blocksize, channels):
    pcm = np.array(samples, dtype=np.int16)
    if channels == 2:
        pcm = np.stack([pcm, pcm[::-1]], axis=1)
    enc = fc.encode_flac(pcm, 44100, blocksize=blocksize)
    dec, rate = fc.decode_flac(enc)
    ref = pcm if pcm.ndim == 2 else pcm[:, None]
    assert rate == 44100 and (dec == ref).all()
    assert hashlib.md5(ref.astype("<i2").tobytes()).digest() == enc[26:42]
