"""Adversarial-input robustness for the round-3 codecs: truncations,
bit flips and random bytes must raise clean exceptions (ValueError /
NotImplementedError / struct.error-free), never hang or corrupt state —
at 100 TB one bad fetched file must fail its row, not the executor."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from texoo_spark import flaccodec as fc
from texoo_spark import mp4box as m

_OK_ERRORS = (ValueError, NotImplementedError, IndexError, KeyError,
              struct.error, EOFError, OverflowError)


def _flac_sample():
    pcm = (np.arange(600) % 251 - 125).astype(np.int16)
    return fc.encode_flac(pcm, 8000, blocksize=256)


def _mp4_sample():
    return m.synth_mp4(3)


@pytest.mark.parametrize("make", [_flac_sample, _mp4_sample],
                         ids=["flac", "mp4"])
def test_truncations_fail_cleanly(make):
    """Every prefix of a valid payload either raises a member of the
    clean-error set or (for mp4) parses a shorter-but-valid table."""
    payload = make()
    decode = (fc.decode_flac if payload[:4] == b"fLaC"
              else m.parse_mp4)
    for cut in list(range(0, 64)) + list(
            range(64, len(payload), max(1, len(payload) // 97))):
        try:
            decode(payload[:cut])
        except _OK_ERRORS:
            pass


@pytest.mark.parametrize("make", [_flac_sample, _mp4_sample],
                         ids=["flac", "mp4"])
def test_single_bit_flips_fail_cleanly_or_decode(make):
    """Flipping any single bit in the first 200 bytes either still
    decodes (the flip hit unchecked padding) or raises cleanly. FLAC's
    CRC-8/CRC-16/MD5 must catch flips inside frame data."""
    payload = bytearray(make())
    decode = (fc.decode_flac if payload[:4] == b"fLaC"
              else m.parse_mp4)
    for byte in range(0, min(len(payload), 200), 7):
        for bit in (0, 4, 7):
            mut = bytearray(payload)
            mut[byte] ^= 1 << bit
            try:
                decode(bytes(mut))
            except _OK_ERRORS:
                pass


@settings(max_examples=150, deadline=None, derandomize=True)
@given(st.binary(min_size=0, max_size=300))
def test_random_bytes_never_crash_flac(data):
    try:
        fc.decode_flac(data)
    except _OK_ERRORS:
        pass


@settings(max_examples=150, deadline=None, derandomize=True)
@given(st.binary(min_size=0, max_size=300))
def test_random_bytes_never_crash_mp4(data):
    try:
        m.parse_mp4(data)
    except _OK_ERRORS:
        pass


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.binary(min_size=1, max_size=120))
def test_random_tail_after_valid_flac_header(data):
    """A valid fLaC magic + garbage body must not hang or escape the
    clean-error set (exercises the metadata-block and frame-sync
    walkers against arbitrary lengths/types)."""
    try:
        fc.decode_flac(b"fLaC" + data)
    except _OK_ERRORS:
        pass


@settings(max_examples=100, deadline=None, derandomize=True)
@given(st.binary(min_size=1, max_size=120))
def test_random_moov_body_never_crashes(data):
    buf = (struct.pack(">I", 8 + 8 + len(data)) + b"moov"
           + struct.pack(">I", 8 + len(data)) + b"trak" + data)
    try:
        m.parse_mp4(buf)
    except _OK_ERRORS:
        pass


def _jpeg_frame():
    """A real baseline-JPEG frame exactly as the mp4:decoded lane slices
    it out of a Motion-JPEG container."""
    buf = m.synth_mjpeg_mp4(91)
    trk = m.parse_mp4(buf).tracks[0]
    off, sz = trk.sample_offsets[0], trk.sample_sizes[0]
    return buf[off:off + sz]


def test_jpeg_truncations_fail_cleanly():
    from texoo_spark.jpegcodec import decode_jpeg
    payload = _jpeg_frame()
    for cut in list(range(0, 64)) + list(
            range(64, len(payload), max(1, len(payload) // 97))):
        try:
            decode_jpeg(payload[:cut])
        except _OK_ERRORS:
            pass


def test_jpeg_bit_flips_fail_cleanly_or_decode():
    from texoo_spark.jpegcodec import decode_jpeg
    payload = bytearray(_jpeg_frame())
    for byte in range(0, min(len(payload), 200), 7):
        for bit in (0, 4, 7):
            mut = bytearray(payload)
            mut[byte] ^= 1 << bit
            try:
                decode_jpeg(bytes(mut))
            except _OK_ERRORS:
                pass


@settings(max_examples=150, deadline=None, derandomize=True)
@given(st.binary(min_size=0, max_size=300))
def test_random_bytes_never_crash_jpeg(data):
    from texoo_spark.jpegcodec import decode_jpeg
    try:
        decode_jpeg(data)
    except _OK_ERRORS:
        pass
