"""GIF87a/89a codec (stdlib+numpy only) — the second entropy-coded image
format after baseline JPEG (jpegcodec.py), built from the public GIF
specification. LZW with variable-width codes IS the entropy coder here,
implemented from scratch; the format is lossless, so round trips are
bit-exact for any image with <= 256 distinct colors.

Decoder (``decode_gif``):
- header + logical screen descriptor, global color table;
- extension blocks (graphic control, comment, application) skipped via
  the sub-block chain; graphic-control transparency index honored as
  alpha only when present (output stays RGB here: first frame, no
  compositing — animation frames beyond the first are out of scope);
- image descriptor with local color table and INTERLACED row order
  (the 8/8-4/8-2/4-1/2 four-pass scheme);
- LZW: initial code width = min_code_size + 1, CLEAR resets the table,
  EOI ends the stream, width grows after code 2^w - 1 up to 12 bits,
  the KwKwK case (code == next slot) handled per the spec.

Encoder (``make_gif``): palettizes an (H, W, 3) uint8 image (error if
> 256 distinct colors), emits a global color table and a real LZW
compressor (dict up to 4096 entries, CLEAR on overflow, little-endian
bit packing, 255-byte sub-blocks), optional interlacing.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    order = []
    for start, step in _INTERLACE_PASSES:
        order.extend(range(start, h, step))
    return order


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------

class _LZWBitUnpacker:
    """GIF packs LZW codes little-endian within a byte stream."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def read(self, width: int) -> int:
        while self.n < width:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            self.acc |= self.data[self.pos] << self.n
            self.pos += 1
            self.n += 8
        v = self.acc & ((1 << width) - 1)
        self.acc >>= width
        self.n -= width
        return v


def lzw_decode(data: bytes, min_code_size: int) -> bytearray:
    """GIF-variant LZW: returns the decoded index stream."""
    clear = 1 << min_code_size
    eoi = clear + 1
    r = _LZWBitUnpacker(data)
    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        width = min_code_size + 1
        prev = None

    reset()
    while True:
        code = r.read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            return out
        if code < len(table) and (code < clear or table[code]):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError(f"invalid LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


def lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Real LZW compressor (dict growth to 4096, CLEAR on overflow)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------

def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def make_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """Encode (H, W, 3) uint8 (<= 256 distinct colors) as GIF89a."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("make_gif expects (H, W, 3) RGB")
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} distinct colors (max 256)")
    # color table size: power of two >= max(len(palette), 2)
    bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[:len(palette)] = palette
    indices = inverse.reshape(h, w).astype(np.uint8)
    if interlace:
        indices = indices[_interlace_order(h)]
    min_code_size = max(2, bits)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (bits - 1) << 4 | (bits - 1),
                       0, 0)
    out += table.tobytes()
    out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h,
                                 0x40 if interlace else 0)
    out.append(min_code_size)
    out += _sub_blocks(lzw_encode(indices.tobytes(), min_code_size))
    out += b"\x3B"                           # trailer
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> (H, W, 3) uint8 (first frame)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF: bad signature")
    w, h, flags, _bg, _ar = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 7)
        gct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:                    # trailer
            raise ValueError("GIF has no image data")
        if block == 0x21:                    # extension: skip sub-blocks
            pos += 1                         # label
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        left, top, iw, ih, iflags = struct.unpack("<HHHHB",
                                                  data[pos:pos + 9])
        pos += 9
        ct = gct
        if iflags & 0x80:                    # local color table
            n = 2 << (iflags & 7)
            ct = np.frombuffer(data, np.uint8, n * 3, pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code_size = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos]:
            ln = data[pos]
            lzw += data[pos + 1:pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(lzw_decode(bytes(lzw), min_code_size),
                            np.uint8)
        if idx.size != iw * ih:
            raise ValueError("GIF index stream size mismatch")
        rows = idx.reshape(ih, iw)
        if iflags & 0x40:                    # interlaced
            deinter = np.empty_like(rows)
            deinter[_interlace_order(ih)] = rows
            rows = deinter
        out = np.zeros((h, w), dtype=np.uint8)
        out[top:top + ih, left:left + iw] = rows
        return ct[out]
    raise ValueError("truncated GIF: no trailer")
