"""ISO-BMFF (MP4, ISO/IEC 14496-12) container parser + deterministic writer.

Real container metadata for the video frame-sampling lane: the parser
walks the box tree (ftyp/moov/trak/mdia/minf/stbl), decodes the sample
tables — stts (decode deltas), stsz (sizes), stsc (sample→chunk runs),
stco/co64 (chunk offsets), stss (sync samples), mdhd/mvhd (timescale,
duration, incl. version-1 64-bit forms), tkhd (16.16 fixed-point
width/height), hdlr (track kind) — and emits one row per sample:
(dts ticks, byte offset, byte size, sync flag). That is exactly the
metadata a 100 TB video-curation pipeline needs to sample frames WITHOUT
decoding: pick target timestamps, snap to the preceding sync sample, and
read only those byte ranges out of mdat.

Codec payloads (H.264/AAC bitstreams inside the samples) are NOT decoded
here — no codec library exists in this environment; samples are treated
as opaque byte ranges, which is all frame sampling/slicing requires. The
deterministic writer produces spec-conformant containers whose sample
bytes are a closed-form function of (media_id, sample_idx) so the whole
chain (write → box parse → sample table → byte slice) sits under the
DuckDB value oracle.

Everything here derives from the public ISO base-media file format
structure (the same box grammar mp4box/ffmpeg document); the reference
repo (sebastianarnold/TeXoo) has no video path — this module is part of
the net-new multimodal tier (SURVEY §2.7).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

_FULL = ("mvhd", "tkhd", "mdhd", "hdlr", "stts", "stsz", "stsc", "stco",
         "co64", "stss")
_CONTAINERS = {"moov", "trak", "mdia", "minf", "stbl", "edts", "dinf",
               "udta", "mvex", "moof", "traf"}


def iter_boxes(buf: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for each box in [start, end).

    Handles 32-bit sizes, size==1 (64-bit largesize) and size==0
    (box extends to end of the enclosing scope)."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack_from(">I", buf, pos)[0]
        btype = buf[pos + 4:pos + 8].decode("latin-1")
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError(f"truncated largesize box at {pos}")
            size = struct.unpack_from(">Q", buf, pos + 8)[0]
            body = pos + 16
        elif size == 0:
            size = end - pos
        if size < body - pos or pos + size > end:
            raise ValueError(f"box '{btype}' at {pos} overruns scope")
        yield btype, body, pos + size
        pos += size


@dataclass
class Track:
    track_id: int = 0
    handler: str = ""          # 'vide' / 'soun' / ...
    codec: str = ""            # first stsd entry fourcc
    width: float = 0.0         # tkhd 16.16 fixed
    height: float = 0.0
    timescale: int = 0         # mdhd
    duration: int = 0          # mdhd ticks
    # per-sample arrays (plain lists; callers numpy-ify as needed)
    sample_sizes: list = field(default_factory=list)
    sample_offsets: list = field(default_factory=list)
    sample_dts: list = field(default_factory=list)       # decode ticks
    sync_samples: list | None = None                     # 1-based or None

    def is_sync(self, idx0: int) -> bool:
        """Sync (keyframe) flag for 0-based sample idx; absent stss means
        every sample is sync (14496-12 §8.6.2)."""
        return self.sync_samples is None or (idx0 + 1) in self._sync_set

    @property
    def _sync_set(self):
        if not hasattr(self, "_sync_cache"):
            self._sync_cache = set(self.sync_samples or ())
        return self._sync_cache


@dataclass
class Movie:
    timescale: int = 0
    duration: int = 0
    tracks: list = field(default_factory=list)


def _fullbox(buf: bytes, body: int) -> tuple[int, int, int]:
    """(version, flags, payload_start) of a FullBox body."""
    version = buf[body]
    flags = int.from_bytes(buf[body + 1:body + 4], "big")
    return version, flags, body + 4


def _parse_mvhd(buf, body, movie: Movie):
    v, _, p = _fullbox(buf, body)
    if v == 1:
        movie.timescale = struct.unpack_from(">I", buf, p + 16)[0]
        movie.duration = struct.unpack_from(">Q", buf, p + 20)[0]
    else:
        movie.timescale = struct.unpack_from(">I", buf, p + 8)[0]
        movie.duration = struct.unpack_from(">I", buf, p + 12)[0]


def _parse_tkhd(buf, body, trk: Track):
    v, _, p = _fullbox(buf, body)
    trk.track_id = struct.unpack_from(">I", buf, p + (16 if v == 1 else 8))[0]
    # width/height are the LAST two u32s of the box (16.16 fixed), after
    # ids/duration (32 or 20 bytes by version) + 16 bytes
    # reserved/layer/group/volume + the 36-byte matrix
    tail = p + (84 if v == 1 else 72)
    w, h = struct.unpack_from(">II", buf, tail)
    trk.width, trk.height = w / 65536.0, h / 65536.0


def _parse_mdhd(buf, body, trk: Track):
    v, _, p = _fullbox(buf, body)
    if v == 1:
        trk.timescale = struct.unpack_from(">I", buf, p + 16)[0]
        trk.duration = struct.unpack_from(">Q", buf, p + 20)[0]
    else:
        trk.timescale = struct.unpack_from(">I", buf, p + 8)[0]
        trk.duration = struct.unpack_from(">I", buf, p + 12)[0]


def _parse_stts(buf, body) -> list[tuple[int, int]]:
    _, _, p = _fullbox(buf, body)
    n = struct.unpack_from(">I", buf, p)[0]
    return [struct.unpack_from(">II", buf, p + 4 + 8 * i) for i in range(n)]


def _parse_stsz(buf, body) -> tuple[int, list[int]]:
    _, _, p = _fullbox(buf, body)
    uniform, count = struct.unpack_from(">II", buf, p)
    if uniform:
        return count, [uniform] * count
    return count, list(struct.unpack_from(f">{count}I", buf, p + 8))


def _parse_stsc(buf, body) -> list[tuple[int, int, int]]:
    _, _, p = _fullbox(buf, body)
    n = struct.unpack_from(">I", buf, p)[0]
    return [struct.unpack_from(">III", buf, p + 4 + 12 * i) for i in range(n)]


def _parse_stco(buf, body, wide: bool) -> list[int]:
    _, _, p = _fullbox(buf, body)
    n = struct.unpack_from(">I", buf, p)[0]
    fmt = ">Q" if wide else ">I"
    step = 8 if wide else 4
    return [struct.unpack_from(fmt, buf, p + 4 + step * i)[0]
            for i in range(n)]


def _parse_stss(buf, body) -> list[int]:
    _, _, p = _fullbox(buf, body)
    n = struct.unpack_from(">I", buf, p)[0]
    return [struct.unpack_from(">I", buf, p + 4 + 4 * i)[0]
            for i in range(n)]


def _parse_stsd_codec(buf, body) -> str:
    _, _, p = _fullbox(buf, body)
    n = struct.unpack_from(">I", buf, p)[0]
    if n < 1:
        return ""
    return buf[p + 8:p + 12].decode("latin-1")


def _expand_sample_table(trk: Track, stts, stsc, chunk_offsets, sizes):
    """Resolve the four tables into flat per-sample (dts, offset) arrays
    (14496-12 §8.7.4 sample-to-chunk expansion)."""
    # decode timestamps from delta runs
    dts, t = [], 0
    for count, delta in stts:
        for _ in range(count):
            dts.append(t)
            t += delta
    trk.sample_dts = dts
    # chunk runs: stsc entry i covers chunks first_chunk_i .. first_{i+1}-1
    offsets = []
    n_chunks = len(chunk_offsets)
    sample = 0
    for i, (first, per_chunk, _desc) in enumerate(stsc):
        last = (stsc[i + 1][0] - 1) if i + 1 < len(stsc) else n_chunks
        for chunk in range(first, last + 1):
            pos = chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if sample >= len(sizes):
                    break
                offsets.append(pos)
                pos += sizes[sample]
                sample += 1
    trk.sample_offsets = offsets
    trk.sample_sizes = sizes


def parse_mp4(payload: bytes) -> Movie:
    """Parse an ISO-BMFF container into Movie/Track metadata + flat
    per-sample tables. Only moov subtree bytes are examined — mdat is
    never read (at scale: fetch the moov byte range only)."""
    movie = Movie()
    for btype, body, bend in iter_boxes(payload, 0, len(payload)):
        if btype != "moov":
            continue
        for mtype, mbody, mend in iter_boxes(payload, body, bend):
            if mtype == "mvhd":
                _parse_mvhd(payload, mbody, movie)
            elif mtype == "trak":
                movie.tracks.append(_parse_trak(payload, mbody, mend))
    return movie


def _parse_trak(buf, body, bend) -> Track:
    trk = Track()
    stts = stsc = sizes = chunk_offsets = None
    for ttype, tbody, tend in iter_boxes(buf, body, bend):
        if ttype == "tkhd":
            _parse_tkhd(buf, tbody, trk)
        elif ttype == "mdia":
            for mtype, mbody, mend in iter_boxes(buf, tbody, tend):
                if mtype == "mdhd":
                    _parse_mdhd(buf, mbody, trk)
                elif mtype == "hdlr":
                    _, _, p = _fullbox(buf, mbody)
                    trk.handler = buf[p + 4:p + 8].decode("latin-1")
                elif mtype == "minf":
                    for ntype, nbody, nend in iter_boxes(buf, mbody, mend):
                        if ntype != "stbl":
                            continue
                        for st, sbody, _send in iter_boxes(buf, nbody, nend):
                            if st == "stts":
                                stts = _parse_stts(buf, sbody)
                            elif st == "stsz":
                                _, sizes = _parse_stsz(buf, sbody)
                            elif st == "stsc":
                                stsc = _parse_stsc(buf, sbody)
                            elif st == "stco":
                                chunk_offsets = _parse_stco(buf, sbody, False)
                            elif st == "co64":
                                chunk_offsets = _parse_stco(buf, sbody, True)
                            elif st == "stss":
                                trk.sync_samples = _parse_stss(buf, sbody)
                            elif st == "stsd":
                                trk.codec = _parse_stsd_codec(buf, sbody)
    if stts and stsc and sizes is not None and chunk_offsets is not None:
        _expand_sample_table(trk, stts, stsc, chunk_offsets, sizes)
    return trk


# ---------------------------------------------------------------------------
# deterministic writer


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, version: int, body: bytes) -> bytes:
    return _box(btype, bytes([version, 0, 0, 0]) + body)


FTYP = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isom")
assert len(FTYP) == 20


def write_mp4(samples: list[bytes], deltas: list[int],
              sync_flags: list[bool], width: int, height: int,
              timescale: int = 1000, samples_per_chunk: int = 2,
              wide_offsets: bool = False, version1: bool = False,
              fourcc: bytes = b"rawv") -> bytes:
    """Minimal valid single-video-track MP4: ftyp + mdat + moov (trailing
    moov, the standard non-faststart layout — chunk offsets are known
    before the index is written). Chunks group `samples_per_chunk`
    consecutive samples; a short final chunk gets its own stsc run.
    `wide_offsets` emits co64; `version1` emits 64-bit mvhd/mdhd."""
    if not (len(samples) == len(deltas) == len(sync_flags)):
        raise ValueError("samples/deltas/sync_flags length mismatch")
    n = len(samples)
    mdat = _box(b"mdat", b"".join(samples))
    mdat_off = len(FTYP)

    # chunk layout
    chunk_offsets, stsc_runs = [], []
    pos = mdat_off + 8
    i = 0
    chunk_no = 0
    while i < n:
        take = min(samples_per_chunk, n - i)
        chunk_no += 1
        chunk_offsets.append(pos)
        if not stsc_runs or stsc_runs[-1][1] != take:
            stsc_runs.append((chunk_no, take))
        pos += sum(len(s) for s in samples[i:i + take])
        i += take

    duration = sum(deltas)
    # stts runs (RLE over consecutive equal deltas)
    stts_runs = []
    for d in deltas:
        if stts_runs and stts_runs[-1][1] == d:
            stts_runs[-1][0] += 1
        else:
            stts_runs.append([1, d])

    if version1:
        mvhd_tail = (struct.pack(">QQIQ", 0, 0, timescale, duration)
                     + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                     + b"\x00" * 10 + _UNITY_MATRIX + b"\x00" * 24
                     + struct.pack(">I", 2))
        mvhd = _full(b"mvhd", 1, mvhd_tail)
        mdhd = _full(b"mdhd", 1, struct.pack(">QQIQ", 0, 0, timescale,
                                             duration)
                     + struct.pack(">HH", 0x55C4, 0))
        tkhd = _full(b"tkhd", 1, struct.pack(">QQIIQ", 0, 0, 1, 0, duration)
                     + b"\x00" * 16 + _UNITY_MATRIX
                     + struct.pack(">II", width << 16, height << 16))
    else:
        mvhd_tail = (struct.pack(">IIII", 0, 0, timescale, duration)
                     + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                     + b"\x00" * 10 + _UNITY_MATRIX + b"\x00" * 24
                     + struct.pack(">I", 2))
        mvhd = _full(b"mvhd", 0, mvhd_tail)
        mdhd = _full(b"mdhd", 0, struct.pack(">IIII", 0, 0, timescale,
                                             duration)
                     + struct.pack(">HH", 0x55C4, 0))
        tkhd = _full(b"tkhd", 0, struct.pack(">IIIII", 0, 0, 1, 0, duration)
                     + b"\x00" * 16 + _UNITY_MATRIX
                     + struct.pack(">II", width << 16, height << 16))

    hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + b"vide"
                 + b"\x00" * 12 + b"video\x00")
    # sample entry: default fourcc 'rawv' (opaque synthetic payloads);
    # 'mjpa' marks Motion-JPEG samples that ARE real codec bitstreams
    entry = _box(fourcc, b"\x00" * 6 + struct.pack(">H", 1))
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + entry)
    stts = _full(b"stts", 0, struct.pack(">I", len(stts_runs))
                 + b"".join(struct.pack(">II", c, d) for c, d in stts_runs))
    stsc = _full(b"stsc", 0, struct.pack(">I", len(stsc_runs))
                 + b"".join(struct.pack(">III", first, per, 1)
                            for first, per in stsc_runs))
    sizes = [len(s) for s in samples]
    uniform = sizes[0] if n and all(s == sizes[0] for s in sizes) else 0
    stsz = _full(b"stsz", 0, struct.pack(">II", uniform, n)
                 + (b"" if uniform else
                    b"".join(struct.pack(">I", s) for s in sizes)))
    if wide_offsets:
        co = _full(b"co64", 0, struct.pack(">I", len(chunk_offsets))
                   + b"".join(struct.pack(">Q", o) for o in chunk_offsets))
    else:
        co = _full(b"stco", 0, struct.pack(">I", len(chunk_offsets))
                   + b"".join(struct.pack(">I", o) for o in chunk_offsets))
    stbl_children = [stsd, stts, stsc, stsz, co]
    syncs = [i + 1 for i, s in enumerate(sync_flags) if s]
    if len(syncs) != n:  # omit stss when every sample is sync (spec default)
        stbl_children.append(
            _full(b"stss", 0, struct.pack(">I", len(syncs))
                  + b"".join(struct.pack(">I", s) for s in syncs)))
    stbl = _box(b"stbl", b"".join(stbl_children))
    minf = _box(b"minf", stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return FTYP + mdat + moov


_UNITY_MATRIX = struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                            0x40000000)


# ---------------------------------------------------------------------------
# deterministic synthesis rule (shared by the Spark lane, its tests and the
# DuckDB oracle — every constant below is replicated in closed-form SQL)

MDAT_PAYLOAD_START = len(FTYP) + 8  # 28: ftyp + mdat header


def synth_rule(media_id: int) -> dict:
    """Closed-form sample-table spec for media_id: n samples, per-sample
    delta (ms at timescale 1000), sizes, sync flags, frame dimensions."""
    n = 5 + media_id % 4
    delta = 200 + (media_id % 3) * 100
    sizes = [24 + ((media_id + 5 * i) % 17) for i in range(n)]
    return {
        "n": n, "delta": delta, "sizes": sizes,
        "sync": [i % 3 == 0 for i in range(n)],
        "width": 320 + (media_id % 16) * 8,
        "height": 180 + (media_id % 9) * 8,
    }


def synth_sample_bytes(media_id: int, idx: int, size: int) -> bytes:
    """Sample payload: printable-ASCII closed form so the DuckDB oracle can
    rebuild and sha256 the exact bytes as VARCHAR."""
    return bytes(32 + (media_id * 31 + 7 * idx + j) % 95
                 for j in range(size))


def synth_mp4(media_id: int) -> bytes:
    """Deterministic spec-conformant MP4 for media_id (the hermetic
    stand-in for real fetched video bytes; every table value is a
    closed-form function of media_id). co64 and version-1 boxes rotate in
    on id residues so both code paths stay exercised under the oracle."""
    r = synth_rule(media_id)
    samples = [synth_sample_bytes(media_id, i, s)
               for i, s in enumerate(r["sizes"])]
    return write_mp4(samples, [r["delta"]] * r["n"], r["sync"],
                     r["width"], r["height"],
                     wide_offsets=(media_id % 5 == 0),
                     version1=(media_id % 7 == 0))


def synth_mjpeg_rule(media_id: int) -> dict:
    """Closed-form spec for a Motion-JPEG MP4: frame count / timing /
    sync pattern plus the flat-8x8-block grayscale pixel rule per frame.
    Block b of frame i holds constant value (16*b + 7*i + id%200) % 256 —
    at quality 100 the T.81 round trip is bit-exact, so decoded pixel
    stats are a pure closed form the DuckDB oracle can state."""
    n = 4 + media_id % 3
    w = 16 * (1 + media_id % 2)
    h = 16
    return {
        "n": n, "delta": 250 + (media_id % 2) * 250,
        "sync": [i % 2 == 0 for i in range(n)],
        "width": w, "height": h,
        "blocks": (h // 8) * (w // 8),
        "base": media_id % 200,
    }


def frame_block_values(media_id: int, idx: int) -> "list[int]":
    """The flat-block grayscale values of MJPEG frame ``idx`` in
    row-major block order (shared by the encoder, tests and oracle)."""
    r = synth_mjpeg_rule(media_id)
    return [(16 * b + 7 * idx + r["base"]) % 256
            for b in range(r["blocks"])]


def synth_mjpeg_mp4(media_id: int) -> bytes:
    """Deterministic MP4 whose samples are REAL baseline-JPEG bitstreams
    (jpegcodec.make_flat_block_jpeg) — the in-container codec loop the
    'mp4:decoded' lane closes: container parse -> sync-frame sampling ->
    byte slice -> T.81 entropy decode -> pixel stats, all hermetic."""
    import numpy as np

    from texoo_spark.jpegcodec import make_flat_block_jpeg
    r = synth_mjpeg_rule(media_id)
    bw = r["width"] // 8
    samples = [make_flat_block_jpeg(
        np.array(frame_block_values(media_id, i), np.uint8)
        .reshape(r["height"] // 8, bw))
        for i in range(r["n"])]
    return write_mp4(samples, [r["delta"]] * r["n"], r["sync"],
                     r["width"], r["height"],
                     wide_offsets=(media_id % 5 == 0),
                     version1=(media_id % 7 == 0), fourcc=b"mjpa")
