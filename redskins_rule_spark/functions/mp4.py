"""Pure-Python ISO BMFF (MP4) container codec — closes the "video
container" half of the MP4 seam (`operators/multimodal.py` previously
raised NotImplementedError for any non-GIF video payload).

Scope — container level, per the public ISO/IEC 14496-12 box grammar:

  * `encode_mp4(tracks)` — writes ftyp / mdat / moov with one trak per
    track: tkhd, mdhd, hdlr, minf (vmhd|smhd + dinf/dref/url) and a
    full sample table (stsd, stts, stsc, stsz, stco). One chunk per
    track; mdat precedes moov so chunk offsets are independent of
    moov's size (every box size is a closed-form function of sample
    counts/sizes — which is what makes the oracle SQL exact).
  * `parse_mp4(payload)` — strict box-walk parser: top-level and
    container boxes are traversed with bounds checks; any truncation
    or malformed size surfaces as ValueError (the shared corrupt-
    payload contract of the wav/gif/png/jpeg codecs, so
    `decode_stats_tolerant`-style quarantining composes unchanged).
  * `sample_locations(track)` — resolves stsc run-length chunk map +
    stsz + stco into absolute (offset, size) per sample.
  * `extract_samples(payload, track, stride)` — REAL frame/sample
    extraction from mdat by sample-table offsets. This is the part of
    "video frame sampling" a container can do without a codec library;
    DECODING the extracted access units (H.264/AAC/...) still needs
    ffmpeg-class code and remains the documented seam.

The sample entries inside stsd are minimal 16-byte SampleEntry boxes
(format fourcc + data_reference_index) rather than full
Visual/AudioSampleEntry records — sufficient for the box grammar and
kept fixed-size so container byte length stays arithmetic-predictable.

Reference behavior target: chaseeanderson/redskins-rule has no media
path at all; this module extends the engine's multimodal family
(SURVEY §2 extension rows) the same way gif.py/jpeg.py do.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_HANDLERS = {"vide", "soun"}
_HDLR_NAME = b"redskins\x00"  # fixed-length so hdlr size is constant


# ---------------------------------------------------------------------------
# data model
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Mp4TrackSpec:
    """Encoder input: one media track, one chunk, constant sample delta."""

    handler: str  # 'vide' | 'soun'
    sample_delta: int  # ticks per sample (track timescale units)
    samples: tuple[bytes, ...]
    timescale: int = 1000
    width: int = 320  # vide only
    height: int = 240
    # raw AVCDecoderConfigurationRecord: when set (vide only), stsd
    # carries a REAL avc1 VisualSampleEntry + avcC box — the
    # out-of-band parameter-set layout real MP4s use — and the
    # samples are expected to be AVCC length-prefixed NAL units
    avcc: bytes | None = None
    # raw esds BOX BODY (fullbox header + descriptor chain): when set
    # (soun only), stsd carries a REAL mp4a AudioSampleEntry + esds —
    # how MP4 declares the AAC decoder config (no ADTS in-container)
    esds: bytes | None = None

    @property
    def duration(self) -> int:
        return self.sample_delta * len(self.samples)


@dataclass(frozen=True)
class Mp4Track:
    """Parser output for one trak."""

    track_id: int
    handler: str
    timescale: int
    duration: int
    sample_sizes: tuple[int, ...]
    # stts entries as (sample_count, sample_delta) runs
    time_to_sample: tuple[tuple[int, int], ...]
    # stsc entries as (first_chunk, samples_per_chunk) runs (desc idx dropped)
    sample_to_chunk: tuple[tuple[int, int], ...]
    chunk_offsets: tuple[int, ...]
    avcc: bytes | None = None  # raw avcC record when stsd carries avc1
    esds: bytes | None = None  # raw esds box body when stsd carries mp4a

    @property
    def n_samples(self) -> int:
        return len(self.sample_sizes)


@dataclass(frozen=True)
class Mp4Meta:
    major_brand: str
    timescale: int
    duration: int
    mdat_bytes: int
    tracks: tuple[Mp4Track, ...]

    @property
    def duration_ms(self) -> int:
        return self.duration * 1000 // self.timescale


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _full(fourcc: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, struct.pack(">I", (version << 24) | flags) + body)


_UNITY_MATRIX = struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)


def _mvhd(timescale: int, duration: int, next_track_id: int) -> bytes:
    body = struct.pack(">IIII", 0, 0, timescale, duration)
    body += struct.pack(">iHH", 0x10000, 0x0100, 0)  # rate, volume, reserved
    body += b"\x00" * 8 + _UNITY_MATRIX + b"\x00" * 24
    body += struct.pack(">I", next_track_id)
    return _full(b"mvhd", 0, 0, body)


def _tkhd(track_id: int, duration: int, spec: Mp4TrackSpec) -> bytes:
    vol = 0x0100 if spec.handler == "soun" else 0
    w = spec.width << 16 if spec.handler == "vide" else 0
    h = spec.height << 16 if spec.handler == "vide" else 0
    body = struct.pack(">IIIII", 0, 0, track_id, 0, duration)
    body += b"\x00" * 8 + struct.pack(">HHHH", 0, 0, vol, 0)
    body += _UNITY_MATRIX + struct.pack(">II", w, h)
    return _full(b"tkhd", 0, 7, body)  # flags: enabled|in_movie|in_preview


def _stbl(spec: Mp4TrackSpec, chunk_offset: int) -> bytes:
    if spec.avcc is not None and spec.handler == "vide":
        # REAL avc1 VisualSampleEntry (ISO 14496-15 §5.3.4): the full
        # 70-byte visual record + the avcC configuration box — the
        # out-of-band parameter-set layout actual encoders write
        avcc_box = _box(b"avcC", spec.avcc)
        visual = (
            b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dref
            + struct.pack(">HH", 0, 0) + b"\x00" * 12   # pre_defined/reserved
            + struct.pack(">HH", spec.width, spec.height)
            + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + struct.pack(">I", 0)                        # reserved
            + struct.pack(">H", 1)                        # frame_count
            + b"\x00" * 32                               # compressorname
            + struct.pack(">Hh", 0x0018, -1)              # depth, pre_defined
        )
        entry = _box(b"avc1", visual + avcc_box)
    elif spec.esds is not None and spec.handler == "soun":
        # REAL mp4a AudioSampleEntry (ISO 14496-14 §5.6): the 20-byte
        # audio record + the esds configuration box
        esds_box = _full(b"esds", 0, 0, spec.esds[4:])
        audio = (
            b"\x00" * 6 + struct.pack(">H", 1)        # reserved + dref
            + struct.pack(">HHI", 0, 0, 0)             # version/rev/vendor
            + struct.pack(">HHHH", 2, 16, 0, 0)        # ch/bits/compid/pkt
            + struct.pack(">I", 44100 << 16)           # samplerate 16.16
        )
        entry = _box(b"mp4a", audio + esds_box)
    else:
        fmt = b"mp4v" if spec.handler == "vide" else b"mp4a"
        entry = struct.pack(">I4s", 16, fmt) + b"\x00" * 6 + struct.pack(">H", 1)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + entry)
    n = len(spec.samples)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, spec.sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(
        b"stsz",
        0,
        0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in spec.samples),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    return _box(b"stbl", stsd + stts + stsc + stsz + stco)


def _trak(track_id: int, spec: Mp4TrackSpec, chunk_offset: int) -> bytes:
    mdhd = _full(
        b"mdhd",
        0,
        0,
        struct.pack(">IIIIHH", 0, 0, spec.timescale, spec.duration, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr",
        0,
        0,
        struct.pack(">I4s", 0, spec.handler.encode()) + b"\x00" * 12 + _HDLR_NAME,
    )
    if spec.handler == "vide":
        mhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    else:
        mhd = _full(b"smhd", 0, 0, struct.pack(">HH", 0, 0))
    url = _full(b"url ", 0, 1, b"")  # flags=1: media is self-contained
    dinf = _box(b"dinf", _full(b"dref", 0, 0, struct.pack(">I", 1) + url))
    minf = _box(b"minf", mhd + dinf + _stbl(spec, chunk_offset))
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    return _box(b"trak", _tkhd(track_id, spec.duration, spec) + mdia)


def encode_mp4(tracks: list[Mp4TrackSpec], movie_timescale: int = 1000) -> bytes:
    """ftyp + mdat (all samples, one chunk per track, track order) +
    moov. Chunk offsets are absolute file offsets into mdat, computed
    before moov is written — the standard progressive-download layout
    inverted (moov last) so sizes never feed back into offsets."""
    if not tracks:
        raise ValueError("mp4: at least one track required")
    for t in tracks:
        if t.handler not in _HANDLERS:
            raise ValueError(f"mp4: unsupported handler {t.handler!r}")
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomiso2")
    assert len(ftyp) == 24
    payload = b"".join(b"".join(t.samples) for t in tracks)
    mdat = _box(b"mdat", payload)
    # per-track chunk offsets: ftyp + mdat header, then prior tracks' bytes
    offs, pos = [], len(ftyp) + 8
    for t in tracks:
        offs.append(pos)
        pos += sum(len(s) for s in t.samples)
    duration = max(
        t.duration * movie_timescale // t.timescale for t in tracks
    )
    traks = b"".join(
        _trak(i + 1, t, offs[i]) for i, t in enumerate(tracks)
    )
    moov = _box(
        b"moov", _mvhd(movie_timescale, duration, len(tracks) + 1) + traks
    )
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# parser (strict: every malformation is ValueError)
# ---------------------------------------------------------------------------


def _need(data: bytes, start: int, n: int, what: str) -> bytes:
    if start + n > len(data):
        raise ValueError(f"mp4: truncated {what} at offset {start}")
    return data[start : start + n]


def _walk(data: bytes, start: int, end: int):
    """Yield (fourcc, body_start, body_end) for each box in [start, end).

    Handles 32-bit sizes, largesize (size==1 → 64-bit) and size==0
    (box extends to `end`), and rejects any size that fails to advance
    or overruns the range — a corrupted size field can neither loop
    nor escape the parent box.
    """
    off = start
    while off < end:
        size, fourcc = struct.unpack(">I4s", _need(data, off, 8, "box header"))
        body = off + 8
        if size == 1:
            (size,) = struct.unpack(">Q", _need(data, body, 8, "largesize"))
            body += 8
            if size < 16:
                raise ValueError(f"mp4: invalid largesize {size} at {off}")
        elif size == 0:
            size = end - off
        elif size < 8:
            raise ValueError(f"mp4: invalid box size {size} at offset {off}")
        if off + size > end:
            raise ValueError(
                f"mp4: box {fourcc!r} at {off} overruns parent ({off + size} > {end})"
            )
        yield fourcc, body, off + size
        off += size


def _fullbox(data: bytes, start: int, what: str) -> tuple[int, int, int]:
    (vf,) = struct.unpack(">I", _need(data, start, 4, what))
    return vf >> 24, vf & 0xFFFFFF, start + 4


def _parse_trak(data: bytes, start: int, end: int) -> Mp4Track:
    track_id = duration = timescale = None
    handler = None
    avcc: bytes | None = None
    esds: bytes | None = None
    sizes: tuple[int, ...] = ()
    stts: tuple[tuple[int, int], ...] = ()
    stsc: tuple[tuple[int, int], ...] = ()
    stco: tuple[int, ...] = ()

    def visit(s: int, e: int) -> None:
        nonlocal track_id, duration, timescale, handler, sizes, stts, \
            stsc, stco, avcc, esds
        for cc, b, be in _walk(data, s, e):
            if cc in (b"mdia", b"minf", b"stbl"):
                visit(b, be)
            elif cc == b"stsd":
                _, _, p = _fullbox(data, b, "stsd")
                (n_entries,) = struct.unpack(">I", _need(data, p, 4, "stsd"))
                if n_entries < 1:
                    raise ValueError("mp4: stsd with no sample entries")
                # first entry: size + fourcc, then format-specific body
                esize, efmt = struct.unpack(
                    ">I4s", _need(data, p + 4, 8, "stsd entry")
                )
                if esize < 16 or p + 4 + esize > be:
                    raise ValueError("mp4: stsd entry overruns box")
                if efmt == b"mp4a" and esize > 36:
                    # 8-byte reserved/dref + 20-byte audio record,
                    # then the config boxes — walk for esds
                    q = p + 12 + 8 + 20
                    eend = p + 4 + esize
                    for cc2, b2, be2 in _walk(data, q, eend):
                        if cc2 == b"esds":
                            v2, fl2, p2 = _fullbox(data, b2, "esds")
                            # re-prefix the fullbox header so the raw
                            # body round-trips through parse_esds
                            esds = struct.pack(
                                ">I", (v2 << 24) | fl2
                            ) + data[p2:be2]
                if efmt == b"avc1":
                    # skip the 70-byte VisualSampleEntry record (after
                    # the 8-byte reserved/dref prefix), then walk the
                    # config boxes for avcC
                    q = p + 12 + 8 + 70
                    eend = p + 4 + esize
                    for cc2, b2, be2 in _walk(data, q, eend):
                        if cc2 == b"avcC":
                            avcc = data[b2:be2]
                    if avcc is None:
                        raise ValueError("mp4: avc1 entry without avcC")
            elif cc == b"tkhd":
                v, _, p = _fullbox(data, b, "tkhd")
                if v != 0:
                    raise ValueError(f"mp4: unsupported tkhd version {v}")
                _, _, track_id = struct.unpack(">III", _need(data, p, 12, "tkhd"))
            elif cc == b"mdhd":
                v, _, p = _fullbox(data, b, "mdhd")
                if v != 0:
                    raise ValueError(f"mp4: unsupported mdhd version {v}")
                _, _, timescale, duration = struct.unpack(
                    ">IIII", _need(data, p, 16, "mdhd")
                )
            elif cc == b"hdlr":
                _, _, p = _fullbox(data, b, "hdlr")
                _, h = struct.unpack(">I4s", _need(data, p, 8, "hdlr"))
                handler = h.decode("ascii", "replace")
            elif cc == b"stsz":
                _, _, p = _fullbox(data, b, "stsz")
                fixed, n = struct.unpack(">II", _need(data, p, 8, "stsz"))
                if fixed:
                    sizes = (fixed,) * n
                else:
                    raw = _need(data, p + 8, 4 * n, "stsz entries")
                    sizes = struct.unpack(f">{n}I", raw)
            elif cc == b"stts":
                _, _, p = _fullbox(data, b, "stts")
                (n,) = struct.unpack(">I", _need(data, p, 4, "stts"))
                raw = _need(data, p + 4, 8 * n, "stts entries")
                flat = struct.unpack(f">{2 * n}I", raw)
                stts = tuple(zip(flat[::2], flat[1::2]))
            elif cc == b"stsc":
                _, _, p = _fullbox(data, b, "stsc")
                (n,) = struct.unpack(">I", _need(data, p, 4, "stsc"))
                raw = _need(data, p + 4, 12 * n, "stsc entries")
                flat = struct.unpack(f">{3 * n}I", raw)
                stsc = tuple((flat[3 * i], flat[3 * i + 1]) for i in range(n))
            elif cc == b"stco":
                _, _, p = _fullbox(data, b, "stco")
                (n,) = struct.unpack(">I", _need(data, p, 4, "stco"))
                raw = _need(data, p + 4, 4 * n, "stco entries")
                stco = struct.unpack(f">{n}I", raw)

    visit(start, end)
    if track_id is None or timescale is None or handler is None:
        raise ValueError("mp4: trak missing tkhd/mdhd/hdlr")
    return Mp4Track(
        track_id=track_id,
        handler=handler,
        avcc=avcc,
        esds=esds,
        timescale=timescale,
        duration=duration,
        sample_sizes=tuple(sizes),
        time_to_sample=stts,
        sample_to_chunk=stsc,
        chunk_offsets=tuple(stco),
    )


def parse_mp4(data: bytes) -> Mp4Meta:
    if len(data) < 8:
        raise ValueError("mp4: payload shorter than one box header")
    major = None
    timescale = duration = None
    mdat_bytes = 0
    tracks: list[Mp4Track] = []
    first = True
    for cc, b, be in _walk(data, 0, len(data)):
        if first:
            if cc != b"ftyp":
                raise ValueError(f"mp4: first box is {cc!r}, expected ftyp")
            major = _need(data, b, 4, "ftyp").decode("ascii", "replace")
            first = False
        elif cc == b"mdat":
            mdat_bytes += be - b
        elif cc == b"moov":
            for mc, mb, mbe in _walk(data, b, be):
                if mc == b"mvhd":
                    v, _, p = _fullbox(data, mb, "mvhd")
                    if v != 0:
                        raise ValueError(f"mp4: unsupported mvhd version {v}")
                    _, _, timescale, duration = struct.unpack(
                        ">IIII", _need(data, p, 16, "mvhd")
                    )
                elif mc == b"trak":
                    tracks.append(_parse_trak(data, mb, mbe))
    if first:
        raise ValueError("mp4: empty payload")
    if timescale is None:
        raise ValueError("mp4: no moov/mvhd box")
    return Mp4Meta(
        major_brand=major,
        timescale=timescale,
        duration=duration,
        mdat_bytes=mdat_bytes,
        tracks=tuple(tracks),
    )


def sample_locations(track: Mp4Track) -> list[tuple[int, int]]:
    """Absolute (offset, size) per sample: expand the stsc run-length
    chunk map against stco/stsz per ISO/IEC 14496-12 §8.7 semantics
    (entry i applies to chunks [first_chunk_i, first_chunk_{i+1}))."""
    if not track.sample_to_chunk or not track.chunk_offsets:
        if track.n_samples:
            raise ValueError("mp4: samples present but stsc/stco empty")
        return []
    locs: list[tuple[int, int]] = []
    n_chunks = len(track.chunk_offsets)
    runs = list(track.sample_to_chunk)
    si = 0
    for i, (first, per_chunk) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
        for chunk in range(first, last + 1):
            if chunk < 1:
                # stsc chunk numbers are 1-based (ISO 14496-12 §8.7.4);
                # a corrupt first_chunk=0 would otherwise wrap
                # chunk_offsets[-1] into a silently wrong offset
                # instead of the strict-parser ValueError (ADVICE r7)
                raise ValueError("mp4: stsc chunk number below 1")
            if chunk > n_chunks:
                raise ValueError("mp4: stsc refers past stco chunk count")
            off = track.chunk_offsets[chunk - 1]
            for _ in range(per_chunk):
                if si >= track.n_samples:
                    raise ValueError("mp4: stsc maps more samples than stsz")
                size = track.sample_sizes[si]
                locs.append((off, size))
                off += size
                si += 1
    if si != track.n_samples:
        raise ValueError(
            f"mp4: sample table maps {si} samples, stsz declares {track.n_samples}"
        )
    return locs


def extract_samples(
    data: bytes, track: Mp4Track, stride: int = 1
) -> list[tuple[int, bytes]]:
    """REAL sample extraction: (sample_idx, bytes) for every `stride`-th
    sample, sliced out of mdat by the resolved sample table. Bounds-
    checked — a sample table pointing outside the payload is corrupt."""
    out = []
    for i, (off, size) in enumerate(sample_locations(track)):
        if i % stride:
            continue
        if off + size > len(data):
            raise ValueError(
                f"mp4: sample {i} [{off}:{off + size}] outside payload"
            )
        out.append((i, data[off : off + size]))
    return out


# ---------------------------------------------------------------------------
# deterministic synthetic payloads (oracle-predictable)
# ---------------------------------------------------------------------------


def synth_mp4(clen: int) -> bytes:
    """Container derived from a character length, every field integer-
    predictable (the q84/q98 generator pattern):

      video track (always):  n = clen % 7 + 2 samples, delta 40 ticks
        (25 fps at timescale 1000); sample i has size
        (clen + 3i) % 50 + 4, filled with byte (clen + 7i) % 251.
      audio track (clen % 3 == 0): n = clen % 11 + 3, delta 23;
        sample i size (clen + 5i) % 17 + 1, fill (clen + 11i) % 251.

    Size ledger (oracle): ftyp 24, mdat 8+S, mvhd+moov header 116,
    video trak 377+4n_v, audio trak 373+4n_a → byte_len =
    525 + 4·n_v + S_v (+ 373 + 4·n_a + S_a when audio present).
    """
    nv = clen % 7 + 2
    vsamples = tuple(
        bytes([(clen + 7 * i) % 251]) * ((clen + 3 * i) % 50 + 4)
        for i in range(nv)
    )
    tracks = [Mp4TrackSpec("vide", 40, vsamples)]
    if clen % 3 == 0:
        na = clen % 11 + 3
        asamples = tuple(
            bytes([(clen + 11 * i) % 251]) * ((clen + 5 * i) % 17 + 1)
            for i in range(na)
        )
        tracks.append(Mp4TrackSpec("soun", 23, asamples))
    return encode_mp4(tracks)


def synth_mp4_avc(clen: int) -> bytes:
    """MP4 whose video samples carry REAL H.264 Annex B NAL streams
    (functions/avc.py) — closed-form structure a SQL oracle predicts:

      nv = clen % 6 + 2 video samples, delta 40. Sample 0 is the
      parameter-set sample: SPS (profile 66, level clen % 45 + 10,
      pic_width_in_mbs = clen % 5 + 1, pic_height_in_map_units =
      clen % 3 + 1, progressive, no cropping) + PPS
      (entropy_coding_mode = clen % 2) + one IDR slice stub (type 5,
      ref_idc 3, (clen % 17) + 2 nonzero fill bytes). Samples i >= 1
      are non-IDR slice stubs (type 1, ref_idc i % 3 + 1 capped at 3,
      (clen + 3*i) % 23 + 1 fill bytes) — slice BODIES are opaque by
      design (CAVLC/CABAC is the documented seam); every NAL header,
      start code, and parameter-set bit is real.
    """
    from redskins_rule_spark.functions.avc import (
        encode_nal_stream,
        encode_pps,
        encode_sps,
    )

    nv = clen % 6 + 2
    sps = encode_sps(
        profile_idc=66,
        level_idc=clen % 45 + 10,
        sps_id=clen % 4,
        log2_max_frame_num_minus4=clen % 8,
        pic_order_cnt_type=2,
        log2_max_poc_lsb_minus4=0,
        max_num_ref_frames=clen % 5,
        gaps_allowed=clen % 2,
        pic_width_in_mbs_minus1=clen % 5,
        pic_height_in_map_units_minus1=clen % 3,
        direct_8x8=clen % 2,
    )
    pps = encode_pps(pps_id=0, sps_id=clen % 4, entropy_coding_mode=clen % 2)

    def stub(n: int, seed: int) -> bytes:
        return bytes([(seed + 7 * j) % 253 + 1 for j in range(n)])

    samples = [
        encode_nal_stream(
            [
                (3, 7, sps),
                (3, 8, pps),
                (3, 5, stub(clen % 17 + 2, clen)),
            ]
        )
    ]
    for i in range(1, nv):
        samples.append(
            encode_nal_stream(
                [(min(i % 3 + 1, 3), 1, stub((clen + 3 * i) % 23 + 1, clen + i))]
            )
        )
    return encode_mp4([Mp4TrackSpec("vide", 40, tuple(samples))])


def synth_mp4_avcc(clen: int) -> bytes:
    """MP4 in the REAL-WORLD AVC layout: parameter sets OUT-OF-BAND
    in the stsd avc1 entry's avcC record, mdat samples as
    length-prefixed NAL units (no start codes). Closed forms:

      length_size = 2 when clen is odd else 4; SPS geometry
      pic_width_in_mbs = clen % 7 + 1, pic_height_in_map_units =
      clen % 2 + 1; level clen % 40 + 11; PPS entropy_coding_mode =
      (clen + 1) % 2. nv = clen % 5 + 2 samples, one slice-stub NAL
      each (sample 0 IDR type 5, others type 1), stub i =
      (clen + 3*i) % 29 + 1 nonzero fill bytes.
    """
    from redskins_rule_spark.functions.avc import (
        encode_avcc,
        encode_nal_stream_avcc,
        encode_pps,
        encode_sps,
        escape_rbsp,
    )

    length_size = 2 if clen % 2 else 4
    sps = encode_sps(
        profile_idc=66,
        level_idc=clen % 40 + 11,
        sps_id=0,
        log2_max_frame_num_minus4=clen % 8,
        pic_order_cnt_type=2,
        log2_max_poc_lsb_minus4=0,
        max_num_ref_frames=clen % 4,
        gaps_allowed=0,
        pic_width_in_mbs_minus1=clen % 7,
        pic_height_in_map_units_minus1=clen % 2,
        direct_8x8=1,
    )
    pps = encode_pps(pps_id=0, sps_id=0, entropy_coding_mode=(clen + 1) % 2)
    avcc = encode_avcc(
        [bytes([(3 << 5) | 7]) + escape_rbsp(sps)],
        [bytes([(3 << 5) | 8]) + escape_rbsp(pps)],
        length_size=length_size,
    )

    def stub(n: int, seed: int) -> bytes:
        return bytes([(seed + 5 * j) % 251 + 1 for j in range(n)])

    nv = clen % 5 + 2
    samples = []
    for i in range(nv):
        ntype = 5 if i == 0 else 1
        samples.append(
            encode_nal_stream_avcc(
                [(3 if i == 0 else 2, ntype, stub((clen + 3 * i) % 29 + 1, clen + i))],
                length_size,
            )
        )
    return encode_mp4(
        [
            Mp4TrackSpec(
                "vide", 40, tuple(samples),
                width=(clen % 7 + 1) * 16, height=(clen % 2 + 1) * 16,
                avcc=avcc,
            )
        ]
    )


def synth_mp4_ipcm(clen: int) -> bytes:
    """MP4 (avcC layout) whose single IDR video sample carries a REAL
    all-I_PCM slice — decodable pixels inside a decodable container.
    Closed forms shared with functions/avc.py `synth_avc_ipcm`:
    planes from `synth_ipcm_planes(clen)`, qp_delta = clen%5 − 2,
    idr_pic_id = clen%8; length_size = 2 when clen is odd else 4;
    level clen % 40 + 11."""
    from redskins_rule_spark.functions.avc import (
        encode_avcc,
        encode_ipcm_slice,
        encode_nal_stream_avcc,
        encode_pps,
        encode_sps,
        escape_rbsp,
        synth_ipcm_planes,
    )

    length_size = 2 if clen % 2 else 4
    y, cb, cr, mb_w, mb_h = synth_ipcm_planes(clen)
    sps = encode_sps(66, clen % 40 + 11, 0, 0, 0, 0, 1, 0,
                     mb_w - 1, mb_h - 1, 1)
    pps = encode_pps(0, 0, 0)
    slc = encode_ipcm_slice(
        y, cb, cr, mb_w, mb_h, qp_delta=clen % 5 - 2, idr_pic_id=clen % 8
    )
    avcc = encode_avcc(
        [bytes([(3 << 5) | 7]) + escape_rbsp(sps)],
        [bytes([(3 << 5) | 8]) + escape_rbsp(pps)],
        length_size=length_size,
    )
    sample = encode_nal_stream_avcc([(3, 5, slc)], length_size)
    return encode_mp4(
        [
            Mp4TrackSpec(
                "vide", 40, (sample,),
                width=16 * mb_w, height=16 * mb_h,
                avcc=avcc,
            )
        ]
    )


def synth_mp4_aac(clen: int) -> bytes:
    """MP4 in the real-world AAC layout: decoder config OUT-OF-BAND
    in the stsd mp4a entry's esds descriptor chain; mdat samples are
    raw access units (opaque — the spectral seam). Closed forms:

      AudioSpecificConfig: audioObjectType clen % 3 + 1,
      sampling-frequency index clen % 13, channels clen % 7 + 1.
      na = clen % 8 + 2 samples, delta 1024 ticks at the config's
      sample rate as track timescale (so duration is sample-exact);
      sample i = (clen + 9*i) % 31 + 1 fill bytes.
    """
    from redskins_rule_spark.functions.aac import (
        SAMPLE_RATES_AAC,
        encode_audio_specific_config,
        encode_esds,
    )

    asc = encode_audio_specific_config(
        clen % 3 + 1, clen % 13, clen % 7 + 1
    )
    na = clen % 8 + 2
    samples = tuple(
        bytes([(clen + 13 * i) % 251]) * ((clen + 9 * i) % 31 + 1)
        for i in range(na)
    )
    return encode_mp4(
        [
            Mp4TrackSpec(
                "soun", 1024, samples,
                timescale=SAMPLE_RATES_AAC[clen % 13],
                esds=encode_esds(asc),
            )
        ]
    )
