"""Pure-Python MP3 (MPEG-1 Layer III) frame-stream codec — closes the
container/framing half of the compressed-audio seam
(`operators/multimodal.py` previously raised NotImplementedError for
any non-WAV audio payload).

Scope — framing level, per the public ISO/IEC 11172-3 header layout:

  * `encode_mp3(frames, id3_payload)` — writes an optional ID3v2.3 tag
    (10-byte header + syncsafe size) followed by a contiguous sequence
    of Layer III frames; each frame's 4-byte header carries real
    bitrate-index / samplerate-index / padding bits and the body is
    sized by the spec formula  144 · bitrate / sample_rate + padding.
  * `parse_mp3(payload)` — strict walk: skip ID3v2 if present, then
    every byte must belong to a valid frame (sync 0x7FF, MPEG-1,
    Layer III); returns frame count, per-frame bitrates/lengths,
    sample rate, and exact duration (1152 samples per frame). Any
    truncation, bad sync, or reserved bitrate/samplerate index
    surfaces as ValueError — the shared corrupt-payload contract of
    the wav/gif/png/jpeg/mp4 codecs.
  * `extract_frames(payload, stride)` — the frame bodies (sans 4-byte
    header), sliced by the spec length formula — proving the walk
    reads real bytes. DECODING Layer III audio (huffman/IMDCT/
    synthesis filterbank) remains the documented seam.

Profile gate: MPEG-1 Layer III only (the ubiquitous profile); MPEG-2
/ 2.5 and Layers I/II raise ValueError naming the profile, the same
shape as the baseline-JPEG gate in functions/jpeg.py.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# MPEG-1 Layer III bitrate table, kbps, header index 1..14
BITRATE_KBPS = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
# MPEG-1 sample-rate table, header index 0..2
SAMPLE_RATES = (44100, 48000, 32000)
SAMPLES_PER_FRAME = 1152


@dataclass(frozen=True)
class Mp3Meta:
    id3_bytes: int  # 0 when no ID3v2 tag
    sample_rate: int
    frame_lengths: tuple[int, ...]
    bitrates_kbps: tuple[int, ...]

    @property
    def n_frames(self) -> int:
        return len(self.frame_lengths)

    @property
    def duration_ms(self) -> int:
        return self.n_frames * SAMPLES_PER_FRAME * 1000 // self.sample_rate

    @property
    def is_vbr(self) -> bool:
        return len(set(self.bitrates_kbps)) > 1


def frame_length(bitrate_idx: int, sr_idx: int, padding: int) -> int:
    """Spec formula for Layer III: 144 · bitrate / sample_rate (+1 pad)."""
    return (
        144 * BITRATE_KBPS[bitrate_idx - 1] * 1000 // SAMPLE_RATES[sr_idx]
        + padding
    )


def _header(bitrate_idx: int, sr_idx: int, padding: int) -> bytes:
    # sync(11)=0x7FF version(2)=11(MPEG1) layer(2)=01(III) prot(1)=1
    # brate(4) srate(2) pad(1) priv(1)=0 mode(2)=11(mono) rest=0
    word = (
        (0x7FF << 21)
        | (0b11 << 19)
        | (0b01 << 17)
        | (1 << 16)
        | (bitrate_idx << 12)
        | (sr_idx << 10)
        | (padding << 9)
        | (0b11 << 6)
    )
    return struct.pack(">I", word)


def encode_mp3(
    frames: list[tuple[int, int, int, int]], id3_payload: bytes | None = None
) -> bytes:
    """frames: (bitrate_idx 1-14, sr_idx 0-2, padding 0|1, fill_byte).
    All frames must share sr_idx (one stream, one clock)."""
    if not frames:
        raise ValueError("mp3: at least one frame required")
    out = bytearray()
    if id3_payload is not None:
        if len(id3_payload) >= 1 << 28:
            raise ValueError("mp3: ID3 tag too large for syncsafe size")
        n = len(id3_payload)
        syncsafe = bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        out += b"ID3" + bytes([3, 0, 0]) + syncsafe + id3_payload
    for bi, si, pad, fill in frames:
        if not 1 <= bi <= 14 or not 0 <= si <= 2:
            raise ValueError(f"mp3: invalid bitrate/samplerate index {bi}/{si}")
        body = frame_length(bi, si, pad) - 4
        out += _header(bi, si, pad) + bytes([fill]) * body
    return bytes(out)


def _id3_size(data: bytes) -> int:
    """Bytes occupied by a leading ID3v2 tag, 0 if absent."""
    if len(data) < 3 or data[:3] != b"ID3":
        return 0
    if len(data) < 10:
        raise ValueError("mp3: truncated ID3v2 header")
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("mp3: ID3v2 size bytes not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    # v2.4 footer (header flag 0x10): 10 extra bytes after the body,
    # excluded from the declared size
    footer = 10 if data[3] == 4 and data[5] & 0x10 else 0
    if 10 + size + footer > len(data):
        raise ValueError("mp3: ID3v2 tag overruns payload")
    return 10 + size + footer


def parse_mp3(data: bytes) -> Mp3Meta:
    start = _id3_size(data)
    off = start
    lengths: list[int] = []
    rates: list[int] = []
    sr = None
    if off >= len(data):
        raise ValueError("mp3: no frames after ID3 tag")
    while off < len(data):
        if off + 4 > len(data):
            raise ValueError(f"mp3: truncated frame header at {off}")
        (word,) = struct.unpack(">I", data[off : off + 4])
        if word >> 21 != 0x7FF:
            raise ValueError(f"mp3: lost frame sync at offset {off}")
        version = (word >> 19) & 0b11
        layer = (word >> 17) & 0b11
        if version != 0b11 or layer != 0b01:
            raise ValueError(
                "mp3: unsupported profile (only MPEG-1 Layer III); "
                f"version bits {version:02b}, layer bits {layer:02b}"
            )
        bi = (word >> 12) & 0xF
        si = (word >> 10) & 0b11
        pad = (word >> 9) & 1
        if bi == 0 or bi == 15:
            raise ValueError(f"mp3: free/bad bitrate index at offset {off}")
        if si == 3:
            raise ValueError(f"mp3: reserved sample-rate index at offset {off}")
        if sr is None:
            sr = SAMPLE_RATES[si]
        elif SAMPLE_RATES[si] != sr:
            raise ValueError("mp3: sample rate changes mid-stream")
        flen = frame_length(bi, si, pad)
        if off + flen > len(data):
            raise ValueError(f"mp3: truncated frame at offset {off}")
        lengths.append(flen)
        rates.append(BITRATE_KBPS[bi - 1])
        off += flen
    return Mp3Meta(
        id3_bytes=start,
        sample_rate=sr,
        frame_lengths=tuple(lengths),
        bitrates_kbps=tuple(rates),
    )


def extract_frames(data: bytes, stride: int = 1) -> list[tuple[int, bytes]]:
    """(frame_idx, body bytes) for every `stride`-th frame — real
    slices of the payload, headers stripped."""
    meta = parse_mp3(data)
    out = []
    off = meta.id3_bytes
    for i, flen in enumerate(meta.frame_lengths):
        if i % stride == 0:
            out.append((i, data[off + 4 : off + flen]))
        off += flen
    return out


def synth_mp3(clen: int) -> bytes:
    """Frame stream derived from a character length, every field
    integer-predictable (the q84/q98/q187 generator pattern):

      ID3v2 tag payload: clen % 29 bytes (fill clen % 251).
      n = clen % 13 + 2 frames at 32000 Hz (sr_idx 2 → exactly 36 ms
      per frame); frame i: bitrate index (clen + s·i) % 14 + 1 where
      s = 0 when clen % 4 == 0 (CBR) else 1 (VBR), padding
      (clen + i) % 2, body fill byte (clen + 13·i) % 251.
    """
    n = clen % 13 + 2
    step = 0 if clen % 4 == 0 else 1
    frames = [
        ((clen + step * i) % 14 + 1, 2, (clen + i) % 2, (clen + 13 * i) % 251)
        for i in range(n)
    ]
    return encode_mp3(frames, id3_payload=bytes([clen % 251]) * (clen % 29))


# --- Layer III entropy-structure layer (side info + scalefactors) ---------
#
# Narrows the compressed-audio seam a second notch (after the r7
# framing layer): EVERYTHING in a Layer III frame that is fixed-width
# bit fields — the 17-byte mono side info (ISO/IEC 11172-3 §2.4.1.7)
# and the scalefactor section of main_data, including scfsi copy
# semantics — is now really encoded and really decoded, bit-exact and
# integer-only, leaving precisely the spectral Huffman payload
# (Table B.7 codebooks) + the float reconstruction pipeline
# (requantize/IMDCT/synthesis) as the documented seam. The synthetic
# granules are DIGITAL SILENCE (big_values = 0 and part2_3_length ==
# the scalefactor bit count, so the Huffman region is empty) — a
# spec-valid stream shape real encoders emit for silent granules,
# which is what keeps the encoder 100% format-faithful without the
# codebooks. Profile gates (same shape as the JPEG profile gates):
# MPEG-1 mono, long blocks (window_switching parsed, short/mixed
# scalefactor layout raises naming the profile), main_data_begin == 0
# (the bit-reservoir backpointer raises — reservoir reassembly is
# part of the spectral seam).

# scalefac_compress -> (slen1, slen2), ISO 11172-3 Table B.6
SLEN = (
    (0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2), (1, 3),
    (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3), (4, 2), (4, 3),
)
# long-block scalefactor bands per slen group: 0-10 use slen1,
# 11-20 use slen2; scfsi groups are bands 0-5 / 6-10 / 11-15 / 16-20
_SCFSI_GROUPS = ((0, 6), (6, 11), (11, 16), (16, 21))


# --- count1-region Huffman (ISO 11172-3 Table B.7, tables A/B) ------------
#
# The spectral payload of a Layer III granule is big_values pairs,
# then "count1" QUADRUPLES of |v|,|w|,|x|,|y| ∈ {0,1} (+ a sign bit
# per nonzero), then implicit zeros. The two count1 codebooks are the
# one part of Table B.7 that is small enough to carry as public spec
# text: table A below (a Kraft-exact 16-entry prefix code — one 1-bit,
# four 4-bit, five 5-bit, six 6-bit words), and table B, which is
# trivially the 4-bit one's complement of the (v,w,x,y) nibble. With
# these, granules whose big_values == 0 decode their ENTIRE spectrum
# exactly; big-values pair tables (the 32-table bulk of B.7) remain
# the documented seam.

# vwxy nibble -> (hlen, hcod), count1 table A
_COUNT1_A: dict[int, tuple[int, int]] = {
    0b0000: (1, 0b1),
    0b0001: (4, 0b0101),
    0b0010: (4, 0b0100),
    0b0011: (5, 0b00101),
    0b0100: (4, 0b0110),
    0b0101: (6, 0b000101),
    0b0110: (5, 0b00100),
    0b0111: (6, 0b000100),
    0b1000: (4, 0b0111),
    0b1001: (5, 0b00011),
    0b1010: (5, 0b00110),
    0b1011: (6, 0b000000),
    0b1100: (5, 0b00111),
    0b1101: (6, 0b000010),
    0b1110: (6, 0b000001),
    0b1111: (6, 0b000011),
}
_COUNT1_A_DECODE = {(ln, code): v for v, (ln, code) in _COUNT1_A.items()}
assert sum(2.0 ** -ln for ln, _ in _COUNT1_A.values()) == 1.0  # Kraft-exact

# big-values pair table 1 (Table B.7): the one pair codebook small
# enough to carry as spec text — |x|,|y| ∈ {0,1}, no linbits/ESC.
# Granules whose big-values pairs fit in ±1 therefore decode fully;
# tables 2-31 (+ linbits escapes) remain the documented seam, and
# DELIBERATELY so: each is a 9-to-256-entry arbitrary Huffman
# codebook with no verifiable public copy in this container, so any
# reconstruction from memory would risk shipping a plausible-but-
# wrong table — worse than a seam that raises by name (the same
# judgment call as AAC's 121-entry scalefactor codebook; see the
# q224 registration note). The structural layers AROUND the tables
# (side info, scalefactors, bit reservoir, count1 + table-1 regions)
# are all real and oracle-checked.
_BIGV_T1: dict[tuple[int, int], tuple[int, int]] = {
    (0, 0): (1, 0b1),
    (0, 1): (3, 0b001),
    (1, 0): (2, 0b01),
    (1, 1): (3, 0b000),
}
_BIGV_T1_DECODE = {(ln, code): xy for xy, (ln, code) in _BIGV_T1.items()}
assert sum(2.0 ** -ln for ln, _ in _BIGV_T1.values()) == 1.0  # Kraft-exact


def _bigv_pair_bits(pair: tuple[int, int]) -> int:
    x, y = pair
    return _BIGV_T1[(1 if x else 0, 1 if y else 0)][0] + (
        (1 if x else 0) + (1 if y else 0)
    )


def _count1_quad_bits(quad: tuple[int, int, int, int], table: int) -> int:
    """Encoded size of one quadruple: codeword + one sign bit per
    nonzero component."""
    nibble = sum((1 << (3 - k)) if quad[k] else 0 for k in range(4))
    hlen = 4 if table else _COUNT1_A[nibble][0]
    return hlen + sum(1 for v in quad if v)


@dataclass(frozen=True)
class Mp3Granule:
    part2_3_length: int
    big_values: int
    global_gain: int
    scalefac_compress: int
    table_select: tuple[int, int, int]
    region0_count: int
    region1_count: int
    preflag: int
    scalefac_scale: int
    count1table_select: int
    scalefactors: tuple[int, ...]  # 21 EFFECTIVE values (scfsi applied)
    spectral_bits: int  # part2_3_length minus scalefactor bits
    # decoded count1 quadruples (v,w,x,y each in {-1,0,1}) when the
    # caller asked for spectral decode; None in structure-only parses
    count1: tuple[tuple[int, int, int, int], ...] | None = None
    # decoded big-values pairs (x,y each in {-1,0,1}, pair table 1)
    # when the caller asked for spectral decode; None otherwise
    big_pairs: tuple[tuple[int, int], ...] | None = None


@dataclass(frozen=True)
class Mp3FrameInfo:
    main_data_begin: int
    scfsi: int  # 4 bits, group 0 = MSB
    granules: tuple[Mp3Granule, Mp3Granule]


class _Bits:
    """MSB-first bit cursor (no JPEG byte-stuffing)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > 8 * len(self.data):
            raise ValueError("mp3: bit field overruns frame body")
        v = 0
        p = self.pos
        for _ in range(n):
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = end
        return v


class _BitsOut:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, n: int) -> None:
        if value < 0 or value >= (1 << n):
            raise ValueError(f"mp3: field value {value} exceeds {n} bits")
        for i in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc = 0
                self._n = 0

    def pad_to_byte(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


def _granule_sf_bits(scalefac_compress: int, scfsi: int, gr: int) -> int:
    """Scalefactor bit count of one long-block granule — granule 1
    skips the scfsi-copied groups."""
    slen1, slen2 = SLEN[scalefac_compress]
    bits = 0
    for gi, (lo, hi) in enumerate(_SCFSI_GROUPS):
        if gr == 1 and (scfsi >> (3 - gi)) & 1:
            continue
        width = slen1 if lo < 11 else slen2
        bits += (hi - lo) * width
    return bits


def encode_mp3_granules(
    frames: list[dict],
    bitrate_idx: int,
    sr_idx: int,
    id3_payload: bytes | None = None,
) -> bytes:
    """Mono MPEG-1 Layer III stream with REAL side info and REAL
    scalefactor sections; spectra are digital silence (big_values=0,
    empty Huffman region), so every emitted bit is spec-layout-true
    without the Table B.7 codebooks.

    Each frames[i] is a dict: scfsi (0-15) and per granule g in (0,1)
    keys 'g0'/'g1', each a dict with global_gain, scalefac_compress,
    preflag, scalefac_scale, count1table_select, and scalefactors (21
    ints; granule-1 values inside scfsi-copied groups must EQUAL
    granule 0's — enforced, since the stream cannot represent a
    difference).

    A granule dict may also carry 'count1': a list of (v,w,x,y)
    quadruples with components in {-1, 0, 1}, Huffman-coded into the
    spectral region with the granule's count1table_select (Table B.7
    A/B) + one sign bit per nonzero — so part2_3_length exceeds the
    scalefactor bits by exactly the count1 bits and the stream is no
    longer silence. big_values stays 0: the pair tables remain the
    documented seam."""
    out = bytearray()
    if id3_payload is not None:
        n = len(id3_payload)
        if n >= 1 << 28:
            raise ValueError("mp3: ID3 tag too large for syncsafe size")
        out += b"ID3" + bytes([3, 0, 0]) + bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        ) + id3_payload
    for fr in frames:
        scfsi, sides, main_bytes = _render_frame(fr)
        body_len = frame_length(bitrate_idx, sr_idx, 0) - 4
        payload = _write_side(0, scfsi, sides) + main_bytes
        if len(payload) > body_len:
            raise ValueError("mp3: side info + scalefactors exceed frame")
        out += _header(bitrate_idx, sr_idx, 0) + payload + bytes(
            body_len - len(payload)
        )
    return bytes(out)


def _render_frame(fr: dict) -> tuple[int, list[tuple[int, ...]], bytes]:
    """Render one frame's main_data (scalefactors + big-values pairs
    + count1 quadruples, byte-padded — the pad bits are ancillary
    data per §2.4.1.7) plus the side-info granule fields describing
    it. Shared by the contiguous and reservoir encoders."""
    scfsi = fr["scfsi"]
    if not 0 <= scfsi <= 15:
        raise ValueError("mp3: scfsi out of range")
    main = _BitsOut()
    sides: list[tuple[int, ...]] = []
    for g in (0, 1):
        gd = fr[f"g{g}"]
        sfc = gd["scalefac_compress"]
        if not 0 <= sfc <= 15:
            raise ValueError("mp3: scalefac_compress out of range")
        slen1, slen2 = SLEN[sfc]
        sfs = list(gd["scalefactors"])
        if len(sfs) != 21:
            raise ValueError("mp3: long blocks carry 21 scalefactors")
        quads = [tuple(q) for q in gd.get("count1", [])]
        table = gd["count1table_select"]
        for quad in quads:
            if len(quad) != 4 or any(v not in (-1, 0, 1) for v in quad):
                raise ValueError(
                    "mp3: count1 quadruples take components in {-1,0,1}"
                )
        pairs = [tuple(p) for p in gd.get("big_pairs", [])]
        for pair in pairs:
            if len(pair) != 2 or any(v not in (-1, 0, 1) for v in pair):
                raise ValueError(
                    "mp3: table-1 big-values pairs take components "
                    "in {-1,0,1}"
                )
        if len(pairs) > 288:
            raise ValueError("mp3: big_values exceeds 288 pairs")
        bv_bits = sum(_bigv_pair_bits(p) for p in pairs)
        c1_bits = sum(_count1_quad_bits(q, table) for q in quads)
        part2 = _granule_sf_bits(sfc, scfsi, g)
        ts = (1, 1, 1) if pairs else (0, 0, 0)
        sides.append(
            (part2 + bv_bits + c1_bits, len(pairs), gd["global_gain"],
             sfc, ts[0], ts[1], ts[2], 0, 0, gd["preflag"],
             gd["scalefac_scale"], table)
        )
        for gi, (lo, hi) in enumerate(_SCFSI_GROUPS):
            width = slen1 if lo < 11 else slen2
            if g == 1 and (scfsi >> (3 - gi)) & 1:
                if sfs[lo:hi] != list(fr["g0"]["scalefactors"])[lo:hi]:
                    raise ValueError(
                        "mp3: scfsi-copied group differs from granule 0"
                    )
                continue
            for b in range(lo, hi):
                main.write(sfs[b], width)
        for pair in pairs:  # big-values region precedes count1
            x, y = pair
            hlen, hcod = _BIGV_T1[(1 if x else 0, 1 if y else 0)]
            main.write(hcod, hlen)
            for v in pair:
                if v:
                    main.write(1 if v < 0 else 0, 1)
        for quad in quads:
            nibble = sum(
                (1 << (3 - k)) if quad[k] else 0 for k in range(4)
            )
            if table:
                main.write(nibble ^ 0b1111, 4)  # table B: complement
            else:
                hlen, hcod = _COUNT1_A[nibble]
                main.write(hcod, hlen)
            for v in quad:
                if v:
                    main.write(1 if v < 0 else 0, 1)
    main.pad_to_byte()
    return scfsi, sides, bytes(main.buf)


def _write_side(
    main_data_begin: int, scfsi: int, sides: list[tuple[int, ...]]
) -> bytes:
    """17-byte mono side info from rendered granule fields."""
    side = _BitsOut()
    side.write(main_data_begin, 9)
    side.write(0, 5)   # private_bits (mono)
    side.write(scfsi, 4)
    for (part23, bv, gg, sfc, t0, t1, t2, r0, r1, pre, ss, c1t) in sides:
        side.write(part23, 12)
        side.write(bv, 9)
        side.write(gg, 8)
        side.write(sfc, 4)
        side.write(0, 1)  # window_switching_flag (long)
        side.write(t0, 5)
        side.write(t1, 5)
        side.write(t2, 5)
        side.write(r0, 4)
        side.write(r1, 3)
        side.write(pre, 1)
        side.write(ss, 1)
        side.write(c1t, 1)
    return bytes(side.buf)


def encode_mp3_reservoir(
    frames: list[dict],
    bitrate_idx: int,
    sr_idx: int,
    begins: list[int] | None = None,
) -> bytes:
    """Mono Layer III stream that USES THE BIT RESERVOIR: frame n's
    main_data starts `begins[n]` bytes BEFORE its own main-data area
    (§2.4.1.7 main_data_begin — the mechanism virtually every real
    MP3 exercises), so granule payloads spill across frame
    boundaries. The layout is validated exactly as a conforming
    decoder would have to: begins[0] == 0 (nothing precedes frame 0),
    each begin ≤ 511 (9-bit field), no overlap with the previous
    frame's main data, and each frame's main data ends inside its own
    area. Bytes not covered by any main_data are ancillary filler
    (0xAA) — a decoder must SKIP them via main_data_begin, never
    assume contiguity. begins=None packs back-to-back (every begin
    the maximum the layout allows, capped at 511 via filler)."""
    rendered = [_render_frame(fr) for fr in frames]
    cap = frame_length(bitrate_idx, sr_idx, 0) - 4 - 17
    starts = [n * cap for n in range(len(frames))]
    if begins is None:
        begins = []
        pos = 0
        for n, (_s, _g, mb) in enumerate(rendered):
            want = starts[n] - pos
            b = min(want, 511)
            pos = starts[n] - b + len(mb)
            begins.append(b)
    if len(begins) != len(frames):
        raise ValueError("mp3: one main_data_begin per frame")
    area = bytearray(b"\xaa" * (len(frames) * cap))
    pos = 0
    placed: list[int] = []
    for n, ((_scfsi, _sides, mb), begin) in enumerate(zip(rendered, begins)):
        if not 0 <= begin <= 511:
            raise ValueError("mp3: main_data_begin exceeds the 9-bit range")
        start = starts[n] - begin
        if start < 0:
            raise ValueError("mp3: reservoir reaches before the stream start")
        if start < pos:
            raise ValueError("mp3: main data overlaps the previous frame's")
        if start + len(mb) > starts[n] + cap:
            raise ValueError("mp3: main data overruns its own frame area")
        area[start: start + len(mb)] = mb
        pos = start + len(mb)
        placed.append(begin)
    out = bytearray()
    for n, (scfsi, sides, _mb) in enumerate(rendered):
        out += (
            _header(bitrate_idx, sr_idx, 0)
            + _write_side(placed[n], scfsi, sides)
            + area[starts[n]: starts[n] + cap]
        )
    return bytes(out)


def parse_mp3_granules(
    data: bytes, decode_count1: bool = False
) -> list[Mp3FrameInfo]:
    """REAL side-info + scalefactor decode of every frame (mono
    MPEG-1 Layer III, long blocks): the 136-bit side info, then the
    scalefactor section of main_data with scfsi copy semantics —
    granule 1's copied groups take granule 0's DECODED values.
    Returns EFFECTIVE scalefactors plus `spectral_bits`, the size of
    the remaining Huffman spectral payload this module does not
    decode (the documented seam; 0 for silence granules).

    Profile gates, each raising ValueError naming the boundary:
    main_data_begin > 0 (bit-reservoir reassembly belongs to the
    spectral seam), window_switching_flag with short/mixed blocks
    (different scalefactor layout), and any structural corruption —
    side info overrunning the body, part2_3_length smaller than its
    own scalefactor section, scalefactor bits overrunning main_data.

    With decode_count1=True the spectral region is DECODED, not
    skipped, for granules whose big_values == 0: the count1
    quadruple Huffman run (Table B.7 A/B + sign bits) must consume
    part2_3_length exactly, and each granule's quadruples land in
    `Mp3Granule.count1`. A granule with big_values > 0 raises naming
    the big-values pair-table seam."""
    out: list[Mp3FrameInfo] = []
    for _idx, body in extract_frames(data):
        main_data_begin, scfsi, sides = _read_side_info(body)
        if main_data_begin:
            raise ValueError(
                "mp3: bit reservoir (main_data_begin > 0) needs "
                "cross-frame main_data reassembly — use "
                "parse_mp3_reservoir"
            )
        mbr = _Bits(body[17:])
        granules = _read_frame_main(
            mbr, scfsi, sides, decode_count1, 8 * len(body[17:])
        )
        out.append(
            Mp3FrameInfo(
                main_data_begin=main_data_begin,
                scfsi=scfsi,
                granules=(granules[0], granules[1]),
            )
        )
    return out


def _read_side_info(body: bytes) -> tuple[int, int, list[tuple]]:
    """Decode the 136-bit mono side info (§2.4.1.7)."""
    if len(body) < 17:
        raise ValueError("mp3: frame too short for mono side info")
    br = _Bits(body)
    main_data_begin = br.read(9)
    br.read(5)  # private_bits
    scfsi = br.read(4)
    sides = []
    for _g in (0, 1):
        part23 = br.read(12)
        big_values = br.read(9)
        global_gain = br.read(8)
        sfc = br.read(4)
        ws = br.read(1)
        if ws:
            block_type = br.read(2)
            if block_type == 0:
                raise ValueError(
                    "mp3: window_switching with block_type 0 is invalid"
                )
            raise ValueError(
                "mp3: short/mixed-block scalefactor layout is outside "
                "the long-block profile"
            )
        table_select = (br.read(5), br.read(5), br.read(5))
        region0 = br.read(4)
        region1 = br.read(3)
        preflag = br.read(1)
        scalefac_scale = br.read(1)
        count1table = br.read(1)
        sides.append(
            (part23, big_values, global_gain, sfc, table_select,
             region0, region1, preflag, scalefac_scale, count1table)
        )
    if br.pos != 136:
        raise ValueError("mp3: mono side info must be exactly 17 bytes")
    return main_data_begin, scfsi, sides


def _read_frame_main(
    mbr: _Bits,
    scfsi: int,
    sides: list[tuple],
    decode_count1: bool,
    bit_limit: int,
) -> list[Mp3Granule]:
    """Decode one frame's main_data (scalefactors with scfsi copy
    semantics, then the spectral region) from an already-positioned
    bit cursor. `bit_limit` is the absolute bound the spectral bits
    may not cross — the frame body end for contiguous streams, the
    frame's own main-data-area end for reservoir streams."""
    granules = []
    g0_sfs: list[int] = []
    for g in (0, 1):
        (part23, big_values, global_gain, sfc, table_select,
         region0, region1, preflag, scalefac_scale, count1table) = sides[g]
        slen1, slen2 = SLEN[sfc]
        sfs: list[int] = []
        for gi, (lo, hi) in enumerate(_SCFSI_GROUPS):
            if g == 1 and (scfsi >> (3 - gi)) & 1:
                sfs.extend(g0_sfs[lo:hi])
                continue
            width = slen1 if lo < 11 else slen2
            for _b in range(lo, hi):
                sfs.append(mbr.read(width))
        part2 = _granule_sf_bits(sfc, scfsi, g)
        if part23 < part2:
            raise ValueError(
                "mp3: part2_3_length smaller than its scalefactor section"
            )
        spectral = part23 - part2
        if mbr.pos + spectral > bit_limit:
            raise ValueError("mp3: spectral bits overrun main_data")
        count1_quads: tuple[tuple[int, int, int, int], ...] | None = None
        big_pairs_out: tuple[tuple[int, int], ...] | None = None
        if decode_count1:
            end = mbr.pos + spectral
            if big_values and table_select != (1, 1, 1):
                raise ValueError(
                    "mp3: big-values pair tables 2-31 (Table B.7 bulk) "
                    "are outside the table-1 profile — spectral-seam "
                    "territory"
                )
            bpairs: list[tuple[int, int]] = []
            for _p in range(big_values):
                ln, code = 1, mbr.read(1)
                while (ln, code) not in _BIGV_T1_DECODE:
                    if ln >= 3:
                        raise ValueError(
                            "mp3: invalid big-values table-1 codeword"
                        )
                    code = (code << 1) | mbr.read(1)
                    ln += 1
                xy = _BIGV_T1_DECODE[(ln, code)]
                vals2 = []
                for mag in xy:
                    if mag:
                        vals2.append(-1 if mbr.read(1) else 1)
                    else:
                        vals2.append(0)
                if mbr.pos > end:
                    raise ValueError(
                        "mp3: big-values pair overruns part2_3_length"
                    )
                bpairs.append((vals2[0], vals2[1]))
            big_pairs_out = tuple(bpairs)
            quads: list[tuple[int, int, int, int]] = []
            while mbr.pos < end:
                if count1table:  # table B: 4-bit one's complement
                    nibble = mbr.read(4) ^ 0b1111
                else:  # table A: walk the prefix code (max 6 bits)
                    ln, code = 1, mbr.read(1)
                    while (ln, code) not in _COUNT1_A_DECODE:
                        if ln >= 6:
                            raise ValueError(
                                "mp3: invalid count1 table-A codeword"
                            )
                        code = (code << 1) | mbr.read(1)
                        ln += 1
                    nibble = _COUNT1_A_DECODE[(ln, code)]
                vals = []
                for k in range(4):
                    if (nibble >> (3 - k)) & 1:
                        vals.append(-1 if mbr.read(1) else 1)
                    else:
                        vals.append(0)
                if mbr.pos > end:
                    raise ValueError(
                        "mp3: count1 quadruple overruns part2_3_length"
                    )
                quads.append((vals[0], vals[1], vals[2], vals[3]))
            count1_quads = tuple(quads)
        else:
            # the Huffman spectral payload is skipped, not decoded —
            # advance the cursor so multi-granule frames stay aligned
            mbr.pos += spectral
        if g == 0:
            g0_sfs = sfs
        granules.append(
            Mp3Granule(
                part2_3_length=part23,
                big_values=big_values,
                global_gain=global_gain,
                scalefac_compress=sfc,
                table_select=table_select,
                region0_count=region0,
                region1_count=region1,
                preflag=preflag,
                scalefac_scale=scalefac_scale,
                count1table_select=count1table,
                scalefactors=tuple(sfs),
                spectral_bits=spectral,
                count1=count1_quads,
                big_pairs=big_pairs_out,
            )
        )
    return granules


def parse_mp3_reservoir(
    data: bytes, decode_count1: bool = False
) -> list[Mp3FrameInfo]:
    """REAL bit-reservoir decode (§2.4.1.7) — the cross-frame
    main_data reassembly virtually every real-world MP3 requires and
    `parse_mp3_granules` raises on. The reservoir is the
    concatenation of every frame's post-side-info bytes; frame n's
    main_data starts main_data_begin bytes BEFORE its own area, i.e.
    inside earlier frames' areas, and may spill forward across frame
    boundaries. Enforced as a conforming decoder must: the start may
    not precede the stream, may not overlap the previous frame's
    main_data, and the frame's bits may not run past its OWN area end
    (future frames' bytes are not available at decode time). Bytes no
    frame claims are ancillary data and are skipped — contiguity is
    never assumed. Content decoding (scalefactors, count1,
    big-values table 1) is byte-for-byte the `parse_mp3_granules`
    walk; only the transport differs."""
    headers = []
    areas: list[bytes] = []
    offsets: list[int] = []
    total = 0
    for _idx, body in extract_frames(data):
        begin, scfsi, sides = _read_side_info(body)
        headers.append((begin, scfsi, sides))
        offsets.append(total)
        areas.append(body[17:])
        total += len(body) - 17
    mbr = _Bits(b"".join(areas))
    out: list[Mp3FrameInfo] = []
    prev_end = 0
    for n, (begin, scfsi, sides) in enumerate(headers):
        start = offsets[n] - begin
        if start < 0:
            raise ValueError(
                "mp3: main_data_begin reaches before the stream start"
            )
        if 8 * start < prev_end:
            raise ValueError(
                "mp3: main data overlaps the previous frame's"
            )
        mbr.pos = 8 * start
        limit = 8 * (offsets[n] + len(areas[n]))
        granules = _read_frame_main(mbr, scfsi, sides, decode_count1, limit)
        if mbr.pos > limit:
            raise ValueError("mp3: main data overruns its own frame area")
        prev_end = mbr.pos
        out.append(
            Mp3FrameInfo(
                main_data_begin=begin,
                scfsi=scfsi,
                granules=(granules[0], granules[1]),
            )
        )
    return out


def synth_mp3_granules(clen: int) -> bytes:
    """Granule-bearing stream derived from a character length, every
    side-info and scalefactor field integer-predictable:

      n = clen % 7 + 2 frames, bitrate index clen % 14 + 1, 32 kHz,
      ID3 payload clen % 19 bytes. Frame i granule g:
        global_gain        = (clen + 7*i + 3*g) % 256
        scalefac_compress  = (clen + i + g) % 16
        preflag            = (clen + i + g) % 2
        scalefac_scale     = (clen + i) % 2
        count1table_select = (clen + g) % 2
        scalefactor[b]     = (clen + i + g + b) % 2^slen(b)  (0 when
                             slen is 0); granule 1's scfsi-copied
                             groups take granule 0's values
        scfsi              = (5*clen + 3*i + 1) % 16  (decoupled from
                             granule 0's scalefac_compress so a parser
                             conflating the two fields cannot pass)
    """
    n = clen % 7 + 2
    frames = []
    for i in range(n):
        scfsi = (5 * clen + 3 * i + 1) % 16
        fr: dict = {"scfsi": scfsi}
        for g in (0, 1):
            sfc = (clen + i + g) % 16
            slen1, slen2 = SLEN[sfc]
            sfs = []
            for b in range(21):
                width = slen1 if b < 11 else slen2
                sfs.append((clen + i + g + b) % (1 << width) if width else 0)
            fr[f"g{g}"] = {
                "global_gain": (clen + 7 * i + 3 * g) % 256,
                "scalefac_compress": sfc,
                "preflag": (clen + i + g) % 2,
                "scalefac_scale": (clen + i) % 2,
                "count1table_select": (clen + g) % 2,
                "scalefactors": sfs,
            }
        # apply scfsi copies so the encoder's equality contract holds
        for gi, (lo, hi) in enumerate(_SCFSI_GROUPS):
            if (scfsi >> (3 - gi)) & 1:
                fr["g1"]["scalefactors"][lo:hi] = fr["g0"]["scalefactors"][lo:hi]
        frames.append(fr)
    return encode_mp3_granules(
        frames, clen % 14 + 1, 2,
        id3_payload=bytes([clen % 251]) * (clen % 19),
    )


def synth_mp3_count1(clen: int) -> bytes:
    """Count1-bearing stream from one integer (the q210 oracle's
    closed form): n = clen%5 + 2 frames, bitrate index clen%14 + 1,
    32 kHz. Frame i granule g carries nq = (clen+i+g)%5 + 1 count1
    quadruples; quadruple q's components are

        v = (clen + 3q + i + g) % 3 − 1
        w = (clen + 5q + 2i)    % 3 − 1
        x = (clen + 7q + 3i + g) % 3 − 1
        y = (clen + 11q + 4i)   % 3 − 1

    (each in {−1,0,1}); count1table_select = (clen+g)%2 so BOTH
    Table B.7 codebooks (A prefix code, B complement) are exercised
    in every payload. Scalefactor fields follow the
    synth_mp3_granules formulas with decoupling offsets."""
    return encode_mp3_granules(_count1_frame_dicts(clen), clen % 14 + 1, 2)


def _count1_frame_dicts(clen: int) -> list[dict]:
    """The synth_mp3_count1 granule-content formulas as frame dicts —
    shared by the contiguous (q210) and reservoir (q223) transports
    so both oracles replay the SAME closed form."""
    n = clen % 5 + 2
    frames: list[dict] = []
    for i in range(n):
        scfsi = (3 * clen + 5 * i + 2) % 16
        fr: dict = {"scfsi": scfsi}
        for g in (0, 1):
            sfc = (clen + 2 * i + g) % 16
            slen1, slen2 = SLEN[sfc]
            sfs = []
            for b in range(21):
                width = slen1 if b < 11 else slen2
                sfs.append((clen + 2 * i + g + b) % (1 << width) if width else 0)
            nq = (clen + i + g) % 5 + 1
            quads = [
                (
                    (clen + 3 * q + i + g) % 3 - 1,
                    (clen + 5 * q + 2 * i) % 3 - 1,
                    (clen + 7 * q + 3 * i + g) % 3 - 1,
                    (clen + 11 * q + 4 * i) % 3 - 1,
                )
                for q in range(nq)
            ]
            fr[f"g{g}"] = {
                "global_gain": (clen + 5 * i + 7 * g) % 256,
                "scalefac_compress": sfc,
                "preflag": (clen + i + g) % 2,
                "scalefac_scale": (clen + i) % 2,
                "count1table_select": (clen + g) % 2,
                "scalefactors": sfs,
                "count1": quads,
            }
        for gi, (lo, hi) in enumerate(_SCFSI_GROUPS):
            if (scfsi >> (3 - gi)) & 1:
                fr["g1"]["scalefactors"][lo:hi] = fr["g0"]["scalefactors"][lo:hi]
        frames.append(fr)
    return frames


def synth_mp3_reservoir(clen: int) -> bytes:
    """Reservoir-packed count1 stream (the q223 closed form): the
    granule CONTENT replays `synth_mp3_count1`'s formulas exactly —
    same quadruples, scalefactors, and codebook selects, so the
    oracle is q210's — while the TRANSPORT exercises the bit
    reservoir: main_data_begin_n = (7·clen + 13·n) % (upper_n + 1),
    where upper_n = min(511, layout slack) is the largest legal
    back-reach at frame n. Main data therefore starts inside EARLIER
    frames' areas and spills across frame boundaries, with 0xAA
    ancillary filler in the uncovered gaps — decoding it requires
    real cross-frame reassembly, not contiguity assumptions."""
    frames = _count1_frame_dicts(clen)
    bidx = clen % 14 + 1
    cap = frame_length(bidx, 2, 0) - 4 - 17
    begins: list[int] = []
    pos = 0
    for n, fr in enumerate(frames):
        mb_len = len(_render_frame(fr)[2])
        upper = min(511, n * cap - pos)
        b = 0 if upper <= 0 else (7 * clen + 13 * n) % (upper + 1)
        begins.append(b)
        pos = n * cap - b + mb_len
    return encode_mp3_reservoir(frames, bidx, 2, begins)


def synth_mp3_bigv(clen: int) -> bytes:
    """Streams whose granules carry BOTH spectral regions — table-1
    big-values pairs then count1 quadruples (the q213 oracle's closed
    forms): n = clen%4 + 2 frames; frame i granule g has
    np = (clen+2i+g)%6 + 1 pairs and nq = (clen+i+g)%4 quadruples
    (nq may be 0 — a pairs-only granule);

        pair p:  x = (clen + 2p + i) % 3 − 1, y = (clen + 3p + g) % 3 − 1
        quad q:  v = (clen + 3q + i + g) % 3 − 1
                 w = (clen + 5q + 2i) % 3 − 1
                 x = (clen + 7q + 3i + g) % 3 − 1
                 y = (clen + 11q + 4i) % 3 − 1

    count1table_select = (clen + i) % 2."""
    n = clen % 4 + 2
    frames = []
    for i in range(n):
        scfsi = (7 * clen + 3 * i + 4) % 16
        fr: dict = {"scfsi": scfsi}
        for g in (0, 1):
            sfc = (clen + 3 * i + g) % 16
            slen1, slen2 = SLEN[sfc]
            sfs = []
            for b in range(21):
                width = slen1 if b < 11 else slen2
                sfs.append((clen + 3 * i + g + b) % (1 << width) if width else 0)
            np_ = (clen + 2 * i + g) % 6 + 1
            nq = (clen + i + g) % 4
            fr[f"g{g}"] = {
                "global_gain": (clen + 9 * i + 2 * g) % 256,
                "scalefac_compress": sfc,
                "preflag": (clen + i) % 2,
                "scalefac_scale": (clen + g) % 2,
                "count1table_select": (clen + i) % 2,
                "scalefactors": sfs,
                "big_pairs": [
                    ((clen + 2 * p + i) % 3 - 1, (clen + 3 * p + g) % 3 - 1)
                    for p in range(np_)
                ],
                "count1": [
                    (
                        (clen + 3 * q + i + g) % 3 - 1,
                        (clen + 5 * q + 2 * i) % 3 - 1,
                        (clen + 7 * q + 3 * i + g) % 3 - 1,
                        (clen + 11 * q + 4 * i) % 3 - 1,
                    )
                    for q in range(nq)
                ],
            }
        for gi, (lo, hi) in enumerate(_SCFSI_GROUPS):
            if (scfsi >> (3 - gi)) & 1:
                fr["g1"]["scalefactors"][lo:hi] = fr["g0"]["scalefactors"][lo:hi]
        frames.append(fr)
    return encode_mp3_granules(frames, clen % 14 + 1, 2)


# --- ID3v2.3 text frames (the tag BODY, previously opaque) ----------------
#
# The framing layer skips ID3v2 tags by their syncsafe size; this
# layer decodes what is inside — the metadata a real audio-crawl
# pipeline actually wants (title/album/artist/track). ID3v2.3 per
# the public informal standard id3.org/id3v2.3.0: 10-byte tag header
# (version 3, syncsafe total size), then frames of 4-char id +
# 4-byte PLAIN big-endian size (v2.3 — only v2.4 made frame sizes
# syncsafe) + 2 flag bytes; text frames (T***) carry an encoding
# byte then the value. Profile gates raise by name: v2.4 tags,
# unsynchronisation, extended headers, and compressed/encrypted
# frames are all outside the structure profile; encodings 0
# (ISO-8859-1) and 3 (UTF-8) decode, UTF-16 (1/2) is surfaced as
# undecoded (value None) rather than guessed.

_ID3_TEXT_ENCODINGS = {0: "latin-1", 3: "utf-8"}


def encode_id3v23(frames: list[tuple[str, str]], padding: int = 0) -> bytes:
    """ID3v2.3 tag from (frame_id, text) pairs — text frames only
    (id starting with 'T'), encoding 0 (ISO-8859-1)."""
    body = bytearray()
    for fid, text in frames:
        if len(fid) != 4 or not fid.startswith("T") or not fid.isalnum():
            raise ValueError(f"id3: {fid!r} is not a text frame id")
        payload = b"\x00" + text.encode("latin-1")
        body += fid.encode("ascii") + struct.pack(">I", len(payload))
        body += b"\x00\x00" + payload
    body += b"\x00" * padding
    n = len(body)
    if n >= 1 << 28:
        raise ValueError("id3: tag too large for syncsafe size")
    syncsafe = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    return b"ID3" + bytes([3, 0, 0]) + syncsafe + bytes(body)


def _parse_id3_frames(
    data: bytes, versions: tuple[int, ...]
) -> list[tuple[str, str | None]]:
    """Shared ID3v2.3 / v2.4 frame walk. The two on-disk differences
    are handled per the tag's OWN version byte: frame sizes are plain
    big-endian in v2.3 but SYNCSAFE in v2.4, and the format-flag
    gates live in different bits (v2.3: compression 0x80 / encryption
    0x40; v2.4: compression 0x08 / encryption 0x04 / per-frame
    unsynchronisation 0x02 / data-length-indicator 0x01). v2.4 may
    also declare a FOOTER (header flag 0x10): a 10-byte '3DI' mirror
    appended after the body, excluded from the declared size."""
    if len(data) < 3 or data[:3] != b"ID3":
        return []
    if len(data) < 10:
        raise ValueError("mp3: truncated ID3v2 header")
    version = data[3]
    if version not in versions:
        if version == 4:
            raise ValueError(
                "id3: v2.4 tags (syncsafe frame sizes) are outside the "
                "v2.3 structure profile"
            )
        raise ValueError(f"id3: unsupported ID3v2.{version} tag")
    flags = data[5]
    if flags & 0x80:
        raise ValueError("id3: unsynchronisation is outside the profile")
    if flags & 0x40:
        raise ValueError("id3: extended headers are outside the profile")
    has_footer = bool(flags & 0x10)
    if has_footer and version != 4:
        raise ValueError("id3: footers exist only in v2.4")
    if any(b & 0x80 for b in data[6:10]):
        raise ValueError("mp3: ID3v2 size bytes not syncsafe")
    size = (data[6] << 21) | (data[7] << 14) | (data[8] << 7) | data[9]
    end = 10 + size
    if end + (10 if has_footer else 0) > len(data):
        raise ValueError("mp3: ID3v2 tag overruns payload")
    if has_footer:
        foot = data[end: end + 10]
        if foot[:3] != b"3DI" or foot[3:10] != data[3:10]:
            raise ValueError("id3: footer does not mirror the header")
    out: list[tuple[str, str | None]] = []
    pos = 10
    while pos < end:
        if data[pos] == 0:
            # padding terminates the walk — but v2.4 §3.1 forbids
            # padding when a footer is present (the footer exists so
            # readers can find the tag from the END of the file, and
            # trailing padding would break that scan)
            if has_footer:
                raise ValueError(
                    "id3: v2.4 forbids padding together with a footer"
                )
            break
        if pos + 10 > end:
            raise ValueError("id3: truncated frame header")
        fid = data[pos: pos + 4]
        if not all(65 <= b <= 90 or 48 <= b <= 57 for b in fid):
            raise ValueError(f"id3: invalid frame id {fid!r}")
        if version == 4:
            if any(b & 0x80 for b in data[pos + 4: pos + 8]):
                raise ValueError("id3: v2.4 frame size bytes not syncsafe")
            fsize = (
                (data[pos + 4] << 21) | (data[pos + 5] << 14)
                | (data[pos + 6] << 7) | data[pos + 7]
            )
        else:
            (fsize,) = struct.unpack(">I", data[pos + 4: pos + 8])
        fflags = data[pos + 8: pos + 10]
        bad = fflags[1] & (0x0F if version == 4 else 0xC0)
        if bad:
            raise ValueError(
                "id3: compressed/encrypted/unsynchronised frames are "
                "outside the profile"
            )
        fstart = pos + 10
        if fstart + fsize > end:
            raise ValueError("id3: frame size overruns tag")
        name = fid.decode("ascii")
        value: str | None = None
        if name.startswith("T") and fsize >= 1:
            enc = data[fstart]
            codec = _ID3_TEXT_ENCODINGS.get(enc)
            if codec is not None:
                raw = data[fstart + 1: fstart + fsize]
                try:
                    value = raw.split(b"\x00", 1)[0].decode(codec, "strict")
                except UnicodeDecodeError as e:
                    # shared codec contract: corruption is ALWAYS a
                    # ValueError, never a task-killing exception class
                    raise ValueError(
                        f"id3: undecodable {codec} text in {name}"
                    ) from e
        out.append((name, value))
        pos = fstart + fsize
    return out


def parse_id3v23_frames(data: bytes) -> list[tuple[str, str | None]]:
    """Frame walk of a leading ID3v2.3 tag: (frame_id, text) for
    decodable text frames, (frame_id, None) for non-text frames and
    UTF-16 values; [] when no tag leads the payload. Bounds-checked
    throughout; padding terminates the walk. v2.4 tags raise by name
    (use `parse_id3_frames` for the version-dispatching walk)."""
    return _parse_id3_frames(data, (3,))


def parse_id3_frames(data: bytes) -> list[tuple[str, str | None]]:
    """Version-dispatching ID3v2 frame walk: v2.3 (plain frame sizes)
    AND v2.4 (syncsafe frame sizes, optional verified footer) decode;
    anything else raises by name."""
    return _parse_id3_frames(data, (3, 4))


def encode_id3v24(
    frames: list[tuple[str, str]], padding: int = 0, footer: bool = False
) -> bytes:
    """ID3v2.4 tag from (frame_id, text) pairs — text frames only,
    encoding 3 (UTF-8, the v2.4 addition), SYNCSAFE frame sizes, and
    an optional footer (a '3DI' mirror of the header appended after
    the body; the spec forbids padding when a footer is present —
    enforced)."""
    if footer and padding:
        raise ValueError("id3: v2.4 forbids padding together with a footer")
    body = bytearray()
    for fid, text in frames:
        if len(fid) != 4 or not fid.startswith("T") or not fid.isalnum():
            raise ValueError(f"id3: {fid!r} is not a text frame id")
        payload = b"\x03" + text.encode("utf-8")
        n = len(payload)
        if n >= 1 << 28:
            raise ValueError("id3: frame too large for syncsafe size")
        body += fid.encode("ascii") + bytes(
            [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
        )
        body += b"\x00\x00" + payload
    body += b"\x00" * padding
    n = len(body)
    if n >= 1 << 28:
        raise ValueError("id3: tag too large for syncsafe size")
    syncsafe = bytes(
        [(n >> 21) & 0x7F, (n >> 14) & 0x7F, (n >> 7) & 0x7F, n & 0x7F]
    )
    head_rest = bytes([4, 0, 0x10 if footer else 0]) + syncsafe
    out = b"ID3" + head_rest + bytes(body)
    if footer:
        out += b"3DI" + head_rest
    return out


def synth_mp3_tagged(clen: int) -> bytes:
    """Frame stream led by a REAL ID3v2.3 tag whose text frames are
    integer-predictable: TIT2 = 't' + clen % 97, TALB = 'a' +
    clen % 13, TRCK = clen % 30 + 1, plus clen % 7 padding bytes;
    audio = clen % 5 + 2 CBR frames at 32 kHz (bitrate index
    clen % 14 + 1, fill (clen + 3*i) % 251)."""
    tag = encode_id3v23(
        [
            ("TIT2", f"t{clen % 97}"),
            ("TALB", f"a{clen % 13}"),
            ("TRCK", str(clen % 30 + 1)),
        ],
        padding=clen % 7,
    )
    n = clen % 5 + 2
    frames = [
        (clen % 14 + 1, 2, 0, (clen + 3 * i) % 251) for i in range(n)
    ]
    # encode_mp3 wraps a RAW id3 payload; splice the real tag instead
    audio = encode_mp3(frames)
    return tag + audio


def synth_mp3_tagged24(clen: int) -> bytes:
    """Frame stream led by a REAL ID3v2.4 tag (the q219 oracle's
    closed forms): TIT2 = 't' + clen % 97, TALB = 'x' repeated
    clen % 64 + 128 (frame size >= 128 so the SYNCSAFE frame-size
    encoding genuinely differs from v2.3's plain big-endian),
    TRCK = clen % 30 + 1; a verified FOOTER when clen % 3 == 0 (else
    clen % 7 padding bytes); audio = clen % 5 + 2 CBR frames at
    32 kHz (bitrate index clen % 14 + 1, fill (clen + 3*i) % 251)."""
    footer = clen % 3 == 0
    tag = encode_id3v24(
        [
            ("TIT2", f"t{clen % 97}"),
            ("TALB", "x" * (clen % 64 + 128)),
            ("TRCK", str(clen % 30 + 1)),
        ],
        padding=0 if footer else clen % 7,
        footer=footer,
    )
    n = clen % 5 + 2
    frames = [
        (clen % 14 + 1, 2, 0, (clen + 3 * i) % 251) for i in range(n)
    ]
    return tag + encode_mp3(frames)
