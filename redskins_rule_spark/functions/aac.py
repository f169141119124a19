"""ADTS/AAC framing layer (public ISO/IEC 14496-3 §1.A.2.2 — the
Audio Data Transport Stream header that wraps raw AAC in standalone
.aac files and broadcast streams).

The AAC analog of functions/mp3.py's framing layer: every field of
the 7-byte (9 with CRC) fixed+variable ADTS header is really encoded
and really decoded — syncword, MPEG-4/2 ID, profile (AudioObjectType
− 1), the sampling-frequency index table, channel configuration, the
13-bit frame length (which INCLUDES the header, unlike MP3's
formula-derived length), buffer fullness, and the
raw-data-blocks-per-frame count (1024 samples per block, which is
what makes duration integer-predictable). Frame payloads — the raw
AAC access units — stay opaque BY DESIGN: spectral decode
(scalefactor bands, spectral Huffman, TNS, the MDCT bank) is the
documented seam, exactly like MP3's Table B.7 layer. When
protection_absent is 0 the 16-bit CRC field is parsed and surfaced
but not verified (verification is optional per the spec and belongs
to the seam).

Corruption contract: truncation at any non-frame-boundary byte, a
broken syncword, a reserved sampling-frequency index, channel
config 0, or a declared frame length that disagrees with the header
size / runs past the payload raises ValueError — the shared codec
contract of functions/.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

# index 0-12 per ISO 14496-3 Table 1.18; 13/14 reserved, 15 escape
SAMPLE_RATES_AAC = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)
SAMPLES_PER_BLOCK = 1024


@dataclass(frozen=True)
class AdtsFrame:
    profile: int  # AudioObjectType - 1: 0=Main, 1=LC, 2=SSR, 3=LTP
    sr_idx: int
    channels: int
    frame_length: int  # header included, per the 13-bit field
    n_blocks: int  # raw_data_blocks_in_frame (1..4)
    crc_present: bool
    payload: bytes  # the opaque raw AAC access unit(s) — the seam


@dataclass(frozen=True)
class AdtsMeta:
    frames: tuple[AdtsFrame, ...]

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATES_AAC[self.frames[0].sr_idx]

    @property
    def n_samples(self) -> int:
        return sum(f.n_blocks for f in self.frames) * SAMPLES_PER_BLOCK

    @property
    def duration_ms(self) -> int:
        return self.n_samples * 1000 // self.sample_rate


def encode_adts(
    frames: list[tuple[int, int, int, bytes]],
    crc_present: bool = False,
) -> bytes:
    """frames: (profile 0-3, sr_idx 0-12, channels 1-7, payload).
    One raw data block per frame (the overwhelmingly common layout);
    all frames must share sr_idx (one stream, one clock). With
    crc_present the 16-bit CRC field is emitted as zero — parsers
    skip it (verification is spec-optional and seam-side here)."""
    if not frames:
        raise ValueError("adts: at least one frame required")
    sr0 = frames[0][1]
    out = bytearray()
    hdr_len = 9 if crc_present else 7
    for profile, sr_idx, channels, payload in frames:
        if not 0 <= profile <= 3:
            raise ValueError("adts: profile out of range")
        if not 0 <= sr_idx <= 12:
            raise ValueError("adts: reserved sampling-frequency index")
        if sr_idx != sr0:
            raise ValueError("adts: mixed sampling-frequency indices")
        if not 1 <= channels <= 7:
            raise ValueError("adts: channel configuration out of range")
        flen = hdr_len + len(payload)
        if flen >= 1 << 13:
            raise ValueError("adts: frame length exceeds 13 bits")
        # fixed header: FFF | ID=0 (MPEG-4) | layer=00 | protection_absent
        b1 = 0xF0 | (0 << 3) | (0 << 1) | (0 if crc_present else 1)
        b2 = (profile << 6) | (sr_idx << 2) | (0 << 1) | (channels >> 2)
        # variable header: frame_length(13) | fullness(11)=0x7FF (VBR)
        # | raw_data_blocks_minus1(2)=0
        b3 = ((channels & 3) << 6) | (0 << 5) | (0 << 4) | (0 << 3) | (
            0 << 2
        ) | ((flen >> 11) & 3)
        b4 = (flen >> 3) & 0xFF
        b5 = ((flen & 7) << 5) | 0x1F
        b6 = (0x3F << 2) | 0
        out += bytes([0xFF, b1, b2, b3, b4, b5, b6])
        if crc_present:
            out += struct.pack(">H", 0)
        out += payload
    return bytes(out)


def parse_adts(data: bytes) -> AdtsMeta:
    """Strict ADTS frame walk: validate every header field, slice
    each frame's payload by the DECLARED 13-bit length (bounds-
    checked against the stream), stop cleanly at end-of-stream — a
    prefix ending exactly on a frame boundary is a valid shorter
    stream, the same format-faithful truncation contract as MP3."""
    if not data:
        raise ValueError("adts: empty payload")
    frames = []
    pos = 0
    sr0 = None
    while pos < len(data):
        if pos + 7 > len(data):
            raise ValueError("adts: truncated header")
        h = data[pos: pos + 7]
        if h[0] != 0xFF or (h[1] & 0xF0) != 0xF0:
            raise ValueError("adts: bad syncword")
        if (h[1] >> 3) & 1:
            raise ValueError("adts: MPEG-2 AAC (ID=1) outside profile")
        if (h[1] >> 1) & 3:
            raise ValueError("adts: layer bits must be 00")
        crc_present = not (h[1] & 1)
        profile = h[2] >> 6
        sr_idx = (h[2] >> 2) & 0xF
        if sr_idx > 12:
            raise ValueError("adts: reserved sampling-frequency index")
        if sr0 is None:
            sr0 = sr_idx
        elif sr_idx != sr0:
            raise ValueError("adts: sampling-frequency index changed mid-stream")
        channels = ((h[2] & 1) << 2) | (h[3] >> 6)
        if channels == 0:
            raise ValueError(
                "adts: channel_configuration 0 (config in PCE) outside profile"
            )
        flen = ((h[3] & 3) << 11) | (h[4] << 3) | (h[5] >> 5)
        n_blocks = (h[6] & 3) + 1
        hdr_len = 9 if crc_present else 7
        if flen < hdr_len:
            raise ValueError("adts: frame length smaller than its header")
        if pos + flen > len(data):
            raise ValueError("adts: frame length overruns payload")
        if crc_present and pos + 9 > len(data):
            raise ValueError("adts: truncated CRC")
        frames.append(
            AdtsFrame(
                profile=profile,
                sr_idx=sr_idx,
                channels=channels,
                frame_length=flen,
                n_blocks=n_blocks,
                crc_present=crc_present,
                payload=data[pos + hdr_len: pos + flen],
            )
        )
        pos += flen
    return AdtsMeta(frames=tuple(frames))


def synth_adts(clen: int) -> bytes:
    """ADTS stream derived from a character length, every header
    field integer-predictable:

      n = clen % 9 + 2 frames; profile clen % 4; sr_idx clen % 13;
      channels clen % 7 + 1; CRC present when clen % 5 == 0;
      frame i payload: (clen + 5*i) % 37 + 1 bytes of fill
      (clen + 11*i) % 251 (payload byte values never matter to the
      header walk — they are the documented raw-AAC seam)."""
    n = clen % 9 + 2
    crc = clen % 5 == 0
    frames = [
        (
            clen % 4,
            clen % 13,
            clen % 7 + 1,
            bytes([(clen + 11 * i) % 251]) * ((clen + 5 * i) % 37 + 1),
        )
        for i in range(n)
    ]
    return encode_adts(frames, crc_present=crc)


# --- MP4 esds / AudioSpecificConfig (out-of-band AAC config) --------------
#
# The AAC counterpart of the avcC layer: inside MP4, AAC carries no
# ADTS headers — the decoder config rides the stsd mp4a entry's esds
# box as an MPEG-4 Systems descriptor chain (ES_Descriptor ->
# DecoderConfigDescriptor -> DecoderSpecificInfo) whose payload is
# the bit-packed AudioSpecificConfig (ISO 14496-3 §1.6.2.1). Both
# the descriptor walk (7-bit continuation lengths) and the
# bit-packed config are pure structure — really encoded, really
# decoded; the raw access units in mdat remain the spectral seam.


@dataclass(frozen=True)
class AudioConfig:
    audio_object_type: int  # 1=Main, 2=LC, 3=SSR, 4=LTP
    sr_idx: int
    channels: int

    @property
    def sample_rate(self) -> int:
        return SAMPLE_RATES_AAC[self.sr_idx]


def encode_audio_specific_config(
    audio_object_type: int, sr_idx: int, channels: int
) -> bytes:
    """AudioSpecificConfig: AOT(5) + freqIdx(4) + channelConfig(4) +
    GASpecificConfig (frameLength/dependsOnCore/extension = 0) —
    2 bytes for the GA profile family."""
    if not 1 <= audio_object_type <= 4:
        raise ValueError("aac: audioObjectType outside the GA profile family")
    if not 0 <= sr_idx <= 12:
        raise ValueError("aac: reserved sampling-frequency index")
    if not 1 <= channels <= 7:
        raise ValueError("aac: channel configuration out of range")
    bits = (
        (audio_object_type << 11) | (sr_idx << 7) | (channels << 3) | 0
    )
    return bits.to_bytes(2, "big")


def parse_audio_specific_config(data: bytes) -> AudioConfig:
    if len(data) < 2:
        raise ValueError("aac: truncated AudioSpecificConfig")
    bits = int.from_bytes(data[:2], "big")
    aot = bits >> 11
    sr_idx = (bits >> 7) & 0xF
    channels = (bits >> 3) & 0xF
    if aot == 31 or sr_idx == 15:
        raise ValueError(
            "aac: escape-coded AOT/frequency outside the GA structure profile"
        )
    if not 1 <= aot <= 4:
        raise ValueError("aac: audioObjectType outside the GA profile family")
    if sr_idx > 12:
        raise ValueError("aac: reserved sampling-frequency index")
    if not 1 <= channels <= 7:
        raise ValueError("aac: channel configuration out of range")
    return AudioConfig(
        audio_object_type=aot, sr_idx=sr_idx, channels=channels
    )


def _desc(tag: int, body: bytes) -> bytes:
    """MPEG-4 Systems descriptor with minimal-length encoding."""
    size = len(body)
    lenbytes = bytearray()
    lenbytes.append(size & 0x7F)
    size >>= 7
    while size:
        lenbytes.insert(0, 0x80 | (size & 0x7F))
        size >>= 7
    return bytes([tag]) + bytes(lenbytes) + body


def _read_desc(data: bytes, pos: int) -> tuple[int, int, int]:
    """(tag, body_start, body_end) of the descriptor at pos; the
    7-bit continuation length is capped at 4 bytes per the spec."""
    if pos >= len(data):
        raise ValueError("aac: truncated descriptor tag")
    tag = data[pos]
    pos += 1
    size = 0
    for i in range(4):
        if pos >= len(data):
            raise ValueError("aac: truncated descriptor length")
        b = data[pos]
        pos += 1
        size = (size << 7) | (b & 0x7F)
        if not b & 0x80:
            break
    else:
        raise ValueError("aac: descriptor length exceeds 4 bytes")
    if pos + size > len(data):
        raise ValueError("aac: descriptor body overruns esds")
    return tag, pos, pos + size


def encode_esds(config: bytes, es_id: int = 1) -> bytes:
    """esds BOX body (version/flags + ES_Descriptor chain): the
    DecoderConfigDescriptor declares MPEG-4 Audio (OTI 0x40,
    streamType 5) and wraps `config` (an AudioSpecificConfig) in
    DecoderSpecificInfo; SLConfig predefined=2 closes the chain."""
    dsi = _desc(0x05, config)
    dcd = _desc(
        0x04,
        bytes([0x40, (5 << 2) | 1]) + b"\x00\x00\x00"  # OTI, stream, buf
        + b"\x00\x00\x00\x00" * 2  # max/avg bitrate
        + dsi,
    )
    sl = _desc(0x06, b"\x02")
    es = _desc(0x03, struct.pack(">HB", es_id, 0) + dcd + sl)
    return b"\x00\x00\x00\x00" + es  # fullbox version/flags


def parse_esds(body: bytes) -> AudioConfig:
    """Walk the descriptor chain of an esds box body down to the
    AudioSpecificConfig. Strict: wrong tags, OTI other than MPEG-4
    Audio, and any length inconsistency raise ValueError."""
    if len(body) < 4:
        raise ValueError("aac: truncated esds fullbox header")
    tag, b, e = _read_desc(body, 4)
    if tag != 0x03:
        raise ValueError("aac: esds must start with an ES_Descriptor")
    if e - b < 3:
        raise ValueError("aac: truncated ES_Descriptor")
    flags = body[b + 2]
    pos = b + 3
    if flags & 0x80:
        pos += 2  # dependsOn_ES_ID
    if flags & 0x40:
        if pos >= e:
            raise ValueError("aac: truncated URL descriptor")
        pos += 1 + body[pos]
    if flags & 0x20:
        pos += 2  # OCR_ES_ID
    tag, b2, e2 = _read_desc(body, pos)
    if tag != 0x04:
        raise ValueError("aac: expected DecoderConfigDescriptor")
    if e2 - b2 < 13:
        raise ValueError("aac: truncated DecoderConfigDescriptor")
    if body[b2] != 0x40:
        raise ValueError(
            f"aac: objectTypeIndication 0x{body[b2]:02x} is not MPEG-4 Audio"
        )
    tag, b3, e3 = _read_desc(body, b2 + 13)
    if tag != 0x05:
        raise ValueError("aac: expected DecoderSpecificInfo")
    return parse_audio_specific_config(body[b3:e3])


# --- raw_data_block structure layer: silent SCEs (zero codebooks) ---------
#
# The AAC counterpart of MP3's silence granules (q203): a
# single_channel_element whose every section selects the ZERO
# codebook (sect_cb = 0) transmits NO scalefactor data and NO
# spectral data (ISO/IEC 14496-3 §4.4.2 / 13818-7 §6.3: zero-codebook
# bands skip both), so the ENTIRE element is fixed-width fields plus
# the section-run structure — decodable with zero Huffman tables.
# Everything here is really encoded and really decoded: the
# raw_data_block element walk (id_syn_ele until ID_END), the SCE's
# instance tag and global gain, ics_info for long windows, and
# section_data with its 5-bit escape runs (max_sfb > 31 exercises the
# escape). What remains of the AAC seam after this layer is exactly
# the scalefactor + spectral Huffman codebooks (any nonzero sect_cb,
# short-window grouping, and the float reconstruction) — raised by
# name. FIL elements are walked by their declared count.

_AAC_ID_SCE, _AAC_ID_FIL, _AAC_ID_END = 0, 6, 7


@dataclass(frozen=True)
class AacSilentSce:
    instance_tag: int
    global_gain: int
    window_sequence: int
    window_shape: int
    max_sfb: int
    sections: tuple[tuple[int, int], ...]  # (sect_cb, sect_len) runs,
    # concatenated across window groups for EIGHT_SHORT_SEQUENCE
    # scale_factor_grouping (7 bits, MSB = window 1) for short
    # windows; None for long
    grouping: int | None = None

    @property
    def n_groups(self) -> int:
        """Window groups: 1 for long; for EIGHT_SHORT_SEQUENCE a new
        group starts at every ZERO grouping bit (bit i covers window
        i+1), so n = 1 + zero-bit count."""
        if self.grouping is None:
            return 1
        return 1 + sum(
            1 for i in range(7) if not (self.grouping >> (6 - i)) & 1
        )


class _AacBits:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > 8 * len(self.data):
            raise ValueError("aac: bit field overruns raw_data_block")
        v = 0
        p = self.pos
        for _ in range(n):
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = end
        return v


class _AacBitsOut:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, n: int) -> None:
        if value < 0 or value >= (1 << n):
            raise ValueError(f"aac: field value {value} exceeds {n} bits")
        for i in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc = 0
                self._n = 0

    def pad_to_byte(self) -> bytes:
        if self._n:
            self.write(0, 8 - self._n)
        return bytes(self.buf)


def encode_aac_silent_block(sces: list[dict]) -> bytes:
    """One byte-aligned raw_data_block of silent SCEs + ID_END. Each
    sce dict: instance_tag (0-15), global_gain (0-255), window_shape
    (0/1), n_sections (runs splitting max_sfb as-evenly-as-possible,
    every run ZERO codebook), and EITHER long windows
    (window_sequence absent/0, max_sfb 1-49, 5-bit section escapes)
    OR EIGHT_SHORT_SEQUENCE (window_sequence = 2, max_sfb 1-15,
    grouping = 7-bit scale_factor_grouping, section data PER WINDOW
    GROUP with 3-bit escapes — the §8.3.4 short-window layout)."""
    w = _AacBitsOut()
    for sce in sces:
        max_sfb = sce["max_sfb"]
        ns = sce["n_sections"]
        wseq = sce.get("window_sequence", 0)
        if not 1 <= ns <= max_sfb:
            raise ValueError("aac: n_sections must be in [1, max_sfb]")
        w.write(_AAC_ID_SCE, 3)
        w.write(sce["instance_tag"], 4)
        w.write(sce["global_gain"], 8)
        w.write(0, 1)              # ics_reserved_bit
        w.write(wseq, 2)           # window_sequence
        w.write(sce["window_shape"], 1)
        if wseq == 2:
            if not 1 <= max_sfb <= 15:
                raise ValueError(
                    "aac: short-window max_sfb is a 4-bit field"
                )
            grouping = sce["grouping"]
            w.write(max_sfb, 4)
            w.write(grouping, 7)   # scale_factor_grouping
            n_groups = 1 + sum(
                1 for i in range(7) if not (grouping >> (6 - i)) & 1
            )
            sect_bits, esc = 3, 7
        else:
            w.write(max_sfb, 6)
            w.write(0, 1)          # predictor_data_present
            n_groups = 1
            sect_bits, esc = 5, 31
        # section_data: per group, runs of (cb=0, len) with escapes
        base, rem = divmod(max_sfb, ns)
        for _g in range(n_groups):
            for s in range(ns):
                run = base + (1 if s < rem else 0)
                w.write(0, 4)      # sect_cb = ZERO_HCB
                left = run
                while left >= esc:
                    w.write(esc, sect_bits)
                    left -= esc
                w.write(left, sect_bits)
        w.write(0, 1)              # pulse_data_present
        w.write(0, 1)              # tns_data_present
        w.write(0, 1)              # gain_control_data_present
        # zero-codebook bands: no scale_factor_data, no spectral_data
    w.write(_AAC_ID_END, 3)
    return w.pad_to_byte()


def parse_aac_silent_block(payload: bytes) -> list[AacSilentSce]:
    """Decode a raw_data_block of silent SCEs. Profile gates raise by
    name: any nonzero sect_cb (scalefactor + spectral Huffman — the
    codebook seam), short/mixed windows (grouped scalefactor layout),
    predictor/pulse/TNS/gain-control side data, and element types
    other than SCE/FIL/END."""
    br = _AacBits(payload)
    out: list[AacSilentSce] = []
    while True:
        ele = br.read(3)
        if ele == _AAC_ID_END:
            break
        if ele == _AAC_ID_FIL:
            cnt = br.read(4)
            if cnt == 15:
                cnt += br.read(8) - 1
            for _ in range(cnt):
                br.read(8)
            continue
        if ele != _AAC_ID_SCE:
            raise ValueError(
                f"aac: element type {ele} is outside the silent-SCE "
                "structure profile"
            )
        tag = br.read(4)
        gain = br.read(8)
        if br.read(1):
            raise ValueError("aac: ics_reserved_bit must be 0")
        wseq = br.read(2)
        wshape = br.read(1)
        grouping: int | None = None
        if wseq == 2:
            # EIGHT_SHORT_SEQUENCE (§8.3.4): 4-bit max_sfb, 7-bit
            # scale_factor_grouping, section data PER WINDOW GROUP
            # with 3-bit length escapes
            max_sfb = br.read(4)
            grouping = br.read(7)
            n_groups = 1 + sum(
                1 for i in range(7) if not (grouping >> (6 - i)) & 1
            )
            sect_bits, esc = 3, 7
        else:
            max_sfb = br.read(6)
            if br.read(1):
                raise ValueError(
                    "aac: predictor data is outside the structure profile"
                )
            n_groups = 1
            sect_bits, esc = 5, 31
        sections: list[tuple[int, int]] = []
        for _g in range(n_groups):
            k = 0
            while k < max_sfb:
                cb = br.read(4)
                sect_len = 0
                while True:
                    incr = br.read(sect_bits)
                    sect_len += incr
                    if incr != esc:
                        break
                if sect_len == 0:
                    raise ValueError("aac: zero-length section run")
                if cb != 0:
                    raise ValueError(
                        f"aac: sect_cb {cb} needs the scalefactor + "
                        "spectral Huffman codebooks — outside the "
                        "silent-SCE profile (codebook seam)"
                    )
                sections.append((cb, sect_len))
                k += sect_len
            if k != max_sfb:
                raise ValueError("aac: section runs overrun max_sfb")
        if br.read(1):
            raise ValueError("aac: pulse data is outside the profile")
        if br.read(1):
            raise ValueError("aac: TNS data is outside the profile")
        if br.read(1):
            raise ValueError("aac: gain control is outside the profile")
        out.append(
            AacSilentSce(
                instance_tag=tag,
                global_gain=gain,
                window_sequence=wseq,
                window_shape=wshape,
                max_sfb=max_sfb,
                sections=tuple(sections),
                grouping=grouping,
            )
        )
    return out


def synth_adts_silent(clen: int) -> bytes:
    """ADTS stream whose payloads are REAL silent raw_data_blocks
    (the q214 oracle's closed forms): n = clen%6 + 2 frames, profile
    clen%4, sr_idx clen%13, mono SCE per frame; frame f's SCE has

        instance_tag  = (clen + f) % 16
        global_gain   = (clen + 3f) % 256
        window_shape  = (clen + f) % 2
        max_sfb       = (clen + 5f) % 42 + 4   (crosses 31: escape runs)
        n_sections    = (clen + f) % 3 + 1
    """
    n = clen % 6 + 2
    frames = []
    for f in range(n):
        block = encode_aac_silent_block(
            [
                {
                    "instance_tag": (clen + f) % 16,
                    "global_gain": (clen + 3 * f) % 256,
                    "window_shape": (clen + f) % 2,
                    "max_sfb": (clen + 5 * f) % 42 + 4,
                    "n_sections": (clen + f) % 3 + 1,
                }
            ]
        )
        frames.append((clen % 4, clen % 13, 1, block))
    return encode_adts(frames, crc_present=False)


def synth_adts_short(clen: int) -> bytes:
    """ADTS stream of REAL EIGHT_SHORT_SEQUENCE silent SCEs (the q224
    oracle's closed forms): n = clen%6 + 2 frames; frame f's SCE has

        instance_tag = (clen + 2f) % 16
        global_gain  = (clen + 7f) % 256
        window_shape = (clen + f) % 2
        max_sfb      = (clen + 5f) % 12 + 2    (4-bit short field)
        grouping     = (3·clen + 11·f) % 128   (7-bit, all patterns)
        n_sections   = min((clen + f) % 3 + 1, max_sfb) per group

    so window-group counts 1..8 and the 3-bit section-length escape
    (runs ≥ 7) are both exercised across the corpus."""
    n = clen % 6 + 2
    frames = []
    for f in range(n):
        max_sfb = (clen + 5 * f) % 12 + 2
        block = encode_aac_silent_block(
            [
                {
                    "instance_tag": (clen + 2 * f) % 16,
                    "global_gain": (clen + 7 * f) % 256,
                    "window_shape": (clen + f) % 2,
                    "window_sequence": 2,
                    "max_sfb": max_sfb,
                    "grouping": (3 * clen + 11 * f) % 128,
                    "n_sections": min((clen + f) % 3 + 1, max_sfb),
                }
            ]
        )
        frames.append((clen % 4, clen % 13, 1, block))
    return encode_adts(frames, crc_present=False)
