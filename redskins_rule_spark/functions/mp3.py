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
    if 10 + size > len(data):
        raise ValueError("mp3: ID3v2 tag overruns payload")
    return 10 + size


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
