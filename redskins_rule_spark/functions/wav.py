"""Pure-Python RIFF/WAVE PCM16 codec (no audio library needed).

Companion to `functions/bmp.py`: gives the multimodal audio path a
REAL decode target in a container with no codec libraries. Only
uncompressed PCM (format tag 1), 16-bit samples, is supported — the
universal lowest common denominator for WAV.

Layout written/parsed (44-byte canonical header):
  RIFF <size> WAVE
  fmt  chunk: tag=1 (PCM), channels, sample_rate, byte_rate,
              block_align, bits_per_sample=16
  data chunk: little-endian int16 frames, channel-interleaved

The decoder walks chunks (tolerates extra chunks before `data`), so it
also reads WAV files produced by other writers.

Reference capability mapping: the reference pipeline has no media
columns at all; this backs the north-star multimodal surface
(SURVEY.md §8.2) where audio is an opaque binary column decoded by
Arrow-batched pandas functions.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass


@dataclass(frozen=True)
class WavMeta:
    sample_rate: int
    n_channels: int
    n_samples: int  # frames per channel
    bits_per_sample: int

    @property
    def duration_ms(self) -> int:
        return self.n_samples * 1000 // self.sample_rate


def encode_wav(samples: list[int], sample_rate: int, n_channels: int = 1) -> bytes:
    """PCM16 WAV bytes from channel-interleaved int samples (each in
    [-32768, 32767]); len(samples) must be a multiple of n_channels."""
    if n_channels < 1:
        raise ValueError("n_channels must be >= 1")
    if len(samples) % n_channels:
        raise ValueError("len(samples) not a multiple of n_channels")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * n_channels
    byte_rate = sample_rate * block_align
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(payload: bytes) -> tuple[WavMeta, list[int]]:
    """Parse WAV bytes -> (meta, interleaved samples). Raises
    ValueError on anything that is not PCM16 RIFF/WAVE."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    try:
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8 : pos + 8 + clen]
            if cid == b"fmt ":
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    except struct.error as e:  # truncated chunk must not leak struct.error
        raise ValueError(f"truncated WAV chunk: {e}") from e
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_channels, sample_rate, _rate, _align, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(f"unsupported WAV (tag={tag}, bits={bits}); PCM16 only")
    n = len(data) // 2
    samples = list(struct.unpack(f"<{n}h", data[: n * 2]))
    meta = WavMeta(sample_rate, n_channels, n // max(n_channels, 1), bits)
    return meta, samples


def synth_samples(seed: int, n: int) -> list[int]:
    """Deterministic pseudo-audio used by the payload generator AND
    reproducible by integer arithmetic on the oracle side:
    s_i = ((seed + 31*i) mod 65536) - 32768."""
    return [((seed + 31 * i) % 65536) - 32768 for i in range(n)]
