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


# --- IMA-ADPCM (fmt tag 0x11): REAL lossy-codec sample reconstruction ------
#
# The audio analog of the I_PCM pixel notch: WAV's DVI/IMA ADPCM
# format (public IMA ADPCM spec / RFC 3551 §4.5.1 "DVI4" algorithm)
# reconstructs 16-bit samples from 4-bit nibbles through a stepped
# predictor. The two tables below ARE the whole codec — the 89-entry
# step-size table and the 8-entry index-adjustment table from the IMA
# spec — so decode is exact integer arithmetic an oracle can replay
# step by step (a recursive fold: state = (predictor, step index)).
# WAV framing per format 0x11, mono single block: a 4-byte block
# header (initial predictor int16, initial step index uint8,
# reserved) whose predictor IS the first output sample, then packed
# nibbles (low nibble first).

IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)


def ima_adpcm_step(pred: int, idx: int, nibble: int) -> tuple[int, int]:
    """One IMA decode step: (predictor, index) x nibble ->
    (new predictor, new index). Pure integer arithmetic."""
    step = IMA_STEPS[idx]
    diff = step >> 3
    if nibble & 1:
        diff += step >> 2
    if nibble & 2:
        diff += step >> 1
    if nibble & 4:
        diff += step
    pred = pred - diff if nibble & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    idx = max(0, min(88, idx + IMA_INDEX[nibble & 7]))
    return pred, idx


def encode_wav_ima(nibbles: list[int], pred0: int, idx0: int,
                   sample_rate: int) -> bytes:
    """Mono single-block IMA-ADPCM WAV carrying the given 4-bit
    nibble stream with the given initial predictor/step index (the
    block header). Nibble count must be even (two per byte, low
    nibble first, per the IMA WAV layout)."""
    if len(nibbles) % 2:
        raise ValueError("ima: nibble count must be even")
    if not -32768 <= pred0 <= 32767 or not 0 <= idx0 <= 88:
        raise ValueError("ima: block header out of range")
    if any(not 0 <= n <= 15 for n in nibbles):
        raise ValueError("ima: nibbles take values 0-15")
    data = struct.pack("<hBB", pred0, idx0, 0)
    data += bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, len(nibbles), 2)
    )
    block_align = len(data)
    # samples per block: the header sample + one per nibble
    spb = 1 + len(nibbles)
    byte_rate = sample_rate * block_align // max(spb, 1)
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate, byte_rate, block_align, 4, 2, spb
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_ima(payload: bytes) -> tuple[int, list[int]]:
    """Decode a mono single-block IMA-ADPCM WAV to
    (sample_rate, reconstructed 16-bit samples) — the block header's
    predictor is sample 0, then one decoded sample per nibble.
    Raises ValueError (never struct.error) on PCM payloads, bad
    headers, or truncation."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    try:
        while pos + 8 <= len(payload):
            cid = payload[pos: pos + 4]
            (clen,) = struct.unpack_from("<I", payload, pos + 4)
            body = payload[pos + 8: pos + 8 + clen]
            if len(body) != clen:
                raise ValueError("truncated WAV chunk body")
            if cid == b"fmt ":
                if clen < 16:
                    raise ValueError("short fmt chunk")
                fmt = struct.unpack_from("<HHIIHH", body, 0)
            elif cid == b"data":
                data = body
            pos += 8 + clen + (clen & 1)
    except struct.error as e:
        raise ValueError(f"truncated WAV chunk: {e}") from e
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag, n_channels, sample_rate, _rate, _align, bits = fmt
    if tag != 0x11:
        raise ValueError(f"unsupported WAV tag {tag}; IMA-ADPCM (0x11) only")
    if n_channels != 1 or bits != 4:
        raise ValueError("ima: mono 4-bit blocks only")
    if len(data) < 4:
        raise ValueError("ima: block shorter than its header")
    pred, idx, _res = struct.unpack_from("<hBB", data, 0)
    if idx > 88:
        raise ValueError("ima: step index out of range")
    samples = [pred]
    for byte in data[4:]:
        for nibble in (byte & 0x0F, byte >> 4):
            pred, idx = ima_adpcm_step(pred, idx, nibble)
            samples.append(pred)
    return sample_rate, samples


def synth_wav_ima(clen: int) -> bytes:
    """Closed-form IMA payload (the q217 oracle replays the predictor
    fold as a recursive CTE): pred0 = (clen*37) % 1024 - 512,
    idx0 = clen % 89, 64 nibbles n_i = (clen + 3i + i//7) % 16,
    sample rate 8000 + 100*(clen % 5)."""
    nibbles = [(clen + 3 * i + i // 7) % 16 for i in range(64)]
    return encode_wav_ima(
        nibbles, (clen * 37) % 1024 - 512, clen % 89,
        8000 + 100 * (clen % 5),
    )


# --- G.711 mu-law / A-law (fmt tags 7 / 6): telephony companding ------------
#
# The codec every PSTN/VoIP crawl actually contains. Unlike the
# Huffman-table seams (MP3/AAC), G.711's mapping is GENERATED by a
# short segment algorithm — 8 logarithmic segments of 16 steps, sign
# + 3-bit exponent + 4-bit mantissa — so there is no codebook to
# carry: the algebra below is the classic public-domain Sun g711.c
# formulation of ITU-T G.711. In-container conformance limits are
# documented honestly: no reference test vectors ship here, so what
# the tests pin is (a) ENCODE∘DECODE is the identity on all 256 codes
# of both laws EXCEPT mu-law's negative zero — 0x7F decodes to 0,
# which canonically re-encodes as 0xFF (the one two-codes-one-value
# seam in true G.711; the q231 workload and tests pin it by name) —
# (a property strong enough that a mis-remembered constant breaks
# it), (b) quantization error
# is bounded by the segment step size everywhere, and (c) the SQL
# oracle replays the same algebra independently.

_ULAW_BIAS = 0x84  # 132
_ULAW_CLIP = 32635
_ALAW_SEG_END = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]


def linear2ulaw(s: int) -> int:
    """16-bit linear sample -> 8-bit mu-law code."""
    sign = 0x80 if s < 0 else 0x00
    mag = -s if s < 0 else s
    mag = min(mag, _ULAW_CLIP) + _ULAW_BIAS
    exponent = (mag >> 7).bit_length() - 1  # mag >= BIAS -> >= 0; CLIP -> <= 7
    mantissa = (mag >> (exponent + 3)) & 0x0F
    return (~(sign | (exponent << 4) | mantissa)) & 0xFF


def ulaw2linear(code: int) -> int:
    """8-bit mu-law code -> 16-bit linear sample."""
    u = (~code) & 0xFF
    exponent = (u >> 4) & 7
    mantissa = u & 0x0F
    mag = (((mantissa << 3) + _ULAW_BIAS) << exponent) - _ULAW_BIAS
    return -mag if u & 0x80 else mag


def linear2alaw(s: int) -> int:
    """16-bit linear sample -> 8-bit A-law code."""
    pcm = s >> 3  # 16 -> 13 bit (arithmetic shift)
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    seg = 8
    for i, end in enumerate(_ALAW_SEG_END):
        if pcm <= end:
            seg = i
            break
    if seg >= 8:  # out of range -> clip to the top code
        return 0x7F ^ mask
    aval = seg << 4
    aval |= (pcm >> 1) & 0x0F if seg < 2 else (pcm >> seg) & 0x0F
    return aval ^ mask


def alaw2linear(code: int) -> int:
    """8-bit A-law code -> 16-bit linear sample."""
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if a & 0x80 else -t


def encode_wav_g711(
    samples: list[int], sample_rate: int, law: str
) -> bytes:
    """RIFF/WAVE with fmt tag 7 (mu-law) or 6 (A-law), 8 bits per
    sample, mono: the real container shape telephony recordings use."""
    if law == "ulaw":
        tag, comp = 7, linear2ulaw
    elif law == "alaw":
        tag, comp = 6, linear2alaw
    else:
        raise ValueError(f"unknown law {law!r}")
    data = bytes(comp(s) for s in samples)
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_g711(payload: bytes) -> tuple[str, int, list[int], list[int]]:
    """Parse a G.711 WAV -> (law, sample_rate, raw 8-bit codes,
    reconstructed 16-bit samples). Chunk walk mirrors decode_wav;
    fmt tags 6/7 only."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt_seen, law, sr = 12, False, "", 0
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        if pos + 8 + clen > len(payload):
            raise ValueError(
                f"chunk {cid!r} declares {clen} bytes past EOF (truncated?)"
            )
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            tag, nch, sr, _br, _ba, bps = struct.unpack_from("<HHIIHH", body, 0)
            if tag not in (6, 7):
                raise ValueError(f"not a G.711 WAV (fmt tag {tag})")
            if nch != 1 or bps != 8:
                raise ValueError("only mono 8-bit G.711 supported")
            law = "alaw" if tag == 6 else "ulaw"
            fmt_seen = True
        elif cid == b"data":
            if not fmt_seen:
                raise ValueError("data chunk before fmt")
            expand = alaw2linear if law == "alaw" else ulaw2linear
            return law, sr, list(body), [expand(b) for b in body]
        pos += 8 + clen + (clen & 1)  # RIFF chunks are word-aligned
    raise ValueError("no data chunk")


def synth_g711_samples(clen: int) -> list[int]:
    """Deterministic full-range 16-bit wave (closed form for the SQL
    oracle): covers both signs and all magnitude segments."""
    n = clen % 49 + 16
    return [((clen * 31 + 7 * k * k + 13 * k) % 65536) - 32768 for k in range(n)]


def synth_wav_g711(clen: int) -> bytes:
    """Corpus payload: law alternates per doc, sample rate cycles the
    classic telephony set."""
    law = "ulaw" if clen % 2 == 0 else "alaw"
    sr = 8000 + 8000 * (clen % 2)
    return encode_wav_g711(synth_g711_samples(clen), sr, law)
