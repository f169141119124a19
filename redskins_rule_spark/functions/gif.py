"""Pure-Python animated-GIF (GIF89a) codec — the video modality's real
decode target, completing the BMP (image) / WAV (audio) codec family
for a container with no media libraries.

Scope: grayscale-palette GIF89a with one global color table, an
optional per-frame graphic-control extension carrying the frame delay,
and LZW-coded 8-bit indexed frames. Both directions are implemented:

  * `encode_gif(frames, delay_cs)` — LZW with the standard
    emit-literals + periodic CLEAR strategy (dictionary never grows
    past 9-bit codes; simple, spec-valid, ~20% larger than optimal).
  * `decode_gif(payload)` — full LZW decode, block-walking parser
    (tolerates extensions it does not know).
  * `decode_gif_meta(payload)` — header/descriptor walk ONLY: frame
    count, dimensions, delays, without decompressing pixel data —
    the cheap path for metadata extraction over billions of payloads.

LZW per GIF89a spec (CompuServe): initial code size 8 (palette 256),
9-bit codes, CLEAR=256, EOI=257, codes packed little-endian into
255-byte sub-blocks.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_CLEAR = 256
_EOI = 257
_CODE_BITS = 9


@dataclass(frozen=True)
class GifMeta:
    width: int
    height: int
    n_frames: int
    delays_cs: tuple[int, ...]  # per-frame delay, centiseconds

    @property
    def duration_cs(self) -> int:
        return sum(self.delays_cs)


class _BitPacker:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += _CODE_BITS
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _lzw_encode(pixels: bytes) -> bytes:
    """Literal-code LZW: CLEAR, then raw byte codes, re-CLEARing every
    254 literals so the decoder's growing dictionary never forces the
    code width past 9 bits. Spec-valid output, trivially correct."""
    p = _BitPacker()
    p.put(_CLEAR)
    count = 0
    for b in pixels:
        p.put(b)
        count += 1
        if count == 254:
            p.put(_CLEAR)
            count = 0
    p.put(_EOI)
    return p.flush()


def _lzw_decode(data: bytes, expected: int) -> bytes:
    """Standard GIF LZW decoder (variable code width, dictionary
    rebuild on CLEAR); stops after `expected` pixels or EOI."""
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    code_bits = _CODE_BITS
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= code_bits:
            code = acc & ((1 << code_bits) - 1)
            acc >>= code_bits
            nbits -= code_bits
            if code == _CLEAR:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                code_bits = _CODE_BITS
                prev = None
                continue
            if code == _EOI:
                return bytes(out)
            if code < len(table) and (code < 256 or table[code]):
                entry = table[code]
            elif prev is not None:
                entry = prev + prev[:1]
            else:
                raise ValueError("corrupt LZW stream")
            out += entry
            if prev is not None:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_bits) and code_bits < 12:
                    code_bits += 1
            prev = entry
            if len(out) >= expected:
                return bytes(out)
    return bytes(out)


def _sub_blocks(data: bytes) -> bytes:
    """Wrap raw bytes into <=255-byte length-prefixed sub-blocks."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _interlace_rows(height: int) -> list[int]:
    """GIF89a Appendix E row order: pass 1 rows 0,8,…; pass 2 rows
    4,12,…; pass 3 rows 2,6,…; pass 4 rows 1,3,…"""
    rows: list[int] = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        rows.extend(range(start, height, step))
    return rows


def encode_gif(
    frames: list[bytes],
    width: int,
    height: int,
    delay_cs: int = 4,
    interlace: bool = False,
) -> bytes:
    """GIF89a bytes from 8-bit grayscale frames (each `width*height`
    palette-index bytes; palette i -> rgb(i,i,i)). With
    `interlace=True` each frame's rows are stored in the Appendix E
    four-pass order and the descriptor's interlace flag is set."""
    for i, f in enumerate(frames):
        if len(f) != width * height:
            raise ValueError(f"frame {i}: {len(f)} bytes != {width}*{height}")
    if not frames:
        raise ValueError("need at least one frame")
    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 256 entries, 8-bit
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    # netscape looping extension (standard for animation)
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        if interlace:
            f = b"".join(
                f[r * width: (r + 1) * width] for r in _interlace_rows(height)
            )
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
        )
        out.append(8)  # LZW minimum code size
        out += _sub_blocks(_lzw_encode(f))
    out += b"\x3b"
    return bytes(out)


def _walk(payload: bytes, want_pixels: bool):
    if len(payload) < 13 or payload[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF payload")
    try:
        return _walk_inner(payload, want_pixels)
    except (struct.error, IndexError) as e:
        # A truncated extension/descriptor/sub-block must surface as the
        # documented ValueError, not kill the task with struct.error.
        raise ValueError(f"truncated GIF payload: {e}") from e


def _walk_inner(payload: bytes, want_pixels: bool):
    width, height, flags = struct.unpack_from("<HHB", payload, 6)
    pos = 13
    if flags & 0x80:  # global color table
        pos += 3 * (2 << (flags & 0x07))
    delays: list[int] = []
    frames: list[bytes] = []
    pending_delay = 0
    saw_trailer = False
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            saw_trailer = True
            break
        if b == 0x21:  # extension
            label = payload[pos + 1]
            pos += 2
            if label == 0xF9 and payload[pos] >= 4:
                (pending_delay,) = struct.unpack_from("<H", payload, pos + 2)
            while payload[pos]:  # skip sub-blocks
                pos += payload[pos] + 1
            pos += 1
        elif b == 0x2C:  # image descriptor
            _, _, fw, fh, lflags = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos += 1  # LZW min code size
            data = bytearray()
            while payload[pos]:
                n = payload[pos]
                data += payload[pos + 1 : pos + 1 + n]
                pos += n + 1
            pos += 1
            delays.append(pending_delay)
            pending_delay = 0
            if want_pixels:
                px = _lzw_decode(bytes(data), fw * fh)
                if lflags & 0x40:  # interlaced: undo the 4-pass row order
                    out_px = bytearray(len(px))
                    for i, r in enumerate(_interlace_rows(fh)):
                        out_px[r * fw: (r + 1) * fw] = px[i * fw: (i + 1) * fw]
                    px = bytes(out_px)
                frames.append(px)
            else:
                frames.append(b"")
        else:
            raise ValueError(f"unknown GIF block 0x{b:02x} at {pos}")
    if not saw_trailer:
        # Payload ended before the 0x3B trailer — a mid-color-table or
        # mid-stream cut would otherwise read as a valid 0-frame GIF.
        raise ValueError("truncated GIF payload: missing trailer")
    meta = GifMeta(width, height, len(frames), tuple(delays))
    return meta, frames


def decode_gif_meta(payload: bytes) -> GifMeta:
    """Frame count / dimensions / delays WITHOUT LZW decompression."""
    meta, _ = _walk(payload, want_pixels=False)
    return meta


def decode_gif(payload: bytes) -> tuple[GifMeta, list[bytes]]:
    """Full decode: (meta, list of width*height grayscale frames)."""
    return _walk(payload, want_pixels=True)


def synth_frames(seed: int, n_frames: int, width: int, height: int) -> list[bytes]:
    """Deterministic pseudo-video reproducible by integer arithmetic:
    frame f pixel (y, x) = (seed + 7*f + 3*y + x) % 256."""
    return [
        bytes(
            (seed + 7 * f + 3 * y + x) % 256
            for y in range(height)
            for x in range(width)
        )
        for f in range(n_frames)
    ]
