"""Pure-Python PNG codec (stdlib zlib only — no PIL needed).

Companion to `functions/bmp.py` / `wav.py` / `gif.py`: unlike those,
PNG is a genuinely COMPRESSED format (DEFLATE inside IDAT), so this
closes part of the compressed-codec boundary documented in README —
Python's built-in ``zlib`` provides inflate/deflate, and the container
always has it.

Scope: 8-bit/channel truecolor RGB (color type 2), no interlacing —
the canonical baseline every PNG writer can emit. The decoder
implements ALL five scanline filters (None/Sub/Up/Average/Paeth, PNG
spec §9) so it also reads files produced by real encoders that pick
per-row filters; the encoder emits filter 0 rows (deterministic
output, byte-exact round-trip).

Multi-IDAT payloads are concatenated per spec; chunk CRCs are
verified (a corrupt payload fails loudly as ValueError, never a
garbage image). Truncation anywhere raises ValueError per the decode
contract shared by all codecs in this package.

Reference capability mapping: the reference pipeline has no media
columns; this backs the north-star multimodal surface (SURVEY.md
§8.2) where images are opaque binary columns decoded by Arrow-batched
pandas functions.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass

_SIG = b"\x89PNG\r\n\x1a\n"


@dataclass(frozen=True)
class PngMeta:
    width: int
    height: int
    bit_depth: int
    color_type: int
    n_idat_chunks: int

    @property
    def channels(self) -> int:
        return {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[self.color_type]


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: bytes, width: int, height: int) -> bytes:
    """RGB24 pixel bytes (row-major, 3 bytes/pixel) -> PNG bytes.

    Scanlines carry filter byte 0 (None); IDAT is one zlib stream.
    """
    if width < 1 or height < 1:
        raise ValueError("width/height must be >= 1")
    if len(pixels) != width * height * 3:
        raise ValueError(f"{len(pixels)} bytes != {width}*{height}*3")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    stride = width * 3
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _walk_chunks(payload: bytes):
    if len(payload) < len(_SIG) + 12 or payload[: len(_SIG)] != _SIG:
        raise ValueError("not a PNG payload")
    pos = len(_SIG)
    try:
        while pos + 8 <= len(payload):
            (clen,) = struct.unpack_from(">I", payload, pos)
            tag = payload[pos + 4 : pos + 8]
            body = payload[pos + 8 : pos + 8 + clen]
            if len(body) != clen:
                raise ValueError(f"truncated {tag!r} chunk")
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + clen)
            if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
                raise ValueError(f"CRC mismatch in {tag!r} chunk")
            yield tag, body
            pos += 12 + clen
            if tag == b"IEND":
                return
    except struct.error as e:  # truncated length/CRC field
        raise ValueError(f"truncated PNG payload: {e}") from e
    raise ValueError("truncated PNG payload: missing IEND")


def decode_png_meta(payload: bytes) -> PngMeta:
    """Dimensions/depth WITHOUT inflating any pixel data."""
    ihdr, n_idat = None, 0
    for tag, body in _walk_chunks(payload):
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError("bad IHDR length")
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            n_idat += 1
    if ihdr is None:
        raise ValueError("missing IHDR chunk")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise ValueError(f"unsupported compression/filter method {comp}/{filt}")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    return PngMeta(w, h, depth, ctype, n_idat)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[PngMeta, bytes]:
    """PNG bytes -> (meta, raw RGB24 pixel bytes). RGB-8 only; all five
    scanline filters are reversed per spec §9."""
    meta = decode_png_meta(payload)
    if meta.bit_depth != 8 or meta.color_type != 2:
        raise ValueError(
            f"unsupported PNG (depth={meta.bit_depth}, color_type="
            f"{meta.color_type}); 8-bit RGB only"
        )
    idat = b"".join(body for tag, body in _walk_chunks(payload) if tag == b"IDAT")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    stride, bpp = meta.width * 3, 3
    if len(raw) != (stride + 1) * meta.height:
        raise ValueError(
            f"inflated size {len(raw)} != {(stride + 1) * meta.height}"
        )
    out = bytearray(stride * meta.height)
    prev = bytearray(stride)
    for y in range(meta.height):
        f = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown PNG filter {f} on row {y}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return meta, bytes(out)


def synth_pixels(seed: int, width: int, height: int) -> bytes:
    """Deterministic pseudo-image reproducible by integer arithmetic on
    the oracle side: pixel (y, x, c) = (seed + 5*y + 3*x + c) mod 256."""
    return bytes(
        (seed + 5 * y + 3 * x + c) % 256
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )
