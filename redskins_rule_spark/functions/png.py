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
    interlace: int = 0  # 0 = none, 1 = Adam7

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
    if interlace not in (0, 1):
        raise ValueError(f"unknown PNG interlace method {interlace}")
    return PngMeta(w, h, depth, ctype, n_idat, interlace)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter_line(
    line: bytearray, prev: bytes | bytearray, f: int, y: int, bpp: int = 3
) -> None:
    """Reverse one scanline filter in place (spec §9)."""
    stride = len(line)
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


def _filter_line(
    line: bytes, prev: bytes | bytearray, f: int, bpp: int = 3
) -> bytes:
    """Apply one scanline filter (the encoder-side forward transform)."""
    stride = len(line)
    out = bytearray(line)
    if f == 0:
        return bytes(out)
    if f == 1:
        for i in range(stride - 1, bpp - 1, -1):
            out[i] = (line[i] - line[i - bpp]) & 0xFF
    elif f == 2:
        for i in range(stride):
            out[i] = (line[i] - prev[i]) & 0xFF
    elif f == 3:
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            out[i] = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
    elif f == 4:
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            ul = prev[i - bpp] if i >= bpp else 0
            out[i] = (line[i] - _paeth(left, prev[i], ul)) & 0xFF
    else:
        raise ValueError(f"unknown PNG filter {f}")
    return bytes(out)


def _unfilter_image(raw: bytes, pos: int, width: int, height: int) -> tuple[bytearray, int]:
    """Unfilter `height` scanlines of `width` RGB pixels starting at
    byte `pos` of the inflated stream; returns (pixels, new pos)."""
    stride = width * 3
    out = bytearray(stride * height)
    prev: bytes | bytearray = bytes(stride)
    for y in range(height):
        if pos + 1 + stride > len(raw):
            raise ValueError("inflated stream shorter than scanlines")
        f = raw[pos]
        line = bytearray(raw[pos + 1: pos + 1 + stride])
        _unfilter_line(line, prev, f, y)
        out[y * stride: (y + 1) * stride] = line
        prev = line
        pos += 1 + stride
    return out, pos


# Adam7 pass geometry (spec §8.2): (xstart, ystart, xstep, ystep)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _adam7_dims(width: int, height: int):
    """Per-pass (xs, ys, xst, yst, pw, ph); empty passes have pw or
    ph 0 and contribute no scanlines at all (spec §8.2)."""
    for xs, ys, xst, yst in _ADAM7:
        pw = (width - xs + xst - 1) // xst if width > xs else 0
        ph = (height - ys + yst - 1) // yst if height > ys else 0
        yield xs, ys, xst, yst, pw, ph


def decode_png(payload: bytes) -> tuple[PngMeta, bytes]:
    """PNG bytes -> (meta, raw RGB24 pixel bytes). RGB-8 only; all five
    scanline filters are reversed per spec §9; Adam7-interlaced images
    (interlace method 1) are deinterlaced per §8.2 — each pass is an
    independently filtered sub-image whose pixels scatter back onto
    the raster, so the returned bytes are identical to the
    progressive layout's."""
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
    stride = meta.width * 3
    if meta.interlace == 0:
        if len(raw) != (stride + 1) * meta.height:
            raise ValueError(
                f"inflated size {len(raw)} != {(stride + 1) * meta.height}"
            )
        out, _pos = _unfilter_image(raw, 0, meta.width, meta.height)
        return meta, bytes(out)
    # Adam7: seven passes, each an independent filtered sub-image
    out = bytearray(stride * meta.height)
    pos = 0
    for xs, ys, xst, yst, pw, ph in _adam7_dims(meta.width, meta.height):
        if pw == 0 or ph == 0:
            continue
        sub, pos = _unfilter_image(raw, pos, pw, ph)
        pstride = pw * 3
        for py in range(ph):
            oy = ys + py * yst
            for px in range(pw):
                ox = (xs + px * xst) * 3
                src = py * pstride + px * 3
                out[oy * stride + ox: oy * stride + ox + 3] = sub[src: src + 3]
    if pos != len(raw):
        raise ValueError("trailing bytes after the last Adam7 pass")
    return meta, bytes(out)


def encode_png_interlaced(
    pixels: bytes,
    width: int,
    height: int,
    pass_filters: tuple[int, ...] | None = None,
) -> bytes:
    """RGB24 pixels -> Adam7-interlaced PNG (interlace method 1).
    `pass_filters` selects the scanline filter (0-4) used throughout
    each of the seven passes (default all 0) — so a single payload can
    exercise every filter type across its passes."""
    if width < 1 or height < 1:
        raise ValueError("width/height must be >= 1")
    if len(pixels) != width * height * 3:
        raise ValueError(f"{len(pixels)} bytes != {width}*{height}*3")
    filters = pass_filters or (0,) * 7
    if len(filters) != 7:
        raise ValueError("pass_filters takes one filter per Adam7 pass")
    stride = width * 3
    raw = bytearray()
    for p, (xs, ys, xst, yst, pw, ph) in enumerate(
        _adam7_dims(width, height)
    ):
        if pw == 0 or ph == 0:
            continue
        f = filters[p]
        pstride = pw * 3
        prev: bytes | bytearray = bytes(pstride)
        for py in range(ph):
            oy = ys + py * yst
            line = bytearray()
            for px in range(pw):
                ox = (xs + px * xst) * 3
                line += pixels[oy * stride + ox: oy * stride + ox + 3]
            raw.append(f)
            raw += _filter_line(bytes(line), prev, f)
            prev = line  # filters reference the UNFILTERED previous line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 1)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def synth_pixels(seed: int, width: int, height: int) -> bytes:
    """Deterministic pseudo-image reproducible by integer arithmetic on
    the oracle side: pixel (y, x, c) = (seed + 5*y + 3*x + c) mod 256."""
    return bytes(
        (seed + 5 * y + 3 * x + c) % 256
        for y in range(height)
        for x in range(width)
        for c in range(3)
    )
