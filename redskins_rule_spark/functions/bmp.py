"""Pure-Python BMP (BITMAPINFOHEADER, 24-bit BI_RGB) codec.

The one image format decodable with zero codec libraries — fixed
54-byte header, raw bottom-up BGR rows padded to 4 bytes. This gives
the multimodal operators a REAL decode/resize backend in this
container (no PIL/opencv): `decode_backend="bmp"` in
`operators/multimodal.py` parses actual image bytes instead of the
deterministic fake, and the encoder below generates valid payloads
for tests/oracles.

Runs inside Arrow-batched `mapInPandas` workers — numpy row ops, no
per-pixel Python loops.
"""

from __future__ import annotations

import struct

import numpy as np

_FILE_HEADER = struct.Struct("<2sIHHI")  # magic, file size, res1, res2, offset
_INFO_HEADER = struct.Struct("<IiiHHIIiiII")  # size, w, h, planes, bpp, comp, ...

HEADER_SIZE = _FILE_HEADER.size + _INFO_HEADER.size  # 54


def row_size(width: int) -> int:
    """Bytes per pixel row: 3 bytes/pixel padded to a 4-byte boundary."""
    return (3 * width + 3) // 4 * 4


def bmp_size(width: int, height: int) -> int:
    """Total file size of a 24-bit BMP with the 54-byte header."""
    return HEADER_SIZE + row_size(width) * height


def encode_bmp(pixels: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a 24-bit BMP."""
    if pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) RGB array, got {pixels.shape}")
    h, w, _ = pixels.shape
    rsz = row_size(w)
    size = bmp_size(w, h)
    out = bytearray(size)
    _FILE_HEADER.pack_into(out, 0, b"BM", size, 0, 0, HEADER_SIZE)
    _INFO_HEADER.pack_into(
        out, _FILE_HEADER.size, _INFO_HEADER.size, w, h, 1, 24, 0,
        rsz * h, 2835, 2835, 0, 0,
    )
    # RGB → BGR, rows bottom-up, each padded to rsz
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, rsz), dtype=np.uint8)
    rows[:, : 3 * w] = bgr.reshape(h, 3 * w)
    out[HEADER_SIZE:] = rows.tobytes()
    return bytes(out)


def decode_bmp_meta(data: bytes) -> tuple[int, int, int]:
    """Parse (width, height, channels) from a BMP header — no pixel IO."""
    if len(data) < HEADER_SIZE or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, w, h, _, bpp, comp = struct.unpack_from("<IiiHHI", data, _FILE_HEADER.size)[:6]
    if comp != 0:
        raise ValueError(f"unsupported BMP compression {comp}")
    return w, abs(h), bpp // 8


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode a 24-bit BMP into an (h, w, 3) uint8 RGB array.

    Honors the sign of biHeight: positive = bottom-up rows (the
    common case, flipped on read), negative = top-down (stored in
    display order, no flip) — mirroring top-down files would silently
    invert every downstream resize/feature."""
    w, h, ch = decode_bmp_meta(data)
    raw_h = struct.unpack_from("<Iii", data, _FILE_HEADER.size)[2]
    if ch != 3:
        raise ValueError(f"only 24-bit BMPs supported, got {ch * 8} bpp")
    offset = _FILE_HEADER.unpack_from(data, 0)[4]
    rsz = row_size(w)
    rows = np.frombuffer(data, dtype=np.uint8, count=rsz * h, offset=offset)
    bgr = rows.reshape(h, rsz)[:, : 3 * w].reshape(h, w, 3)
    if raw_h > 0:  # bottom-up storage -> flip to display order
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()


def resize_nearest(pixels: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) array — pure indexing."""
    h, w, _ = pixels.shape
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    return pixels[np.ix_(ys, xs)]


# --- BI_RLE8: the compressed BMP profile (Windows BMP spec) ----------------
#
# 8-bit palette BMPs with compression 1 carry run-length-encoded
# pixel data: (count, index) run pairs, and four 0x00-escapes —
# end-of-line (00 00), end-of-bitmap (00 01), delta (00 02 dx dy:
# skip pixels, which KEEP their background value), and absolute mode
# (00 n>=3: n literal bytes padded to a word boundary). The encoder
# below is a real greedy RLE (runs >= 3 as run pairs, literal
# stretches >= 3 as absolute chunks, stragglers as 1-2 count runs);
# the decoder walks every escape bounds-checked, raising ValueError
# on row/column overruns, truncation, or a missing EOF. Grayscale
# palette (i, i, i) so pixel index == intensity; rows bottom-up per
# the spec (RLE8 has no top-down variant).

_RLE8_PALETTE = b"".join(bytes((i, i, i, 0)) for i in range(256))


def _rle8_encode_row(row: bytes) -> bytearray:
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        # length of the run starting at i
        j = i + 1
        while j < n and row[j] == row[i] and j - i < 255:
            j += 1
        run = j - i
        if run >= 3:
            out += bytes((run, row[i]))
            i = j
            continue
        # literal stretch: until the next run of >= 3 (or row end)
        k = i
        while k < n and k - i < 255:
            r = k + 1
            while r < n and row[r] == row[k]:
                r += 1
            if r - k >= 3:
                break
            k = r
        lit = row[i:k]
        if len(lit) >= 3:
            out += bytes((0, len(lit))) + lit
            if len(lit) % 2:
                out.append(0)  # word-align absolute chunks
        else:
            for v in lit:
                out += bytes((1, v))
        i = k
    return out


def encode_bmp_rle8(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale array as an 8-bit BI_RLE8 BMP
    (grayscale palette, bottom-up rows, EOL after every row, EOF at
    the end)."""
    if pixels.ndim != 2:
        raise ValueError(f"expected (h, w) gray array, got {pixels.shape}")
    h, w = pixels.shape
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up storage
        body += _rle8_encode_row(pixels[y].tobytes())
        body += b"\x00\x00"  # EOL
    body += b"\x00\x01"  # EOF
    offset = HEADER_SIZE + len(_RLE8_PALETTE)
    size = offset + len(body)
    out = bytearray(offset)
    _FILE_HEADER.pack_into(out, 0, b"BM", size, 0, 0, offset)
    _INFO_HEADER.pack_into(
        out, _FILE_HEADER.size, _INFO_HEADER.size, w, h, 1, 8, 1,
        len(body), 2835, 2835, 256, 0,
    )
    out[HEADER_SIZE:offset] = _RLE8_PALETTE
    return bytes(out) + bytes(body)


def decode_bmp_rle8(data: bytes) -> np.ndarray:
    """Decode a BI_RLE8 BMP to an (h, w) uint8 grayscale array
    (palette indices; delta-skipped pixels keep value 0). Raises
    ValueError on any overrun, truncation, or missing EOF."""
    if len(data) < HEADER_SIZE or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, w, h, _, bpp, comp = struct.unpack_from(
        "<IiiHHI", data, _FILE_HEADER.size
    )[:6]
    if comp != 1 or bpp != 8:
        raise ValueError(
            f"not a BI_RLE8 BMP (compression {comp}, {bpp} bpp)"
        )
    if h <= 0:
        raise ValueError("RLE8 BMPs are bottom-up only (biHeight > 0)")
    offset = _FILE_HEADER.unpack_from(data, 0)[4]
    img = np.zeros((h, w), dtype=np.uint8)
    pos, x, y = offset, 0, 0  # y counts stored (bottom-up) rows
    while True:
        if pos + 2 > len(data):
            raise ValueError("rle8: truncated stream (no EOF escape)")
        b0, b1 = data[pos], data[pos + 1]
        pos += 2
        if b0:  # encoded run
            if y >= h or x + b0 > w:
                raise ValueError("rle8: run overruns the row")
            img[h - 1 - y, x: x + b0] = b1
            x += b0
        elif b1 == 0:  # EOL
            x, y = 0, y + 1
            if y > h:
                raise ValueError("rle8: more rows than biHeight")
        elif b1 == 1:  # EOF
            if pos != len(data):
                raise ValueError("rle8: trailing bytes after EOF")
            return img
        elif b1 == 2:  # delta
            if pos + 2 > len(data):
                raise ValueError("rle8: truncated delta escape")
            dx, dy = data[pos], data[pos + 1]
            pos += 2
            x, y = x + dx, y + dy
            if y >= h or x > w:
                raise ValueError("rle8: delta escape leaves the bitmap")
        else:  # absolute mode: b1 >= 3 literal bytes, word-aligned
            nbytes = b1 + (b1 % 2)
            if pos + nbytes > len(data):
                raise ValueError("rle8: truncated absolute chunk")
            if y >= h or x + b1 > w:
                raise ValueError("rle8: absolute chunk overruns the row")
            img[h - 1 - y, x: x + b1] = np.frombuffer(
                data, dtype=np.uint8, count=b1, offset=pos
            )
            x += b1
            pos += nbytes


def synth_gray_rle(clen: int) -> np.ndarray:
    """Closed-form grayscale image mixing run-friendly and
    run-hostile rows (the q220 oracle's formula): w = clen%19 + 1,
    h = clen%9 + 1; pixel (y, x) = (clen + 7y + 3x) % 256 on rows
    y % 3 == 0 (no runs → absolute mode) and
    (clen + 5y + x//4) % 256 otherwise (runs of 4 → run pairs)."""
    w, h = clen % 19 + 1, clen % 9 + 1
    img = np.zeros((h, w), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            if y % 3 == 0:
                img[y, x] = (clen + 7 * y + 3 * x) % 256
            else:
                img[y, x] = (clen + 5 * y + x // 4) % 256
    return img
