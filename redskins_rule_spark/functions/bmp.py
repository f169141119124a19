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
