"""EXIF APP1 metadata layer (public JEITA CP-3451 / TIFF 6.0
structure): the metadata every image-curation pipeline actually
reads — orientation, declared dimensions, capture timestamp.

An EXIF block is an APP1 JPEG segment whose body is "Exif\\0\\0"
followed by a little TIFF file: byte-order mark (II/MM), magic 42,
an offset to IFD0, then IFD0 as a count-prefixed array of 12-byte
entries (tag, type, count, value-or-offset) with out-of-line storage
for values wider than 4 bytes (ASCII strings here). Everything in
this module is real structure, BOTH byte orders: the encoder builds
the TIFF from first principles and the parser walks it
bounds-checked, raising ValueError (never struct.error) on
truncation, a bad byte-order mark, a wrong magic, an entry overrun,
or an out-of-line value past the block end.

Only the three TIFF types the tags below need are implemented
(SHORT=3, LONG=4, ASCII=2); other types surface by NUMBER in the
entry list so callers can see what a real file carries, but their
values stay opaque (the documented boundary — RATIONAL etc. add no
structural novelty).

Reference behavior: chaseeanderson/redskins-rule has no media
pipeline; this extends the repo's crawl-curation surface
(SURVEY.md §2 extension tier).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_EXIF_HEADER = b"Exif\x00\x00"
TAG_IMAGE_WIDTH = 0x0100
TAG_IMAGE_HEIGHT = 0x0101
TAG_ORIENTATION = 0x0112
TAG_DATETIME = 0x0132


@dataclass(frozen=True)
class ExifData:
    byte_order: str  # "II" (little) or "MM" (big)
    orientation: int | None
    width: int | None
    height: int | None
    datetime: str | None
    n_entries: int


def encode_exif(
    orientation: int,
    width: int,
    height: int,
    datetime: str,
    big_endian: bool = False,
) -> bytes:
    """APP1 segment BODY (header included, segment length excluded):
    Exif\\0\\0 + TIFF with one IFD0 carrying ImageWidth (LONG),
    ImageHeight (LONG), Orientation (SHORT), DateTime (ASCII,
    out-of-line)."""
    if not 1 <= orientation <= 8:
        raise ValueError("exif: orientation takes values 1-8")
    e = ">" if big_endian else "<"
    dt = datetime.encode("ascii") + b"\x00"
    # layout: TIFF header (8) + count (2) + 4 entries (48) + next-IFD
    # pointer (4) = 62; the ASCII value lands right after
    dt_off = 8 + 2 + 4 * 12 + 4

    def entry(tag: int, typ: int, count: int, value: bytes) -> bytes:
        return struct.pack(e + "HHI", tag, typ, count) + value

    entries = [
        entry(TAG_IMAGE_WIDTH, 4, 1, struct.pack(e + "I", width)),
        entry(TAG_IMAGE_HEIGHT, 4, 1, struct.pack(e + "I", height)),
        entry(TAG_ORIENTATION, 3, 1, struct.pack(e + "H", orientation) + b"\x00\x00"),
        entry(TAG_DATETIME, 2, len(dt), struct.pack(e + "I", dt_off)),
    ]
    tiff = (
        (b"MM" if big_endian else b"II")
        + struct.pack(e + "H", 42)
        + struct.pack(e + "I", 8)  # IFD0 offset
        + struct.pack(e + "H", len(entries))
        + b"".join(entries)
        + struct.pack(e + "I", 0)  # no next IFD
        + dt
    )
    return _EXIF_HEADER + tiff


def parse_exif(body: bytes) -> ExifData:
    """Parse an APP1 Exif body back to the tags above. Unknown tags
    and unimplemented types are counted (n_entries covers ALL IFD0
    entries) but left opaque."""
    if body[: len(_EXIF_HEADER)] != _EXIF_HEADER:
        raise ValueError("exif: missing Exif\\0\\0 header")
    t = body[len(_EXIF_HEADER):]
    if len(t) < 8:
        raise ValueError("exif: truncated TIFF header")
    bom = t[:2]
    if bom == b"II":
        e = "<"
    elif bom == b"MM":
        e = ">"
    else:
        raise ValueError(f"exif: bad byte-order mark {bom!r}")
    (magic,) = struct.unpack_from(e + "H", t, 2)
    if magic != 42:
        raise ValueError(f"exif: bad TIFF magic {magic}")
    (ifd_off,) = struct.unpack_from(e + "I", t, 4)
    if ifd_off + 2 > len(t):
        raise ValueError("exif: IFD0 offset past block end")
    (n,) = struct.unpack_from(e + "H", t, ifd_off)
    pos = ifd_off + 2
    if pos + 12 * n + 4 > len(t):
        raise ValueError("exif: IFD0 entries overrun block")
    orientation = width = height = None
    datetime = None
    for _i in range(n):
        tag, typ, count = struct.unpack_from(e + "HHI", t, pos)
        val = t[pos + 8: pos + 12]
        if typ == 3 and count == 1:  # SHORT
            (v,) = struct.unpack(e + "H", val[:2])
        elif typ == 4 and count == 1:  # LONG
            (v,) = struct.unpack(e + "I", val)
        elif typ == 2:  # ASCII, possibly out-of-line
            if count <= 4:
                raw = val[:count]
            else:
                (off,) = struct.unpack(e + "I", val)
                if off + count > len(t):
                    raise ValueError("exif: ASCII value past block end")
                raw = t[off: off + count]
            v = raw.rstrip(b"\x00").decode("ascii", errors="replace")
        else:
            v = None  # unimplemented type: counted, opaque
        if tag == TAG_ORIENTATION and isinstance(v, int):
            if not 1 <= v <= 8:
                raise ValueError(f"exif: orientation {v} out of range")
            orientation = v
        elif tag == TAG_IMAGE_WIDTH and isinstance(v, int):
            width = v
        elif tag == TAG_IMAGE_HEIGHT and isinstance(v, int):
            height = v
        elif tag == TAG_DATETIME and isinstance(v, str):
            datetime = v
        pos += 12
    return ExifData(
        byte_order=bom.decode("ascii"),
        orientation=orientation,
        width=width,
        height=height,
        datetime=datetime,
        n_entries=n,
    )


def insert_app1(jpeg: bytes, app1_body: bytes) -> bytes:
    """Insert an APP1 segment right after SOI — where real cameras
    put EXIF."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_body) + 2) + app1_body
    return jpeg[:2] + seg + jpeg[2:]


def extract_app1(jpeg: bytes) -> bytes | None:
    """First APP1 segment body before SOS, or None. Fill bytes
    (T.81 B.1.1.2) are skipped like the decoders do."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(jpeg):
        if jpeg[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        while pos + 4 <= len(jpeg) and jpeg[pos + 1] == 0xFF:
            pos += 1
        if pos + 4 > len(jpeg):
            return None
        marker = jpeg[pos + 1]
        if marker in (0xD9, 0xDA):
            return None
        seglen = (jpeg[pos + 2] << 8) | jpeg[pos + 3]
        if seglen < 2 or pos + 2 + seglen > len(jpeg):
            raise ValueError("truncated JPEG segment")
        if marker == 0xE1:
            return jpeg[pos + 4: pos + 2 + seglen]
        pos += 2 + seglen
    return None


def synth_exif_jpeg(clen: int) -> bytes:
    """Closed-form EXIF-bearing JPEG (the q218 oracle's formulas):
    a real baseline-gray JPEG (dims (clen%5+1)x(clen%3+1) MCU blocks)
    with an APP1 whose orientation = clen%8 + 1, declared dims match
    the frame, DateTime = '2024:01:{d:02d} {h:02d}:{m:02d}:00' with
    d = clen%28 + 1, h = clen%24, m = clen%60; big-endian TIFF when
    clen is odd."""
    from redskins_rule_spark.functions.jpeg import (
        encode_jpeg_gray,
        synth_dc_blocks,
    )

    bw, bh = clen % 5 + 1, clen % 3 + 1
    jpeg = encode_jpeg_gray(synth_dc_blocks(clen, bw, bh), bw, bh)
    exif = encode_exif(
        clen % 8 + 1,
        8 * bw,
        8 * bh,
        f"2024:01:{clen % 28 + 1:02d} {clen % 24:02d}:{clen % 60:02d}:00",
        big_endian=bool(clen % 2),
    )
    return insert_app1(jpeg, exif)
