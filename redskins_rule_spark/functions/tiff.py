"""Pure-Python baseline TIFF 6.0 codec (grayscale 8-bit, strips,
Compression = none | PackBits).

TIFF completes the raster-format family next to BMP/PNG/GIF/JPEG: it
is the format scanners, scientific pipelines, and print archives
feed a crawl, and — like FLAC on the audio side — its baseline
profile is fully algorithmic: a fixed 8-byte header, a directory of
12-byte tagged entries (the SAME IFD structure `functions/exif.py`
walks inside JPEG APP1 — EXIF *is* an embedded TIFF), strip offsets/
byte-counts, and PackBits, a one-rule RLE with zero tables. Both
byte orders (II little / MM big) are first-class: every multi-byte
integer in the file — header, entry fields, inline values, offsets —
flips with the declared order, so a decoder that hardcodes either
endianness fails half the corpus.

PackBits (TIFF 6.0 §9): a header byte n, then
  0 <= n <= 127  -> copy the next n+1 literal bytes
  129 <= n <= 255 -> repeat the next byte 257-n times
  n == 128       -> no-op (skipped; encoders shouldn't emit it)
TIFF constrains packets to NOT cross row boundaries ("the
compression scheme must be applied to each row separately"); the
encoder compresses per row and the decoder validates that each row's
expansion lands exactly on the row size.

Runs inside Arrow-batched `mapInPandas` workers; payloads are small
(synth images are <= 18x8), so the per-payload byte machine is
Python over bytearrays like functions/bmp.py's RLE8 path.
"""

from __future__ import annotations

import struct

import numpy as np

# tag ids used by the baseline grayscale profile (TIFF 6.0 §8)
TAG_WIDTH = 256
TAG_HEIGHT = 257
TAG_BITS = 258
TAG_COMPRESSION = 259
TAG_PHOTOMETRIC = 262
TAG_STRIP_OFFSETS = 273
TAG_SAMPLES = 277
TAG_ROWS_PER_STRIP = 278
TAG_STRIP_COUNTS = 279

COMP_NONE = 1
COMP_PACKBITS = 32773

_TYPE_SHORT = 3  # 2-byte
_TYPE_LONG = 4  # 4-byte


def packbits_encode_row(row: bytes) -> bytes:
    """PackBits-encode ONE row (packets never cross rows by
    construction). Greedy: any run of >= 2 identical bytes becomes a
    run packet (max 128), everything else accumulates into literal
    packets (max 128)."""
    out = bytearray()
    i, n = 0, len(row)
    lit_start = i
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 2:
            # flush pending literals first
            j = lit_start
            while j < i:
                chunk = min(128, i - j)
                out.append(chunk - 1)
                out += row[j : j + chunk]
                j += chunk
            out.append(257 - run)
            out.append(row[i])
            i += run
            lit_start = i
        else:
            i += 1
    j = lit_start
    while j < n:
        chunk = min(128, n - j)
        out.append(chunk - 1)
        out += row[j : j + chunk]
        j += chunk
    return bytes(out)


def packbits_decode(data: bytes, row_size: int, n_rows: int) -> bytes:
    """Decode PackBits data that encodes `n_rows` rows of `row_size`
    bytes, enforcing the TIFF row-boundary rule: every packet must
    finish inside the row it started (a decoder that ignores this
    accepts streams no conforming encoder emits — and silently
    misaligns every later row if the stream is corrupt)."""
    out = bytearray()
    i, n = 0, len(data)
    row_left = row_size
    rows_done = 0
    while i < n:
        if rows_done == n_rows:
            raise ValueError("PackBits data continues past final row")
        h = data[i]
        i += 1
        if h == 128:  # no-op
            continue
        if h < 128:  # literal: h+1 bytes
            cnt = h + 1
            if i + cnt > n:
                raise ValueError("PackBits literal overruns stream")
            if cnt > row_left:
                raise ValueError("PackBits packet crosses row boundary")
            out += data[i : i + cnt]
            i += cnt
        else:  # run: repeat next byte 257-h times
            cnt = 257 - h
            if i >= n:
                raise ValueError("PackBits run missing repeat byte")
            if cnt > row_left:
                raise ValueError("PackBits packet crosses row boundary")
            out += bytes([data[i]]) * cnt
            i += 1
        row_left -= cnt
        if row_left == 0:
            row_left = row_size
            rows_done += 1
    if rows_done != n_rows or row_left != row_size:
        raise ValueError(
            f"PackBits decoded {rows_done} full rows (+{row_size - row_left}"
            f" bytes), expected {n_rows} rows of {row_size}"
        )
    return bytes(out)


def encode_tiff(
    pixels: np.ndarray,
    *,
    big_endian: bool = False,
    compression: int = COMP_PACKBITS,
    rows_per_strip: int = 2,
) -> bytes:
    """Encode an (h, w) uint8 grayscale array as a baseline TIFF:
    header -> pixel strips -> IFD (entries in ascending-tag order, as
    the spec requires and the decoder enforces). Strip offset/count
    arrays live past the IFD when they don't fit the 4-byte inline
    value slot."""
    if pixels.ndim != 2:
        raise ValueError(f"expected (h, w) grayscale array, got {pixels.shape}")
    if compression not in (COMP_NONE, COMP_PACKBITS):
        raise ValueError(f"unsupported compression {compression}")
    if rows_per_strip < 1:
        raise ValueError("rows_per_strip must be >= 1")
    h, w = pixels.shape
    e = ">" if big_endian else "<"

    strips: list[bytes] = []
    for top in range(0, h, rows_per_strip):
        rows = pixels[top : top + rows_per_strip]
        if compression == COMP_NONE:
            strips.append(rows.tobytes())
        else:
            strips.append(
                b"".join(packbits_encode_row(r.tobytes()) for r in rows)
            )

    header = struct.pack(
        e + "2sH", b"MM" if big_endian else b"II", 42
    )
    # layout: header(8) | strip data | [offset/count arrays] | IFD
    pos = 8
    offsets = []
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    n_strips = len(strips)

    extra = bytearray()  # out-of-line value arrays, placed before the IFD
    def value_field(typ: int, values: list[int]) -> bytes:
        nonlocal extra
        size = 2 if typ == _TYPE_SHORT else 4
        fmt = "H" if typ == _TYPE_SHORT else "I"
        raw = struct.pack(e + fmt * len(values), *values)
        if len(raw) <= 4:
            return raw + b"\0" * (4 - len(raw))
        off = pos + len(extra)
        extra += raw
        return struct.pack(e + "I", off)

    entries: list[tuple[int, int, int, list[int]]] = [
        (TAG_WIDTH, _TYPE_SHORT, 1, [w]),
        (TAG_HEIGHT, _TYPE_SHORT, 1, [h]),
        (TAG_BITS, _TYPE_SHORT, 1, [8]),
        (TAG_COMPRESSION, _TYPE_SHORT, 1, [compression]),
        (TAG_PHOTOMETRIC, _TYPE_SHORT, 1, [1]),  # BlackIsZero
        (TAG_STRIP_OFFSETS, _TYPE_LONG, n_strips, offsets),
        (TAG_SAMPLES, _TYPE_SHORT, 1, [1]),
        (TAG_ROWS_PER_STRIP, _TYPE_SHORT, 1, [rows_per_strip]),
        (TAG_STRIP_COUNTS, _TYPE_LONG, n_strips, [len(s) for s in strips]),
    ]
    ifd = bytearray()
    body = bytearray()
    for tag, typ, count, values in entries:  # already ascending by tag
        body += struct.pack(e + "HHI", tag, typ, count)
        body += value_field(typ, values)
    ifd_off = pos + len(extra)
    ifd += struct.pack(e + "H", len(entries))
    ifd += body
    ifd += struct.pack(e + "I", 0)  # next-IFD pointer: none

    out = bytearray(header)
    out += struct.pack(e + "I", ifd_off)
    for s in strips:
        out += s
    out += extra
    out += ifd
    return bytes(out)


def _read_ifd(data: bytes, e: str, off: int) -> dict[int, tuple[int, list[int]]]:
    """Walk one IFD: {tag: (type, values)} with ascending-tag-order
    validation and inline-vs-offset value resolution (count*size <= 4
    -> inline, else a file offset — the same rule exif.py applies to
    the APP1-embedded TIFF)."""
    if off + 2 > len(data):
        raise ValueError("IFD offset past EOF")
    (n_entries,) = struct.unpack_from(e + "H", data, off)
    pos = off + 2
    if pos + 12 * n_entries + 4 > len(data):
        raise ValueError("IFD overruns file")
    out: dict[int, tuple[int, list[int]]] = {}
    prev_tag = -1
    for _ in range(n_entries):
        tag, typ, count = struct.unpack_from(e + "HHI", data, pos)
        if tag <= prev_tag:
            raise ValueError(f"IFD tags not in ascending order at {tag}")
        prev_tag = tag
        if typ == _TYPE_SHORT:
            size, fmt = 2, "H"
        elif typ == _TYPE_LONG:
            size, fmt = 4, "I"
        else:
            raise ValueError(f"unsupported TIFF type {typ} for tag {tag}")
        total = size * count
        if total <= 4:
            vals = list(struct.unpack_from(e + fmt * count, data, pos + 8))
        else:
            (voff,) = struct.unpack_from(e + "I", data, pos + 8)
            if voff + total > len(data):
                raise ValueError(f"tag {tag} value array past EOF")
            vals = list(struct.unpack_from(e + fmt * count, data, voff))
        out[tag] = (typ, vals)
        pos += 12
    return out


def decode_tiff_meta(data: bytes) -> dict:
    """Header + IFD walk, no pixel IO: width/height/compression/
    strip layout/endianness, every required baseline tag validated."""
    if len(data) < 8:
        raise ValueError("not a TIFF payload")
    order = data[:2]
    if order == b"II":
        e = "<"
    elif order == b"MM":
        e = ">"
    else:
        raise ValueError(f"bad TIFF byte order {order!r}")
    magic, ifd_off = struct.unpack_from(e + "HI", data, 2)
    if magic != 42:
        raise ValueError(f"bad TIFF magic {magic}")
    ifd = _read_ifd(data, e, ifd_off)
    def one(tag: int) -> int:
        if tag not in ifd:
            raise ValueError(f"missing required tag {tag}")
        vals = ifd[tag][1]
        if len(vals) != 1:
            raise ValueError(f"tag {tag} expected 1 value, got {len(vals)}")
        return vals[0]

    w, h = one(TAG_WIDTH), one(TAG_HEIGHT)
    comp = one(TAG_COMPRESSION)
    if comp not in (COMP_NONE, COMP_PACKBITS):
        raise ValueError(f"unsupported compression {comp}")
    if one(TAG_BITS) != 8 or one(TAG_SAMPLES) != 1:
        raise ValueError("only 8-bit grayscale supported")
    if one(TAG_PHOTOMETRIC) != 1:
        raise ValueError("only BlackIsZero supported")
    rps = one(TAG_ROWS_PER_STRIP)
    offsets = ifd[TAG_STRIP_OFFSETS][1] if TAG_STRIP_OFFSETS in ifd else []
    counts = ifd[TAG_STRIP_COUNTS][1] if TAG_STRIP_COUNTS in ifd else []
    n_strips = (h + rps - 1) // rps
    if len(offsets) != n_strips or len(counts) != n_strips:
        raise ValueError(
            f"strip arrays have {len(offsets)}/{len(counts)} entries,"
            f" expected {n_strips}"
        )
    return {
        "width": w,
        "height": h,
        "compression": comp,
        "rows_per_strip": rps,
        "strip_offsets": offsets,
        "strip_counts": counts,
        "big_endian": e == ">",
    }


def decode_tiff(data: bytes) -> np.ndarray:
    """Decode a baseline grayscale TIFF into an (h, w) uint8 array:
    per-strip PackBits (or verbatim) expansion with byte-count and
    row-boundary validation, strips concatenated top-to-bottom."""
    meta = decode_tiff_meta(data)
    w, h = meta["width"], meta["height"]
    rps = meta["rows_per_strip"]
    rows = bytearray()
    done = 0
    for off, cnt in zip(meta["strip_offsets"], meta["strip_counts"]):
        if off + cnt > len(data):
            raise ValueError("strip past EOF")
        strip_rows = min(rps, h - done)
        raw = bytes(data[off : off + cnt])
        if meta["compression"] == COMP_NONE:
            if cnt != strip_rows * w:
                raise ValueError(
                    f"uncompressed strip is {cnt} bytes,"
                    f" expected {strip_rows * w}"
                )
            rows += raw
        else:
            rows += packbits_decode(raw, w, strip_rows)
        done += strip_rows
    if done != h:
        raise ValueError(f"strips cover {done} rows, expected {h}")
    return np.frombuffer(bytes(rows), dtype=np.uint8).reshape(h, w)


def synth_gray_tiff(clen: int) -> np.ndarray:
    """Deterministic grayscale content with run-friendly and
    run-hostile rows (the q220 recipe with fresh constants): rows
    r % 3 == 0 step in plateaus of 5 (PackBits emits run packets),
    other rows step by 7 (coprime with 256 — no two adjacent pixels
    equal, PackBits emits literal packets). Every payload therefore
    exercises BOTH packet kinds and the closed form is one CASE in
    SQL."""
    w = clen % 17 + 2
    h = clen % 7 + 2
    r = np.arange(h, dtype=np.int64)[:, None]
    c = np.arange(w, dtype=np.int64)[None, :]
    runs = (clen + 11 * r + c // 5) % 256
    lits = (clen + 13 * r + 7 * c) % 256
    return np.where(r % 3 == 0, runs, lits).astype(np.uint8)


def synth_tiff(clen: int) -> bytes:
    """Payload generator for the corpus: content from
    `synth_gray_tiff`; byte order, compression, and strip height all
    cycle with clen so both endiannesses, both compressions, and
    multi-strip layouts (with a short final strip) each cover a third
    to a half of any corpus."""
    return encode_tiff(
        synth_gray_tiff(clen),
        big_endian=clen % 2 == 1,
        compression=COMP_NONE if clen % 3 == 0 else COMP_PACKBITS,
        rows_per_strip=clen % 3 + 1,
    )
