"""Pure-Python QOI codec (the "Quite OK Image" format, 2021 —
public-domain one-page spec).

QOI joins FLAC/TIFF/G.711 in the zero-carried-tables tier: the whole
format is eight byte-level rules. Header: magic 'qoif', big-endian
width/height, channels, colorspace. Chunks:

  0xFE       QOI_OP_RGB    tag + 3 channel bytes
  0xFF       QOI_OP_RGBA   tag + 4 channel bytes
  0b00xxxxxx QOI_OP_INDEX  64-slot table lookup, hash (3r+5g+7b+11a)%64
  0b01xxxxxx QOI_OP_DIFF   dr,dg,db each 2 bits biased -2 (wrapping)
  0b10xxxxxx QOI_OP_LUMA   dg 6 bits biased -32; second byte
                           (dr-dg)+8 and (db-dg)+8 in 4 bits each
  0b11xxxxxx QOI_OP_RUN    run of 1..62 previous pixels (bias -1;
                           lengths 63/64 are forbidden — their tags
                           collide with RGB/RGBA)

Decoder state: previous pixel starts (0,0,0,255); every SEEN pixel
(from any op) updates its index slot. Stream ends with seven 0x00
then 0x01. All differences wrap mod 256.

The encoder here is a CONFORMING but configurable encoder: any
subset of the compressed ops yields a valid QOI stream (the spec
constrains the decoder, not encoder choices), and `use_index=False`
is how the corpus synth keeps its byte layout closed-form — an index
hit depends on 64-slot table liveness, which is history-dependent in
a way no per-doc SQL formula should have to replay. The decoder
always honors all ops; pytest drives INDEX with hand-built streams.
"""

from __future__ import annotations

import struct

_MAGIC = b"qoif"
_END = b"\x00" * 7 + b"\x01"


def _hash(px: tuple[int, int, int, int]) -> int:
    r, g, b, a = px
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def _sdelta(a: int, b: int) -> int:
    """Wrapped signed delta a-b in [-128, 127]."""
    return ((a - b + 128) % 256) - 128


def encode_qoi(
    pixels: list[tuple[int, int, int]],
    width: int,
    height: int,
    *,
    use_index: bool = True,
) -> bytes:
    """Encode RGB pixels (row-major, len == width*height) as QOI with
    channels=3. Op priority mirrors the reference encoder: RUN, then
    INDEX (optional), then DIFF, then LUMA, then RGB."""
    if len(pixels) != width * height:
        raise ValueError(f"{len(pixels)} pixels for {width}x{height}")
    out = bytearray()
    out += _MAGIC + struct.pack(">IIBB", width, height, 3, 0)
    prev = (0, 0, 0, 255)
    index: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)] * 64
    run = 0
    for r, g, b in pixels:
        px = (r, g, b, 255)
        if px == prev:
            run += 1
            if run == 62:
                out.append(0xC0 | (run - 1))
                run = 0
            continue
        if run:
            out.append(0xC0 | (run - 1))
            run = 0
        h = _hash(px)
        if use_index and index[h] == px:
            out.append(h)
        else:
            dr = _sdelta(r, prev[0])
            dg = _sdelta(g, prev[1])
            db = _sdelta(b, prev[2])
            if -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                -32 <= dg <= 31
                and -8 <= dr - dg <= 7
                and -8 <= db - dg <= 7
            ):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            else:
                out += bytes((0xFE, r, g, b))
        index[h] = px
        prev = px
    if run:
        out.append(0xC0 | (run - 1))
    out += _END
    return bytes(out)


def decode_qoi(data: bytes) -> dict:
    """Decode a QOI stream -> {width, height, pixels, op_counts}.
    op_counts tallies rgb/rgba/index/diff/luma/run chunk USES (run
    counts chunks, not covered pixels). Raises ValueError on bad
    magic, channel count, truncation, pixel over/underrun, or a
    missing/misplaced end marker."""
    if len(data) < 22 or data[:4] != _MAGIC:
        raise ValueError("not a QOI payload")
    width, height, channels, colorspace = struct.unpack_from(">IIBB", data, 4)
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(f"bad QOI header ({channels=}, {colorspace=})")
    n_px = width * height
    pixels: list[tuple[int, int, int, int]] = []
    prev = (0, 0, 0, 255)
    index: list[tuple[int, int, int, int]] = [(0, 0, 0, 0)] * 64
    counts = {"rgb": 0, "rgba": 0, "index": 0, "diff": 0, "luma": 0, "run": 0}
    pos = 14
    end_at = len(data) - 8
    if data[end_at:] != _END:
        raise ValueError("missing QOI end marker")
    while pos < end_at:
        if len(pixels) >= n_px:
            raise ValueError("chunk data continues past declared pixels")
        tag = data[pos]
        if tag == 0xFE:
            if pos + 4 > end_at:
                raise ValueError("QOI_OP_RGB truncated")
            prev = (data[pos + 1], data[pos + 2], data[pos + 3], prev[3])
            pos += 4
            counts["rgb"] += 1
        elif tag == 0xFF:
            if pos + 5 > end_at:
                raise ValueError("QOI_OP_RGBA truncated")
            prev = (data[pos + 1], data[pos + 2], data[pos + 3], data[pos + 4])
            pos += 5
            counts["rgba"] += 1
        else:
            op = tag >> 6
            if op == 0:  # INDEX
                prev = index[tag & 0x3F]
                pos += 1
                counts["index"] += 1
            elif op == 1:  # DIFF
                dr = ((tag >> 4) & 3) - 2
                dg = ((tag >> 2) & 3) - 2
                db = (tag & 3) - 2
                prev = (
                    (prev[0] + dr) % 256,
                    (prev[1] + dg) % 256,
                    (prev[2] + db) % 256,
                    prev[3],
                )
                pos += 1
                counts["diff"] += 1
            elif op == 2:  # LUMA
                if pos + 2 > end_at:
                    raise ValueError("QOI_OP_LUMA truncated")
                dg = (tag & 0x3F) - 32
                b2 = data[pos + 1]
                dr = ((b2 >> 4) & 0x0F) - 8 + dg
                db = (b2 & 0x0F) - 8 + dg
                prev = (
                    (prev[0] + dr) % 256,
                    (prev[1] + dg) % 256,
                    (prev[2] + db) % 256,
                    prev[3],
                )
                pos += 2
                counts["luma"] += 1
            else:  # RUN
                rl = (tag & 0x3F) + 1
                if rl > 62:
                    raise ValueError("forbidden QOI run length")
                if len(pixels) + rl > n_px:
                    raise ValueError("run overruns declared pixels")
                pixels.extend([prev] * rl)
                pos += 1
                counts["run"] += 1
                continue  # run does not re-index prev (already seen)
            # INDEX/DIFF/LUMA fall through to emit + index update
        index[_hash(prev)] = prev
        pixels.append(prev)
    if len(pixels) != n_px:
        raise ValueError(f"decoded {len(pixels)} pixels, expected {n_px}")
    return {
        "width": width,
        "height": height,
        "pixels": pixels,
        "op_counts": counts,
    }


def synth_qoi_pixels(clen: int) -> list[tuple[int, int, int]]:
    """Deterministic RGB stream whose ENCODED op sequence is
    closed-form: each cycle is [RGB jump, run of 1..3 repeats, DIFF
    step, LUMA step], with the jump's green delta forced into
    [64, 191] mod 256 (outside LUMA range from either side), the
    DIFF step fixed at (+1,+1,+1), and the LUMA step's dg in [3, 31]
    (never DIFF-able). Every pixel is a prefix sum of per-cycle
    constants — SQL replays it with window cumsums."""
    n_cycles = clen % 13 + 3
    px: list[tuple[int, int, int]] = []
    r, g, b = 0, 0, 0  # the decoder's start pixel (alpha rides at 255)
    for c in range(n_cycles):
        # jump deltas (from the previous cycle's END pixel)
        jr = 64 + (clen + 17 * c) % 128
        jg = 64 + (clen * 3 + 29 * c) % 128
        jb = 64 + (clen * 5 + 41 * c) % 128
        r, g, b = (r + jr) % 256, (g + jg) % 256, (b + jb) % 256
        px.append((r, g, b))
        run = (clen + c) % 3 + 1
        px.extend([(r, g, b)] * run)
        # DIFF step
        r, g, b = (r + 1) % 256, (g + 1) % 256, (b + 1) % 256
        px.append((r, g, b))
        # LUMA step
        dg = (clen + 3 * c) % 29 + 3
        dr = dg + (c % 15) - 7
        db = dg + (clen + c) % 15 - 7
        r, g, b = (r + dr) % 256, (g + dg) % 256, (b + db) % 256
        px.append((r, g, b))
    return px


def synth_qoi(clen: int) -> bytes:
    """Corpus payload: one-row image (height 1) over the synth stream,
    encoded WITHOUT the index op so the byte layout stays closed-form
    (see module docstring)."""
    px = synth_qoi_pixels(clen)
    return encode_qoi(px, len(px), 1, use_index=False)
