"""Pure-Python baseline JPEG codec (grayscale, public ITU T.81 spec).

Closes the last open item of the compressed-codec boundary (README
decision record; VERDICT r4 item 6): JPEG needs no external library —
the entropy layer is canonical Huffman (spec Annex C/F), the transform
is the 8x8 DCT-II family, and numpy (baked into the container) gives
an exact-enough float IDCT. Scope is the smallest REAL profile:

- baseline sequential DCT (SOF0), 8-bit, ONE component (grayscale) —
  no chroma subsampling / color transform to keep decode semantics
  integer-predictable for differential oracles;
- standard Annex K luminance quantization + Huffman tables on the
  encode side; the DECODER reads whatever DQT/DHT the file carries
  (tables are parsed, never assumed);
- image dimensions multiples of 8 (no partial-MCU edge replication).

The synthetic payload path mirrors `functions/png.py`: blocks are
DC-ONLY, so every decoded pixel is exactly

    clamp(round(dc * q[0] / 8) + 128)

— integer arithmetic a SQL oracle can recompute, while the decoder
still runs the full marker walk, Huffman decode (with byte
unstuffing), dequantization, dezigzag, and a REAL 2D IDCT. Blocks
with AC energy decode correctly too (pytest pins them against a
direct numpy IDCT reference); they're just not used in the
hash-checked oracle because float cosines aren't SQL-portable.

Reference capability mapping: the reference pipeline has no media
columns; this backs the north-star multimodal surface (SURVEY.md
§8.2) where images are opaque binary columns decoded by
Arrow-batched pandas functions.
"""

from __future__ import annotations

import struct

import numpy as np

# --- public-spec constant tables (ITU T.81 Annex K) -----------------------

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]  # raster order

_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))

_AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the canonical assignment of
    Annex C: codes of each length are consecutive, lengths ascending."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _canonical_codes(_DC_BITS, _DC_VALS)
_AC_ENC = _canonical_codes(_AC_BITS, _AC_VALS)

# IDCT basis: M[u, x] = C(u)/2 * cos((2x+1) u pi / 16); block = M.T @ F @ M
_IDCT_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing (spec F.1.2.3)
                    self.buf.append(0x00)
                self._acc = 0
                self._nbits = 0

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self._acc = (self._acc << pad) | ((1 << pad) - 1)  # 1-fill
            self.buf.append(self._acc)
            if self._acc == 0xFF:
                self.buf.append(0x00)
            self._acc = 0
            self._nbits = 0


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _amplitude(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def encode_jpeg_gray(
    blocks: list[list[int]],
    w_blocks: int,
    h_blocks: int,
    quant: list[int] | None = None,
) -> bytes:
    """Quantized 8x8 blocks (each 64 ints in ZIGZAG order, row-major
    block layout) -> baseline grayscale JPEG bytes.

    `blocks` carry QUANTIZED coefficients — the encoder is the
    entropy/container layer only, so a test can place exact
    coefficients and predict the decode. len(blocks) must equal
    w_blocks * h_blocks.
    """
    if len(blocks) != w_blocks * h_blocks:
        raise ValueError("blocks count != w_blocks * h_blocks")
    q = list(quant) if quant is not None else QUANT_LUMA
    if len(q) != 64:
        raise ValueError("quant table must have 64 entries")

    w, h = 8 * w_blocks, 8 * h_blocks
    out = bytearray(b"\xff\xd8")  # SOI
    # DQT: Pq=0 (8-bit), Tq=0; entries in zigzag order per spec
    dqt = bytes([0x00]) + bytes(q[ZIGZAG[i]] for i in range(64))
    out += b"\xff\xdb" + struct.pack(">H", 2 + len(dqt)) + dqt
    # SOF0: 8-bit precision, 1 component (id 1, 1x1 sampling, Tq 0)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT: DC table class 0 id 0, AC table class 1 id 0
    dht = (
        bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS)
        + bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS)
    )
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    # SOS: 1 component, DC/AC table 0, spectral selection 0..63
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    bw = _BitWriter()
    prev_dc = 0
    for blk in blocks:
        if len(blk) != 64:
            raise ValueError("each block must have 64 zigzag coefficients")
        diff = blk[0] - prev_dc
        prev_dc = blk[0]
        s = _category(diff)
        code, length = _DC_ENC[s]
        bw.write(code, length)
        if s:
            bw.write(_amplitude(diff, s), s)
        run = 0
        last_nz = 0
        for k in range(63, 0, -1):
            if blk[k]:
                last_nz = k
                break
        for k in range(1, last_nz + 1):
            v = blk[k]
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = _AC_ENC[0xF0]  # ZRL
                bw.write(code, length)
                run -= 16
            s = _category(v)
            code, length = _AC_ENC[(run << 4) | s]
            bw.write(code, length)
            bw.write(_amplitude(v, s), s)
            run = 0
        if last_nz < 63:
            code, length = _AC_ENC[0x00]  # EOB
            bw.write(code, length)
    bw.flush()
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self._acc = b
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value lookup, canonical assignment."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_huff(br: _BitReader, tree: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        if (length, code) in tree:
            return tree[(length, code)]
    raise ValueError("invalid Huffman code in JPEG scan")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg_gray(data: bytes) -> tuple[int, int, bytes]:
    """Baseline grayscale JPEG bytes -> (width, height, pixel bytes).

    Full marker walk (DQT/DHT/SOF0/SOS parsed from the FILE, Annex K
    never assumed), canonical Huffman decode with byte unstuffing, DC
    prediction, dequantize, dezigzag, numpy 2D IDCT, level shift +128,
    clamp to [0, 255]. Pixels round as floor(x + 0.5) so DC-only
    blocks land exactly on round(dc*q/8) + 128. Raises ValueError on
    structural corruption; progressive / multi-component / non-8-
    multiple dimensions raise ValueError (out of the baseline-gray
    profile's scope).
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    quant: dict[int, list[int]] = {}
    dc_trees: dict[int, dict[tuple[int, int], int]] = {}
    ac_trees: dict[int, dict[tuple[int, int], int]] = {}
    width = height = -1
    comp_q = comp_dc = comp_ac = 0
    scan_start = -1

    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at byte {pos}")
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG (0xFF at end of data)")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:  # standalone
            continue
        if pos + 2 > len(data):
            raise ValueError("truncated JPEG segment header")
        seglen = struct.unpack(">H", data[pos: pos + 2])[0]
        body = data[pos + 2: pos + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated JPEG segment body")
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = list(body[i + 1: i + 65])
                if len(zz) != 64:
                    raise ValueError("truncated DQT")
                raster = [0] * 64
                for k in range(64):
                    raster[ZIGZAG[k]] = zz[k]
                quant[tq] = raster
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1: i + 17])
                n = sum(bits)
                vals = list(body[i + 17: i + 17 + n])
                if len(bits) != 16 or len(vals) != n:
                    raise ValueError("truncated DHT")
                (dc_trees if tc == 0 else ac_trees)[th] = _decode_tree(
                    bits, vals
                )
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            # 6-byte frame header + 3 bytes for the single component
            # spec (id, sampling, Tq) — a corrupted seglen can produce
            # a shorter body that is still "consistent" with itself
            if len(body) < 9:
                raise ValueError("truncated SOF0 segment")
            precision, height, width, ncomp = struct.unpack(
                ">BHHB", body[:6]
            )
            if precision != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component baseline")
            if width % 8 or height % 8:
                raise ValueError("dimensions must be multiples of 8")
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG profile")
        elif marker == 0xDA:  # SOS
            if len(body) < 3:
                raise ValueError("truncated SOS segment")
            if body[0] != 1:
                raise ValueError("only single-component scans")
            comp_dc, comp_ac = body[2] >> 4, body[2] & 0x0F
            scan_start = pos + seglen
            break
        # APPn / COM / DRI etc: skipped (DRI irrelevant — we emit no
        # restart markers; stray RSTn in the scan raises in _BitReader)
        pos += seglen

    if scan_start < 0 or width < 0:
        raise ValueError("missing SOS or SOF0")
    q = quant.get(comp_q)
    if q is None or comp_dc not in dc_trees or comp_ac not in ac_trees:
        raise ValueError("scan references undefined tables")

    # entropy data runs until the EOI marker
    end = data.rfind(b"\xff\xd9")
    if end < scan_start:
        raise ValueError("missing EOI")
    br = _BitReader(data[scan_start:end])

    wb, hb = width // 8, height // 8
    qv = np.array(q, dtype=np.float64).reshape(8, 8)
    pixels = np.empty((height, width), dtype=np.uint8)
    prev_dc = 0
    for b in range(wb * hb):
        zz = [0] * 64
        s = _read_huff(br, dc_trees[comp_dc])
        diff = _extend(br.read_bits(s), s) if s else 0
        prev_dc += diff
        zz[0] = prev_dc
        k = 1
        while k < 64:
            rs = _read_huff(br, ac_trees[comp_ac])
            if rs == 0x00:  # EOB
                break
            run, size = rs >> 4, rs & 0x0F
            if size == 0:
                if run != 15:
                    raise ValueError("invalid AC run/size")
                k += 16  # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC coefficient index overflow")
            zz[k] = _extend(br.read_bits(size), size)
            k += 1
        coeff = np.zeros(64, dtype=np.float64)
        for i in range(64):
            coeff[ZIGZAG[i]] = zz[i]
        f = coeff.reshape(8, 8) * qv
        blk = _IDCT_M.T @ f @ _IDCT_M
        blk = np.clip(np.floor(blk + 0.5) + 128, 0, 255).astype(np.uint8)
        by, bx = divmod(b, wb)
        pixels[by * 8:(by + 1) * 8, bx * 8:(bx + 1) * 8] = blk
    return width, height, pixels.tobytes()


def synth_dc_blocks(clen: int, w_blocks: int, h_blocks: int) -> list[list[int]]:
    """Deterministic DC-only blocks for the differential payload:
    block b (row-major) carries quantized DC ((clen + 7b) % 64) - 32,
    so with the Annex K table (q[0] = 16) every pixel of block b
    decodes to EXACTLY 2*dc + 128 — in [64, 190], no clamping —
    letting integer SQL predict decoded pixel sums."""
    return [
        [((clen + 7 * b) % 64) - 32] + [0] * 63
        for b in range(w_blocks * h_blocks)
    ]
