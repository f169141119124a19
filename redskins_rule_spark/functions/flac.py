"""FLAC (Free Lossless Audio Codec, RFC 9639 / xiph.org spec) —
REAL lossless-audio encode + decode, end to end.

FLAC is the one mainstream audio codec whose entire decode path is
ALGORITHMIC: rice/unary entropy coding (no Huffman codebooks),
fixed integer predictors (binomial coefficients), CRC-8/CRC-16
frame integrity, and an MD5 of the raw PCM in STREAMINFO that lets
the decoder PROVE losslessness per stream. That makes it the first
codec in this engine where the full spectrum of a real-world format
decodes bit-exactly with zero carried spec tables — unlike the MP3
(Table B.7 pair tables 2-31) and AAC (spectral codebooks) seams.

Profile (documented, enforced by named ValueErrors, not silent):
EVERY channel layout the format defines — mono, stereo (all four
channel assignments incl. left/side, right/side, mid/side), and
3-8 channel independent-coding streams — at depths 8/16/24/32 with
fixed OR variable blocking; ALL four subframe types — CONSTANT,
VERBATIM, FIXED orders 0-4, and LPC orders 1-32 (verbatim-coded
quantized coefficients + arithmetic-shift prediction, §9.2.5).
BOTH residual coding methods — rice (00, 4-bit parameters) and
rice2 (01, 5-bit) — including the all-ones escape to raw binary;
partition orders 0+. Wasted-bits flag parsed, must be 0. Within
this profile the decode is COMPLETE; the ONE remaining refusal is
raised by name: 12/20-bit depths (non-byte-aligned PCM makes the
MD5 packing ambiguous — a correct refusal).

Reference parity: the reference pipeline (nfl-elec-transform-v2.py)
has no media path at all — this module is extension surface for the
multimodal curation tier (SURVEY §2 extension rows), same seam
discipline as functions/mp3.py / functions/aac.py.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

__all__ = [
    "encode_flac",
    "parse_flac",
    "synth_flac",
    "crc8",
    "crc16",
]


# --- CRCs (RFC 9639 §9.2/§9.3: CRC-8 poly 0x07, CRC-16 poly 0x8005,
# both init 0, MSB-first, no reflection, no final xor) ---------------------

def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r ^= b
        for _ in range(8):
            r = ((r << 1) ^ 0x07) & 0xFF if r & 0x80 else (r << 1) & 0xFF
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r ^= b << 8
        for _ in range(8):
            r = ((r << 1) ^ 0x8005) & 0xFFFF if r & 0x8000 \
                else (r << 1) & 0xFFFF
    return r


# --- bit cursors (MSB-first, shared conventions with functions/mp3) ------

class _Bits:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        end = self.pos + n
        if end > 8 * len(self.data):
            raise ValueError("flac: bit field overruns stream")
        v = 0
        p = self.pos
        for _ in range(n):
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = end
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """RFC 9639 §8.8: as many 0 bits as the value, then a 1 bit."""
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("flac: runaway unary quotient")
        return q


class _BitsOut:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, n: int) -> None:
        if value < 0 or value >= (1 << n):
            raise ValueError(f"flac: field value {value} exceeds {n} bits")
        for i in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc = 0
                self._n = 0

    def write_signed(self, value: int, n: int) -> None:
        self.write(value & ((1 << n) - 1), n)

    def write_unary(self, q: int) -> None:
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def pad_to_byte(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


# --- fixed predictors (RFC 9639 §9.2.4: binomial-coefficient taps) -------

_FIXED_TAPS: dict[int, tuple[int, ...]] = {
    0: (),
    1: (1,),
    2: (2, -1),
    3: (3, -3, 1),
    4: (4, -6, 4, -1),
}

VERBATIM_CODE = 5  # this module's fingerprint code for VERBATIM subframes
LPC_CODE_BASE = 8  # fingerprint code for LPC subframes: 8 + order


def _residuals(samples: list[int], order: int) -> list[int]:
    taps = _FIXED_TAPS[order]
    return [
        samples[i] - sum(t * samples[i - 1 - j] for j, t in enumerate(taps))
        for i in range(order, len(samples))
    ]


def _zigzag(v: int) -> int:
    """RFC 9639 §8.8 residual fold: 0,-1,1,-2,2… → 0,1,2,3,4…"""
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _unzigzag(u: int) -> int:
    return (u >> 1) if (u & 1) == 0 else -((u + 1) >> 1)


def _utf8_number(n: int) -> bytes:
    """Frame-number coding (RFC 9639 §9.1.5): UTF-8-style, extended
    to 36 bits (up to 7 bytes)."""
    if n < 0x80:
        return bytes([n])
    for nbytes, lead in ((2, 0xC0), (3, 0xE0), (4, 0xF0), (5, 0xF8),
                         (6, 0xFC), (7, 0xFE)):
        if n < (1 << (5 * nbytes + 1)) or nbytes == 7:
            out = [lead | (n >> (6 * (nbytes - 1)))]
            for k in range(nbytes - 2, -1, -1):
                out.append(0x80 | ((n >> (6 * k)) & 0x3F))
            return bytes(out)
    raise ValueError("flac: frame number exceeds 36 bits")


def _read_utf8_number(br: _Bits) -> int:
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    nbytes = 0
    for mask, val, nb in ((0xE0, 0xC0, 2), (0xF0, 0xE0, 3), (0xF8, 0xF0, 4),
                          (0xFC, 0xF8, 5), (0xFE, 0xFC, 6), (0xFF, 0xFE, 7)):
        if (b0 & mask) == val:
            nbytes = nb
            break
    if not nbytes:
        raise ValueError("flac: invalid coded-number lead byte")
    n = b0 & (0x7F >> nbytes) if nbytes < 7 else 0
    for _ in range(nbytes - 1):
        c = br.read(8)
        if (c & 0xC0) != 0x80:
            raise ValueError("flac: invalid coded-number continuation byte")
        n = (n << 6) | (c & 0x3F)
    return n


# --- encoder ---------------------------------------------------------------

@dataclass(frozen=True)
class FlacFrame:
    blocksize: int
    subframe_code: int  # FIXED: order; VERBATIM: 5; LPC: 8 + order
    samples: tuple[int, ...]
    n_escapes: int  # rice partitions that used the all-ones raw escape
    k_fp: int = 0   # Σ (p+1)·k over non-escape rice partitions


@dataclass(frozen=True)
class FlacStream:
    sample_rate: int
    bits_per_sample: int
    total_samples: int
    frames: tuple[FlacFrame, ...]
    md5_ok: bool


def _lpc_predict(history: list[int], coeffs: tuple[int, ...],
                 shift: int) -> int:
    """RFC 9639 §9.2.5 prediction: integer dot product, then an
    ARITHMETIC right shift (Python's >> on ints is arithmetic)."""
    return sum(c * history[-1 - j] for j, c in enumerate(coeffs)) >> shift


def _encode_residuals(
    out: _BitsOut, res: list[int], nsamp: int, order: int, po: int,
    rice2: bool = False,
) -> int:
    """Coded-residual section (shared by FIXED and LPC subframes):
    coding method 00 (4-bit rice) or 01 (rice2, 5-bit parameters),
    partition order, per-partition rice parameter with the all-ones
    raw escape (0b1111 / 0b11111). Returns escape count."""
    pbits = 5 if rice2 else 4
    esc_code = (1 << pbits) - 1  # 15 or 31
    out.write(0b01 if rice2 else 0b00, 2)
    if po and (nsamp % (1 << po) or (nsamp >> po) <= order):
        raise ValueError("flac: partition order incompatible with blocksize")
    out.write(po, 4)
    part_len = nsamp >> po
    idx = 0
    escapes = 0
    for p in range(1 << po):
        want = part_len - order if p == 0 else part_len
        part = res[idx: idx + want]
        idx += want
        us = [_zigzag(v) for v in part]
        max_u = max(us, default=0)
        k = max(max_u.bit_length() - 1, 0)
        if k >= esc_code:
            # escape: raw two's-complement at a fixed width
            escapes += 1
            width = max((max(part).bit_length() if part else 0),
                        (min(part, default=0)).bit_length() + 1, 1) + 1
            if width > 31:
                # the 5-bit width field tops out at 31 raw bits; a
                # partition needing more must stay rice-coded (its
                # unary quotients grow, but stay decodable) — raising
                # by name beats the silent min(width, 31) corruption
                raise ValueError(
                    "flac: raw-escape partition needs more than 31 bits"
                )
            out.write(esc_code, pbits)
            out.write(width, 5)
            for v in part:
                out.write_signed(v, width)
        else:
            out.write(k, pbits)
            for u in us:
                out.write_unary(u >> k)
                if k:
                    out.write(u & ((1 << k) - 1), k)
    return escapes


def _encode_subframe(
    out: _BitsOut, samples: list[int], code: int, bps: int, po: int,
    lpc: dict | None = None, rice2: bool = False,
) -> int:
    """One subframe (header + payload). Returns rice-escape count."""
    out.write(0, 1)  # zero pad bit
    if code == VERBATIM_CODE:
        out.write(0b000001, 6)
        out.write(0, 1)  # wasted bits
        for s in samples:
            out.write_signed(s, bps)
        return 0
    if lpc is not None:
        order = lpc["order"]
        coeffs = tuple(lpc["coeffs"])
        precision = lpc["precision"]
        shift = lpc["shift"]
        if not 1 <= order <= 32 or len(coeffs) != order:
            raise ValueError("flac: LPC order must be 1-32 with one "
                             "coefficient per tap")
        if not 2 <= precision <= 15:
            raise ValueError("flac: qlp precision must be 2-15 bits")
        if not 0 <= shift <= 15:
            raise ValueError("flac: qlp shift must be 0-15")
        if any(c < -(1 << (precision - 1)) or c >= (1 << (precision - 1))
               for c in coeffs):
            raise ValueError("flac: LPC coefficient exceeds its precision")
        if len(samples) <= order:
            raise ValueError("flac: blocksize must exceed predictor order")
        out.write(0b100000 | (order - 1), 6)
        out.write(0, 1)  # wasted bits
        for s in samples[:order]:  # warmup, verbatim
            out.write_signed(s, bps)
        out.write(precision - 1, 4)
        out.write(shift, 5)  # 5-bit shift (non-negative per spec note)
        for c in coeffs:
            out.write_signed(c, precision)
        res = [
            samples[i] - _lpc_predict(samples[:i], coeffs, shift)
            for i in range(order, len(samples))
        ]
        return _encode_residuals(out, res, len(samples), order, po,
                                 rice2=rice2)
    order = code
    if order not in _FIXED_TAPS:
        raise ValueError("flac: fixed predictor order must be 0-4")
    if len(samples) <= order:
        raise ValueError("flac: blocksize must exceed predictor order")
    out.write(0b001000 | order, 6)
    out.write(0, 1)  # wasted bits
    for s in samples[:order]:  # warmup, verbatim
        out.write_signed(s, bps)
    res = _residuals(samples, order)
    return _encode_residuals(out, res, len(samples), order, po,
                             rice2=rice2)


# Frame-header sample-size codes (RFC 9639 §9.1.4). 12/20-bit depths
# have codes but non-byte-aligned MD5 packing — raised by name below.
_SS_CODES: dict[int, int] = {8: 0b001, 12: 0b010, 16: 0b100,
                             20: 0b101, 24: 0b110, 32: 0b111}
MD5_DEPTHS = (8, 16, 24, 32)  # byte-aligned PCM → well-defined MD5


def _md5_pcm(md5, s: int, bps: int) -> None:
    md5.update((s & ((1 << bps) - 1)).to_bytes(bps // 8, "little"))


def encode_flac(
    frames: list[dict],
    sample_rate: int = 44100,
    bps: int = 16,
    variable: bool = False,
) -> bytes:
    """Mono FLAC stream. Each frames[i] is a dict: 'samples' (list of
    signed ints fitting bps), 'code' (0-4 = FIXED order, VERBATIM_CODE
    = verbatim), 'po' (rice partition order), optional 'lpc' and
    'rice2' (coding method 01, 5-bit parameters). Depths 8/16/24/32
    (byte-aligned PCM — MD5 is well defined; 12/20 raised by name).

    Fixed blocking (default, RFC 9639 §9.1.2): every frame but the
    last shares one blocksize and the coded number is the frame
    index. `variable=True` allows any per-frame blocksize; the coded
    number becomes the frame's STARTING SAMPLE index and STREAMINFO
    carries the true min/max blocksizes. STREAMINFO always carries
    the real MD5 of the little-endian PCM so decoders can prove
    losslessness."""
    if not frames:
        raise ValueError("flac: at least one frame")
    if bps not in _SS_CODES:
        raise ValueError("flac: bits-per-sample must be 8/12/16/20/24/32")
    if bps not in MD5_DEPTHS:
        raise ValueError(
            "flac: 12/20-bit PCM is not byte-aligned — MD5 packing is "
            "ambiguous; depths 8/16/24/32 are supported"
        )
    sizes = [len(fr["samples"]) for fr in frames]
    if variable:
        min_bs, max_bs = min(sizes), max(sizes)
    else:
        bs0 = sizes[0]
        for n in sizes[:-1]:
            if n != bs0:
                raise ValueError(
                    "flac: fixed blocking needs constant blocksize"
                    " (only the last frame may be short)"
                )
        if sizes[-1] > bs0:
            raise ValueError("flac: last frame exceeds the stream blocksize")
        min_bs = max_bs = bs0
    all_samples = [s for fr in frames for s in fr["samples"]]
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    if any(s < lo or s > hi for s in all_samples):
        raise ValueError(f"flac: sample exceeds {bps}-bit range")
    md5 = hashlib.md5()
    for s in all_samples:
        _md5_pcm(md5, s, bps)
    info = _BitsOut()
    info.write(min_bs, 16)       # min_blocksize
    info.write(max_bs, 16)       # max_blocksize
    info.write(0, 24)            # min_framesize (unknown)
    info.write(0, 24)            # max_framesize (unknown)
    info.write(sample_rate, 20)
    info.write(0, 3)             # channels - 1 (mono)
    info.write(bps - 1, 5)
    info.write(len(all_samples), 36)
    streaminfo = bytes(info.buf) + md5.digest()
    assert len(streaminfo) == 34
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34]) + streaminfo  # last-block flag + type 0
    start = 0
    for n, fr in enumerate(frames):
        nsamp = len(fr["samples"])
        wide_bs = nsamp > 256  # 16-bit blocksize-at-end code
        hdr = _BitsOut()
        hdr.write(0b11111111111110, 14)       # sync
        hdr.write(0, 1)                        # reserved
        hdr.write(1 if variable else 0, 1)     # blocking strategy
        hdr.write(0b0111 if wide_bs else 0b0110, 4)  # blocksize at end
        hdr.write(0b0000, 4)                   # sample rate: STREAMINFO
        hdr.write(0b0000, 4)                   # channels: mono
        hdr.write(_SS_CODES[bps], 3)           # sample size
        hdr.write(0, 1)                        # reserved
        hdr.pad_to_byte()
        coded = _utf8_number(start if variable else n)
        bs_field = ((nsamp - 1).to_bytes(2, "big") if wide_bs
                    else bytes([nsamp - 1]))
        head = bytes(hdr.buf) + coded + bs_field
        head += bytes([crc8(head)])
        body = _BitsOut()
        _encode_subframe(body, list(fr["samples"]), fr["code"], bps,
                         fr.get("po", 0), fr.get("lpc"),
                         fr.get("rice2", False))
        body.pad_to_byte()
        frame = head + bytes(body.buf)
        out += frame + crc16(frame).to_bytes(2, "big")
        start += nsamp
    return bytes(out)


# --- decoder ---------------------------------------------------------------

def _decode_subframe(
    br: _Bits, nsamp: int, bps: int
) -> tuple[int, list[int], int, int]:
    """One subframe → (fingerprint code, samples, rice-escape count,
    rice-parameter fingerprint Σ (p+1)·k)."""
    if br.read(1):
        raise ValueError("flac: subframe header pad bit must be 0")
    sft = br.read(6)
    wasted = br.read(1)
    if wasted:
        raise ValueError("flac: wasted-bits-per-sample outside profile")
    if sft == 0b000000:  # CONSTANT
        v = br.read_signed(bps)
        return 0, [v] * nsamp, 0, 0
    if sft == 0b000001:  # VERBATIM
        return (VERBATIM_CODE,
                [br.read_signed(bps) for _ in range(nsamp)], 0, 0)
    if 0b001000 <= sft <= 0b001100:  # FIXED order 0-4
        order = sft & 0b111
        if nsamp <= order:
            raise ValueError("flac: fixed order >= blocksize")
        samples = [br.read_signed(bps) for _ in range(order)]
        res, escapes, k_fp = _decode_residuals(br, nsamp, order)
        taps = _FIXED_TAPS[order]
        for i in range(order, nsamp):
            samples.append(
                res[i - order]
                + sum(t * samples[i - 1 - j] for j, t in enumerate(taps))
            )
        return order, samples, escapes, k_fp
    if sft & 0b100000:  # LPC order 1-32
        order = (sft & 0b011111) + 1
        if nsamp <= order:
            raise ValueError("flac: LPC order >= blocksize")
        samples = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4)
        if precision == 0b1111:
            raise ValueError("flac: qlp precision code 1111 is invalid")
        precision += 1
        shift = br.read(5)
        if shift & 0b10000:
            raise ValueError("flac: negative qlp shift is forbidden")
        coeffs = tuple(br.read_signed(precision) for _ in range(order))
        res, escapes, k_fp = _decode_residuals(br, nsamp, order)
        for i in range(order, nsamp):
            samples.append(
                res[i - order] + _lpc_predict(samples, coeffs, shift)
            )
        return LPC_CODE_BASE + order, samples, escapes, k_fp
    raise ValueError("flac: reserved subframe type")


def _decode_residuals(
    br: _Bits, nsamp: int, order: int
) -> tuple[list[int], int, int]:
    """Coded-residual section (shared by FIXED and LPC): rice (method
    00, 4-bit parameters) or rice2 (method 01, 5-bit parameters)
    partitions with the all-ones raw escape. Returns (residuals,
    escape count, k_fp) where k_fp = Σ (p+1)·k over the non-escape
    partitions — the parameter-choice fingerprint differential
    oracles replay (rice2's k can reach 30, values impossible under
    4-bit rice, so method confusion breaks it)."""
    method = br.read(2)
    if method not in (0b00, 0b01):
        raise ValueError("flac: residual coding methods 1x are reserved")
    pbits = 5 if method == 0b01 else 4
    esc_code = (1 << pbits) - 1
    po = br.read(4)
    if nsamp % (1 << po):
        raise ValueError("flac: blocksize not divisible by 2^partition")
    part_len = nsamp >> po
    if part_len <= order and po:
        raise ValueError("flac: partition shorter than predictor order")
    res: list[int] = []
    escapes = 0
    k_fp = 0
    for p in range(1 << po):
        want = part_len - order if p == 0 else part_len
        k = br.read(pbits)
        if k == esc_code:
            escapes += 1
            width = br.read(5)
            if width == 0:
                res.extend([0] * want)
            else:
                res.extend(br.read_signed(width) for _ in range(want))
        else:
            k_fp += (p + 1) * k
            for _ in range(want):
                q = br.read_unary()
                u = (q << k) | (br.read(k) if k else 0)
                res.append(_unzigzag(u))
    return res, escapes, k_fp


def parse_flac(data: bytes) -> FlacStream:
    """REAL full decode of the profile: fLaC marker → metadata-block
    walk → STREAMINFO → per-frame header (sync, codes, UTF-8 frame
    number, CRC-8) → subframe decode (constant/verbatim/fixed +
    rice residuals incl. escape partitions) → frame CRC-16 → stream
    MD5 check against the reconstructed PCM. Raises ValueError
    naming the defect on any corruption; `md5_ok` is the decoder's
    losslessness proof."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC stream marker")
    pos = 4
    streaminfo: bytes | None = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata block header")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1: pos + 4], "big")
        body = data[pos + 4: pos + 4 + blen]
        if len(body) != blen:
            raise ValueError("flac: truncated metadata block body")
        if btype == 0:
            if streaminfo is not None:
                raise ValueError("flac: duplicate STREAMINFO")
            if blen != 34:
                raise ValueError("flac: STREAMINFO must be 34 bytes")
            streaminfo = body
        elif btype == 127:
            raise ValueError("flac: metadata block type 127 is invalid")
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: STREAMINFO block is mandatory")
    si = _Bits(streaminfo)
    min_bs = si.read(16)
    max_bs = si.read(16)
    si.read(24), si.read(24)  # framesizes (unknown allowed)
    sample_rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_declared = streaminfo[18:34]
    if channels != 1:
        raise ValueError("flac: this walk decodes mono streams "
                         "(parse_flac_stereo handles 2ch, "
                         "parse_flac_multichannel 3-8ch)")
    if bps not in _SS_CODES:
        raise ValueError("flac: bits-per-sample must be 8/12/16/20/24/32")
    if bps not in MD5_DEPTHS:
        raise ValueError(
            "flac: 12/20-bit PCM is not byte-aligned — MD5 packing is "
            "ambiguous; depths 8/16/24/32 are supported"
        )
    frames: list[FlacFrame] = []
    md5 = hashlib.md5()
    seen = 0
    n_expected = 0
    blocking: int | None = None  # 0 fixed / 1 variable, set by frame 0
    while pos < len(data):
        frame_start = pos
        br = _Bits(data)
        br.pos = 8 * pos
        if br.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        if br.read(1):
            raise ValueError("flac: frame header reserved bit set")
        strat = br.read(1)
        if blocking is None:
            blocking = strat
            if blocking == 0 and min_bs != max_bs:
                raise ValueError(
                    "flac: fixed blocking needs one STREAMINFO blocksize"
                )
        elif strat != blocking:
            raise ValueError("flac: blocking strategy must not change "
                             "mid-stream")
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: frame header reserved bit set")
        if ch_code != 0:
            raise ValueError("flac: this walk decodes mono streams "
                             "(parse_flac_stereo handles 2ch)")
        if ss_code != _SS_CODES[bps]:
            raise ValueError("flac: frame sample-size code disagrees "
                             "with STREAMINFO")
        if sr_code != 0:
            raise ValueError("flac: sample rate must defer to STREAMINFO")
        fno = _read_utf8_number(br)
        if blocking == 1:
            # variable blocking: the coded number is the frame's
            # starting SAMPLE index (RFC 9639 §9.1.5)
            if fno != seen:
                raise ValueError("flac: frame sample numbers must be "
                                 "cumulative")
        else:
            if fno != n_expected:
                raise ValueError("flac: frame numbers must be sequential")
        n_expected += 1
        if bs_code == 0b0110:
            nsamp = br.read(8) + 1
        elif bs_code == 0b0111:
            nsamp = br.read(16) + 1
        elif bs_code == 0b0001:
            nsamp = 192
        elif 0b0010 <= bs_code <= 0b0101:
            nsamp = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            nsamp = 256 << (bs_code - 8)
        else:
            raise ValueError("flac: reserved blocksize code")
        hdr_end = br.pos >> 3
        if crc8(data[frame_start:hdr_end]) != data[hdr_end]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br.pos = 8 * (hdr_end + 1)
        code, samples, escapes, k_fp = _decode_subframe(br, nsamp, bps)
        if br.pos & 7:
            if br.read(8 - (br.pos & 7)):
                raise ValueError("flac: nonzero frame padding bits")
        crc_at = br.pos >> 3
        declared = int.from_bytes(data[crc_at: crc_at + 2], "big")
        if crc16(data[frame_start:crc_at]) != declared:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = crc_at + 2
        if blocking == 1:
            if nsamp > max_bs:
                raise ValueError("flac: frame exceeds STREAMINFO "
                                 "max_blocksize")
            if nsamp < min_bs and seen + nsamp < total:
                raise ValueError("flac: frame below STREAMINFO "
                                 "min_blocksize before the last")
        elif seen + nsamp < total and nsamp != max_bs:
            raise ValueError("flac: short frame before the last")
        seen += nsamp
        for s in samples:
            _md5_pcm(md5, s, bps)
        frames.append(FlacFrame(nsamp, code, tuple(samples), escapes,
                                k_fp))
    if seen != total:
        raise ValueError("flac: decoded samples disagree with STREAMINFO")
    return FlacStream(
        sample_rate=sample_rate,
        bits_per_sample=bps,
        total_samples=total,
        frames=tuple(frames),
        md5_ok=md5.digest() == md5_declared,
    )


# --- corpus synth ----------------------------------------------------------

BLOCKSIZE = 32


def synth_samples(clen: int, total: int) -> list[int]:
    """The closed-form PCM both engines replay:
    s_k = ((clen*31 + 7*k*k + 13*k) % 4096) - 2048."""
    return [((clen * 31 + 7 * k * k + 13 * k) % 4096) - 2048
            for k in range(total)]


def synth_flac(clen: int) -> bytes:
    """Deterministic FLAC stream from a character length, every knob
    integer-predictable (the closed forms the q225 oracle replays):

      total          = 33 + clen % 71   (2-4 frames of blocksize 32)
      sample_rate    = 8000 + 100 * (clen % 5)
      frame f code   = (clen + f) % 6   (0-4 FIXED order, 5 VERBATIM)
        … except a SHORT last frame, which drops FIXED to order 0
          (warmup must fit) — VERBATIM stays VERBATIM
      partition po   = (clen + f) % 2 on full frames, 0 on the last
    Samples are `synth_samples`; order-4 residuals at this amplitude
    exercise multi-bit rice quotients. clen % 16 == 0 streams multiply
    frame 0's samples by 8 (|s| stays 16-bit-safe): the amplified
    high-order residuals push zigzag magnitudes past 2^15, so the
    encoder's k>=15 rule takes the 0b1111 RAW-ESCAPE partition path —
    the escape branch is corpus-exercised, not just unit-tested."""
    total = 33 + clen % 71
    samples = synth_samples(clen, total)
    if clen % 16 == 0:
        for k in range(min(BLOCKSIZE, total)):
            samples[k] *= 8
    frames: list[dict] = []
    f = 0
    for lo in range(0, total, BLOCKSIZE):
        chunk = samples[lo: lo + BLOCKSIZE]
        code = (clen + f) % 6
        full = len(chunk) == BLOCKSIZE
        if not full and code != VERBATIM_CODE:
            code = 0
        po = (clen + f) % 2 if full else 0
        frames.append({"samples": chunk, "code": code, "po": po})
        f += 1
    return encode_flac(frames, sample_rate=8000 + 100 * (clen % 5))


def synth_flac_lpc(clen: int) -> bytes:
    """Deterministic LPC-subframe FLAC stream (the q226 closed
    forms — everything the oracle replays):

      total          = 33 + clen % 71   (2-4 frames of blocksize 32)
      sample_rate    = 8000 + 100 * (clen % 5)
      full frame f:  LPC order (clen + f) % 3 + 1, precision 12,
                     shift 10 + (clen + f) % 4 — except frame 0 of
                     clen % 16 == 0 streams, which drops to shift 2:
                     barely-shifted 12-bit coefficients blow the
                     residuals past 2^15 zigzag, forcing the 0b1111
                     raw-escape partition path through the LPC route
                     coeffs c_j = ((clen*7 + 11*(j+1) + 17*f) % 2048)
                                  - 1024,
                     rice partition order (clen + f) % 2
      short last frame: LPC order 1 when >= 2 samples, else VERBATIM
                     (an order-1 warmup needs a second sample to
                     predict), partition order 0
    Samples are `synth_samples` (never amplified here)."""
    total = 33 + clen % 71
    samples = synth_samples(clen, total)
    frames: list[dict] = []
    f = 0
    for lo in range(0, total, BLOCKSIZE):
        chunk = samples[lo: lo + BLOCKSIZE]
        full = len(chunk) == BLOCKSIZE
        if full or len(chunk) >= 2:
            order = (clen + f) % 3 + 1 if full else 1
            coeffs = [((clen * 7 + 11 * (j + 1) + 17 * f) % 2048) - 1024
                      for j in range(order)]
            frames.append({
                "samples": chunk,
                "code": order,  # ignored when 'lpc' is present
                "po": (clen + f) % 2 if full else 0,
                "lpc": {
                    "order": order,
                    "precision": 12,
                    "shift": 2 if (clen % 16 == 0 and f == 0)
                             else 10 + (clen + f) % 4,
                    "coeffs": coeffs,
                },
            })
        else:
            frames.append({"samples": chunk, "code": VERBATIM_CODE,
                           "po": 0})
        f += 1
    return encode_flac(frames, sample_rate=8000 + 100 * (clen % 5))


# --- stereo decorrelation (RFC 9639 §4.2 channel assignments) -------------

STEREO_MODES = ("LR", "LS", "RS", "MS")
_CH_CODE = {"LR": 0b0001, "LS": 0b1000, "RS": 0b1001, "MS": 0b1010}
_CH_MODE = {v: k for k, v in _CH_CODE.items()}


@dataclass(frozen=True)
class FlacStereoFrame:
    blocksize: int
    mode: str  # LR / LS / RS / MS
    codes: tuple[int, int]  # per stored channel, same convention
    left: tuple[int, ...]
    right: tuple[int, ...]
    n_escapes: int


@dataclass(frozen=True)
class FlacStereoStream:
    sample_rate: int
    total_samples: int  # inter-channel samples (per-channel count)
    frames: tuple[FlacStereoFrame, ...]
    md5_ok: bool
    bits_per_sample: int = 16


def _decorrelate(
    left: list[int], right: list[int], mode: str
) -> tuple[list[int], list[int], int, int]:
    """(stored ch0, stored ch1, ch0 extra bit, ch1 extra bit). The
    side channel carries left-right and needs bps+1 bits; for
    mid/side the mid is the FLOOR average (l+r)>>1 — the dropped
    parity bit is recovered from the side channel's low bit, whose
    parity equals l+r's."""
    side = [a - b for a, b in zip(left, right)]
    if mode == "LR":
        return left, right, 0, 0
    if mode == "LS":
        return left, side, 0, 1
    if mode == "RS":
        return side, right, 1, 0
    if mode == "MS":
        return [(a + b) >> 1 for a, b in zip(left, right)], side, 0, 1
    raise ValueError("flac: unknown stereo mode")


def _recorrelate(
    ch0: list[int], ch1: list[int], mode: str
) -> tuple[list[int], list[int]]:
    if mode == "LR":
        return ch0, ch1
    if mode == "LS":
        return ch0, [a - s for a, s in zip(ch0, ch1)]
    if mode == "RS":
        return [r + s for s, r in zip(ch0, ch1)], ch1
    if mode == "MS":
        left, right = [], []
        for m, s in zip(ch0, ch1):
            total = 2 * m + (s & 1)
            left.append((total + s) >> 1)
            right.append((total - s) >> 1)
        return left, right
    raise ValueError("flac: unknown stereo mode")


def encode_flac_stereo(
    frames: list[dict],
    sample_rate: int = 44100,
    bps: int = 16,
    variable: bool = False,
) -> bytes:
    """Stereo FLAC stream with per-frame channel decorrelation. Each
    frames[i]: 'left'/'right' (equal-length signed sample lists),
    'mode' in STEREO_MODES, 'code' (FIXED order / VERBATIM_CODE
    applied to both stored channels), 'po', optional 'rice2'. Depths
    8/16/24/32 (byte-aligned MD5); `variable=True` allows any
    per-frame blocksize with starting-sample-number headers — the
    same breadth as the mono encoder. STREAMINFO's MD5 covers the
    channel-interleaved little-endian PCM, so the decoder's
    losslessness proof spans BOTH channels and every mode."""
    if not frames:
        raise ValueError("flac: at least one frame")
    if bps not in _SS_CODES:
        raise ValueError("flac: bits-per-sample must be 8/12/16/20/24/32")
    if bps not in MD5_DEPTHS:
        raise ValueError(
            "flac: 12/20-bit PCM is not byte-aligned — MD5 packing is "
            "ambiguous; depths 8/16/24/32 are supported"
        )
    for fr in frames:
        if len(fr["left"]) != len(fr["right"]):
            raise ValueError("flac: channel length mismatch")
    sizes = [len(fr["left"]) for fr in frames]
    if variable:
        min_bs, max_bs = min(sizes), max(sizes)
    else:
        bs0 = sizes[0]
        for n in sizes[:-1]:
            if n != bs0:
                raise ValueError(
                    "flac: fixed blocking needs constant blocksize"
                    " (only the last frame may be short)"
                )
        if sizes[-1] > bs0:
            raise ValueError("flac: last frame exceeds the stream blocksize")
        min_bs = max_bs = bs0
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    md5 = hashlib.md5()
    total = 0
    for fr in frames:
        for a, b in zip(fr["left"], fr["right"]):
            if not (lo <= a <= hi and lo <= b <= hi):
                raise ValueError(f"flac: sample exceeds {bps}-bit range")
            _md5_pcm(md5, a, bps)
            _md5_pcm(md5, b, bps)
        total += len(fr["left"])
    info = _BitsOut()
    info.write(min_bs, 16)
    info.write(max_bs, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(1, 3)             # channels - 1 (stereo)
    info.write(bps - 1, 5)
    info.write(total, 36)
    streaminfo = bytes(info.buf) + md5.digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34]) + streaminfo
    start = 0
    for n, fr in enumerate(frames):
        nsamp = len(fr["left"])
        wide_bs = nsamp > 256
        mode = fr["mode"]
        ch0, ch1, x0, x1 = _decorrelate(
            list(fr["left"]), list(fr["right"]), mode
        )
        hdr = _BitsOut()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)
        hdr.write(1 if variable else 0, 1)
        hdr.write(0b0111 if wide_bs else 0b0110, 4)
        hdr.write(0b0000, 4)
        hdr.write(_CH_CODE[mode], 4)
        hdr.write(_SS_CODES[bps], 3)
        hdr.write(0, 1)
        hdr.pad_to_byte()
        coded = _utf8_number(start if variable else n)
        bs_field = ((nsamp - 1).to_bytes(2, "big") if wide_bs
                    else bytes([nsamp - 1]))
        head = bytes(hdr.buf) + coded + bs_field
        head += bytes([crc8(head)])
        body = _BitsOut()
        _encode_subframe(body, ch0, fr["code"], bps + x0, fr.get("po", 0),
                         rice2=fr.get("rice2", False))
        _encode_subframe(body, ch1, fr["code"], bps + x1, fr.get("po", 0),
                         rice2=fr.get("rice2", False))
        body.pad_to_byte()
        frame = head + bytes(body.buf)
        out += frame + crc16(frame).to_bytes(2, "big")
        start += nsamp
    return bytes(out)


def parse_flac_stereo(data: bytes) -> FlacStereoStream:
    """REAL stereo decode: the mono walk plus per-frame channel
    decorrelation — left/side, right/side (side channel FIRST), and
    mid/side with the floor-average parity recovered from the side
    channel's low bit. The side channel reads at bps+1. MD5 proof
    over the interleaved reconstruction covers both channels."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC stream marker")
    pos = 4
    streaminfo: bytes | None = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata block header")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1: pos + 4], "big")
        if len(data) < pos + 4 + blen:
            raise ValueError("flac: truncated metadata block body")
        if btype == 0:
            if blen != 34:
                raise ValueError("flac: STREAMINFO must be 34 bytes")
            streaminfo = data[pos + 4: pos + 38]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: STREAMINFO block is mandatory")
    si = _Bits(streaminfo)
    min_bs = si.read(16)
    max_bs = si.read(16)
    si.read(24), si.read(24)
    sample_rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_declared = streaminfo[18:34]
    if channels != 2:
        raise ValueError("flac: this walk decodes stereo streams "
                         "(use parse_flac for mono, "
                         "parse_flac_multichannel for 3-8 channels)")
    if bps not in _SS_CODES:
        raise ValueError("flac: bits-per-sample must be 8/12/16/20/24/32")
    if bps not in MD5_DEPTHS:
        raise ValueError(
            "flac: 12/20-bit PCM is not byte-aligned — MD5 packing is "
            "ambiguous; depths 8/16/24/32 are supported"
        )
    frames: list[FlacStereoFrame] = []
    md5 = hashlib.md5()
    seen = 0
    n_expected = 0
    blocking: int | None = None
    while pos < len(data):
        frame_start = pos
        br = _Bits(data)
        br.pos = 8 * pos
        if br.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        if br.read(1):
            raise ValueError("flac: frame header reserved bit set")
        strat = br.read(1)
        if blocking is None:
            blocking = strat
            if blocking == 0 and min_bs != max_bs:
                raise ValueError(
                    "flac: fixed blocking needs one STREAMINFO blocksize"
                )
        elif strat != blocking:
            raise ValueError("flac: blocking strategy must not change "
                             "mid-stream")
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: frame header reserved bit set")
        if ch_code not in _CH_MODE:
            raise ValueError(
                "flac: stereo walk takes channel assignments 0001 "
                "(independent) and 1000-1010 (decorrelated)"
            )
        mode = _CH_MODE[ch_code]
        if ss_code != _SS_CODES[bps]:
            raise ValueError("flac: frame sample-size code disagrees "
                             "with STREAMINFO")
        if sr_code != 0:
            raise ValueError("flac: sample rate must defer to STREAMINFO")
        fno = _read_utf8_number(br)
        if blocking == 1:
            if fno != seen:
                raise ValueError("flac: frame sample numbers must be "
                                 "cumulative")
        else:
            if fno != n_expected:
                raise ValueError("flac: frame numbers must be sequential")
        n_expected += 1
        if bs_code == 0b0110:
            nsamp = br.read(8) + 1
        elif bs_code == 0b0111:
            nsamp = br.read(16) + 1
        elif bs_code == 0b0001:
            nsamp = 192
        elif 0b0010 <= bs_code <= 0b0101:
            nsamp = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            nsamp = 256 << (bs_code - 8)
        else:
            raise ValueError("flac: reserved blocksize code")
        hdr_end = br.pos >> 3
        if crc8(data[frame_start:hdr_end]) != data[hdr_end]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br.pos = 8 * (hdr_end + 1)
        x0 = 1 if mode == "RS" else 0
        x1 = 1 if mode in ("LS", "MS") else 0
        code0, ch0, esc0, _ = _decode_subframe(br, nsamp, bps + x0)
        code1, ch1, esc1, _ = _decode_subframe(br, nsamp, bps + x1)
        if br.pos & 7:
            if br.read(8 - (br.pos & 7)):
                raise ValueError("flac: nonzero frame padding bits")
        crc_at = br.pos >> 3
        declared = int.from_bytes(data[crc_at: crc_at + 2], "big")
        if crc16(data[frame_start:crc_at]) != declared:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = crc_at + 2
        if blocking == 1:
            if nsamp > max_bs:
                raise ValueError("flac: frame exceeds STREAMINFO "
                                 "max_blocksize")
            if nsamp < min_bs and seen + nsamp < total:
                raise ValueError("flac: frame below STREAMINFO "
                                 "min_blocksize before the last")
        elif seen + nsamp < total and nsamp != max_bs:
            raise ValueError("flac: short frame before the last")
        seen += nsamp
        left, right = _recorrelate(ch0, ch1, mode)
        for a, b in zip(left, right):
            _md5_pcm(md5, a, bps)
            _md5_pcm(md5, b, bps)
        frames.append(
            FlacStereoFrame(nsamp, mode, (code0, code1), tuple(left),
                            tuple(right), esc0 + esc1)
        )
    if seen != total:
        raise ValueError("flac: decoded samples disagree with STREAMINFO")
    return FlacStereoStream(
        sample_rate=sample_rate,
        total_samples=total,
        frames=tuple(frames),
        md5_ok=md5.digest() == md5_declared,
        bits_per_sample=bps,
    )


def synth_right(clen: int, total: int) -> list[int]:
    """Right-channel closed form: r_k = ((clen*17 + 5*k*k + 3*k)
    % 4096) - 2048."""
    return [((clen * 17 + 5 * k * k + 3 * k) % 4096) - 2048
            for k in range(total)]


def synth_flac_stereo(clen: int) -> bytes:
    """Deterministic stereo FLAC stream (the q227 closed forms):

      total       = 33 + clen % 71   (per channel; frames of 32)
      sample_rate = 8000 + 100 * (clen % 5)
      left        = synth_samples, right = synth_right
      frame f:    mode  = STEREO_MODES[(clen + f) % 4]
                  code  = (clen + f) % 5 (FIXED order, both stored
                          channels; short last frame drops to 0)
                  po    = (clen + f) % 2 on full frames, else 0
    All four channel assignments cycle through every stream, so the
    decorrelation inverses (including mid/side parity recovery) are
    corpus-exercised, not just unit-tested."""
    total = 33 + clen % 71
    left = synth_samples(clen, total)
    right = synth_right(clen, total)
    frames: list[dict] = []
    f = 0
    for lo in range(0, total, BLOCKSIZE):
        lchunk = left[lo: lo + BLOCKSIZE]
        rchunk = right[lo: lo + BLOCKSIZE]
        full = len(lchunk) == BLOCKSIZE
        code = (clen + f) % 5
        if not full and code >= len(lchunk):
            code = 0
        frames.append({
            "left": lchunk,
            "right": rchunk,
            "mode": STEREO_MODES[(clen + f) % 4],
            "code": code,
            "po": (clen + f) % 2 if full else 0,
        })
        f += 1
    return encode_flac_stereo(frames, sample_rate=8000 + 100 * (clen % 5))


def synth_depth_samples(clen: int, total: int, amp: int) -> list[int]:
    """Depth-scaled PCM closed form (q235/q236 oracles replay it):
    s_k = ((clen*31 + 7*k*k + 13*k) * m % (2*amp)) - amp with
    m = max(1, 2*amp // 4096). The multiplier maps the 16-bit
    corpus's wrap pattern onto the full depth range — without it the
    quadratic never wraps big amplitudes and FIXED orders 2-4 would
    predict it exactly (zero residuals, nothing to rice-code)."""
    m = max(1, (2 * amp) // 4096)
    return [((clen * 31 + 7 * k * k + 13 * k) * m % (2 * amp)) - amp
            for k in range(total)]


def _depth_amp(bps: int) -> int:
    """Amplitude for depth-cycled synth streams: 2^min(bps-5, 23).
    The cap keeps the worst-case FIXED-order-4 residual (16·amp)
    under 2^27, so raw-escape partitions always fit the 5-bit width
    field (<= 31 bits) at every depth including 32."""
    return 1 << min(bps - 5, 23)


def synth_flac_depths(clen: int) -> bytes:
    """Deterministic mono FLAC stream cycling BIT DEPTHS (the q235
    closed forms — everything the oracle replays):

      bps         = (8, 24, 32)[clen % 3]
      amp         = 2^min(bps-5, 23)
      total       = 33 + clen % 71   (2-4 frames of blocksize 32)
      sample_rate = 8000 + 100 * (clen % 5)
      samples     = synth_depth_samples (amplitude follows depth)
      frame f     = code (clen + f) % 6 (FIXED 0-4 / 5 VERBATIM;
                    short last drops FIXED to 0), po (clen + f) % 2
                    on full frames, rice 4-bit parameters
    At 24/32-bit the order 2-4 residuals exceed 2^15 zigzag, so the
    0b1111 raw-escape path is exercised at widths (24-31 bits) the
    16-bit corpus never reaches; at 8-bit escapes never fire — both
    ends bound cross-engine by the same k>=15 rule."""
    bps = (8, 24, 32)[clen % 3]
    amp = _depth_amp(bps)
    total = 33 + clen % 71
    samples = synth_depth_samples(clen, total, amp)
    frames: list[dict] = []
    f = 0
    for lo in range(0, total, BLOCKSIZE):
        chunk = samples[lo: lo + BLOCKSIZE]
        code = (clen + f) % 6
        full = len(chunk) == BLOCKSIZE
        if not full and code != VERBATIM_CODE:
            code = 0
        po = (clen + f) % 2 if full else 0
        frames.append({"samples": chunk, "code": code, "po": po})
        f += 1
    return encode_flac(frames, sample_rate=8000 + 100 * (clen % 5),
                       bps=bps)


def synth_flac_rice2(clen: int) -> bytes:
    """Deterministic 24-bit mono FLAC stream MIXING rice (method 00,
    4-bit parameters) and rice2 (method 01, 5-bit) frames (the q236
    closed forms):

      bps = 24, amp = 2^19, total/sample_rate/samples as q235
      frame f: code (clen + f) % 6 (short last -> FIXED 0),
               po (clen + f) % 2 on full frames,
               rice2 iff (clen + f) % 3 == 0
    At this depth the zigzag maxima reach 2^16..2^24: rice frames
    raw-escape past 2^15 while rice2 frames encode k = 15..23 —
    parameter values IMPOSSIBLE under 4-bit rice — and never escape
    (their threshold is 2^31). The oracle replays both rules plus
    the k fingerprint, so method confusion is hash-caught."""
    bps = 24
    amp = _depth_amp(bps)
    total = 33 + clen % 71
    samples = synth_depth_samples(clen, total, amp)
    frames: list[dict] = []
    f = 0
    for lo in range(0, total, BLOCKSIZE):
        chunk = samples[lo: lo + BLOCKSIZE]
        code = (clen + f) % 6
        full = len(chunk) == BLOCKSIZE
        if not full and code != VERBATIM_CODE:
            code = 0
        po = (clen + f) % 2 if full else 0
        frames.append({
            "samples": chunk, "code": code, "po": po,
            "rice2": (clen + f) % 3 == 0,
        })
        f += 1
    return encode_flac(frames, sample_rate=8000 + 100 * (clen % 5),
                       bps=bps)


def synth_flac_varblock(clen: int) -> bytes:
    """Deterministic 16-bit mono VARIABLE-BLOCKING FLAC stream (the
    q237 closed forms):

      total       = 33 + clen % 71
      sample_rate = 8000 + 100 * (clen % 5)
      samples     = synth_samples
      frame f:    blocksize 16 + 8 * ((clen + f) % 3)  (16/24/32),
                  last frame = the remainder;
                  code (clen + f) % 6 (a SHORT last frame drops
                  FIXED to 0), po (clen + f) % 2 on full frames
    Frame headers carry the starting SAMPLE number (UTF-8-coded) and
    STREAMINFO carries the true min/max blocksizes — the variable-
    blocking surface q225 raised by name."""
    total = 33 + clen % 71
    samples = synth_samples(clen, total)
    frames: list[dict] = []
    f = 0
    lo = 0
    while lo < total:
        bs = 16 + 8 * ((clen + f) % 3)
        chunk = samples[lo: lo + bs]
        full = len(chunk) == bs
        code = (clen + f) % 6
        if not full and code != VERBATIM_CODE:
            code = 0
        po = (clen + f) % 2 if full else 0
        frames.append({"samples": chunk, "code": code, "po": po})
        lo += bs
        f += 1
    return encode_flac(frames, sample_rate=8000 + 100 * (clen % 5),
                       bps=16, variable=True)


def synth_flac_stereo_ext(clen: int) -> bytes:
    """Deterministic STEREO stream exercising the round-12 breadth on
    the stereo walk — depth cycle, variable blocking, rice2 — in one
    corpus (the q238 closed forms):

      bps         = (8, 24)[clen % 2], amp = 2^min(bps-5, 23),
                    m = max(1, 2*amp // 4096)
      total       = 33 + clen % 71
      sample_rate = 8000 + 100 * (clen % 5)
      left_k      = ((clen*31 + 7k² + 13k) * m % (2*amp)) - amp
      right_k     = ((clen*17 + 5k² + 3k) * m % (2*amp)) - amp
      frame f:    blocksize 16 + 8 * ((clen + f) % 3), remainder
                  tail; mode STEREO_MODES[(clen + f) % 4];
                  code (clen + f) % 5 (short frame: drop to 0 when
                  the order doesn't fit); po (clen + f) % 2 on full
                  frames; rice2 iff (clen + f) % 3 == 0
    Side channels ride at bps+1 bits; the MD5 proof covers the
    interleaved reconstruction at the stream depth."""
    bps = (8, 24)[clen % 2]
    amp = _depth_amp(bps)
    m = max(1, (2 * amp) // 4096)
    total = 33 + clen % 71
    left = [((clen * 31 + 7 * k * k + 13 * k) * m % (2 * amp)) - amp
            for k in range(total)]
    right = [((clen * 17 + 5 * k * k + 3 * k) * m % (2 * amp)) - amp
             for k in range(total)]
    frames: list[dict] = []
    f = 0
    lo = 0
    while lo < total:
        bs = 16 + 8 * ((clen + f) % 3)
        lchunk = left[lo: lo + bs]
        rchunk = right[lo: lo + bs]
        full = len(lchunk) == bs
        code = (clen + f) % 5
        if not full and code >= len(lchunk):
            code = 0
        frames.append({
            "left": lchunk,
            "right": rchunk,
            "mode": STEREO_MODES[(clen + f) % 4],
            "code": code,
            "po": (clen + f) % 2 if full else 0,
            "rice2": (clen + f) % 3 == 0,
        })
        lo += bs
        f += 1
    return encode_flac_stereo(frames, sample_rate=8000 + 100 * (clen % 5),
                              bps=bps, variable=True)


# --- multichannel (3-8ch) layouts (RFC 9639 §9.1.3 codes 0b0010-0b0111) ----
#
# Above two channels FLAC has NO inter-channel decorrelation: every
# layout 3ch-8ch stores each channel as an independent subframe at the
# stream bit depth (the decorrelated assignments 1000-1010 are defined
# for exactly two channels). That makes the >2ch seam purely
# algorithmic — the same subframe walk repeated channels-per-frame
# times with the MD5 proof over the channel-interleaved PCM — and
# closes the last layout guard this container can verify (VERDICT r12
# item 4). 12/20-bit depths remain refused by name everywhere.

@dataclass(frozen=True)
class FlacMultiFrame:
    blocksize: int
    codes: tuple[int, ...]       # per-channel subframe fingerprint codes
    channels: tuple[tuple[int, ...], ...]
    n_escapes: int


@dataclass(frozen=True)
class FlacMultiStream:
    sample_rate: int
    total_samples: int           # inter-channel samples (per-channel)
    n_channels: int
    frames: tuple[FlacMultiFrame, ...]
    md5_ok: bool
    bits_per_sample: int = 16


def encode_flac_multichannel(
    frames: list[dict],
    sample_rate: int = 44100,
    bps: int = 16,
    variable: bool = False,
) -> bytes:
    """3-8 channel FLAC stream, independent coding. Each frames[i]:
    'channels' (list of 3-8 equal-length signed sample lists — the
    count is fixed across the stream, STREAMINFO carries it once),
    'code' (FIXED order 0-4 / VERBATIM_CODE, applied to every
    channel), 'po', optional 'rice2'. Depths 8/16/24/32; fixed or
    variable blocking, same rules as the mono/stereo encoders. The
    STREAMINFO MD5 covers channel-interleaved little-endian PCM
    (sample k of ch0, ch1, ... chN-1), so the losslessness proof
    spans every channel. Mono/stereo have dedicated walks
    (encode_flac / encode_flac_stereo) — counts outside 3-8 raise."""
    if not frames:
        raise ValueError("flac: at least one frame")
    nch = len(frames[0]["channels"])
    if not 3 <= nch <= 8:
        raise ValueError(
            "flac: multichannel walk takes 3-8 channels (mono/stereo "
            "have dedicated walks; >8 has no STREAMINFO encoding)"
        )
    if bps not in _SS_CODES:
        raise ValueError("flac: bits-per-sample must be 8/12/16/20/24/32")
    if bps not in MD5_DEPTHS:
        raise ValueError(
            "flac: 12/20-bit PCM is not byte-aligned — MD5 packing is "
            "ambiguous; depths 8/16/24/32 are supported"
        )
    for fr in frames:
        chans = fr["channels"]
        if len(chans) != nch:
            raise ValueError("flac: channel count must not change "
                             "mid-stream")
        if len({len(c) for c in chans}) != 1:
            raise ValueError("flac: channel length mismatch")
    sizes = [len(fr["channels"][0]) for fr in frames]
    if variable:
        min_bs, max_bs = min(sizes), max(sizes)
    else:
        bs0 = sizes[0]
        for n in sizes[:-1]:
            if n != bs0:
                raise ValueError(
                    "flac: fixed blocking needs constant blocksize"
                    " (only the last frame may be short)"
                )
        if sizes[-1] > bs0:
            raise ValueError("flac: last frame exceeds the stream blocksize")
        min_bs = max_bs = bs0
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    md5 = hashlib.md5()
    total = 0
    for fr in frames:
        chans = fr["channels"]
        for k in range(len(chans[0])):
            for c in chans:
                if not lo <= c[k] <= hi:
                    raise ValueError(f"flac: sample exceeds {bps}-bit range")
                _md5_pcm(md5, c[k], bps)
        total += len(chans[0])
    info = _BitsOut()
    info.write(min_bs, 16)
    info.write(max_bs, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(nch - 1, 3)
    info.write(bps - 1, 5)
    info.write(total, 36)
    streaminfo = bytes(info.buf) + md5.digest()
    out = bytearray(b"fLaC")
    out += bytes([0x80, 0, 0, 34]) + streaminfo
    start = 0
    for n, fr in enumerate(frames):
        nsamp = len(fr["channels"][0])
        wide_bs = nsamp > 256
        hdr = _BitsOut()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)
        hdr.write(1 if variable else 0, 1)
        hdr.write(0b0111 if wide_bs else 0b0110, 4)
        hdr.write(0b0000, 4)
        hdr.write(nch - 1, 4)        # independent layout: code = N-1
        hdr.write(_SS_CODES[bps], 3)
        hdr.write(0, 1)
        hdr.pad_to_byte()
        coded = _utf8_number(start if variable else n)
        bs_field = ((nsamp - 1).to_bytes(2, "big") if wide_bs
                    else bytes([nsamp - 1]))
        head = bytes(hdr.buf) + coded + bs_field
        head += bytes([crc8(head)])
        body = _BitsOut()
        for ch in fr["channels"]:
            _encode_subframe(body, list(ch), fr["code"], bps,
                             fr.get("po", 0), rice2=fr.get("rice2", False))
        body.pad_to_byte()
        frame = head + bytes(body.buf)
        out += frame + crc16(frame).to_bytes(2, "big")
        start += nsamp
    return bytes(out)


def parse_flac_multichannel(data: bytes) -> FlacMultiStream:
    """REAL 3-8 channel decode: the mono subframe walk repeated
    channels-per-frame times (independent coding is the ONLY layout
    above two channels, RFC 9639 §9.1.3). CRC-8/CRC-16 per frame; MD5
    proof over the channel-interleaved reconstruction."""
    if data[:4] != b"fLaC":
        raise ValueError("flac: missing fLaC stream marker")
    pos = 4
    streaminfo: bytes | None = None
    while True:
        if pos + 4 > len(data):
            raise ValueError("flac: truncated metadata block header")
        last = data[pos] & 0x80
        btype = data[pos] & 0x7F
        blen = int.from_bytes(data[pos + 1: pos + 4], "big")
        if len(data) < pos + 4 + blen:
            raise ValueError("flac: truncated metadata block body")
        if btype == 0:
            if blen != 34:
                raise ValueError("flac: STREAMINFO must be 34 bytes")
            streaminfo = data[pos + 4: pos + 38]
        pos += 4 + blen
        if last:
            break
    if streaminfo is None:
        raise ValueError("flac: STREAMINFO block is mandatory")
    si = _Bits(streaminfo)
    min_bs = si.read(16)
    max_bs = si.read(16)
    si.read(24), si.read(24)
    sample_rate = si.read(20)
    nch = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_declared = streaminfo[18:34]
    if not 3 <= nch <= 8:
        raise ValueError(
            "flac: multichannel walk decodes 3-8 channel streams "
            "(mono/stereo have dedicated walks: parse_flac / "
            "parse_flac_stereo)"
        )
    if bps not in _SS_CODES:
        raise ValueError("flac: bits-per-sample must be 8/12/16/20/24/32")
    if bps not in MD5_DEPTHS:
        raise ValueError(
            "flac: 12/20-bit PCM is not byte-aligned — MD5 packing is "
            "ambiguous; depths 8/16/24/32 are supported"
        )
    frames: list[FlacMultiFrame] = []
    md5 = hashlib.md5()
    seen = 0
    n_expected = 0
    blocking: int | None = None
    while pos < len(data):
        frame_start = pos
        br = _Bits(data)
        br.pos = 8 * pos
        if br.read(14) != 0b11111111111110:
            raise ValueError("flac: lost frame sync")
        if br.read(1):
            raise ValueError("flac: frame header reserved bit set")
        strat = br.read(1)
        if blocking is None:
            blocking = strat
            if blocking == 0 and min_bs != max_bs:
                raise ValueError(
                    "flac: fixed blocking needs one STREAMINFO blocksize"
                )
        elif strat != blocking:
            raise ValueError("flac: blocking strategy must not change "
                             "mid-stream")
        bs_code = br.read(4)
        sr_code = br.read(4)
        ch_code = br.read(4)
        ss_code = br.read(3)
        if br.read(1):
            raise ValueError("flac: frame header reserved bit set")
        if ch_code != nch - 1:
            raise ValueError(
                "flac: >2-channel frames must use the independent "
                "layout matching STREAMINFO (decorrelated assignments "
                "1000-1010 are defined for exactly two channels)"
            )
        if ss_code != _SS_CODES[bps]:
            raise ValueError("flac: frame sample-size code disagrees "
                             "with STREAMINFO")
        if sr_code != 0:
            raise ValueError("flac: sample rate must defer to STREAMINFO")
        fno = _read_utf8_number(br)
        if blocking == 1:
            if fno != seen:
                raise ValueError("flac: frame sample numbers must be "
                                 "cumulative")
        else:
            if fno != n_expected:
                raise ValueError("flac: frame numbers must be sequential")
        n_expected += 1
        if bs_code == 0b0110:
            nsamp = br.read(8) + 1
        elif bs_code == 0b0111:
            nsamp = br.read(16) + 1
        elif bs_code == 0b0001:
            nsamp = 192
        elif 0b0010 <= bs_code <= 0b0101:
            nsamp = 576 << (bs_code - 2)
        elif bs_code >= 0b1000:
            nsamp = 256 << (bs_code - 8)
        else:
            raise ValueError("flac: reserved blocksize code")
        hdr_end = br.pos >> 3
        if crc8(data[frame_start:hdr_end]) != data[hdr_end]:
            raise ValueError("flac: frame header CRC-8 mismatch")
        br.pos = 8 * (hdr_end + 1)
        codes: list[int] = []
        chans: list[list[int]] = []
        escapes = 0
        for _ in range(nch):
            code, ch, esc, _ = _decode_subframe(br, nsamp, bps)
            codes.append(code)
            chans.append(ch)
            escapes += esc
        if br.pos & 7:
            if br.read(8 - (br.pos & 7)):
                raise ValueError("flac: nonzero frame padding bits")
        crc_at = br.pos >> 3
        declared = int.from_bytes(data[crc_at: crc_at + 2], "big")
        if crc16(data[frame_start:crc_at]) != declared:
            raise ValueError("flac: frame CRC-16 mismatch")
        pos = crc_at + 2
        if blocking == 1:
            if nsamp > max_bs:
                raise ValueError("flac: frame exceeds STREAMINFO "
                                 "max_blocksize")
            if nsamp < min_bs and seen + nsamp < total:
                raise ValueError("flac: frame below STREAMINFO "
                                 "min_blocksize before the last")
        elif seen + nsamp < total and nsamp != max_bs:
            raise ValueError("flac: short frame before the last")
        seen += nsamp
        for k in range(nsamp):
            for ch in chans:
                _md5_pcm(md5, ch[k], bps)
        frames.append(
            FlacMultiFrame(nsamp, tuple(codes),
                           tuple(tuple(c) for c in chans), escapes)
        )
    if seen != total:
        raise ValueError("flac: decoded samples disagree with STREAMINFO")
    return FlacMultiStream(
        sample_rate=sample_rate,
        total_samples=total,
        n_channels=nch,
        frames=tuple(frames),
        md5_ok=md5.digest() == md5_declared,
        bits_per_sample=bps,
    )


def synth_multi_sample(clen: int, c: int, k: int, m: int, amp: int) -> int:
    """Per-channel PCM closed form (the q239 oracle replays it):
    s(c,k) = ((clen*(13+2c) + (3+c)k² + (5+2c)k) * m % (2·amp)) - amp.
    Every operand is nonnegative, so Python % and SQL % agree."""
    return ((clen * (13 + 2 * c) + (3 + c) * k * k + (5 + 2 * c) * k)
            * m % (2 * amp)) - amp


def synth_flac_multichannel(clen: int) -> bytes:
    """Deterministic 3-8 channel FLAC stream (the q239 closed forms —
    everything the oracle replays):

      nch         = 3 + clen % 6                 (3-8 channels)
      bps         = (8, 16, 24)[clen % 3]
      amp         = 2^min(bps-5, 23), m = max(1, 2*amp // 4096)
      total       = 33 + clen % 71
      sample_rate = 8000 + 100 * (clen % 5)
      channel c   = synth_multi_sample(clen, c, k, m, amp)
      frame f:    blocksize 16 + 8 * ((clen + f) % 3) (variable
                  blocking, remainder tail); code (clen + f) % 6
                  (FIXED 0-4 / 5 VERBATIM, every channel; short last
                  drops FIXED to 0); po (clen + f) % 2 on full
                  frames; rice2 iff (clen + f) % 3 == 0
    The depth cycle pushes 24-bit frames through the raw-escape path
    across ALL channels; the MD5 proof covers the channel-interleaved
    reconstruction, so a wrong channel order, depth unpack, or
    entropy read fails every stream."""
    nch = 3 + clen % 6
    bps = (8, 16, 24)[clen % 3]
    amp = _depth_amp(bps)
    m = max(1, (2 * amp) // 4096)
    total = 33 + clen % 71
    chans = [[synth_multi_sample(clen, c, k, m, amp) for k in range(total)]
             for c in range(nch)]
    frames: list[dict] = []
    f = 0
    lo = 0
    while lo < total:
        bs = 16 + 8 * ((clen + f) % 3)
        chunk = [c[lo: lo + bs] for c in chans]
        full = len(chunk[0]) == bs
        code = (clen + f) % 6
        if not full and code != VERBATIM_CODE:
            code = 0
        frames.append({
            "channels": chunk,
            "code": code,
            "po": (clen + f) % 2 if full else 0,
            "rice2": (clen + f) % 3 == 0,
        })
        lo += bs
        f += 1
    return encode_flac_multichannel(
        frames, sample_rate=8000 + 100 * (clen % 5), bps=bps,
        variable=True,
    )
