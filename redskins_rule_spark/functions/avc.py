"""H.264/AVC NAL-structure + SPS-geometry layer (public ITU-T H.264
/ ISO/IEC 14496-10 §7 bitstream syntax).

Narrows the compressed-video seam the same way functions/mp3.py's
granule layer narrows the audio one: everything in an AVC elementary
stream that is STRUCTURE — Annex B start-code framing, emulation-
prevention de-escaping (00 00 03), the one-byte NAL header, and the
Exp-Golomb-coded sequence parameter set — is really encoded and
really decoded. Exp-Golomb is SELF-DESCRIBING (a prefix code defined
by its own zero run, spec §9.1), so unlike the MP3 spectral layer or
CAVLC/CABAC slice data there is no external codebook to embed: SPS
geometry (profile/level, pic_width_in_mbs, frame cropping) decodes
exactly from first principles. What remains of the video seam after
this layer is precisely slice-data entropy decode (CAVLC/CABAC) and
the transform/prediction pipeline.

Profile gates (the jpeg/mp3 gate shape, each raising ValueError
naming the boundary): high-profile SPS extensions (chroma_format_idc
branch) and interlaced streams (frame_mbs_only_flag == 0) are
rejected by name; PPS parsing surfaces entropy_coding_mode_flag (the
CAVLC/CABAC selector — i.e. WHICH seam the slice data sits behind)
plus ids, then stops at the documented boundary.

Corruption contract: any truncation, junk before the first start
code, a set forbidden_zero_bit, or an Exp-Golomb read past the RBSP
end raises ValueError — never IndexError — matching every other
codec in functions/.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

_START3 = b"\x00\x00\x01"


@dataclass(frozen=True)
class AvcNal:
    ref_idc: int
    nal_type: int
    rbsp: bytes  # de-escaped payload (header byte excluded)


@dataclass(frozen=True)
class AvcSps:
    profile_idc: int
    level_idc: int
    sps_id: int
    log2_max_frame_num: int
    pic_order_cnt_type: int
    max_num_ref_frames: int
    frame_mbs_only: int
    width: int
    height: int
    # poc-type-0 lsb width — needed to parse slice headers (None for
    # other poc types)
    log2_max_poc_lsb: int | None = None


@dataclass(frozen=True)
class AvcPps:
    pps_id: int
    sps_id: int
    entropy_coding_mode: int  # 0 = CAVLC, 1 = CABAC — the slice seam
    # full-parse fields (None when only the head was read)
    pic_init_qp: int | None = None
    deblocking_control: int | None = None
    weighted_pred: int | None = None


class _EgBits:
    """MSB-first bit reader with Exp-Golomb ue(v)/se(v) (§9.1)."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def u(self, n: int) -> int:
        end = self.pos + n
        if end > 8 * len(self.data):
            raise ValueError("avc: bit field overruns RBSP")
        v = 0
        p = self.pos
        for _ in range(n):
            v = (v << 1) | ((self.data[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = end
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("avc: Exp-Golomb prefix too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        # §9.1.1 mapping: 0,1,-1,2,-2,...
        return (k + 1) // 2 if k % 2 else -(k // 2)

    def align_zero(self) -> None:
        """pcm_alignment_zero_bit run (§7.3.5): skip to the next byte
        boundary, requiring every padding bit to be 0."""
        while self.pos & 7:
            if self.u(1):
                raise ValueError("avc: non-zero pcm alignment bit")

    def bytes_aligned(self, n: int) -> bytes:
        """Read n raw bytes at a byte-aligned position (I_PCM samples)."""
        if self.pos & 7:
            raise ValueError("avc: raw byte read at unaligned position")
        start = self.pos >> 3
        if start + n > len(self.data):
            raise ValueError("avc: I_PCM samples overrun RBSP")
        self.pos += 8 * n
        return self.data[start: start + n]


class _EgBitsOut:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def u(self, value: int, n: int) -> None:
        if value < 0 or value >= (1 << n):
            raise ValueError(f"avc: field value {value} exceeds {n} bits")
        for i in range(n - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                self._acc = 0
                self._n = 0

    def ue(self, value: int) -> None:
        if value < 0:
            raise ValueError("avc: ue(v) takes non-negative values")
        k = value + 1
        n = k.bit_length()
        self.u(0, n - 1)
        self.u(k, n)

    def se(self, value: int) -> None:
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def align_zero(self) -> None:
        """pcm_alignment_zero_bit run (§7.3.5): pad with 0 to the
        next byte boundary."""
        if self._n:
            self.u(0, 8 - self._n)

    def bytes_aligned(self, data: bytes) -> None:
        """Write raw bytes at a byte-aligned position (I_PCM samples)."""
        if self._n:
            raise ValueError("avc: raw byte write at unaligned position")
        self.buf.extend(data)

    def rbsp_trailing(self) -> bytes:
        """Stop bit + zero alignment (§7.3.2.11), then the bytes."""
        self.u(1, 1)
        if self._n:
            self.u(0, 8 - self._n)
        return bytes(self.buf)


def escape_rbsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes: any 00 00 followed by
    00/01/02/03 becomes 00 00 03 xx (§7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def unescape_rbsp(data: bytes) -> bytes:
    """Remove emulation-prevention bytes; a 00 00 03 followed by
    anything above 03 is corrupt per §7.4.1.1."""
    out = bytearray()
    i = 0
    while i < len(data):
        if (
            i + 2 < len(data)
            and data[i] == 0
            and data[i + 1] == 0
            and data[i + 2] == 3
        ):
            if i + 3 < len(data) and data[i + 3] > 3:
                raise ValueError("avc: invalid emulation-prevention escape")
            out += b"\x00\x00"
            i += 3
            continue
        if i + 2 < len(data) and data[i] == 0 and data[i + 1] == 0 and data[i + 2] <= 2:
            # 00 00 00 / 00 00 01 / 00 00 02 must not appear inside an
            # escaped NAL payload (§7.4.1.1 — the encoder inserts 03)
            raise ValueError("avc: unescaped start-code emulation in RBSP")
        out.append(data[i])
        i += 1
    return bytes(out)


def encode_nal_stream(nals: list[tuple[int, int, bytes]]) -> bytes:
    """(ref_idc, nal_type, rbsp) triples -> Annex B byte stream.
    SPS/PPS (types 7/8) get 4-byte start codes, others 3-byte — both
    are spec-legal; the parser accepts either."""
    out = bytearray()
    for ref_idc, nal_type, rbsp in nals:
        if not 0 <= ref_idc <= 3 or not 1 <= nal_type <= 31:
            raise ValueError("avc: NAL header field out of range")
        if rbsp and rbsp[-1] == 0:
            # rbsp_trailing_bits (§7.3.2.11) guarantees every RBSP's
            # last byte is nonzero; without enforcing it here the
            # parser's 4-byte-start-code heuristic strips a trailing
            # 00 as framing and the round-trip silently loses a byte
            # (ADVICE r8)
            raise ValueError(
                "avc: RBSP must end nonzero (rbsp_trailing_bits)"
            )
        if nal_type in (7, 8):
            out += b"\x00" + _START3
        else:
            out += _START3
        out.append((ref_idc << 5) | nal_type)
        out += escape_rbsp(rbsp)
    return bytes(out)


def parse_nal_stream(data: bytes) -> list[AvcNal]:
    """Annex B parse: split on start codes (3- or 4-byte), validate
    the NAL header, de-escape each payload. Anything but leading
    zeros before the first start code is corrupt; an empty stream or
    an empty NAL is corrupt."""
    if not data:
        raise ValueError("avc: empty NAL stream")
    first = data.find(_START3)
    if first < 0 or any(data[:first]):
        raise ValueError("avc: no start code at stream head")
    starts = []
    i = first
    while i >= 0:
        starts.append(i + 3)
        i = data.find(_START3, i + 3)
    out = []
    for k, s in enumerate(starts):
        e = starts[k + 1] - 3 if k + 1 < len(starts) else len(data)
        # a 4-byte start code leaves one 00 before the NEXT start code
        if k + 1 < len(starts) and e > s and data[e - 1] == 0:
            e -= 1
        if e <= s:
            raise ValueError("avc: empty NAL unit")
        hdr = data[s]
        if hdr & 0x80:
            raise ValueError("avc: forbidden_zero_bit set")
        out.append(
            AvcNal(
                ref_idc=(hdr >> 5) & 3,
                nal_type=hdr & 0x1F,
                rbsp=unescape_rbsp(data[s + 1: e]),
            )
        )
    return out


_HIGH_PROFILES = frozenset(
    (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)
)


def encode_sps(
    profile_idc: int,
    level_idc: int,
    sps_id: int,
    log2_max_frame_num_minus4: int,
    pic_order_cnt_type: int,
    log2_max_poc_lsb_minus4: int,
    max_num_ref_frames: int,
    gaps_allowed: int,
    pic_width_in_mbs_minus1: int,
    pic_height_in_map_units_minus1: int,
    direct_8x8: int,
) -> bytes:
    """Baseline/main-profile progressive SPS RBSP (no cropping, no
    VUI) — §7.3.2.1.1 field for field."""
    if profile_idc in _HIGH_PROFILES:
        raise ValueError("avc: high-profile SPS outside this encoder")
    w = _EgBitsOut()
    w.u(profile_idc, 8)
    w.u(0, 8)  # constraint flags + reserved
    w.u(level_idc, 8)
    w.ue(sps_id)
    w.ue(log2_max_frame_num_minus4)
    w.ue(pic_order_cnt_type)
    if pic_order_cnt_type == 0:
        w.ue(log2_max_poc_lsb_minus4)
    elif pic_order_cnt_type == 1:
        raise ValueError("avc: poc type 1 outside this encoder")
    w.ue(max_num_ref_frames)
    w.u(gaps_allowed, 1)
    w.ue(pic_width_in_mbs_minus1)
    w.ue(pic_height_in_map_units_minus1)
    w.u(1, 1)  # frame_mbs_only_flag (progressive profile)
    w.u(direct_8x8, 1)
    w.u(0, 1)  # frame_cropping_flag
    w.u(0, 1)  # vui_parameters_present_flag
    return w.rbsp_trailing()


def parse_sps(rbsp: bytes) -> AvcSps:
    """SPS decode per §7.3.2.1.1, geometry included: width/height
    from pic_width_in_mbs / pic_height_in_map_units with the 4:2:0
    frame-cropping arithmetic (crop unit 2 horizontally, 2·(2 −
    frame_mbs_only) vertically). High-profile chroma extensions and
    interlaced streams raise naming the profile boundary."""
    br = _EgBits(rbsp)
    profile_idc = br.u(8)
    br.u(8)  # constraint flags
    level_idc = br.u(8)
    sps_id = br.ue()
    if profile_idc in _HIGH_PROFILES:
        raise ValueError(
            "avc: high-profile SPS (chroma_format_idc branch) is outside "
            "the baseline/main structure profile"
        )
    log2_max_frame_num = br.ue() + 4
    poc_type = br.ue()
    log2_max_poc_lsb = None
    if poc_type == 0:
        log2_max_poc_lsb = br.ue() + 4
    elif poc_type == 1:
        br.u(1)
        br.se()
        br.se()
        for _ in range(br.ue()):
            br.se()
    elif poc_type > 2:
        raise ValueError("avc: invalid pic_order_cnt_type")
    max_num_ref = br.ue()
    br.u(1)  # gaps_in_frame_num_value_allowed_flag
    pw = br.ue()
    ph = br.ue()
    frame_mbs_only = br.u(1)
    if not frame_mbs_only:
        raise ValueError(
            "avc: interlaced (frame_mbs_only_flag=0) streams are outside "
            "the progressive structure profile"
        )
    br.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if br.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = br.ue(), br.ue(), br.ue(), br.ue()
    br.u(1)  # vui_parameters_present_flag (VUI itself not parsed)
    width = (pw + 1) * 16 - 2 * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * (ph + 1) * 16 - 2 * (
        2 - frame_mbs_only
    ) * (crop_t + crop_b)
    if width <= 0 or height <= 0:
        raise ValueError("avc: cropping exceeds coded size")
    return AvcSps(
        profile_idc=profile_idc,
        level_idc=level_idc,
        sps_id=sps_id,
        log2_max_frame_num=log2_max_frame_num,
        pic_order_cnt_type=poc_type,
        max_num_ref_frames=max_num_ref,
        frame_mbs_only=frame_mbs_only,
        width=width,
        height=height,
        log2_max_poc_lsb=log2_max_poc_lsb,
    )


def encode_pps(pps_id: int, sps_id: int, entropy_coding_mode: int) -> bytes:
    """Minimal-but-real PPS head: ids + entropy_coding_mode_flag +
    the fields through deblocking control, single slice group,
    weighted prediction off — a decodable §7.3.2.2 prefix."""
    w = _EgBitsOut()
    w.ue(pps_id)
    w.ue(sps_id)
    w.u(entropy_coding_mode, 1)
    w.u(0, 1)   # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)     # num_slice_groups_minus1
    w.ue(0)     # num_ref_idx_l0_default_active_minus1
    w.ue(0)     # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)   # weighted_pred_flag
    w.u(0, 2)   # weighted_bipred_idc
    w.se(0)     # pic_init_qp_minus26
    w.se(0)     # pic_init_qs_minus26
    w.se(0)     # chroma_qp_index_offset
    w.u(1, 1)   # deblocking_filter_control_present_flag
    w.u(0, 1)   # constrained_intra_pred_flag
    w.u(0, 1)   # redundant_pic_cnt_present_flag
    return w.rbsp_trailing()


def parse_pps_head(rbsp: bytes) -> AvcPps:
    """PPS ids + entropy_coding_mode_flag (which slice-entropy seam —
    CAVLC or CABAC — the stream's slice data sits behind); parsing
    stops there. Use `parse_pps` for the complete §7.3.2.2 record."""
    br = _EgBits(rbsp)
    pps_id = br.ue()
    sps_id = br.ue()
    mode = br.u(1)
    return AvcPps(pps_id=pps_id, sps_id=sps_id, entropy_coding_mode=mode)


def parse_pps(rbsp: bytes) -> AvcPps:
    """Complete picture-parameter-set parse per §7.3.2.2 through the
    redundant_pic_cnt flag — everything this module's encoder writes.
    Slice-group maps (num_slice_groups > 1, the FMO feature no
    mainstream encoder emits) raise naming the profile boundary;
    pic_init_qp is range-checked per the spec (26 + offset in
    [0, 51])."""
    br = _EgBits(rbsp)
    pps_id = br.ue()
    sps_id = br.ue()
    mode = br.u(1)
    br.u(1)  # bottom_field_pic_order_in_frame_present_flag
    if br.ue():  # num_slice_groups_minus1
        raise ValueError(
            "avc: slice groups (FMO) are outside the structure profile"
        )
    br.ue()  # num_ref_idx_l0_default_active_minus1
    br.ue()  # num_ref_idx_l1_default_active_minus1
    weighted_pred = br.u(1)
    br.u(2)  # weighted_bipred_idc
    qp = 26 + br.se()  # pic_init_qp_minus26
    if not 0 <= qp <= 51:
        raise ValueError("avc: pic_init_qp out of the [0, 51] range")
    br.se()  # pic_init_qs_minus26
    br.se()  # chroma_qp_index_offset
    deblocking = br.u(1)
    br.u(1)  # constrained_intra_pred_flag
    br.u(1)  # redundant_pic_cnt_present_flag
    return AvcPps(
        pps_id=pps_id,
        sps_id=sps_id,
        entropy_coding_mode=mode,
        pic_init_qp=qp,
        deblocking_control=deblocking,
        weighted_pred=weighted_pred,
    )


# --- I_PCM slice layer: real pixels from the video seam ------------------
#
# §7.4.5 gives I slices one macroblock type that needs NO entropy
# decode at all: mb_type 25 (I_PCM) — byte-aligned raw 8-bit samples,
# 256 luma + 64 Cb + 64 Cr per macroblock (4:2:0). An IDR slice made
# entirely of I_PCM macroblocks is therefore fully decodable from the
# bitstream syntax this module already implements (Exp-Golomb header,
# emulation-prevention framing), producing REAL pixel planes — the
# same notch the JPEG family proves on the image seam. What remains
# of the video seam after this layer is exactly CAVLC/CABAC-coded
# macroblocks and the transform/prediction pipeline (still raised by
# name below). Per the conservative §7.4.5 constraint the encoder
# rejects sample value 0 (the pre-escaping start-code guard in the
# original spec text); the decoder accepts any byte — liberal in,
# strict out.

_MB_TYPE_I_PCM = 25


@dataclass(frozen=True)
class AvcIpcmFrame:
    width: int
    height: int
    n_mbs: int
    qp: int  # pic_init_qp + slice_qp_delta
    frame_num: int
    idr_pic_id: int
    y: bytes   # luma plane, raster order, width x height
    cb: bytes  # chroma planes, raster order, (width/2) x (height/2)
    cr: bytes


def encode_ipcm_slice(
    y: bytes,
    cb: bytes,
    cr: bytes,
    mb_w: int,
    mb_h: int,
    *,
    pps_id: int = 0,
    frame_num: int = 0,
    idr_pic_id: int = 0,
    qp_delta: int = 0,
    log2_max_frame_num: int = 4,
    log2_max_poc_lsb: int = 4,
) -> bytes:
    """IDR I-slice RBSP whose every macroblock is I_PCM (§7.3.3 header
    + §7.3.5 slice data): raw planes in, decodable slice out. Planes
    are raster-order 8-bit samples — y is (16·mb_w)×(16·mb_h), cb/cr
    are (8·mb_w)×(8·mb_h)."""
    w_px, h_px = 16 * mb_w, 16 * mb_h
    if len(y) != w_px * h_px:
        raise ValueError("avc: luma plane size mismatch")
    if len(cb) != w_px * h_px // 4 or len(cr) != w_px * h_px // 4:
        raise ValueError("avc: chroma plane size mismatch")
    if 0 in y or 0 in cb or 0 in cr:
        raise ValueError(
            "avc: I_PCM sample value 0 is forbidden (§7.4.5)"
        )
    w = _EgBitsOut()
    # slice_header (§7.3.3) — IDR, CAVLC, progressive, poc type 0
    w.ue(0)                       # first_mb_in_slice
    w.ue(7)                       # slice_type: I (all slices I)
    w.ue(pps_id)
    w.u(frame_num, log2_max_frame_num)
    w.ue(idr_pic_id)
    w.u(0, log2_max_poc_lsb)      # pic_order_cnt_lsb
    w.u(0, 1)                     # no_output_of_prior_pics_flag
    w.u(0, 1)                     # long_term_reference_flag
    w.se(qp_delta)                # slice_qp_delta
    w.ue(1)                       # disable_deblocking_filter_idc = 1
    # slice_data (§7.3.5): raster macroblocks, each I_PCM
    half = w_px // 2
    for mby in range(mb_h):
        for mbx in range(mb_w):
            w.ue(_MB_TYPE_I_PCM)
            w.align_zero()
            rows = []
            for ry in range(16):
                base = (mby * 16 + ry) * w_px + mbx * 16
                rows.append(y[base: base + 16])
            for plane in (cb, cr):
                for ry in range(8):
                    base = (mby * 8 + ry) * half + mbx * 8
                    rows.append(plane[base: base + 8])
            w.bytes_aligned(b"".join(rows))
    return w.rbsp_trailing()


def decode_ipcm_slice(rbsp: bytes, sps: AvcSps, pps: AvcPps) -> AvcIpcmFrame:
    """Decode an all-I_PCM IDR slice back to pixel planes. Any
    non-I_PCM macroblock raises naming the CAVLC/CABAC seam; header
    fields are validated against the SPS/PPS actually in the stream."""
    if pps.entropy_coding_mode != 0:
        raise ValueError(
            "avc: CABAC slice data is outside the I_PCM profile "
            "(entropy seam)"
        )
    if pps.pic_init_qp is None or pps.deblocking_control is None:
        raise ValueError("avc: I_PCM decode needs a fully parsed PPS")
    if sps.log2_max_poc_lsb is None:
        raise ValueError("avc: poc type != 0 outside the I_PCM profile")
    br = _EgBits(rbsp)
    if br.ue() != 0:
        raise ValueError("avc: multi-slice pictures outside this profile")
    slice_type = br.ue()
    if slice_type % 5 != 2:
        raise ValueError(
            "avc: non-I slice data is outside the I_PCM profile "
            "(CAVLC/CABAC entropy seam)"
        )
    if br.ue() != pps.pps_id:
        raise ValueError("avc: slice references an unknown PPS")
    frame_num = br.u(sps.log2_max_frame_num)
    idr_pic_id = br.ue()
    br.u(sps.log2_max_poc_lsb)  # pic_order_cnt_lsb
    br.u(1)  # no_output_of_prior_pics_flag
    br.u(1)  # long_term_reference_flag
    qp = pps.pic_init_qp + br.se()
    if not 0 <= qp <= 51:
        raise ValueError("avc: slice qp out of the [0, 51] range")
    if pps.deblocking_control:
        if br.ue() != 1:  # disable_deblocking_filter_idc
            br.se()  # slice_alpha_c0_offset_div2
            br.se()  # slice_beta_offset_div2
    mb_w, mb_h = sps.width // 16, sps.height // 16
    if sps.width % 16 or sps.height % 16:
        raise ValueError("avc: cropped frames outside the I_PCM profile")
    w_px, half = sps.width, sps.width // 2
    yb = bytearray(w_px * sps.height)
    cbb = bytearray(w_px * sps.height // 4)
    crb = bytearray(w_px * sps.height // 4)
    for mby in range(mb_h):
        for mbx in range(mb_w):
            mb_type = br.ue()
            if mb_type != _MB_TYPE_I_PCM:
                raise ValueError(
                    f"avc: mb_type {mb_type} needs CAVLC residual "
                    "decode — outside the I_PCM profile (entropy seam)"
                )
            br.align_zero()
            samples = br.bytes_aligned(256 + 2 * 64)
            for ry in range(16):
                base = (mby * 16 + ry) * w_px + mbx * 16
                yb[base: base + 16] = samples[ry * 16: ry * 16 + 16]
            for k, plane in ((0, cbb), (1, crb)):
                off = 256 + 64 * k
                for ry in range(8):
                    base = (mby * 8 + ry) * half + mbx * 8
                    plane[base: base + 8] = samples[
                        off + ry * 8: off + ry * 8 + 8
                    ]
    # rbsp_slice_trailing_bits: stop bit then zero padding (§7.3.2.10)
    if br.u(1) != 1:
        raise ValueError("avc: missing rbsp stop bit after slice data")
    while br.pos & 7:
        if br.u(1):
            raise ValueError("avc: non-zero rbsp trailing bit")
    if br.pos != 8 * len(rbsp):
        raise ValueError("avc: trailing bytes after slice data")
    return AvcIpcmFrame(
        width=sps.width,
        height=sps.height,
        n_mbs=mb_w * mb_h,
        qp=qp,
        frame_num=frame_num,
        idr_pic_id=idr_pic_id,
        y=bytes(yb),
        cb=bytes(cbb),
        cr=bytes(crb),
    )


def encode_avc_ipcm(
    y: bytes,
    cb: bytes,
    cr: bytes,
    mb_w: int,
    mb_h: int,
    *,
    level_idc: int = 10,
    qp_delta: int = 0,
    idr_pic_id: int = 0,
) -> bytes:
    """Self-contained Annex B elementary stream: SPS + PPS(CAVLC) +
    one all-I_PCM IDR slice carrying the given planes."""
    sps = encode_sps(66, level_idc, 0, 0, 0, 0, 1, 0, mb_w - 1, mb_h - 1, 1)
    pps = encode_pps(0, 0, 0)
    slc = encode_ipcm_slice(
        y, cb, cr, mb_w, mb_h, qp_delta=qp_delta, idr_pic_id=idr_pic_id
    )
    return encode_nal_stream([(3, 7, sps), (3, 8, pps), (3, 5, slc)])


def decode_avc_ipcm(data: bytes) -> AvcIpcmFrame:
    """Decode an Annex B stream whose IDR slice is all-I_PCM back to
    pixel planes; SPS/PPS must precede the slice (in-band, the q204
    transport). Raises ValueError (never IndexError) on corruption,
    and names the entropy seam on any non-I_PCM macroblock."""
    sps: AvcSps | None = None
    pps: AvcPps | None = None
    for nal in parse_nal_stream(data):
        if nal.nal_type == 7:
            sps = parse_sps(nal.rbsp)
        elif nal.nal_type == 8:
            pps = parse_pps(nal.rbsp)
        elif nal.nal_type == 5:
            if sps is None or pps is None:
                raise ValueError("avc: IDR slice before SPS/PPS")
            return decode_ipcm_slice(nal.rbsp, sps, pps)
        elif nal.nal_type == 1:
            raise ValueError(
                "avc: non-IDR slice is outside the I_PCM profile"
            )
    raise ValueError("avc: stream carries no IDR slice")


def synth_ipcm_planes(clen: int) -> tuple[bytes, bytes, bytes, int, int]:
    """Deterministic pixel planes from one integer (the oracle's
    closed form): mb grid (clen%3+1)×(clen%2+1); sample value at
    plane raster position i (width w) is
    (clen + A·(i%w) + B·(i÷w)) % 255 + 1 with (A,B) = (7,13) luma,
    (5,11) Cb, (3,17) Cr — always in [1,255], never the forbidden 0.
    Returns (y, cb, cr, mb_w, mb_h)."""
    mb_w, mb_h = clen % 3 + 1, clen % 2 + 1
    w, h = 16 * mb_w, 16 * mb_h

    def plane(width: int, height: int, a: int, b: int) -> bytes:
        return bytes(
            (clen + a * (i % width) + b * (i // width)) % 255 + 1
            for i in range(width * height)
        )

    return (
        plane(w, h, 7, 13),
        plane(w // 2, h // 2, 5, 11),
        plane(w // 2, h // 2, 3, 17),
        mb_w,
        mb_h,
    )


def synth_avc_ipcm(clen: int) -> bytes:
    """Closed-form Annex B I_PCM stream for the q209 differential:
    planes from `synth_ipcm_planes`, qp_delta = clen%5 − 2 (so
    qp = 24 + clen%5), idr_pic_id = clen%8."""
    y, cb, cr, mb_w, mb_h = synth_ipcm_planes(clen)
    return encode_avc_ipcm(
        y, cb, cr, mb_w, mb_h,
        qp_delta=clen % 5 - 2,
        idr_pic_id=clen % 8,
    )


# --- AVCC layout (ISO/IEC 14496-15): out-of-band parameter sets ----------
#
# Real MP4s do NOT put SPS/PPS in-band next to the slices: they ride
# the avcC box (AVCDecoderConfigurationRecord) inside the stsd sample
# entry, and the mdat samples are LENGTH-PREFIXED NAL units (no start
# codes, no Annex B scan). These functions implement that second
# framing so both real-world shapes decode: Annex B (q204) and
# AVCC-in-MP4 (q206).


@dataclass(frozen=True)
class AvcConfig:
    profile_idc: int
    level_idc: int
    length_size: int  # NAL length prefix bytes in samples (1, 2, or 4)
    sps: tuple[bytes, ...]  # full NAL units (header byte + escaped RBSP)
    pps: tuple[bytes, ...]


def parse_nal_unit(nal: bytes) -> AvcNal:
    """One NAL unit WITHOUT framing (the avcC / length-prefixed
    shape): header byte + escaped payload."""
    if not nal:
        raise ValueError("avc: empty NAL unit")
    if nal[0] & 0x80:
        raise ValueError("avc: forbidden_zero_bit set")
    return AvcNal(
        ref_idc=(nal[0] >> 5) & 3,
        nal_type=nal[0] & 0x1F,
        rbsp=unescape_rbsp(nal[1:]),
    )


def encode_avcc(
    sps_nals: list[bytes],
    pps_nals: list[bytes],
    length_size: int = 4,
) -> bytes:
    """AVCDecoderConfigurationRecord (§5.3.3.1): profile/compat/level
    mirrored from the FIRST SPS (as the spec requires), reserved bits
    set, 2-byte-length-prefixed parameter-set NAL units."""
    if length_size not in (1, 2, 4):
        raise ValueError("avc: length_size must be 1, 2, or 4")
    if not sps_nals or not pps_nals:
        raise ValueError("avc: avcC requires at least one SPS and PPS")
    if len(sps_nals) > 31 or len(pps_nals) > 255:
        raise ValueError("avc: too many parameter sets for avcC")
    sps0 = parse_nal_unit(sps_nals[0])
    if sps0.nal_type != 7:
        raise ValueError("avc: first avcC entry must be an SPS NAL")
    out = bytearray()
    out.append(1)  # configurationVersion
    out.append(sps0.rbsp[0])  # AVCProfileIndication
    out.append(sps0.rbsp[1])  # profile_compatibility
    out.append(sps0.rbsp[2])  # AVCLevelIndication
    out.append(0xFC | (length_size - 1))
    out.append(0xE0 | len(sps_nals))
    for nal in sps_nals:
        out += struct.pack(">H", len(nal)) + nal
    out.append(len(pps_nals))
    for nal in pps_nals:
        out += struct.pack(">H", len(nal)) + nal
    return bytes(out)


def parse_avcc(data: bytes) -> AvcConfig:
    """Strict AVCDecoderConfigurationRecord parse: version must be 1,
    every parameter-set length bounds-checked, profile/level read
    from the record header (and available for cross-checking against
    the embedded SPS)."""
    if len(data) < 7:
        raise ValueError("avc: truncated avcC record")
    if data[0] != 1:
        raise ValueError(f"avc: avcC configurationVersion {data[0]} != 1")
    profile, level = data[1], data[3]
    length_size = (data[4] & 3) + 1
    if length_size == 3:
        raise ValueError("avc: avcC length size 3 is invalid")
    n_sps = data[5] & 0x1F
    pos = 6
    sps = []
    for _ in range(n_sps):
        if pos + 2 > len(data):
            raise ValueError("avc: truncated avcC SPS length")
        (ln,) = struct.unpack(">H", data[pos: pos + 2])
        pos += 2
        if pos + ln > len(data):
            raise ValueError("avc: avcC SPS overruns record")
        sps.append(data[pos: pos + ln])
        pos += ln
    if pos >= len(data):
        raise ValueError("avc: truncated avcC PPS count")
    n_pps = data[pos]
    pos += 1
    pps = []
    for _ in range(n_pps):
        if pos + 2 > len(data):
            raise ValueError("avc: truncated avcC PPS length")
        (ln,) = struct.unpack(">H", data[pos: pos + 2])
        pos += 2
        if pos + ln > len(data):
            raise ValueError("avc: avcC PPS overruns record")
        pps.append(data[pos: pos + ln])
        pos += ln
    if not sps or not pps:
        raise ValueError("avc: avcC carries no SPS or no PPS")
    return AvcConfig(
        profile_idc=profile,
        level_idc=level,
        length_size=length_size,
        sps=tuple(sps),
        pps=tuple(pps),
    )


def encode_nal_stream_avcc(
    nals: list[tuple[int, int, bytes]], length_size: int = 4
) -> bytes:
    """(ref_idc, nal_type, rbsp) -> length-prefixed sample bytes (the
    AVCC mdat shape; no start codes)."""
    if length_size not in (1, 2, 4):
        raise ValueError("avc: length_size must be 1, 2, or 4")
    out = bytearray()
    for ref_idc, nal_type, rbsp in nals:
        if not 0 <= ref_idc <= 3 or not 1 <= nal_type <= 31:
            raise ValueError("avc: NAL header field out of range")
        nal = bytes([(ref_idc << 5) | nal_type]) + escape_rbsp(rbsp)
        if len(nal) >= 1 << (8 * length_size):
            raise ValueError("avc: NAL exceeds the length prefix")
        out += len(nal).to_bytes(length_size, "big") + nal
    return bytes(out)


def parse_nal_stream_avcc(data: bytes, length_size: int) -> list[AvcNal]:
    """Length-prefixed NAL walk: each prefix bounds-checked against
    the sample; trailing garbage after the last NAL is corrupt."""
    if length_size not in (1, 2, 4):
        raise ValueError("avc: length_size must be 1, 2, or 4")
    out = []
    pos = 0
    while pos < len(data):
        if pos + length_size > len(data):
            raise ValueError("avc: truncated NAL length prefix")
        ln = int.from_bytes(data[pos: pos + length_size], "big")
        pos += length_size
        if ln == 0 or pos + ln > len(data):
            raise ValueError("avc: NAL length overruns sample")
        out.append(parse_nal_unit(data[pos: pos + ln]))
        pos += ln
    if not out:
        raise ValueError("avc: sample carries no NAL units")
    return out


# --- CAVLC residual decode: the nC >= 8 fixed-length profile --------------
#
# First REAL entropy decode through the video seam. ISO/IEC 14496-10
# §9.2 splits a residual block into coeff_token, trailing-one signs,
# level codes, total_zeros, and run_before. Three of those five are
# ARBITRARY Huffman tables (coeff_token for nC < 8, total_zeros,
# run_before) — but the spec leaves a fully STRUCTURAL corridor:
#
#   * coeff_token for nC >= 8 is a 6-bit FLC: ((TotalCoeff-1) << 2)
#     | TrailingOnes, with TotalCoeff = 0 taking the otherwise-
#     impossible value 3 (T1s = 3 needs TotalCoeff >= 3) — Table 9-5
#     last column.
#   * level codes are unary level_prefix + adaptive level_suffix
#     (§9.2.2.1) — pure arithmetic, no codebook.
#   * total_zeros / run_before are SKIPPED entirely when TotalCoeff
#     equals maxNumCoeff (§7.3.5.3.3 parses total_zeros only when
#     TotalCoeff < endIdx - startIdx + 1).
#
# nC >= 8 is reached LEGALLY through §9.2.1's neighbor rule: a
# neighboring I_PCM macroblock contributes nN = 16, so an Intra_16x16
# macroblock whose left neighbor is I_PCM decodes its DC block with
# nC = 16 (top row) — the constrained-but-real case this profile
# encodes. What remains of the entropy seam after this: the nC < 8
# coeff_token VLC tables, total_zeros/run_before codebooks (partial
# blocks), and CABAC. Each raises by name below.


def _write_cavlc_block16(w: _EgBitsOut, levels: tuple[int, ...]) -> None:
    """Encode one 16-coefficient residual block (position order, every
    coefficient nonzero so TotalCoeff == maxNumCoeff == 16) with the
    nC >= 8 FLC coeff_token. Raises on magnitudes needing the
    level_prefix >= 14 escape sizes (decoder handles them; this
    encoder's profile stays below)."""
    if len(levels) != 16 or any(v == 0 for v in levels):
        raise ValueError(
            "avc: the FLC profile codes full blocks — 16 nonzero levels"
        )
    rev = levels[::-1]  # §9.2.2 codes highest-frequency first
    t1 = 0
    while t1 < 3 and abs(rev[t1]) == 1:
        t1 += 1
    w.u(((16 - 1) << 2) | t1, 6)  # coeff_token, Table 9-5 nC >= 8
    for v in rev[:t1]:
        w.u(1 if v < 0 else 0, 1)  # trailing_ones_sign_flag
    suffix_len = 1 if t1 < 3 else 0  # TotalCoeff > 10 (§9.2.2.1)
    for i in range(t1, 16):
        v = rev[i]
        code = 2 * v - 2 if v > 0 else -2 * v - 1
        if i == t1 and t1 < 3:
            # fewer than 3 trailing ones implies |first level| >= 2 —
            # structurally guaranteed here, since t1 only stops below
            # 3 at a non-±1 level
            code -= 2
        prefix = code >> suffix_len
        if prefix > 13:
            raise ValueError(
                "avc: level magnitude needs the level_prefix >= 14 "
                "escape sizes — outside this encoder's profile"
            )
        w.u(0, prefix)
        w.u(1, 1)
        if suffix_len:
            w.u(code & ((1 << suffix_len) - 1), suffix_len)
        if suffix_len == 0:
            suffix_len = 1
        if abs(v) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # TotalCoeff == maxNumCoeff: total_zeros and run_before absent


def _read_cavlc_block16(br: _EgBits, nc: int) -> tuple[int, ...]:
    """Decode one residual block under nC >= 8 (6-bit FLC
    coeff_token), requiring TotalCoeff == 16 so total_zeros /
    run_before never arise. Level decoding implements the FULL
    §9.2.2.1 arithmetic including the level_prefix 14/15/16+ escape
    sizes. Returns the 16 coefficients in position order."""
    if nc < 8:
        raise ValueError(
            f"avc: coeff_token with nC = {nc} needs the Table 9-5 VLC "
            "codebooks — outside the nC >= 8 FLC profile (entropy seam)"
        )
    token = br.u(6)
    if token == 0b000011:
        total, t1 = 0, 0
    else:
        total, t1 = (token >> 2) + 1, token & 3
    if t1 > total:
        raise ValueError("avc: TrailingOnes exceeds TotalCoeff")
    if total != 16:
        raise ValueError(
            f"avc: TotalCoeff {total} < maxNumCoeff needs the "
            "total_zeros codebook (Table 9-7) — outside the full-block "
            "profile (entropy seam)"
        )
    rev: list[int] = []
    for _ in range(t1):
        rev.append(-1 if br.u(1) else 1)
    suffix_len = 1 if t1 < 3 else 0
    for i in range(t1, 16):
        prefix = 0
        while br.u(1) == 0:
            prefix += 1
            if prefix > 31:
                raise ValueError("avc: level_prefix too long")
        size = suffix_len
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        code = (min(15, prefix) << suffix_len) + (br.u(size) if size else 0)
        if prefix >= 15 and suffix_len == 0:
            code += 15
        if prefix >= 16:
            code += (1 << (prefix - 3)) - 4096
        if i == t1 and t1 < 3:
            code += 2
        v = (code + 2) >> 1 if code % 2 == 0 else -((code + 1) >> 1)
        rev.append(v)
        if suffix_len == 0:
            suffix_len = 1
        if abs(v) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    return tuple(rev[::-1])


@dataclass(frozen=True)
class AvcMacroblock:
    """One decoded macroblock: I_PCM raw planes or Intra_16x16
    DC-only CAVLC coefficients."""
    mb_type: int
    # I_PCM (mb_type 25): (y 16x16, cb 8x8, cr 8x8) raw samples
    pcm: tuple[bytes, bytes, bytes] | None
    # Intra_16x16 DC-only: 16 decoded DC coefficients, position order
    dc_levels: tuple[int, ...] | None


@dataclass(frozen=True)
class AvcI16DcFrame:
    width: int
    height: int
    n_mbs: int
    qp: int
    frame_num: int
    idr_pic_id: int
    mbs: tuple[AvcMacroblock, ...]


def encode_i16dc_slice(
    mbs: list[tuple[str, object]],
    mb_w: int,
    mb_h: int,
    *,
    pps_id: int = 0,
    frame_num: int = 0,
    idr_pic_id: int = 0,
    qp_delta: int = 0,
    log2_max_frame_num: int = 4,
    log2_max_poc_lsb: int = 4,
) -> bytes:
    """IDR I-slice mixing I_PCM and Intra_16x16 DC-only macroblocks.
    mbs entries (raster order): ('pcm', (y16x16, cb8x8, cr8x8)) or
    ('i16dc', 16 nonzero levels). Every i16dc macroblock must decode
    with nC >= 8, which the encoder checks with the same §9.2.1
    neighbor rule the decoder applies — so every emitted stream is
    decodable by `decode_i16dc_slice` and any conforming decoder."""
    if len(mbs) != mb_w * mb_h:
        raise ValueError("avc: macroblock list does not fill the grid")
    w = _EgBitsOut()
    w.ue(0)                       # first_mb_in_slice
    w.ue(7)                       # slice_type: I
    w.ue(pps_id)
    w.u(frame_num, log2_max_frame_num)
    w.ue(idr_pic_id)
    w.u(0, log2_max_poc_lsb)      # pic_order_cnt_lsb
    w.u(0, 1)                     # no_output_of_prior_pics_flag
    w.u(0, 1)                     # long_term_reference_flag
    w.se(qp_delta)                # slice_qp_delta
    w.ue(1)                       # disable_deblocking_filter_idc = 1
    # per-MB nN stand-in for §9.2.1: I_PCM -> 16; Intra_16x16 with
    # CodedBlockPatternLuma == 0 -> its 4x4 luma blocks carry 0
    nn = [0] * (mb_w * mb_h)
    for idx, (kind, payload) in enumerate(mbs):
        mbx, mby = idx % mb_w, idx // mb_w
        if kind == "pcm":
            y16, cb8, cr8 = payload  # type: ignore[misc]
            if len(y16) != 256 or len(cb8) != 64 or len(cr8) != 64:
                raise ValueError("avc: I_PCM macroblock sample size")
            if 0 in y16 or 0 in cb8 or 0 in cr8:
                raise ValueError(
                    "avc: I_PCM sample value 0 is forbidden (§7.4.5)"
                )
            w.ue(_MB_TYPE_I_PCM)
            w.align_zero()
            w.bytes_aligned(bytes(y16) + bytes(cb8) + bytes(cr8))
            nn[idx] = 16
        elif kind == "i16dc":
            na = nn[idx - 1] if mbx > 0 else None
            nb = nn[idx - mb_w] if mby > 0 else None
            if na is None and nb is None:
                nc = 0
            elif na is None:
                nc = nb
            elif nb is None:
                nc = na
            else:
                nc = (na + nb + 1) >> 1
            if nc < 8:
                raise ValueError(
                    "avc: i16dc macroblock needs an I_PCM neighbor "
                    f"(nC = {nc} < 8 would take the VLC coeff_token "
                    "tables)"
                )
            w.ue(3)   # Intra_16x16: pred DC, cbp_chroma 0, cbp_luma 0
            w.ue(0)   # intra_chroma_pred_mode: DC
            w.se(0)   # mb_qp_delta
            _write_cavlc_block16(w, tuple(payload))  # type: ignore[arg-type]
            nn[idx] = 0
        else:
            raise ValueError(f"avc: unknown macroblock kind {kind!r}")
    return w.rbsp_trailing()


def decode_i16dc_slice(
    rbsp: bytes, sps: AvcSps, pps: AvcPps
) -> AvcI16DcFrame:
    """Decode an IDR slice of I_PCM + Intra_16x16 DC-only macroblocks
    — the first REAL CAVLC entropy decode through the video seam. nC
    is derived per §9.2.1 (I_PCM neighbors contribute 16; uncoded 4x4
    luma blocks contribute 0); any macroblock whose nC lands below 8,
    any partial block (TotalCoeff < 16), any AC/chroma residual, and
    CABAC all raise naming their exact remaining seam."""
    if pps.entropy_coding_mode != 0:
        raise ValueError(
            "avc: CABAC slice data is outside the CAVLC profile "
            "(entropy seam)"
        )
    if pps.pic_init_qp is None or pps.deblocking_control is None:
        raise ValueError("avc: slice decode needs a fully parsed PPS")
    if sps.log2_max_poc_lsb is None:
        raise ValueError("avc: poc type != 0 outside this profile")
    br = _EgBits(rbsp)
    if br.ue() != 0:
        raise ValueError("avc: multi-slice pictures outside this profile")
    if br.ue() % 5 != 2:
        raise ValueError("avc: non-I slice outside this profile")
    if br.ue() != pps.pps_id:
        raise ValueError("avc: slice references an unknown PPS")
    frame_num = br.u(sps.log2_max_frame_num)
    idr_pic_id = br.ue()
    br.u(sps.log2_max_poc_lsb)
    br.u(1)
    br.u(1)
    qp = pps.pic_init_qp + br.se()
    if not 0 <= qp <= 51:
        raise ValueError("avc: slice qp out of the [0, 51] range")
    if pps.deblocking_control:
        if br.ue() != 1:
            br.se()
            br.se()
    if sps.width % 16 or sps.height % 16:
        raise ValueError("avc: cropped frames outside this profile")
    mb_w, mb_h = sps.width // 16, sps.height // 16
    nn = [0] * (mb_w * mb_h)
    mbs: list[AvcMacroblock] = []
    for idx in range(mb_w * mb_h):
        mbx, mby = idx % mb_w, idx // mb_w
        mb_type = br.ue()
        if mb_type == _MB_TYPE_I_PCM:
            br.align_zero()
            samples = br.bytes_aligned(256 + 2 * 64)
            mbs.append(AvcMacroblock(
                mb_type=mb_type,
                pcm=(samples[:256], samples[256:320], samples[320:384]),
                dc_levels=None,
            ))
            nn[idx] = 16
            continue
        if mb_type == 0:
            raise ValueError(
                "avc: I_4x4 prediction-mode parsing is outside the "
                "Intra_16x16 profile"
            )
        if not 1 <= mb_type <= 24:
            raise ValueError(f"avc: invalid I-slice mb_type {mb_type}")
        cbp_luma = 15 if mb_type - 1 >= 12 else 0
        cbp_chroma = ((mb_type - 1) // 4) % 3
        if cbp_luma or cbp_chroma:
            raise ValueError(
                "avc: AC / chroma residual blocks are outside the "
                "DC-only profile (entropy seam)"
            )
        if br.ue() > 3:
            raise ValueError("avc: invalid intra_chroma_pred_mode")
        qp += br.se()  # mb_qp_delta
        if not 0 <= qp <= 51:
            raise ValueError("avc: macroblock qp out of range")
        na = nn[idx - 1] if mbx > 0 else None
        nb = nn[idx - mb_w] if mby > 0 else None
        if na is None and nb is None:
            nc = 0
        elif na is None:
            nc = nb  # type: ignore[assignment]
        elif nb is None:
            nc = na
        else:
            nc = (na + nb + 1) >> 1
        levels = _read_cavlc_block16(br, nc)
        mbs.append(AvcMacroblock(mb_type=mb_type, pcm=None,
                                 dc_levels=levels))
        nn[idx] = 0
    if br.u(1) != 1:
        raise ValueError("avc: missing rbsp stop bit after slice data")
    while br.pos & 7:
        if br.u(1):
            raise ValueError("avc: non-zero rbsp trailing bit")
    if br.pos != 8 * len(rbsp):
        raise ValueError("avc: trailing bytes after slice data")
    return AvcI16DcFrame(
        width=sps.width,
        height=sps.height,
        n_mbs=mb_w * mb_h,
        qp=qp,
        frame_num=frame_num,
        idr_pic_id=idr_pic_id,
        mbs=tuple(mbs),
    )


def encode_avc_i16dc(
    mbs: list[tuple[str, object]],
    mb_w: int,
    mb_h: int,
    *,
    qp_delta: int = 0,
    idr_pic_id: int = 0,
) -> bytes:
    """Self-contained Annex B stream: SPS + PPS(CAVLC) + one IDR
    slice mixing I_PCM and Intra_16x16 DC-only macroblocks."""
    sps = encode_sps(66, 10, 0, 0, 0, 0, 1, 0, mb_w - 1, mb_h - 1, 1)
    pps = encode_pps(0, 0, 0)
    slc = encode_i16dc_slice(
        mbs, mb_w, mb_h, qp_delta=qp_delta, idr_pic_id=idr_pic_id
    )
    return encode_nal_stream([(3, 7, sps), (3, 8, pps), (3, 5, slc)])


def decode_avc_i16dc(data: bytes) -> AvcI16DcFrame:
    """Decode an Annex B stream of I_PCM + Intra_16x16 DC-only
    macroblocks; SPS/PPS must precede the slice."""
    sps: AvcSps | None = None
    pps: AvcPps | None = None
    for nal in parse_nal_stream(data):
        if nal.nal_type == 7:
            sps = parse_sps(nal.rbsp)
        elif nal.nal_type == 8:
            pps = parse_pps(nal.rbsp)
        elif nal.nal_type == 5:
            if sps is None or pps is None:
                raise ValueError("avc: IDR slice before SPS/PPS")
            return decode_i16dc_slice(nal.rbsp, sps, pps)
        elif nal.nal_type == 1:
            raise ValueError("avc: non-IDR slice is outside this profile")
    raise ValueError("avc: stream carries no IDR slice")


def synth_i16dc_levels(clen: int, p: int) -> tuple[int, ...]:
    """Closed-form DC levels for CAVLC macroblock p of a clen-doc:
    t = (clen + p) % 4 trailing coefficients are ±1, the rest carry
    magnitude 2 + (7·clen + 13·p + 3·k) % 3; the sign at position k
    is +1 when (clen + p + k) is even. Always 16 nonzero levels with
    |level[t-th from the end]| >= 2, so every generated block is
    encodable under the FLC profile."""
    t = (clen + p) % 4
    levels = []
    for k in range(16):
        sign = 1 - 2 * ((clen + p + k) % 2)
        if k >= 16 - t:
            levels.append(sign)
        else:
            levels.append(sign * (2 + (7 * clen + 13 * p + 3 * k) % 3))
    return tuple(levels)


def synth_avc_i16dc(clen: int) -> bytes:
    """Closed-form Annex B stream for the q222 differential: one MB
    row of clen%3+1 (I_PCM, Intra_16x16-DC) pairs — each CAVLC
    macroblock's left neighbor is I_PCM, so nC = 16 and the FLC
    profile is hit legally. PCM samples replay the q209 pattern per
    macroblock; DC levels come from `synth_i16dc_levels`.
    qp_delta = clen%5 − 2, idr_pic_id = clen%8."""
    n_pairs = clen % 3 + 1
    mbs: list[tuple[str, object]] = []
    for p in range(n_pairs):
        y16 = bytes(
            (clen + 7 * c + 13 * r + p) % 255 + 1
            for r in range(16) for c in range(16)
        )
        cb8 = bytes(
            (clen + 5 * c + 11 * r + p) % 255 + 1
            for r in range(8) for c in range(8)
        )
        cr8 = bytes(
            (clen + 3 * c + 17 * r + p) % 255 + 1
            for r in range(8) for c in range(8)
        )
        mbs.append(("pcm", (y16, cb8, cr8)))
        mbs.append(("i16dc", synth_i16dc_levels(clen, p)))
    return encode_avc_i16dc(
        mbs, 2 * n_pairs, 1,
        qp_delta=clen % 5 - 2,
        idr_pic_id=clen % 8,
    )
