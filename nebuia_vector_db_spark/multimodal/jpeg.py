"""Pure numpy/stdlib baseline JPEG codec — grayscale AND color, 8-bit.

Third REAL codec behind the multimodal surface (with png.py and
wav.py; the reference engine is text+vector only, main.go:25-75 —
this module is extension surface). Implements the baseline sequential
DCT process of ITU-T T.81:

- **decoder**: full marker parse (SOI / APPn skipped / DQT / SOF0 /
  DHT / DRI / SOS / EOI), canonical Huffman table reconstruction from
  the DHT bits/values lists, entropy decode with 0xFF00
  byte-unstuffing and RSTn resync, DC prediction, dezigzag,
  dequantize, 8×8 inverse DCT, level shift. Single-component
  (grayscale) scans AND interleaved 3-component YCbCr scans with
  per-component sampling factors up to 2×2 (4:4:4, 4:2:2, 4:2:0):
  chroma planes are decoded at their subsampled resolution, upsampled
  by pixel replication, and converted to RGB with the JFIF matrix;
- **encoder**: RGB→YCbCr (color), 2×2 box-filter chroma downsampling
  (4:2:0), forward DCT, quantization with the Annex K.1/K.2
  luminance/chrominance tables scaled by a libjpeg-style quality
  factor, zigzag, DC differencing, canonical Huffman encode (Annex
  K.3 typical tables, both pairs) with byte stuffing, interleaved
  MCU order, emitting the exact tables it uses in DQT/DHT (so ANY
  baseline decoder can read the stream).

The 2-D DCT is exact matrix arithmetic (C · B · Cᵀ with the
orthonormal DCT-II basis), validated in tests against a literal
four-loop transcription of the T.81 definition; the color transform
is validated against a literal per-pixel transcription of the JFIF
formulas. Progressive mode (SOF2) and sampling factors above 2 are
out of scope — the decoder rejects them cleanly rather than
mis-decoding.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegFormatError(ValueError):
    """Raised when the payload is not a decodable baseline JPEG."""


# ---------------------------------------------------------------- constants
# zigzag scan order: index i of the zigzag sequence -> (row, col)
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[1] if (rc[0] + rc[1]) % 2 else rc[0],
        ),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


_ZIGZAG = _zigzag_order()          # zz index -> raster index
_UNZIGZAG = np.argsort(_ZIGZAG)    # raster index -> zz index

# Annex K.1 luminance quantization table (raster order)
_QTABLE_K1 = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 typical Huffman tables for luminance DC / AC:
# (bits[1..16], values)
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

# Annex K.2 typical chrominance quantization table (raster order)
_QTABLE_K2 = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K.3 typical Huffman tables for chrominance DC / AC
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
assert sum(_AC_C_BITS) == len(_AC_C_VALS) == 162
assert sum(_AC_BITS) == len(_AC_VALS) == 162

# orthonormal 8-point DCT-II basis: T[k, n] = c(k) cos((2n+1)kπ/16)
_DCT_T = np.array(
    [
        [
            (np.sqrt(1 / 8) if k == 0 else np.sqrt(2 / 8))
            * np.cos((2 * n + 1) * k * np.pi / 16)
            for n in range(8)
        ]
        for k in range(8)
    ]
)


def _dct2(block: np.ndarray) -> np.ndarray:
    return _DCT_T @ block @ _DCT_T.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _DCT_T.T @ coef @ _DCT_T


def _scale_qtable(base: np.ndarray, quality: int) -> np.ndarray:
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - q * 2
    t = (base * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def quality_qtable(quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the K.1 luminance table."""
    return _scale_qtable(_QTABLE_K1, quality)


def quality_qtable_chroma(quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the K.2 chrominance table."""
    return _scale_qtable(_QTABLE_K2, quality)


# ------------------------------------------------------------ color space
def rgb_to_ycbcr(img: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range RGB → (Y, Cb, Cr) float64 planes."""
    x = np.asarray(img, dtype=np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF (Y, Cb, Cr) planes → uint8 RGB (h, w, 3)."""
    cb = cb - 128.0
    cr = cr - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136286 * cb - 0.714136286 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -------------------------------------------------------------- bit streams
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, length: int) -> None:
        if length == 0:
            return
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            b = (self._acc >> self._nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s


class _BitReader:
    """Entropy-segment reader: un-stuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise JpegFormatError("entropy stream truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise JpegFormatError("entropy stream truncated")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise JpegFormatError(
                        f"unexpected marker 0xFF{nxt:02X} inside scan"
                    )
            self._acc = b
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


# ----------------------------------------------------------- huffman tables
def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the T.81 canonical construction."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]):
        # (length, code) -> value; decode bit-by-bit
        self.lut: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lut[(length, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            v = self.lut.get((length, code))
            if v is not None:
                return v
        raise JpegFormatError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, amplitude bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _extend(bits: int, size: int) -> int:
    """Inverse of magnitude coding (T.81 F.12 EXTEND)."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


# ------------------------------------------------------------------ encoder
def _plane_to_zz(padded: np.ndarray, qt: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Level-shift, DCT, quantize and zigzag every 8×8 block of an
    8-multiple-padded float plane in one einsum; returns
    (zz rows in block-raster order, block rows, block cols)."""
    bh, bwid = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = (
        padded.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coefs = np.einsum("ij,bjk,lk->bil", _DCT_T, blocks, _DCT_T)
    zz = (
        np.round(coefs / qt[None, :, :])
        .astype(np.int64)
        .reshape(-1, 64)[:, _ZIGZAG]
    )
    return zz, bh, bwid


def _write_block(
    bw: "_BitWriter",
    zz: np.ndarray,
    prev_dc: int,
    dc_codes: dict,
    ac_codes: dict,
) -> int:
    """Entropy-code one zigzagged block; returns the new DC predictor."""
    size, ampl = _magnitude(int(zz[0]) - prev_dc)
    code, length = dc_codes[size]
    bw.write(code, length)
    bw.write(ampl, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            bw.write(code, length)
            run -= 16
        size, ampl = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        bw.write(code, length)
        bw.write(ampl, size)
        run = 0
    if last < 63:
        code, length = ac_codes[0x00]  # EOB
        bw.write(code, length)
    return int(zz[0])


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def encode_jpeg_gray(
    img: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """Encode a 2-D uint8 array as a baseline grayscale JPEG.

    ``restart_interval`` > 0 emits a DRI segment and RSTn markers
    every N MCUs (byte-aligned entropy segments with DC prediction
    reset) — the mechanism hardware/parallel decoders use to resync,
    and the fixture generator for the decoder's restart path."""
    img = np.asarray(img)
    if img.ndim != 2:
        raise JpegFormatError("encoder takes a 2-D grayscale array")
    h, w = img.shape
    if h == 0 or w == 0:
        raise JpegFormatError("empty image")
    qt = quality_qtable(quality)
    # pad to 8x8 multiples by edge replication; every block is
    # DCT'd/quantized in one einsum (the per-block loop only does
    # entropy coding, which is inherently sequential bit work)
    ph, pw = -h % 8, -w % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    zz_all, _, _ = _plane_to_zz(padded, qt)

    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    bw = _BitWriter()
    prev_dc = 0
    mcu = 0
    for zz in zz_all:
        if restart_interval and mcu and mcu % restart_interval == 0:
            bw.flush()  # byte-align before the marker (T.81 F.1.2.3)
            bw.out += bytes(
                [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
            )
            prev_dc = 0
        mcu += 1
        prev_dc = _write_block(bw, zz, prev_dc, dc_codes, ac_codes)
    bw.flush()

    qt_zz = qt.reshape(64)[_ZIGZAG]
    out = b"\xff\xd8"  # SOI
    out += _seg(0xFFDB, bytes([0x00]) + bytes(int(x) for x in qt_zz))  # DQT
    out += _seg(  # SOF0: 8-bit, h, w, 1 component, no subsampling, qtable 0
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    out += _seg(  # SOS: 1 component, DC table 0 / AC table 0
        0xFFDA, bytes([1, 1, 0x00, 0, 63, 0])
    )
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return out


def encode_jpeg_color(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "420",
    restart_interval: int = 0,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB array as a baseline YCbCr JPEG.

    ``subsampling``: ``"420"`` (2×2 luma blocks per MCU, chroma
    box-filtered 2× in both axes — the ubiquitous web/camera layout)
    or ``"444"`` (no subsampling). Luminance uses the K.1 table +
    K.3 luminance Huffman pair (ids 0), chrominance the K.2 table +
    chrominance pair (ids 1). ``restart_interval`` > 0 emits DRI +
    RSTn every N MCUs with all three DC predictors reset."""
    img = np.asarray(img)
    if img.ndim != 3 or img.shape[2] != 3:
        raise JpegFormatError("color encoder takes an (h, w, 3) array")
    h, w = img.shape[:2]
    if h == 0 or w == 0:
        raise JpegFormatError("empty image")
    if subsampling not in ("420", "444"):
        raise JpegFormatError(f"unsupported subsampling {subsampling!r}")
    sub = subsampling == "420"
    y, cb, cr = rgb_to_ycbcr(img)
    mcu_px = 16 if sub else 8
    ph, pw = -h % mcu_px, -w % mcu_px
    pad = lambda p: np.pad(p, ((0, ph), (0, pw)), mode="edge")  # noqa: E731
    y, cb, cr = pad(y), pad(cb), pad(cr)
    if sub:
        # 2x2 box filter, matching the replication upsample on decode
        cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
        cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))

    qt_l = quality_qtable(quality)
    qt_c = quality_qtable_chroma(quality)
    zz_y, by, bx = _plane_to_zz(y, qt_l)
    zz_cb, cby, cbx = _plane_to_zz(cb, qt_c)
    zz_cr, _, _ = _plane_to_zz(cr, qt_c)

    dc_l = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_l = _canonical_codes(_AC_BITS, _AC_VALS)
    dc_c = _canonical_codes(_DC_C_BITS, _DC_C_VALS)
    ac_c = _canonical_codes(_AC_C_BITS, _AC_C_VALS)

    bw = _BitWriter()
    pred = [0, 0, 0]  # Y, Cb, Cr DC predictors
    mcu = 0
    mcy, mcx = cby, cbx  # MCU grid == chroma block grid in both modes
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu // restart_interval - 1) % 8]
                )
                pred = [0, 0, 0]
            mcu += 1
            if sub:  # 2x2 luma blocks in raster order within the MCU
                for vy in (0, 1):
                    for vx in (0, 1):
                        zz = zz_y[(my * 2 + vy) * bx + (mx * 2 + vx)]
                        pred[0] = _write_block(bw, zz, pred[0], dc_l, ac_l)
            else:
                pred[0] = _write_block(
                    bw, zz_y[my * bx + mx], pred[0], dc_l, ac_l
                )
            pred[1] = _write_block(bw, zz_cb[my * cbx + mx], pred[1], dc_c, ac_c)
            pred[2] = _write_block(bw, zz_cr[my * cbx + mx], pred[2], dc_c, ac_c)
    bw.flush()

    samp_y = 0x22 if sub else 0x11
    out = b"\xff\xd8"  # SOI
    out += _seg(
        0xFFDB, bytes([0x00]) + bytes(int(x) for x in qt_l.reshape(64)[_ZIGZAG])
    )
    out += _seg(
        0xFFDB, bytes([0x01]) + bytes(int(x) for x in qt_c.reshape(64)[_ZIGZAG])
    )
    out += _seg(  # SOF0: 3 components — Y (qtable 0), Cb/Cr (qtable 1)
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, samp_y, 0, 2, 0x11, 1, 3, 0x11, 1]),
    )
    out += _seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += _seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    out += _seg(0xFFC4, bytes([0x01]) + bytes(_DC_C_BITS) + bytes(_DC_C_VALS))
    out += _seg(0xFFC4, bytes([0x11]) + bytes(_AC_C_BITS) + bytes(_AC_C_VALS))
    if restart_interval:
        out += _seg(0xFFDD, struct.pack(">H", restart_interval))
    out += _seg(  # SOS: Y tables 0/0, chroma tables 1/1
        0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return out


# ------------------------------------------------------------------ decoder
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JPEG: 2-D uint8 for grayscale streams,
    (h, w, 3) uint8 RGB for 3-component YCbCr streams.

    Fail-closed boundary: ANY malformation — including corruptions
    that slip past the targeted checks (e.g. a DHT whose bit counts
    overrun its value list) — surfaces as :class:`JpegFormatError`,
    never a raw IndexError/struct.error escaping into the caller
    (fuzz-pinned in tests/test_codec_fuzz.py)."""
    try:
        return _decode_jpeg_impl(payload)
    except JpegFormatError:
        raise
    except (IndexError, ValueError, struct.error) as e:
        raise JpegFormatError(f"corrupt JPEG stream: {e}") from e


def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode any supported baseline JPEG to a 2-D uint8 luma array:
    grayscale streams decode directly; color streams decode fully and
    return the JFIF luma of the reconstructed RGB (the shape the
    image-stats kernels in multimodal/assets.py consume)."""
    out = decode_jpeg(payload)
    if out.ndim == 2:
        return out
    y, _, _ = rgb_to_ycbcr(out)
    return np.clip(np.round(y), 0, 255).astype(np.uint8)


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    h = w = None
    comps: list[tuple[int, int, int, int]] = []  # (cid, hs, vs, tq)
    restart_interval = 0

    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise JpegFormatError(f"expected marker at {pos}")
        marker = (payload[pos] << 8) | payload[pos + 1]
        pos += 2
        if marker == 0xFFD9:  # EOI
            break
        if pos + 2 > len(payload):
            raise JpegFormatError("truncated marker segment")
        seg_len = struct.unpack_from(">H", payload, pos)[0]
        if seg_len < 2 or pos + seg_len > len(payload):
            raise JpegFormatError("truncated marker segment")
        body = payload[pos + 2 : pos + seg_len]
        if marker == 0xFFDB:  # DQT (possibly several tables)
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                zz = np.frombuffer(
                    body[off + 1 : off + 65], dtype=np.uint8
                ).astype(np.int64)
                raster = np.empty(64, dtype=np.int64)
                raster[_ZIGZAG] = zz
                qtables[tq] = raster.reshape(8, 8)
                off += 65
        elif marker == 0xFFC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise JpegFormatError("only 8-bit precision supported")
            if ncomp not in (1, 3):
                raise JpegFormatError(
                    f"{ncomp}-component streams unsupported"
                )
            comps = []
            for ci in range(ncomp):
                cid = body[6 + 3 * ci]
                sampling = body[7 + 3 * ci]
                tq = body[8 + 3 * ci]
                hs, vs = sampling >> 4, sampling & 0xF
                if hs not in (1, 2) or vs not in (1, 2):
                    raise JpegFormatError(
                        f"sampling factor {hs}x{vs} unsupported"
                    )
                comps.append((cid, hs, vs, tq))
            if ncomp == 1 and comps[0][1:3] != (1, 1):
                raise JpegFormatError("subsampled single component")
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise JpegFormatError("only baseline (SOF0) supported")
        elif marker == 0xFFC4:  # DHT (possibly several tables)
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                nvals = sum(bits)
                vals = list(body[off + 17 : off + 17 + nvals])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if tc == 0 else huff_ac)[th] = dec
                off += 17 + nvals
        elif marker == 0xFFDD:  # DRI
            restart_interval = struct.unpack_from(">H", body, 0)[0]
        elif marker == 0xFFDA:  # SOS — entropy data follows
            if h is None or not comps:
                raise JpegFormatError("SOS before SOF")
            ns = body[0]
            if ns != len(comps):
                raise JpegFormatError(
                    "scan component count differs from frame "
                    "(non-interleaved multi-scan unsupported)"
                )
            # scan-order table ids matched to frame components by id
            tables_by_cid = {}
            for si in range(ns):
                scid = body[1 + 2 * si]
                td, ta = body[2 + 2 * si] >> 4, body[2 + 2 * si] & 0xF
                tables_by_cid[scid] = (td, ta)
            plan = []
            for cid, hs, vs, tq in comps:
                if cid not in tables_by_cid:
                    raise JpegFormatError(f"scan missing component {cid}")
                td, ta = tables_by_cid[cid]
                if (
                    td not in huff_dc
                    or ta not in huff_ac
                    or tq not in qtables
                ):
                    raise JpegFormatError("scan references missing DHT/DQT")
                plan.append(
                    (hs, vs, qtables[tq], huff_dc[td], huff_ac[ta])
                )
            if len(comps) == 1:
                return _decode_scan(
                    payload, pos + seg_len, h, w, plan[0][2], plan[0][3],
                    plan[0][4], restart_interval,
                )
            return _decode_scan_color(
                payload, pos + seg_len, h, w, plan, restart_interval
            )
        # APPn / COM / anything else: skip
        pos += seg_len
    raise JpegFormatError("no SOS marker found")


def _resync_rst(br: _BitReader) -> None:
    """Byte-align, skip pad/fill bytes (incl. a stuffed 0xFF00 pad),
    consume the RSTn marker."""
    br._nbits = 0
    for _ in range(4):
        if (
            br.pos + 1 < len(br.data)
            and br.data[br.pos] == 0xFF
            and 0xD0 <= br.data[br.pos + 1] <= 0xD7
        ):
            br.pos += 2
            return
        br.pos += 1
    raise JpegFormatError("expected RSTn marker")


def _decode_block(
    br: _BitReader, dc: _HuffDecoder, ac: _HuffDecoder, prev_dc: int
) -> tuple[np.ndarray, int]:
    """Entropy-decode one block; returns (raster 8×8 coefs, new DC)."""
    zz = np.zeros(64, dtype=np.int64)
    size = dc.decode(br)
    prev_dc += _extend(br.read_bits(size), size)
    zz[0] = prev_dc
    k = 1
    while k < 64:
        rs = ac.decode(br)
        run, size = rs >> 4, rs & 0xF
        if rs == 0x00:  # EOB
            break
        if rs == 0xF0:  # ZRL
            k += 16
            continue
        k += run
        if k > 63:
            raise JpegFormatError("AC run past end of block")
        zz[k] = _extend(br.read_bits(size), size)
        k += 1
    raster = np.empty(64, dtype=np.int64)
    raster[_ZIGZAG] = zz
    return raster.reshape(8, 8), prev_dc


def _decode_scan(
    payload: bytes,
    pos: int,
    h: int,
    w: int,
    qt: np.ndarray,
    dc: _HuffDecoder,
    ac: _HuffDecoder,
    restart_interval: int,
) -> np.ndarray:
    br = _BitReader(payload, pos)
    bh, bwid = (h + 7) // 8, (w + 7) // 8
    out = np.empty((bh * 8, bwid * 8), dtype=np.float64)
    prev_dc = 0
    mcu = 0
    for by in range(bh):
        for bx in range(bwid):
            if restart_interval and mcu and mcu % restart_interval == 0:
                _resync_rst(br)
                prev_dc = 0
            raster, prev_dc = _decode_block(br, dc, ac, prev_dc)
            block = _idct2(raster * qt) + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            mcu += 1
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)


def _decode_scan_color(
    payload: bytes,
    pos: int,
    h: int,
    w: int,
    plan: list,  # per component: (hs, vs, qt, dc_decoder, ac_decoder)
    restart_interval: int,
) -> np.ndarray:
    """Interleaved 3-component scan: per MCU, hs×vs blocks of each
    component in turn (T.81 A.2.3 ordering), each with its own
    quantizer, Huffman pair and DC predictor. Chroma planes decode at
    subsampled resolution and upsample by pixel replication."""
    br = _BitReader(payload, pos)
    hmax = max(c[0] for c in plan)
    vmax = max(c[1] for c in plan)
    mcx = (w + 8 * hmax - 1) // (8 * hmax)
    mcy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.empty((mcy * vs * 8, mcx * hs * 8), dtype=np.float64)
        for hs, vs, _, _, _ in plan
    ]
    pred = [0] * len(plan)
    mcu = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart_interval and mcu and mcu % restart_interval == 0:
                _resync_rst(br)
                pred = [0] * len(plan)
            mcu += 1
            for ci, (hs, vs, qt, dc, ac) in enumerate(plan):
                for vy in range(vs):
                    for vx in range(hs):
                        raster, pred[ci] = _decode_block(
                            br, dc, ac, pred[ci]
                        )
                        block = _idct2(raster * qt) + 128.0
                        r0 = (my * vs + vy) * 8
                        c0 = (mx * hs + vx) * 8
                        planes[ci][r0 : r0 + 8, c0 : c0 + 8] = block
    full = []
    for (hs, vs, _, _, _), plane in zip(plan, planes):
        if hs < hmax or vs < vmax:
            plane = plane.repeat(vmax // vs, axis=0).repeat(
                hmax // hs, axis=1
            )
        full.append(plane[:h, :w])
    return ycbcr_to_rgb(full[0], full[1], full[2])
