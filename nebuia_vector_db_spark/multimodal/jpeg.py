"""Pure numpy/stdlib baseline JPEG codec — grayscale, 8-bit.

Third REAL codec behind the multimodal surface (with png.py and
wav.py; the reference engine is text+vector only, main.go:25-75 —
this module is extension surface). Implements the baseline sequential
DCT process of ITU-T T.81 for single-component (luminance) images:

- **decoder**: full marker parse (SOI / APPn skipped / DQT / SOF0 /
  DHT / SOS / EOI), canonical Huffman table reconstruction from the
  DHT bits/values lists, entropy decode with 0xFF00 byte-unstuffing,
  DC prediction, dezigzag, dequantize, 8×8 inverse DCT, level shift,
  crop to the SOF dimensions;
- **encoder**: forward DCT, quantization with the Annex-K luminance
  table scaled by a libjpeg-style quality factor, zigzag, DC
  differencing, canonical Huffman encode with byte stuffing, emitting
  the exact tables it uses in DQT/DHT (so ANY baseline decoder can
  read the stream).

The 2-D DCT is exact matrix arithmetic (C · B · Cᵀ with the
orthonormal DCT-II basis), validated in tests against a literal
four-loop transcription of the T.81 definition. Color (YCbCr,
subsampling) and progressive mode are out of scope — the decoder
rejects them cleanly rather than mis-decoding.
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


def quality_qtable(quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of the K.1 table (1..100)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - q * 2
    t = (_QTABLE_K1 * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


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
    # pad to 8x8 multiples by edge replication
    ph, pw = -h % 8, -w % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64)

    # vectorized transform stage: every 8x8 block DCT'd/quantized in
    # one einsum (the per-block Python loop below only does entropy
    # coding, which is inherently sequential bit work)
    bh, bwid = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = (
        padded.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
        - 128.0
    )
    coefs = np.einsum("ij,bjk,lk->bil", _DCT_T, blocks, _DCT_T)
    zz_all = (
        np.round(coefs / qt[None, :, :])
        .astype(np.int64)
        .reshape(-1, 64)[:, _ZIGZAG]
    )

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
        # DC
        size, ampl = _magnitude(int(zz[0]) - prev_dc)
        prev_dc = int(zz[0])
        code, length = dc_codes[size]
        bw.write(code, length)
        bw.write(ampl, size)
        # AC with run-length of zeros
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
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    qt_zz = qt.reshape(64)[_ZIGZAG]
    out = b"\xff\xd8"  # SOI
    out += seg(0xFFDB, bytes([0x00]) + bytes(int(x) for x in qt_zz))  # DQT
    out += seg(  # SOF0: 8-bit, h, w, 1 component, no subsampling, qtable 0
        0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    )
    out += seg(0xFFC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_VALS))
    out += seg(0xFFC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))  # DRI
    out += seg(  # SOS: 1 component, DC table 0 / AC table 0
        0xFFDA, bytes([1, 1, 0x00, 0, 63, 0])
    )
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return out


# ------------------------------------------------------------------ decoder
def decode_jpeg_gray(payload: bytes) -> np.ndarray:
    """Decode a baseline grayscale JPEG to a 2-D uint8 array.

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


def _decode_jpeg_impl(payload: bytes) -> np.ndarray:
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    h = w = None
    comp_q = None
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
            if ncomp != 1:
                raise JpegFormatError(
                    "only single-component (grayscale) supported"
                )
            cid, sampling, comp_q = body[6], body[7], body[8]
            if sampling != 0x11:
                raise JpegFormatError("subsampling unsupported")
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
            if h is None or comp_q not in qtables:
                raise JpegFormatError("SOS before SOF/DQT")
            ns = body[0]
            if ns != 1:
                raise JpegFormatError("multi-component scan unsupported")
            td, ta = body[2] >> 4, body[2] & 0xF
            if td not in huff_dc or ta not in huff_ac:
                raise JpegFormatError("scan references missing DHT")
            return _decode_scan(
                payload,
                pos + seg_len,
                h,
                w,
                qtables[comp_q],
                huff_dc[td],
                huff_ac[ta],
                restart_interval,
            )
        # APPn / COM / anything else: skip
        pos += seg_len
    raise JpegFormatError("no SOS marker found")


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
                # byte-align, skip pad/fill bytes (incl. a stuffed
                # 0xFF00 pad), consume the RSTn marker, reset DC
                br._nbits = 0
                found = False
                for _ in range(4):
                    if (
                        br.pos + 1 < len(br.data)
                        and br.data[br.pos] == 0xFF
                        and 0xD0 <= br.data[br.pos + 1] <= 0xD7
                    ):
                        br.pos += 2
                        found = True
                        break
                    br.pos += 1
                if not found:
                    raise JpegFormatError("expected RSTn marker")
                prev_dc = 0
            zz = np.zeros(64, dtype=np.int64)
            size = dc.decode(br)
            diff = _extend(br.read_bits(size), size)
            prev_dc += diff
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
            block = _idct2(raster.reshape(8, 8) * qt) + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
            mcu += 1
    return np.clip(np.round(out[:h, :w]), 0, 255).astype(np.uint8)
