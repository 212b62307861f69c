"""Pure-Python FLAC codec (subset) — LOSSLESS COMPRESSED audio, the
cell the multimodal tier lacked: WAV is lossless-uncompressed,
IMA-ADPCM and MPEG-1 Layer II are lossy. The reference engine
(main.go:25-75) is text+vector only; this module is part of the
mandated multimodal extension.

Implemented from the public specification (RFC 9639, "Free Lossless
Audio Codec"), both directions:

- **Stream**: ``fLaC`` magic + STREAMINFO metadata block (min/max
  block size, 20-bit sample rate, channels, bits-per-sample, 36-bit
  total samples, MD5 of the unencoded PCM — verified on decode).
- **Frames**: 14-bit sync (0b11111111111110), fixed blocking
  strategy, UTF-8-style coded frame number, 16-bit
  block-size-minus-one header form, CRC-8 (poly 0x07) over the
  header and CRC-16 (poly 0x8005) over the whole frame — both
  verified on decode.
- **Subframes**: CONSTANT, VERBATIM, FIXED predictors of order 0-4
  (the polynomial approximators: residual = o-th difference), AND
  quantized-coefficient LPC (Levinson-Durbin on the block's
  autocorrelation, 12-bit coefficients with a common shift, orders
  2/4/8 tried) — all chosen per frame by exact encoded-bit cost, so
  LPC is emitted only where it genuinely wins.
- **Residuals**: Rice coding (zigzag fold, unary quotient as a run
  of 0 bits terminated by a 1, parameter-bit remainder) with the
  4-bit-parameter method and partition order 0 on encode; the
  decoder additionally handles any partition order and the 0b1111
  escape (raw n-bit residuals) per the spec.

Unlike the MP3/AAC scope cut (multimodal/assets.py: large tabulated
Huffman codebooks cannot be honestly certified without conformance
vectors), every FLAC structure is ALGORITHMIC — no tables to
mistranscribe — and losslessness gives a self-certifying check the
lossy codecs cannot: decode(encode(pcm)) == pcm exactly, pinned
sample-for-sample by tests and by the ``mm_flac_audio`` oracle row
(stats of the DECODED samples hash-matched against SQL that
regenerates the source signal — the mm_png_roundtrip construction).

Scope (documented): mono, 16-bit; no stereo decorrelation, no seek
tables, no variable blocking.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np


class FlacFormatError(ValueError):
    """Raised when a payload is not a decodable FLAC stream (subset)."""


MAGIC = b"fLaC"
_SYNC = 0b11111111111110


# ------------------------------------------------------------------ CRCs
def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF
                if crc & 0x8000
                else (crc << 1) & 0xFFFF
            )
    return crc


# ---------------------------------------------------------------- bit I/O
class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            self.out.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zeros then a one

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)


class _BitReader:
    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos  # byte position of next refill
        self._acc = 0
        self._n = 0

    def read(self, length: int) -> int:
        while self._n < length:
            if self.pos >= len(self.data):
                raise FlacFormatError("bitstream truncated")
            self._acc = (self._acc << 8) | self.data[self.pos]
            self.pos += 1
            self._n += 8
        self._n -= length
        v = (self._acc >> self._n) & ((1 << length) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def read_signed(self, length: int) -> int:
        v = self.read(length)
        return v - (1 << length) if v & (1 << (length - 1)) else v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
        return q

    def align(self) -> None:
        self._n = 0
        self._acc = 0


# ------------------------------------------------------------- predictors
def _fixed_residual(s: np.ndarray, order: int) -> np.ndarray:
    r = s.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _fixed_restore(res: np.ndarray, warm: list[int], order: int) -> np.ndarray:
    """Invert the o-th difference given the o warmup samples: at each
    level the seed is the (o-1)-th difference of the first o warmups
    (a single value), and one cumsum integrates the level away."""
    cur = np.asarray(res, dtype=np.int64)
    for o in range(order, 0, -1):
        seed = _fixed_residual(np.asarray(warm[:o], dtype=np.int64), o - 1)[-1]
        cur = np.concatenate([[seed], cur]).cumsum()
    return cur


def _zigzag(r: np.ndarray) -> np.ndarray:
    return np.where(r >= 0, r << 1, (-r << 1) - 1).astype(np.int64)


def _rice_cost(u: np.ndarray, k: int) -> int:
    return int((u >> k).sum()) + len(u) * (1 + k)


# ------------------------------------------------------------------- LPC
def _lpc_coeffs(blk: np.ndarray, order: int) -> np.ndarray | None:
    """Levinson-Durbin on the block's autocorrelation (lightly damped
    against exact-zero lags). Returns float64 predictor coefficients
    or None when the recursion is degenerate."""
    x = blk.astype(np.float64)
    n = len(x)
    if n <= order:
        return None
    ac = np.array(
        [float(np.dot(x[: n - lag], x[lag:])) for lag in range(order + 1)]
    )
    if ac[0] == 0.0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1]
        for j in range(i):
            acc -= a[j] * ac[i - j]
        if err == 0.0:
            return None
        k = acc / err
        new = a.copy()
        for j in range(i):
            new[j] = a[j] - k * a[i - 1 - j]
        new[i] = k
        a = new
        err *= 1.0 - k * k
        if err <= 0.0:
            return None
    return a


def _quantize_lpc(a: np.ndarray, precision: int = 12):
    """Quantize float coefficients to `precision`-bit signed integers
    with a common right-shift (the spec's qlp model)."""
    cmax = float(np.abs(a).max())
    if cmax == 0.0:
        return None
    shift = precision - 1 - max(0, int(np.floor(np.log2(cmax))) + 1)
    shift = max(0, min(15, shift))
    q = np.round(a * (1 << shift)).astype(np.int64)
    lim = (1 << (precision - 1)) - 1
    q = np.clip(q, -lim - 1, lim)
    if not q.any():
        return None
    return q, shift


def _lpc_residual(blk: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    order = len(q)
    s = blk.astype(np.int64)
    # prediction for i >= order: (sum_j q[j] * s[i-1-j]) >> shift
    pred = np.zeros(len(s) - order, dtype=np.int64)
    for j in range(order):
        pred += q[j] * s[order - 1 - j : len(s) - 1 - j]
    return s[order:] - (pred >> shift)


def _lpc_restore(
    res: np.ndarray, warm: list[int], q: list[int], shift: int
) -> np.ndarray:
    order = len(q)
    out = list(warm)
    for r in res:
        pred = 0
        for j in range(order):
            pred += q[j] * out[-1 - j]
        out.append(int(r) + (pred >> shift))
    return np.asarray(out, dtype=np.int64)


# ------------------------------------------------------------------ encode
def encode_flac(
    samples: np.ndarray, sample_rate: int = 8000, block_size: int = 256
) -> bytes:
    """Encode mono int16 PCM into a FLAC stream (subset, see module
    docstring). Deterministic: predictor order and Rice parameter are
    chosen by exact bit cost with lowest-value tie-breaks."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim != 1:
        raise FlacFormatError("mono only in this subset")
    n_total = len(s)
    md5 = hashlib.md5(s.astype("<i2").tobytes()).digest()
    frames = bytearray()
    n_frames = -(-n_total // block_size)  # 0 frames for empty input
    for fi in range(n_frames):
        blk = s[fi * block_size : (fi + 1) * block_size].astype(np.int64)
        frames += _encode_frame(blk, fi, sample_rate)
    out = bytearray(MAGIC)
    # STREAMINFO: last-metadata-block flag set, type 0, length 34
    out += bytes([0x80, 0, 0, 34])
    w = _BitWriter()
    # min/max block size describe the stream's fixed block size; the
    # last frame is allowed to be shorter without affecting them
    w.write(block_size, 16)
    w.write(block_size, 16)
    w.write(0, 24)  # min frame size unknown
    w.write(0, 24)  # max frame size unknown
    w.write(sample_rate, 20)
    w.write(0, 3)  # channels - 1
    w.write(15, 5)  # bits per sample - 1
    w.write(n_total, 36)
    out += bytes(w.out) + md5
    return bytes(out) + bytes(frames)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    n_bytes = 2
    while n >= (1 << (n_bytes * 5 + 1)) and n_bytes < 6:
        n_bytes += 1
    lead = (0xFF << (8 - n_bytes)) & 0xFF
    shift = 6 * (n_bytes - 1)
    out.append(lead | (n >> shift))
    for i in range(n_bytes - 1):
        shift -= 6
        out.append(0x80 | ((n >> shift) & 0x3F))
    return bytes(out)


def _encode_frame(blk: np.ndarray, frame_no: int, sample_rate: int) -> bytes:
    bs = len(blk)
    w = _BitWriter()
    w.write(_SYNC, 14)
    w.write(0, 1)  # reserved
    w.write(0, 1)  # fixed blocking strategy
    w.write(0b0111, 4)  # block size: 16-bit value-1 at end of header
    w.write(0b0000, 4)  # sample rate: from STREAMINFO
    w.write(0b0000, 4)  # channel assignment: mono
    w.write(0b100, 3)  # sample size: 16 bit
    w.write(0, 1)  # reserved
    header = bytes(w.out)
    header += _utf8_number(frame_no)
    header += struct.pack(">H", bs - 1)
    header += bytes([_crc8(header)])
    body = _BitWriter()
    _encode_subframe(body, blk)
    body.align()
    frame = header + bytes(body.out)
    return frame + struct.pack(">H", _crc16(frame))


def _encode_subframe(w: _BitWriter, blk: np.ndarray) -> None:
    bs = len(blk)
    if bs and np.all(blk == blk[0]):
        w.write(0, 1)
        w.write(0b000000, 6)  # CONSTANT
        w.write(0, 1)
        w.write(int(blk[0]), 16)
        return
    # pick fixed order (0..4) x rice partition order (0..6) x per-
    # partition parameter by EXACT encoded-bit cost — partitioning is
    # what isolates residual spikes (e.g. a sawtooth wrap) into one
    # expensive partition instead of poisoning the whole block's k
    def _part_plan(res: np.ndarray, order: int):
        u = _zigzag(res)
        best = None  # (bits, porder, [k per partition])
        porder = 0
        while porder <= 6:
            n_part = 1 << porder
            if bs % n_part or bs // n_part <= order:
                break
            ks, bits = [], 4  # 4 bits partition-order field
            ok = True
            for p in range(n_part):
                lo = max(p * (bs // n_part) - order, 0)
                hi = (p + 1) * (bs // n_part) - order
                seg = u[lo:hi]
                costs = [(4 + _rice_cost(seg, k), k) for k in range(15)]
                c, k = min(costs)
                ks.append(k)
                bits += c
            if ok and (best is None or bits < best[0]):
                best = (bits, porder, ks)
            porder += 1
        return best

    best = None  # (bits, kind, order, porder, ks, extra)
    for order in range(0, min(4, bs - 1) + 1):
        plan = _part_plan(_fixed_residual(blk, order), order)
        if plan is None:
            continue
        cost = order * 16 + 2 + plan[0]
        if best is None or cost < best[0]:
            best = (cost, "fixed", order, plan[1], plan[2], None)
    # LPC candidates: real signals are rarely polynomial; a quantized
    # order-2/4/8 predictor often beats every FIXED order. Chosen by
    # the same exact encoded-bit cost (header + warmups + coeff table
    # + residual), so LPC is emitted only when it genuinely wins.
    _LPC_PREC = 12
    for order in (2, 4, 8):
        if order >= bs:
            continue
        a = _lpc_coeffs(blk, order)
        if a is None:
            continue
        qs = _quantize_lpc(a, _LPC_PREC)
        if qs is None:
            continue
        q, shift = qs
        plan = _part_plan(_lpc_residual(blk, q, shift), order)
        if plan is None:
            continue
        cost = order * 16 + 4 + 5 + order * _LPC_PREC + 2 + plan[0]
        if best is None or cost < best[0]:
            best = (cost, "lpc", order, plan[1], plan[2], (q, shift))
    verbatim_cost = bs * 16
    if best is None or best[0] >= verbatim_cost:
        w.write(0, 1)
        w.write(0b000001, 6)  # VERBATIM
        w.write(0, 1)
        for v in blk:
            w.write(int(v), 16)
        return
    _, kind, order, porder, ks, extra = best
    w.write(0, 1)
    if kind == "fixed":
        w.write(0b001000 | order, 6)  # FIXED, order
        w.write(0, 1)  # no wasted bits
        for v in blk[:order]:
            w.write(int(v), 16)  # warmup samples
        res = _fixed_residual(blk, order)
    else:
        q, shift = extra
        w.write(0b100000 | (order - 1), 6)  # LPC, order
        w.write(0, 1)  # no wasted bits
        for v in blk[:order]:
            w.write(int(v), 16)  # warmup samples
        w.write(_LPC_PREC - 1, 4)
        w.write(shift, 5)
        for c in q:
            w.write(int(c), _LPC_PREC)
        res = _lpc_residual(blk, q, shift)
    u = _zigzag(res)
    w.write(0b00, 2)  # residual method: rice, 4-bit params
    w.write(porder, 4)
    n_part = 1 << porder
    for p, k in enumerate(ks):
        lo = max(p * (bs // n_part) - order, 0)
        hi = (p + 1) * (bs // n_part) - order
        w.write(k, 4)
        for uu in u[lo:hi]:
            w.write_unary(int(uu) >> k)
            if k:
                w.write(int(uu) & ((1 << k) - 1), k)


# ------------------------------------------------------------------ decode
def decode_flac(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a FLAC stream (subset): returns (sample_rate, int16
    samples). Verifies the STREAMINFO MD5, every frame-header CRC-8
    and frame CRC-16 — fail-closed typed errors throughout."""
    if data[:4] != MAGIC:
        raise FlacFormatError("bad magic")
    pos = 4
    sample_rate = None
    n_total = None
    md5_want = None
    block_size = None
    while True:
        if pos + 4 > len(data):
            raise FlacFormatError("truncated metadata")
        hdr = data[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        length = int.from_bytes(data[pos + 1 : pos + 4], "big")
        body = data[pos + 4 : pos + 4 + length]
        if btype == 0:
            if length != 34:
                raise FlacFormatError("bad STREAMINFO length")
            r = _BitReader(body)
            r.read(16)
            block_size = r.read(16)
            r.read(24)
            r.read(24)
            sample_rate = r.read(20)
            if r.read(3) != 0:
                raise FlacFormatError("only mono supported in this subset")
            if r.read(5) != 15:
                raise FlacFormatError("only 16-bit supported in this subset")
            n_total = r.read(36)
            md5_want = body[18:34]
        pos += 4 + length
        if last:
            break
    if sample_rate is None:
        raise FlacFormatError("missing STREAMINFO")
    out: list[np.ndarray] = []
    got = 0
    while got < n_total:
        frame, pos = _decode_frame(data, pos, sample_rate)
        out.append(frame)
        got += len(frame)
    samples = (
        np.concatenate(out).astype(np.int16) if out else np.zeros(0, np.int16)
    )
    if len(samples) != n_total:
        raise FlacFormatError("sample count mismatch")
    if md5_want != b"\x00" * 16:
        if hashlib.md5(samples.astype("<i2").tobytes()).digest() != md5_want:
            raise FlacFormatError("PCM MD5 mismatch — lossy decode bug")
    return sample_rate, samples


def _decode_frame(data: bytes, pos: int, sample_rate: int):
    start = pos
    r = _BitReader(data, pos)
    if r.read(14) != _SYNC:
        raise FlacFormatError("bad frame sync")
    r.read(1)
    if r.read(1) != 0:
        raise FlacFormatError("variable blocking not supported")
    bs_code = r.read(4)
    sr_code = r.read(4)
    if r.read(4) != 0:
        raise FlacFormatError("only mono supported")
    if r.read(3) != 0b100:
        raise FlacFormatError("only 16-bit supported")
    r.read(1)
    # coded frame number (UTF-8 style)
    first = r.read(8)
    extra = 0
    if first >= 0xC0:
        probe = first
        while probe & 0x40:
            extra += 1
            probe <<= 1
        for _ in range(extra):
            if r.read(8) & 0xC0 != 0x80:
                raise FlacFormatError("bad coded frame number")
    elif first >= 0x80:
        raise FlacFormatError("bad coded frame number")
    if bs_code == 0b0110:
        bs = r.read(8) + 1
    elif bs_code == 0b0111:
        bs = r.read(16) + 1
    elif bs_code == 0b0001:
        bs = 192
    elif 0b0010 <= bs_code <= 0b0101:
        bs = 576 << (bs_code - 2)
    elif bs_code >= 0b1000:
        bs = 256 << (bs_code - 8)
    else:
        raise FlacFormatError(f"bad block size code {bs_code}")
    if sr_code == 0b1100:
        r.read(8)
    elif sr_code in (0b1101, 0b1110):
        r.read(16)
    elif sr_code > 0b1011:
        raise FlacFormatError("bad sample rate code")
    header_end = r.pos  # CRC-8 covers bytes [start, header_end)
    if _crc8(data[start:header_end]) != r.read(8):
        raise FlacFormatError("frame header CRC-8 mismatch")
    samples = _decode_subframe(r, bs)
    r.align()
    crc_calc = _crc16(data[start : r.pos])
    if crc_calc != r.read(16):
        raise FlacFormatError("frame CRC-16 mismatch")
    return samples, r.pos


def _decode_subframe(r: _BitReader, bs: int) -> np.ndarray:
    if r.read(1) != 0:
        raise FlacFormatError("bad subframe padding bit")
    stype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = 1 + r.read_unary()
    bps = 16 - wasted
    if stype == 0:
        v = r.read_signed(bps)
        out = np.full(bs, v, dtype=np.int64)
    elif stype == 1:
        out = np.array([r.read_signed(bps) for _ in range(bs)], dtype=np.int64)
    elif 8 <= stype <= 12:
        order = stype - 8
        warm = [r.read_signed(bps) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        out = _fixed_restore(np.asarray(res, np.int64), warm, order)
    elif stype >= 32:
        order = (stype & 0x1F) + 1
        warm = [r.read_signed(bps) for _ in range(order)]
        precision = r.read(4) + 1
        if precision == 16:
            raise FlacFormatError("invalid qlp precision code")
        shift = r.read_signed(5)
        if shift < 0:
            raise FlacFormatError("negative qlp shift")
        q = [r.read_signed(precision) for _ in range(order)]
        res = _decode_residual(r, bs, order)
        out = _lpc_restore(np.asarray(res, np.int64), warm, q, shift)
    else:
        raise FlacFormatError(f"reserved subframe type {stype}")
    return out << wasted


def _decode_residual(r: _BitReader, bs: int, order: int) -> list[int]:
    method = r.read(2)
    if method > 1:
        raise FlacFormatError("reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = r.read(4)
    n_part = 1 << porder
    if bs % n_part:
        raise FlacFormatError("block size not divisible by partitions")
    out: list[int] = []
    for p in range(n_part):
        n = bs // n_part - (order if p == 0 else 0)
        if n < 0:
            raise FlacFormatError("partition smaller than predictor order")
        k = r.read(pbits)
        if k == escape:
            nbits = r.read(5)
            vals = [
                r.read_signed(nbits) if nbits else 0 for _ in range(n)
            ]
            out.extend(vals)
            continue
        for _ in range(n):
            q = r.read_unary()
            u = (q << k) | (r.read(k) if k else 0)
            out.append((u >> 1) ^ -(u & 1))
    return out
