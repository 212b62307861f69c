"""Pure-stdlib PNG codec (zlib inflate + scanline unfiltering).

The multimodal surface stubs *codec* work behind
``decode_image_real`` because this environment has no PIL/opencv
(multimodal/assets.py module docstring). PNG, however, needs nothing
beyond ``zlib`` + ``struct`` + numpy — so the PNG path is REAL: real
DEFLATE streams, real CRC validation, real per-scanline unfiltering
(filters 0-4 including Paeth, PNG spec §9 "Filtering",
https://www.w3.org/TR/png-3/#9Filters).

Scope (raises ``ValueError`` outside it): 8-bit depth, color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA),
non-interlaced. That covers everything :func:`encode_png` and the
common screenshot/chart/web-asset PNGs produce; 16-bit and Adam7 are
documented gaps, not silent corruption.

Scale shape: decode runs inside Arrow-batched ``mapInPandas``
(assets.py), one payload at a time, map-side, no shuffle. The
UP filter (2) — the only one our encoder's filter-0 rows plus
vectorizable cases hit in the registry path — is a whole-row numpy
add; SUB/AVG/PAETH fall back to per-pixel loops only for
foreign-encoded files.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, np.ndarray]:
    """Decode PNG bytes → ``(width, height, pixels)`` with ``pixels``
    a ``(height, width, channels)`` uint8 array (palette entries are
    expanded to RGB). Validates the signature and every chunk CRC."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    ihdr: bytes | None = None
    plte: bytes | None = None
    idat: list[bytes] = []
    saw_iend = False
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError(f"truncated chunk {ctype!r}")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in chunk {ctype!r}")
        if ctype == b"IHDR":
            ihdr = body
        elif ctype == b"PLTE":
            plte = body
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            saw_iend = True
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    if not saw_iend:
        # a stream that ends without IEND is a truncation, even when
        # every pixel survived — fail closed rather than pass along a
        # payload something upstream cut short (fuzz-pinned)
        raise ValueError("missing IEND (truncated stream)")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (8 only)")
    if color not in _CHANNELS:
        raise ValueError(f"unsupported color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("Adam7 interlacing not supported")
    if w == 0 or h == 0:
        raise ValueError("zero-dimension image")

    nch = _CHANNELS[color]
    stride = w * nch
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != (stride + 1) * h:
        raise ValueError(
            f"decompressed size {len(raw)} != expected {(stride + 1) * h}"
        )

    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        line = np.frombuffer(
            raw, dtype=np.uint8, offset=off + 1, count=stride
        ).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub — sequential in x, per-pixel loop
            for x in range(nch, stride):
                line[x] = (int(line[x]) + int(line[x - nch])) & 0xFF
        elif ftype == 2:  # Up — whole-row vectorized (uint8 add wraps)
            line += prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - nch]) if x >= nch else 0
                line[x] = (
                    int(line[x]) + ((left + int(prev[x])) >> 1)
                ) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(line[x - nch]) if x >= nch else 0
                b = int(prev[x])
                c = int(prev[x - nch]) if x >= nch else 0
                line[x] = (int(line[x]) + _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype} on row {y}")
        out[y] = line
        prev = line

    px = out.reshape(h, w, nch)
    if color == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if int(px.max(initial=0)) >= pal.shape[0]:
            raise ValueError("palette index out of range")
        px = pal[px[:, :, 0]]
    return int(w), int(h), px


def encode_png(pixels: np.ndarray, compresslevel: int = 6) -> bytes:
    """Encode a ``(h, w)`` or ``(h, w, channels)`` uint8 array as a
    valid PNG (8-bit, non-interlaced, filter 0 on every row — simple
    and deterministic; DEFLATE does the heavy lifting)."""
    arr = np.ascontiguousarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3:
        raise ValueError("pixels must be (h, w) or (h, w, channels)")
    h, w, nch = arr.shape
    if h == 0 or w == 0:
        raise ValueError("zero-dimension image")
    try:
        color = {1: 0, 2: 4, 3: 2, 4: 6}[nch]
    except KeyError:
        raise ValueError(f"unsupported channel count {nch}") from None

    scanlines = bytearray()
    for y in range(h):
        scanlines.append(0)  # filter type None
        scanlines += arr[y].tobytes()
    idat = zlib.compress(bytes(scanlines), compresslevel)

    def _chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
