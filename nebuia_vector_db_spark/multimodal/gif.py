"""Pure-stdlib GIF codec — LZW, animation, interlacing.

Fourth REAL image codec behind the multimodal surface (with png.py,
jpeg.py, wav.py, avi.py; the reference engine is text+vector only,
main.go:25-75 — this module is mandated extension surface). GIF is
the second ANIMATED container (after MJPEG-AVI) and, unlike JPEG, is
lossless: decoded palette indices equal the encoded ones exactly, so
SQL oracles replay frame stats with no construction tricks.

- **encoder**: GIF89a with logical screen descriptor, global color
  table, per-frame Graphic Control Extensions (delay, disposal), the
  Netscape looping application extension for multi-frame streams, and
  genuine variable-code-width LZW compression (code table reset at
  4096 entries, Clear/EOI codes, 255-byte sub-block chaining).
  Optional 4-pass row interlacing.
- **decoder**: header validation (GIF87a/GIF89a), screen descriptor,
  global + local color tables, extension-block walk (GCE parsed for
  delays, others skipped by sub-block structure), image descriptors,
  full LZW decompression with dynamic code width, interlaced row
  de-permutation, fail-closed :class:`GifFormatError` on any
  malformation (fuzz-pinned in tests).

Frames are returned as palette-index arrays plus the active palette —
the lossless representation; callers needing RGB index the palette.
Disposal compositing (partial-frame deltas) is out of scope: frames
with sub-rectangle placement decode at their own geometry with
(left, top) offsets reported, so a caller can composite.
"""

from __future__ import annotations

import struct

import numpy as np


class GifFormatError(ValueError):
    """Raised when the payload is not a decodable GIF stream."""


# 4-pass interlace row schedule: (start, step) per pass
_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _interlace_order(height: int) -> np.ndarray:
    """Output-row index for each stored row, per GIF interlacing."""
    rows = []
    for start, step in _INTERLACE_PASSES:
        rows.extend(range(start, height, step))
    return np.array(rows, dtype=np.int64)


# ------------------------------------------------------------------- LZW
def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-flavor LZW: emit Clear, build the string table up to 4095
    then reset, variable code width growing at table-size powers of
    two, little-endian bit packing, final EOI."""
    clear = 1 << min_code_size
    eoi = clear + 1
    table: dict[bytes, int] = {
        bytes([i]): i for i in range(1 << min_code_size)
    }
    next_code = eoi + 1
    width = min_code_size + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    prefix = b""
    for v in indices.ravel():
        nxt = prefix + bytes([int(v)])
        if nxt in table:
            prefix = nxt
            continue
        emit(table[prefix], width)
        table[nxt] = next_code
        next_code += 1
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        elif next_code == 4097:  # table full: reset
            emit(clear, width)
            table = {bytes([i]): i for i in range(1 << min_code_size)}
            next_code = eoi + 1
            width = min_code_size + 1
        prefix = bytes([int(v)])
    if prefix:
        emit(table[prefix], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`; stops after ``n_expected``
    pixels or EOI, failing closed on bad codes."""
    if not 2 <= min_code_size <= 11:
        raise GifFormatError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(n_expected, dtype=np.uint8)
    n_out = 0

    acc = 0
    nbits = 0
    pos = 0

    def read(w: int) -> int:
        nonlocal acc, nbits, pos
        while nbits < w:
            if pos >= len(data):
                raise GifFormatError("LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << w) - 1)
        acc >>= w
        nbits -= w
        return v

    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while n_out < n_expected:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise GifFormatError(f"invalid LZW code {code}")
        take = min(len(entry), n_expected - n_out)
        out[n_out : n_out + take] = np.frombuffer(
            entry[:take], dtype=np.uint8
        )
        n_out += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out < n_expected:
        raise GifFormatError(
            f"LZW data ends after {n_out} of {n_expected} pixels"
        )
    return out


def _sub_blocks(payload: bytes) -> bytes:
    """Wrap raw bytes into 255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise GifFormatError("sub-block chain truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(payload):
            raise GifFormatError("sub-block overruns stream")
        out += payload[pos : pos + n]
        pos += n


# ----------------------------------------------------------------- encode
def grayscale_palette() -> np.ndarray:
    """Identity 256-entry grayscale palette: index i -> (i, i, i)."""
    g = np.arange(256, dtype=np.uint8)
    return np.stack([g, g, g], axis=1)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray | None = None,
    delay_cs: int = 10,
    interlace: bool = False,
) -> bytes:
    """Encode 2-D uint8 palette-index frames as a GIF89a stream.

    One frame → a plain image; several → an animation with per-frame
    GCE delays and the Netscape infinite-loop extension. All frames
    must share the logical screen geometry. ``palette`` is an (N, 3)
    uint8 color table (power-of-two N ≥ 2; defaults to the 256-entry
    grayscale identity). ``interlace`` stores rows in the 4-pass
    order."""
    if not frames:
        raise GifFormatError("cannot encode a GIF with zero frames")
    palette = (
        grayscale_palette() if palette is None else np.asarray(palette)
    )
    if palette.ndim != 2 or palette.shape[1] != 3:
        raise GifFormatError("palette must be (N, 3)")
    n_colors = palette.shape[0]
    if n_colors < 2 or n_colors > 256 or n_colors & (n_colors - 1):
        raise GifFormatError("palette size must be a power of two in [2,256]")
    depth = n_colors.bit_length() - 1  # log2
    h, w = frames[0].shape

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global table, depth bits per color
    out += struct.pack(
        "<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0
    )
    out += palette.astype(np.uint8).tobytes()

    if len(frames) > 1:
        # Netscape looping extension (loop forever)
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    min_code = max(2, depth)
    for frame in frames:
        frame = np.asarray(frame, dtype=np.uint8)
        if frame.shape != (h, w):
            raise GifFormatError("all frames must share the screen size")
        if frame.max(initial=0) >= n_colors:
            raise GifFormatError("frame index outside the palette")
        # GCE on every frame (legal GIF89a for single images too, and
        # it keeps decoded delays uniform): disposal=1 (leave), delay
        out += b"\x21\xf9\x04" + bytes([0x04]) + struct.pack(
            "<H", delay_cs
        ) + b"\x00\x00"
        flags = 0x40 if interlace else 0x00  # no local table
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
        stored = frame[_interlace_order(h)] if interlace else frame
        out += bytes([min_code])
        out += _sub_blocks(_lzw_encode(stored, min_code))
    out += b"\x3b"  # trailer
    return bytes(out)


# ----------------------------------------------------------------- decode
def decode_gif(payload: bytes) -> dict:
    """Decode a GIF -> ``{width, height, palette, palettes, frames,
    delays_cs, offsets}`` where ``frames`` are 2-D uint8 palette-index
    arrays (losslessly identical to what was encoded), ``palettes``
    the per-frame color table (local table when present, else the
    global one; ``palette`` = frame 0's for the single-palette common
    case), ``delays_cs`` the GCE delay (centiseconds, 0 when absent)
    per frame, and ``offsets`` the (left, top) placement of each frame
    on the logical screen."""
    try:
        return _decode_impl(payload)
    except GifFormatError:
        raise
    except (IndexError, ValueError, struct.error) as e:
        raise GifFormatError(f"corrupt GIF stream: {e}") from e


def _decode_impl(payload: bytes) -> dict:
    if len(payload) < 13 or payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifFormatError("not a GIF stream")
    w, h, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    global_palette = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(payload):
            raise GifFormatError("truncated global color table")
        global_palette = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n

    frames: list[np.ndarray] = []
    delays: list[int] = []
    offsets: list[tuple[int, int]] = []
    palettes: list[np.ndarray] = []
    pending_delay = 0

    while True:
        if pos >= len(payload):
            raise GifFormatError("stream ends without trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(payload):
                raise GifFormatError("truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            if label == 0xF9:  # graphic control
                if len(data) < 4:
                    raise GifFormatError("short graphic control extension")
                pending_delay = struct.unpack_from("<H", data, 1)[0]
        elif block == 0x2C:  # image descriptor
            if pos + 9 > len(payload):
                raise GifFormatError("truncated image descriptor")
            left, top, iw, ih, iflags = struct.unpack_from(
                "<HHHHB", payload, pos
            )
            pos += 9
            if iw == 0 or ih == 0 or left + iw > w or top + ih > h:
                raise GifFormatError("frame rectangle outside the screen")
            palette = global_palette
            if iflags & 0x80:  # local color table
                n = 2 << (iflags & 0x07)
                if pos + 3 * n > len(payload):
                    raise GifFormatError("truncated local color table")
                palette = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            if palette is None:
                raise GifFormatError("no color table for frame")
            if pos >= len(payload):
                raise GifFormatError("missing LZW code size")
            min_code = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            idx = _lzw_decode(data, min_code, iw * ih).reshape(ih, iw)
            if idx.max(initial=0) >= palette.shape[0]:
                raise GifFormatError("pixel index outside the color table")
            if iflags & 0x40:  # interlaced: de-permute rows
                order = _interlace_order(ih)
                out = np.empty_like(idx)
                out[order] = idx
                idx = out
            frames.append(idx)
            delays.append(pending_delay)
            offsets.append((left, top))
            pending_delay = 0
            palettes.append(palette)
        else:
            raise GifFormatError(f"unknown block 0x{block:02X}")

    if not frames:
        raise GifFormatError("GIF holds no image data")
    return {
        "width": int(w),
        "height": int(h),
        # round 6 (ADVICE r4): per-frame palettes — a frame with a
        # local color table previously overwrote the single "palette"
        # slot, so multi-palette GIFs reported only the LAST frame's
        # colors. "palette" stays as frame 0's table for callers of
        # the single-palette common case.
        "palette": palettes[0],
        "palettes": palettes,
        "frames": frames,
        "delays_cs": delays,
        "offsets": offsets,
    }
