"""Pure-stdlib ISO-BMFF (MP4) container codec — MJPEG video track.

Third video-capable container behind the multimodal surface (after
MJPEG-AVI and animated GIF; the reference engine is text+vector only,
main.go:25-75 — mandated extension surface). This is the ISO base
media file format (ISO/IEC 14496-12) box grammar, the format family
of .mp4/.mov/.m4a:

- **mux**: ``ftyp`` + ``mdat`` (concatenated JPEG samples) + ``moov``
  with a single video ``trak`` — ``mvhd``/``tkhd``/``mdhd``/``hdlr``/
  ``vmhd``/``dinf`` and the full sample-table suite: ``stsd`` (a
  VisualSampleEntry with fourcc ``mjpg``), ``stts`` (one delta run),
  ``stsc`` (chunk map), ``stsz`` (per-sample sizes), ``stco`` (chunk
  offsets into ``mdat``).
- **demux**: a genuine box walker (32-bit and 64-bit ``largesize``
  headers, unknown boxes skipped structurally), locates the ``vide``
  handler track, validates the ``stsd`` sample format, and
  reconstructs per-sample byte ranges from the GENERAL ``stsc`` +
  ``stco``/``co64`` + ``stsz`` chunk arithmetic — consecutive samples
  pack inside each chunk, chunks sit anywhere in the file — then
  slices the JPEG samples out and derives fps from ``mdhd``
  timescale / ``stts`` delta.

Frames decode through :mod:`nebuia_vector_db_spark.multimodal.jpeg`
exactly as the AVI path does; the two containers share nothing but
that codec, which is the point — same frames, two real demuxers.

Fail-closed: any malformation (bad magic, box overrun, missing
sample tables, offsets outside ``mdat``/file, inconsistent counts)
raises :class:`Mp4FormatError` (fuzz-pinned in tests).
"""

from __future__ import annotations

import struct


class Mp4FormatError(ValueError):
    """Raised when the payload is not a decodable MJPEG MP4 stream."""


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">B3s", version, flags.to_bytes(3, "big")) + payload)


def encode_mp4_mjpeg(
    frames: list[bytes], fps: int, width: int, height: int
) -> bytes:
    """Encode JPEG frame byte-streams as an ISO-BMFF file with one
    MJPEG video track (sample entry fourcc ``mjpg``), all samples in
    a single ``mdat`` chunk."""
    if not frames:
        raise Mp4FormatError("cannot encode an MP4 with zero frames")
    if fps <= 0:
        raise Mp4FormatError("fps must be positive")
    timescale = fps * 100
    delta = 100
    duration = delta * len(frames)

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    mdat_payload = b"".join(frames)
    mdat = _box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8  # first sample byte within the file

    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">iH", 0x00010000, 0x0100)  # rate, volume
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = _full(
        b"tkhd", 0, 7,  # enabled | in movie | in preview
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 12  # reserved, layer, alt group
        + struct.pack(">Hh", 0, 0)  # volume, reserved
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),  # 16.16 fixed
    )
    mdhd = _full(
        b"mdhd", 0, 0,
        struct.pack(">IIIIHH", 0, 0, timescale, duration, 0x55C4, 0),
    )
    hdlr = _full(
        b"hdlr", 0, 0,
        struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"MJPEG Video\x00",
    )
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + _full(b"url ", 0, 1, b""))
    dinf = _box(b"dinf", dref)

    # VisualSampleEntry 'mjpg'
    entry = (
        b"\x00" * 6 + struct.pack(">H", 1)       # reserved, data ref index
        + struct.pack(">HH", 0, 0) + b"\x00" * 12  # predefined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)                   # frame count
        + b"\x05mjpeg" + b"\x00" * 26            # compressor name (32 B)
        + struct.pack(">Hh", 24, -1)             # depth, color table
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(b"mjpg", entry))
    stts = _full(
        b"stts", 0, 0, struct.pack(">III", 1, len(frames), delta)
    )
    stsc = _full(
        b"stsc", 0, 0, struct.pack(">IIII", 1, 1, len(frames), 1)
    )
    stsz = _full(
        b"stsz", 0, 0,
        struct.pack(">II", 0, len(frames))
        + b"".join(struct.pack(">I", len(f)) for f in frames),
    )
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, chunk_offset))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# ------------------------------------------------------------------ demux
def _walk(payload: bytes, off: int, end: int):
    """Yield (btype, body_start, body_end) for each box in a region,
    handling 64-bit largesize headers."""
    while off < end:
        if off + 8 > end:
            raise Mp4FormatError("truncated box header")
        size = struct.unpack_from(">I", payload, off)[0]
        btype = payload[off + 4 : off + 8]
        body = off + 8
        if size == 1:
            if off + 16 > end:
                raise Mp4FormatError("truncated largesize header")
            size = struct.unpack_from(">Q", payload, off + 8)[0]
            body = off + 16
        elif size == 0:  # box extends to end of region
            size = end - off
        if size < body - off or off + size > end:
            raise Mp4FormatError(f"box {btype!r} overruns its region")
        yield btype, body, off + size
        off += size


def _find(payload: bytes, off: int, end: int, btype: bytes):
    for t, b, e in _walk(payload, off, end):
        if t == btype:
            return b, e
    return None


def _fullbox(payload: bytes, body: int) -> tuple[int, int]:
    """Return (version, payload offset past version/flags)."""
    return payload[body], body + 4


def decode_mp4_mjpeg(payload: bytes) -> dict:
    """Decode an MJPEG MP4 -> ``{fps, width, height, n_frames,
    frames}``: walk the box tree, find the ``vide`` track, check the
    ``stsd`` fourcc, rebuild per-sample offsets from the general
    stsc/stco/stsz arithmetic, and slice the JPEG samples."""
    try:
        return _decode_impl(payload)
    except Mp4FormatError:
        raise
    except (IndexError, ValueError, struct.error, OverflowError) as e:
        raise Mp4FormatError(f"corrupt MP4 stream: {e}") from e


def _decode_impl(payload: bytes) -> dict:
    if len(payload) < 16:
        raise Mp4FormatError("not an ISO-BMFF stream")
    top = list(_walk(payload, 0, len(payload)))
    if not any(t == b"ftyp" for t, _, _ in top):
        raise Mp4FormatError("missing ftyp")
    moov = next(((b, e) for t, b, e in top if t == b"moov"), None)
    if moov is None:
        raise Mp4FormatError("missing moov")

    for t, b, e in _walk(payload, moov[0], moov[1]):
        if t != b"trak":
            continue
        parsed = _parse_trak(payload, b, e)
        if parsed is not None:
            return parsed
    raise Mp4FormatError("no MJPEG video track found")


def _parse_trak(payload: bytes, off: int, end: int) -> dict | None:
    width = height = None
    tkhd = _find(payload, off, end, b"tkhd")
    if tkhd:
        v, p = _fullbox(payload, tkhd[0])
        skip = 32 if v == 1 else 20
        p += skip + 12 + 4 + 36  # ids/times, layer block, volume, matrix
        w_fx, h_fx = struct.unpack_from(">II", payload, p)
        width, height = w_fx >> 16, h_fx >> 16
    mdia = _find(payload, off, end, b"mdia")
    if mdia is None:
        raise Mp4FormatError("trak missing mdia")
    hdlr = _find(payload, mdia[0], mdia[1], b"hdlr")
    if hdlr is None:
        raise Mp4FormatError("mdia missing hdlr")
    handler = payload[hdlr[0] + 8 : hdlr[0] + 12]
    if handler != b"vide":
        return None  # not the video track — caller tries the next trak

    mdhd = _find(payload, mdia[0], mdia[1], b"mdhd")
    if mdhd is None:
        raise Mp4FormatError("mdia missing mdhd")
    v, p = _fullbox(payload, mdhd[0])
    timescale = struct.unpack_from(
        ">I", payload, p + (16 if v == 1 else 8)
    )[0]
    if timescale == 0:
        raise Mp4FormatError("mdhd timescale is zero")

    minf = _find(payload, mdia[0], mdia[1], b"minf")
    if minf is None:
        raise Mp4FormatError("mdia missing minf")
    stbl = _find(payload, minf[0], minf[1], b"stbl")
    if stbl is None:
        raise Mp4FormatError("minf missing stbl")

    # ---- stsd: sample format gate ------------------------------------
    stsd = _find(payload, stbl[0], stbl[1], b"stsd")
    if stsd is None:
        raise Mp4FormatError("stbl missing stsd")
    _, p = _fullbox(payload, stsd[0])
    n_entries = struct.unpack_from(">I", payload, p)[0]
    if n_entries < 1:
        raise Mp4FormatError("empty stsd")
    fourcc = payload[p + 8 : p + 12]
    if fourcc not in (b"mjpg", b"jpeg", b"MJPG"):
        raise Mp4FormatError(f"unsupported sample format {fourcc!r}")

    # ---- stts: frame rate --------------------------------------------
    stts = _find(payload, stbl[0], stbl[1], b"stts")
    if stts is None:
        raise Mp4FormatError("stbl missing stts")
    _, p = _fullbox(payload, stts[0])
    n_runs = struct.unpack_from(">I", payload, p)[0]
    if n_runs < 1:
        raise Mp4FormatError("empty stts")
    _count0, delta0 = struct.unpack_from(">II", payload, p + 4)
    if delta0 == 0:
        raise Mp4FormatError("stts delta is zero")
    fps = timescale // delta0

    # ---- stsz: sample sizes ------------------------------------------
    stsz = _find(payload, stbl[0], stbl[1], b"stsz")
    if stsz is None:
        raise Mp4FormatError("stbl missing stsz")
    _, p = _fullbox(payload, stsz[0])
    fixed, n_samples = struct.unpack_from(">II", payload, p)
    if n_samples == 0:
        raise Mp4FormatError("track has zero samples")
    if fixed:
        sizes = [fixed] * n_samples
    else:
        if p + 8 + 4 * n_samples > stsz[1]:
            raise Mp4FormatError("stsz table truncated")
        sizes = list(
            struct.unpack_from(f">{n_samples}I", payload, p + 8)
        )

    # ---- stsc + stco/co64: chunk map ---------------------------------
    stsc = _find(payload, stbl[0], stbl[1], b"stsc")
    if stsc is None:
        raise Mp4FormatError("stbl missing stsc")
    _, p = _fullbox(payload, stsc[0])
    n_stsc = struct.unpack_from(">I", payload, p)[0]
    if n_stsc < 1 or p + 4 + 12 * n_stsc > stsc[1]:
        raise Mp4FormatError("bad stsc table")
    stsc_rows = [
        struct.unpack_from(">III", payload, p + 4 + 12 * i)
        for i in range(n_stsc)
    ]
    co = _find(payload, stbl[0], stbl[1], b"stco")
    is64 = False
    if co is None:
        co = _find(payload, stbl[0], stbl[1], b"co64")
        is64 = True
    if co is None:
        raise Mp4FormatError("stbl missing stco/co64")
    _, p = _fullbox(payload, co[0])
    n_chunks = struct.unpack_from(">I", payload, p)[0]
    step = 8 if is64 else 4
    if n_chunks < 1 or p + 4 + step * n_chunks > co[1]:
        raise Mp4FormatError("bad chunk offset table")
    fmt = ">Q" if is64 else ">I"
    offsets = [
        struct.unpack_from(fmt, payload, p + 4 + step * i)[0]
        for i in range(n_chunks)
    ]

    # general chunk arithmetic: stsc rows give samples-per-chunk from
    # first_chunk (1-based) until the next row's first_chunk
    frames: list[bytes] = []
    sample = 0
    for ri, (first, spc, _sdi) in enumerate(stsc_rows):
        last = (
            stsc_rows[ri + 1][0] - 1 if ri + 1 < len(stsc_rows)
            else n_chunks
        )
        if first < 1 or first > last:
            raise Mp4FormatError("stsc chunk range invalid")
        for ci in range(first - 1, last):
            pos = offsets[ci]
            for _ in range(spc):
                if sample >= n_samples:
                    break
                size = sizes[sample]
                if pos + size > len(payload):
                    raise Mp4FormatError(
                        "sample extends past end of file"
                    )
                frames.append(payload[pos : pos + size])
                pos += size
                sample += 1
    if sample != n_samples:
        raise Mp4FormatError(
            f"chunk map covers {sample} of {n_samples} samples"
        )

    return {
        "fps": int(fps),
        "width": width,
        "height": height,
        "n_frames": n_samples,
        "frames": frames,
    }
