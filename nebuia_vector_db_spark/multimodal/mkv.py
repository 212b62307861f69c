"""Pure-stdlib Matroska (MKV / EBML) container codec — MJPEG track.

Fourth video-capable container (after MJPEG-AVI, animated GIF and
ISO-BMFF MP4; the reference engine is text+vector only, main.go:25-75
— mandated extension surface), and the third distinct container
GRAMMAR: EBML, the variable-length-integer tag/size encoding under
.mkv/.webm.

- **mux**: EBML header (DocType "matroska") + Segment with Info
  (TimestampScale, Duration), Tracks (one video TrackEntry: number,
  UID, type 1, CodecID ``V_MJPEG``, DefaultDuration ns/frame,
  PixelWidth/Height) and one Cluster per frame (Timestamp +
  keyframe SimpleBlock carrying the raw JPEG bytes). All ids and
  sizes are genuine EBML VINTs (length-prefixed variable integers).
- **demux**: a real EBML walker — VINT id/size decode, unknown-size
  Segment/Cluster support (extends to the parent's end), unknown
  elements skipped structurally — that validates the EBML magic and
  DocType, reads the timescale, locates the video TrackEntry, gates
  the CodecID, derives fps from DefaultDuration, and collects that
  track's SimpleBlock payloads in cluster order (lacing is rejected
  cleanly — the encoder never laces).

Frames decode through the shared JPEG codec, exactly like the AVI and
MP4 paths: same frames, three demuxers, one SQL oracle.

Fail-closed: malformations raise :class:`MkvFormatError` (fuzz-pinned).
"""

from __future__ import annotations

import struct

_EBML_MAGIC = 0x1A45DFA3
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMESCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_NUMBER = 0xD7
_TRACK_UID = 0x73C5
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_CLUSTER = 0x1F43B675
_TIMESTAMP = 0xE7
_SIMPLE_BLOCK = 0xA3
_DOCTYPE = 0x4282

_UNKNOWN = object()  # sentinel for unknown-size elements


class MkvFormatError(ValueError):
    """Raised when the payload is not a decodable MJPEG MKV stream."""


# ------------------------------------------------------------------ VINT
def _vint_encode(value: int, keep_marker: bool = False) -> bytes:
    """EBML variable-length integer: the leading 1-bit's byte position
    encodes the width. ``keep_marker=False`` is the size encoding."""
    for width in range(1, 9):
        if value < (1 << (7 * width)) - (0 if keep_marker else 1):
            out = value | (1 << (7 * width))
            return out.to_bytes(width, "big")
    raise MkvFormatError(f"VINT overflow: {value}")


def _id_encode(eid: int) -> bytes:
    """Element ids are stored with their marker bit as-is."""
    length = (eid.bit_length() + 7) // 8
    return eid.to_bytes(length, "big")


def _vint_decode(
    payload: bytes, pos: int, strip_marker: bool = True, end: int | None = None
):
    """Return (value, next_pos); size VINTs strip the marker, ids keep
    the whole bytes as the id value. ``end`` bounds the read to the
    enclosing element's region (round 6, ADVICE r4): without it a
    VINT starting near a child element's end could consume sibling
    bytes before any overrun check fired — fail closed instead."""
    if end is None:
        end = len(payload)
    if pos >= end:
        raise MkvFormatError("truncated VINT")
    first = payload[pos]
    if first == 0:
        raise MkvFormatError("invalid VINT leading byte 0x00")
    width = 8 - first.bit_length() + 1
    if pos + width > end:
        raise MkvFormatError("truncated VINT body")
    raw = int.from_bytes(payload[pos : pos + width], "big")
    if strip_marker:
        value = raw - (1 << (7 * width))
        if value == (1 << (7 * width)) - 1:
            return _UNKNOWN, pos + width  # all-ones = unknown size
        return value, pos + width
    return raw, pos + width


def _element(eid: int, payload: bytes) -> bytes:
    return _id_encode(eid) + _vint_encode(len(payload)) + payload


def _uint_el(eid: int, value: int) -> bytes:
    length = max(1, (value.bit_length() + 7) // 8)
    return _element(eid, value.to_bytes(length, "big"))


def _float_el(eid: int, value: float) -> bytes:
    return _element(eid, struct.pack(">d", value))


def _str_el(eid: int, value: str) -> bytes:
    return _element(eid, value.encode("ascii"))


# ------------------------------------------------------------------- mux
def encode_mkv_mjpeg(
    frames: list[bytes], fps: int, width: int, height: int
) -> bytes:
    """Encode JPEG frame byte-streams as a Matroska file with one
    ``V_MJPEG`` video track, one keyframe SimpleBlock per Cluster."""
    if not frames:
        raise MkvFormatError("cannot encode an MKV with zero frames")
    if fps <= 0:
        raise MkvFormatError("fps must be positive")

    ebml = _element(
        _EBML_MAGIC,
        _uint_el(0x4286, 1)        # EBMLVersion
        + _uint_el(0x42F7, 1)      # EBMLReadVersion
        + _uint_el(0x42F2, 4)      # EBMLMaxIDLength
        + _uint_el(0x42F3, 8)      # EBMLMaxSizeLength
        + _str_el(_DOCTYPE, "matroska")
        + _uint_el(0x4287, 4)      # DocTypeVersion
        + _uint_el(0x4285, 2),     # DocTypeReadVersion
    )
    frame_ms = 1000 // fps
    info = _element(
        _INFO,
        _uint_el(_TIMESCALE, 1_000_000)  # 1 ms ticks
        + _float_el(_DURATION, float(frame_ms * len(frames))),
    )
    video = _element(
        _VIDEO, _uint_el(_PIXEL_W, width) + _uint_el(_PIXEL_H, height)
    )
    track = _element(
        _TRACK_ENTRY,
        _uint_el(_TRACK_NUMBER, 1)
        + _uint_el(_TRACK_UID, 1)
        + _uint_el(_TRACK_TYPE, 1)  # video
        + _str_el(_CODEC_ID, "V_MJPEG")
        + _uint_el(_DEFAULT_DURATION, 1_000_000_000 // fps)
        + video,
    )
    tracks = _element(_TRACKS, track)
    clusters = b""
    for i, f in enumerate(frames):
        block = (
            _vint_encode(1, keep_marker=False)  # track number VINT (0x81)
            + struct.pack(">h", 0)              # relative timestamp
            + bytes([0x80])                     # keyframe, no lacing
            + f
        )
        clusters += _element(
            _CLUSTER,
            _uint_el(_TIMESTAMP, i * frame_ms)
            + _element(_SIMPLE_BLOCK, block),
        )
    return ebml + _element(_SEGMENT, info + tracks + clusters)


# ----------------------------------------------------------------- demux
def _walk(payload: bytes, pos: int, end: int):
    """Yield (element id, body_start, body_end) across a region; an
    unknown-size element extends to the region's end (legal only for
    Segment/Cluster — enforced by the caller's grammar)."""
    while pos < end:
        eid, p = _vint_decode(payload, pos, strip_marker=False, end=end)
        size, p = _vint_decode(payload, p, strip_marker=True, end=end)
        if size is _UNKNOWN:
            # only the Segment may be unknown-size here: an unknown-
            # size CLUSTER ends at the next cluster id, and treating
            # it as extending to the region end would silently swallow
            # every later cluster's frames — fail closed instead
            if eid != _SEGMENT:
                raise MkvFormatError(
                    f"unknown-size element 0x{eid:X} unsupported"
                )
            yield eid, p, end
            return
        if p + size > end:
            raise MkvFormatError(f"element 0x{eid:X} overruns its region")
        yield eid, p, p + size
        pos = p + size


def _uint(payload: bytes, b: int, e: int) -> int:
    if e - b > 8:
        raise MkvFormatError("uint element too wide")
    return int.from_bytes(payload[b:e], "big")


def decode_mkv_mjpeg(payload: bytes) -> dict:
    """Decode an MJPEG MKV -> ``{fps, width, height, n_frames,
    frames}`` via a genuine EBML walk (see module docstring)."""
    try:
        return _decode_impl(payload)
    except MkvFormatError:
        raise
    except (IndexError, ValueError, struct.error, OverflowError) as e:
        raise MkvFormatError(f"corrupt MKV stream: {e}") from e


def _decode_impl(payload: bytes) -> dict:
    top = _walk(payload, 0, len(payload))
    try:
        eid, b, e = next(top)
    except StopIteration:
        raise MkvFormatError("empty stream") from None
    if eid != _EBML_MAGIC:
        raise MkvFormatError("not an EBML stream")
    doctype = None
    for ceid, cb, ce in _walk(payload, b, e):
        if ceid == _DOCTYPE:
            doctype = payload[cb:ce].rstrip(b"\x00").decode("ascii", "replace")
    if doctype not in ("matroska", "webm"):
        raise MkvFormatError(f"unsupported DocType {doctype!r}")

    segment = None
    for eid, b, e in top:
        if eid == _SEGMENT:
            segment = (b, e)
            break
    if segment is None:
        raise MkvFormatError("missing Segment")

    track_num = None
    fps = width = height = None
    frames: list[bytes] = []
    for eid, b, e in _walk(payload, segment[0], segment[1]):
        if eid == _TRACKS:
            for teid, tb, te in _walk(payload, b, e):
                if teid != _TRACK_ENTRY:
                    continue
                num = ttype = codec = dd = None
                w = h = None
                for feid, fb, fe in _walk(payload, tb, te):
                    if feid == _TRACK_NUMBER:
                        num = _uint(payload, fb, fe)
                    elif feid == _TRACK_TYPE:
                        ttype = _uint(payload, fb, fe)
                    elif feid == _CODEC_ID:
                        codec = payload[fb:fe].decode("ascii", "replace")
                    elif feid == _DEFAULT_DURATION:
                        dd = _uint(payload, fb, fe)
                    elif feid == _VIDEO:
                        for veid, vb, ve in _walk(payload, fb, fe):
                            if veid == _PIXEL_W:
                                w = _uint(payload, vb, ve)
                            elif veid == _PIXEL_H:
                                h = _uint(payload, vb, ve)
                if ttype == 1:
                    if codec not in ("V_MJPEG", "V_JPEG"):
                        raise MkvFormatError(
                            f"unsupported video codec {codec!r}"
                        )
                    if dd is None or dd == 0:
                        raise MkvFormatError("video track lacks duration")
                    track_num = num
                    fps = round(1_000_000_000 / dd)
                    width, height = w, h
        elif eid == _CLUSTER:
            if track_num is None:
                raise MkvFormatError("Cluster before Tracks")
            for ceid, cb, ce in _walk(payload, b, e):
                if ceid != _SIMPLE_BLOCK:
                    continue
                tnum, p = _vint_decode(payload, cb, strip_marker=True, end=ce)
                if tnum is _UNKNOWN:
                    raise MkvFormatError("invalid block track VINT")
                if p + 3 > ce:
                    raise MkvFormatError("SimpleBlock header truncated")
                flags = payload[p + 2]
                if flags & 0x06:
                    raise MkvFormatError("laced SimpleBlock unsupported")
                if tnum == track_num:
                    frames.append(payload[p + 3 : ce])

    if track_num is None:
        raise MkvFormatError("no video track found")
    if not frames:
        raise MkvFormatError("no video frames found")
    return {
        "fps": int(fps),
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }
