"""Pure-stdlib AVI (RIFF) container codec — MJPEG video streams.

Round-4 closure of the "video containers remain executor-install
points" gap (SURVEY §2.4 multimodal row): the engine can now carry a
REAL video payload end to end without any third-party media library.
The reference engine (main.go:25-75) is text+vector only — this whole
module is part of the mandated multimodal extension surface.

AVI is a RIFF form, the same container family as WAV
(:mod:`nebuia_vector_db_spark.multimodal.wav`), so the chunk grammar
here — fourCC ids, little-endian sizes, word-alignment pad bytes —
deliberately mirrors that parser. The video-specific layer is the
`hdrl` header list (`avih` main header, per-stream `strl` with
`strh`/`strf`), the `movi` list holding one `00dc` compressed-frame
chunk per video frame, and the optional `idx1` frame index. Frames
are baseline JPEG byte streams decoded by
:mod:`nebuia_vector_db_spark.multimodal.jpeg` — container parse and
codec compose, exactly how MJPEG-in-AVI works in the wild.

Scale posture: the container is parsed per-row inside Arrow-batched
``mapInPandas`` kernels (see ``assets.attach_avi_assets`` /
``assets.video_frame_stats``) — map-side, no shuffle, no driver
involvement; 100 TB of clips partition like any other binary column.

Decoder is fail-closed: any malformation (bad magic, chunk overrun,
missing header/movi, index pointing outside `movi`, truncation)
raises :class:`AviFormatError` — never a raw struct/Index error and
never silently-wrong frames (fuzz-pinned in tests/test_codec_fuzz.py).
"""

from __future__ import annotations

import struct

AVIF_HASINDEX = 0x00000010
AVIIF_KEYFRAME = 0x00000010


class AviFormatError(ValueError):
    """Raised when the payload is not a decodable MJPEG AVI stream."""


def _chunk(cid: bytes, payload: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd payloads carry one pad byte
    # that is NOT counted in the size field
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def _list(ltype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", ltype + payload)


def encode_avi_mjpeg(
    frames: list[bytes], fps: int, width: int, height: int
) -> bytes:
    """Encode JPEG frame byte-streams as an MJPEG AVI file.

    Emits the canonical single-video-stream layout every AVI reader
    expects: ``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    LIST('movi' 00dc...) idx1)`` with a keyframe index entry per
    frame (MJPEG frames are all intra-coded).
    """
    if not frames:
        raise AviFormatError("cannot encode an AVI with zero frames")
    if fps <= 0:
        raise AviFormatError("fps must be positive")
    max_bytes = max(len(f) for f in frames)

    # --- hdrl ---------------------------------------------------------
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,          # dwMicroSecPerFrame
        max_bytes * fps,           # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        AVIF_HASINDEX,             # dwFlags
        len(frames),               # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        max_bytes,                 # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,                # dwReserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids",                   # fccType
        b"MJPG",                   # fccHandler
        0,                         # dwFlags
        0, 0,                      # wPriority, wLanguage
        0,                         # dwInitialFrames
        1,                         # dwScale
        fps,                       # dwRate (rate/scale = fps)
        0,                         # dwStart
        len(frames),               # dwLength (in frames)
        max_bytes,                 # dwSuggestedBufferSize
        0xFFFFFFFF,                # dwQuality (default)
        0,                         # dwSampleSize (0 = var-size frames)
        0, 0, width, height,       # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                        # biSize (BITMAPINFOHEADER)
        width,
        height,
        1,                         # biPlanes
        24,                        # biBitCount
        b"MJPG",                   # biCompression
        width * height * 3,        # biSizeImage (nominal)
        0, 0, 0, 0,                # bi[XY]PelsPerMeter, biClrUsed/Important
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    # --- movi + idx1 --------------------------------------------------
    # idx1 offsets are, per the Microsoft convention, relative to the
    # position of the 'movi' fourCC (offset 4 = first chunk header)
    movi_payload = b"movi"
    idx_entries = []
    for f in frames:
        idx_entries.append(
            struct.pack(
                "<4sIII", b"00dc", AVIIF_KEYFRAME, len(movi_payload), len(f)
            )
        )
        movi_payload += _chunk(b"00dc", f)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_avi_mjpeg(payload: bytes) -> dict:
    """Decode an MJPEG AVI -> ``{fps, width, height, n_frames,
    frames}`` where ``frames`` is the list of JPEG byte streams in
    stream order.

    A genuine container parse: validates the RIFF/'AVI ' form, walks
    the top-level chunk list tolerating foreign chunks (`JUNK`,
    `INFO` lists), descends into `hdrl` for `avih`/`strh`/`strf`,
    collects `00dc`/`00db` frame chunks from `movi` (including inside
    `rec ` groupings), and — when an `idx1` is present — cross-checks
    every index entry against the frames actually found, rejecting an
    index that points outside the `movi` list. Word-alignment pad
    bytes are honoured throughout. Raises :class:`AviFormatError` on
    any malformation.
    """
    try:
        return _decode_impl(payload)
    except AviFormatError:
        raise
    except (IndexError, ValueError, struct.error) as e:
        raise AviFormatError(f"corrupt AVI stream: {e}") from e


def _walk(payload: bytes, off: int, end: int):
    """Yield ``(cid, body_start, size)`` for each chunk in a region."""
    while off + 8 <= end:
        cid = payload[off : off + 4]
        size = struct.unpack_from("<I", payload, off + 4)[0]
        body = off + 8
        if body + size > end:
            raise AviFormatError(f"chunk {cid!r} overruns its region")
        yield cid, body, size
        off = body + size + (size % 2)
    if off != end and off + 8 > end and off < end:
        # trailing bytes too short to be a chunk header
        raise AviFormatError("trailing garbage after last chunk")


def _decode_impl(payload: bytes) -> dict:
    if len(payload) < 12 or payload[:4] != b"RIFF":
        raise AviFormatError("not a RIFF stream")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if riff_size + 8 > len(payload):
        raise AviFormatError("truncated RIFF payload")
    if payload[8:12] != b"AVI ":
        raise AviFormatError("RIFF form is not 'AVI '")

    fps = width = height = None
    n_declared = None
    vid_stream = None
    frames: list[bytes] = []
    frame_offsets: list[int] = []  # offset of chunk header within movi
    movi = None  # (body_of_LIST, size) — frames collected after the walk
    idx1_raw = None

    for cid, body, size in _walk(payload, 12, 8 + riff_size):
        if cid == b"LIST":
            if size < 4:
                raise AviFormatError("LIST chunk too small")
            ltype = payload[body : body + 4]
            if ltype == b"hdrl":
                fps, width, height, n_declared, vid_stream = _parse_hdrl(
                    payload, body + 4, body + size
                )
            elif ltype == b"movi":
                movi = (body, size)
        elif cid == b"idx1":
            idx1_raw = payload[body : body + size]
        # JUNK / foreign chunks: skipped, like the WAV parser

    if fps is None:
        raise AviFormatError("missing hdrl header list")
    if movi is None:
        raise AviFormatError("missing movi list")
    # the video stream's chunk ids carry its strl index (round 6,
    # ADVICE r4: '00dc' was hardcoded — a file whose video is stream
    # 01 decoded to "no video frames")
    vid_ids = (
        b"%02ddc" % vid_stream,
        b"%02ddb" % vid_stream,
    )
    movi_body, movi_size = movi
    _collect_frames(
        payload, movi_body + 4, movi_body + movi_size, movi_body,
        frames, frame_offsets, vid_ids,
    )
    if not frames:
        raise AviFormatError("movi list holds no video frames")
    if n_declared is not None and n_declared != len(frames):
        raise AviFormatError(
            f"header declares {n_declared} frames, movi holds {len(frames)}"
        )
    if idx1_raw is not None:
        _check_idx1(
            idx1_raw, frames, frame_offsets, movi_size,
            movi_abs=movi_body, vid_ids=vid_ids,
        )

    return {
        "fps": fps,
        "width": width,
        "height": height,
        "n_frames": len(frames),
        "frames": frames,
    }


def _parse_hdrl(payload: bytes, off: int, end: int):
    fps = width = height = n_frames = None
    vid_stream = None
    strl_idx = -1
    for cid, body, size in _walk(payload, off, end):
        if cid == b"avih":
            if size < 40:
                raise AviFormatError("avih too small")
            vals = struct.unpack_from("<10I", payload, body)
            n_frames, width, height = vals[4], vals[8], vals[9]
        elif cid == b"LIST" and payload[body : body + 4] == b"strl":
            strl_idx += 1
            f = _parse_strl(payload, body + 4, body + size)
            if f is not None:
                fps = f
                vid_stream = strl_idx
    if fps is None or width is None:
        raise AviFormatError("hdrl missing avih or a vids strl")
    return fps, width, height, n_frames, vid_stream


def _parse_strl(payload: bytes, off: int, end: int):
    """Return fps if this strl is the MJPEG video stream, else None."""
    fps = None
    is_vids = False
    for cid, body, size in _walk(payload, off, end):
        if cid == b"strh":
            if size < 48:
                raise AviFormatError("strh too small")
            fcc_type = payload[body : body + 4]
            handler = payload[body + 4 : body + 8]
            scale, rate = struct.unpack_from("<II", payload, body + 20)
            if fcc_type == b"vids":
                is_vids = True
                if handler not in (b"MJPG", b"mjpg"):
                    raise AviFormatError(
                        f"unsupported video codec {handler!r}"
                    )
                if scale == 0 or rate == 0:
                    raise AviFormatError("strh rate/scale is zero")
                fps = rate // scale
    return fps if is_vids else None


def _collect_frames(
    payload: bytes,
    off: int,
    end: int,
    movi_body: int,
    frames: list[bytes],
    frame_offsets: list[int],
    vid_ids: tuple[bytes, bytes],
) -> None:
    for cid, body, size in _walk(payload, off, end):
        if cid in vid_ids:
            frames.append(payload[body : body + size])
            frame_offsets.append(body - 8 - movi_body)
        elif cid == b"LIST" and payload[body : body + 4] == b"rec ":
            _collect_frames(
                payload, body + 4, body + size, movi_body, frames,
                frame_offsets, vid_ids,
            )


def _check_idx1(
    raw: bytes,
    frames: list[bytes],
    frame_offsets: list[int],
    movi_size: int,
    movi_abs: int,
    vid_ids: tuple[bytes, bytes],
) -> None:
    """Cross-check the idx1 index against the frames found in movi.

    Offsets come in TWO conventions in the wild (round 6, ADVICE r4 —
    the old check rejected the second one): relative to the 'movi'
    fourCC (Microsoft's documented form; offset 4 = first chunk
    header) or absolute from the file start (what many muxers,
    including old VfW, actually write). Detect the convention from
    the first entry — the only two values consistent with the movi
    layout are ``foff`` and ``foff + movi_abs`` — then enforce it
    uniformly; a mixed or shifted index still fails."""
    if len(raw) % 16:
        raise AviFormatError("idx1 size is not a multiple of 16")
    entries = [
        struct.unpack_from("<4sIII", raw, i) for i in range(0, len(raw), 16)
    ]
    vid = [e for e in entries if e[0] in vid_ids]
    if len(vid) != len(frames):
        raise AviFormatError(
            f"idx1 indexes {len(vid)} frames, movi holds {len(frames)}"
        )
    delta = 0
    if vid and vid[0][2] == frame_offsets[0] + movi_abs:
        delta = movi_abs  # absolute-offset convention
    for (cid, _flags, offset, size), foff, frame in zip(
        vid, frame_offsets, frames
    ):
        if offset != foff + delta:
            raise AviFormatError(
                f"idx1 offset {offset} disagrees with movi layout "
                f"({foff + delta})"
            )
        if (offset - delta) + 8 + size > movi_size:
            raise AviFormatError("idx1 entry points outside the movi list")
        if size != len(frame):
            raise AviFormatError(
                f"idx1 size {size} disagrees with frame size {len(frame)}"
            )
