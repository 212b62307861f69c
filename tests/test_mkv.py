"""Matroska/EBML container codec (multimodal/mkv.py) + the
container-sniffing Spark video path.

EBML is the third distinct container grammar in the multimodal layer
(after RIFF and ISO-BMFF): variable-length-integer ids and sizes,
unknown-size elements, nested element trees. Tests pin the VINT
primitives, the mux/demux round trip, unknown-size Segment handling,
codec/lacing gates, fail-closed fuzz, and row-identity with the AVI
path through Spark.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nebuia_vector_db_spark.multimodal.jpeg import encode_jpeg_gray
from nebuia_vector_db_spark.multimodal.mkv import (
    MkvFormatError,
    _vint_decode,
    _vint_encode,
    decode_mkv_mjpeg,
    encode_mkv_mjpeg,
)


def _jpeg_frames(n=3):
    frames = []
    for k in range(n):
        grid = (
            ((np.arange(64, dtype=np.int64) + k * 7) % 256)
            .astype(np.uint8).reshape(4, 16)
        )
        frames.append(
            encode_jpeg_gray(np.kron(grid, np.ones((8, 8), np.uint8)), 100)
        )
    return frames


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=0, max_value=2**56 - 2))
def test_vint_round_trips(value):
    enc = _vint_encode(value)
    dec, pos = _vint_decode(enc, 0, strip_marker=True)
    assert dec == value and pos == len(enc)


def test_vint_width_boundaries():
    # 126 fits 1 byte; 127 must widen (all-ones = unknown-size marker)
    assert len(_vint_encode(126)) == 1
    assert len(_vint_encode(127)) == 2
    assert len(_vint_encode(2**14 - 2)) == 2
    assert len(_vint_encode(2**14 - 1)) == 3


def test_container_round_trip_byte_exact():
    frames = _jpeg_frames()
    out = decode_mkv_mjpeg(encode_mkv_mjpeg(frames, 8, 128, 32))
    assert out["fps"] == 8
    assert (out["width"], out["height"]) == (128, 32)
    assert out["frames"] == frames


def test_unknown_size_segment_accepted():
    """Streaming muxers write the Segment with an unknown (all-ones)
    size; the walker must extend it to end-of-stream."""
    frames = _jpeg_frames(2)
    good = encode_mkv_mjpeg(frames, 8, 128, 32)
    # Segment id is 4 bytes (1A45.. header first); find it and replace
    # its size VINT with the 8-byte unknown marker
    seg_id = b"\x18\x53\x80\x67"
    i = good.find(seg_id)
    size, after = _vint_decode(good, i + 4, strip_marker=True)
    unknown = b"\x01" + b"\xff" * 7
    patched = good[: i + 4] + unknown + good[after:]
    out = decode_mkv_mjpeg(patched)
    assert out["frames"] == frames


def test_unknown_codec_rejected():
    frames = _jpeg_frames(1)
    good = bytearray(encode_mkv_mjpeg(frames, 8, 128, 32))
    i = bytes(good).find(b"V_MJPEG")
    good[i : i + 7] = b"V_VP9\x00\x00"
    with pytest.raises(MkvFormatError, match="codec"):
        decode_mkv_mjpeg(bytes(good))


def test_laced_block_rejected():
    frames = _jpeg_frames(1)
    good = bytearray(encode_mkv_mjpeg(frames, 8, 128, 32))
    # SimpleBlock layout: id 0xA3, size VINT, track VINT, int16 ts,
    # flags — set a lacing bit in flags. (A bare find(0xA3) would hit
    # the EBML magic's last byte; anchor after the first Cluster id.)
    cluster = bytes(good).find(b"\x1f\x43\xb6\x75")
    i = bytes(good).find(b"\xa3", cluster)
    # walk: a3 <size vint> <0x81> <2 bytes ts> <flags>
    _, p = _vint_decode(bytes(good), i + 1, strip_marker=True)
    flags_pos = p + 1 + 2
    good[flags_pos] |= 0x02
    with pytest.raises(MkvFormatError, match="laced"):
        decode_mkv_mjpeg(bytes(good))


def test_basic_malformations_rejected():
    frames = _jpeg_frames(1)
    mkv = encode_mkv_mjpeg(frames, 8, 128, 32)
    with pytest.raises(MkvFormatError):
        decode_mkv_mjpeg(b"")
    with pytest.raises(MkvFormatError, match="EBML"):
        # a valid VINT id that is not the EBML magic
        decode_mkv_mjpeg(b"\x1a\x45\xdf\xa4" + mkv[4:])
    with pytest.raises(MkvFormatError, match="DocType"):
        decode_mkv_mjpeg(mkv.replace(b"matroska", b"whatever"))
    with pytest.raises(MkvFormatError):
        encode_mkv_mjpeg([], 8, 1, 1)
    with pytest.raises(MkvFormatError):
        encode_mkv_mjpeg([b"x"], 0, 1, 1)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_never_crash_mkv_decoder(payload):
    try:
        decode_mkv_mjpeg(payload)
    except MkvFormatError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=2500),
    st.integers(min_value=0, max_value=255),
)
def test_mutated_mkv_fails_closed(cut, flip_to):
    frames = _jpeg_frames(2)
    good = encode_mkv_mjpeg(frames, 8, 128, 32)
    cut_at = min(cut, len(good) - 1)
    with pytest.raises(MkvFormatError):
        decode_mkv_mjpeg(good[:cut_at])
    mutated = bytearray(good)
    mutated[cut % len(good)] = flip_to
    try:
        out = decode_mkv_mjpeg(bytes(mutated))
        assert isinstance(out["frames"], list)
    except MkvFormatError:
        pass


def test_spark_mkv_pipeline_matches_avi(spark):
    """Three container grammars, identical Spark rows."""
    from nebuia_vector_db_spark.multimodal.assets import (
        attach_avi_assets,
        attach_mkv_assets,
        video_frame_stats,
    )

    texts = [("".join(chr(33 + (i % 90)) for i in range(180)), 1),
             ("z" * 64, 2)]
    docs = spark.createDataFrame(
        [(t, i) for t, i in texts], "text string, doc_id long"
    )
    avi = sorted(
        video_frame_stats(attach_avi_assets(docs)).collect(),
        key=lambda r: (r.doc_id, r.frame_id),
    )
    mkv = sorted(
        video_frame_stats(attach_mkv_assets(docs)).collect(),
        key=lambda r: (r.doc_id, r.frame_id),
    )
    assert len(avi) == len(mkv) > 0
    for ra, rm in zip(avi, mkv):
        assert ra.asDict() == rm.asDict()


def test_unknown_size_cluster_fails_closed():
    """An unknown-size Cluster ends at the NEXT cluster id; a walker
    that extended it to the region end would silently swallow every
    later cluster's frames — the decoder must reject it instead of
    returning a truncated frame list."""
    frames = _jpeg_frames(3)
    good = encode_mkv_mjpeg(frames, 8, 128, 32)
    cluster_id = b"\x1f\x43\xb6\x75"
    i = good.find(cluster_id)
    size, after = _vint_decode(good, i + 4, strip_marker=True)
    unknown = b"\x01" + b"\xff" * 7
    patched = good[: i + 4] + unknown + good[after:]
    with pytest.raises(MkvFormatError, match="unknown-size"):
        decode_mkv_mjpeg(patched)


def test_vint_decode_respects_region_end():
    """Round 6 (ADVICE r4): a VINT whose width extends past its parent
    element's end must fail closed, not silently consume the sibling's
    bytes (the overrun check used to fire only against the whole
    payload)."""
    from nebuia_vector_db_spark.multimodal.mkv import (
        MkvFormatError,
        _vint_decode,
    )

    # 0x01 leading byte = 8-byte-wide VINT; bytes 8.. belong to a sibling
    payload = b"\x01" + b"\x00" * 7 + b"\xff" * 4
    v, p = _vint_decode(payload, 0, strip_marker=False)
    assert p == 8  # unbounded parse is fine
    with pytest.raises(MkvFormatError, match="truncated VINT"):
        _vint_decode(payload, 0, strip_marker=False, end=4)
    with pytest.raises(MkvFormatError, match="truncated VINT"):
        _vint_decode(payload, 4, end=4)  # starts AT the region end


def test_simpleblock_track_vint_bounded_by_block():
    """A SimpleBlock whose track-number VINT claims more bytes than
    the block holds must raise, not read the next element's bytes —
    the exact decode-path call (`_vint_decode(..., end=ce)`) on a
    crafted 1-byte block followed by a sibling element."""
    from nebuia_vector_db_spark.multimodal.mkv import (
        _SIMPLE_BLOCK,
        MkvFormatError,
        _element,
        _vint_decode,
        _walk,
    )

    # cluster region: 1-byte SimpleBlock (body 0x01 = "8-byte VINT
    # follows") then a sibling Timecode element whose bytes the old
    # unbounded decode would silently consume
    region = _element(_SIMPLE_BLOCK, b"\x01") + _element(0xE7, b"\x00" * 16)
    elems = list(_walk(region, 0, len(region)))
    eid, cb, ce = elems[0]
    assert eid == _SIMPLE_BLOCK and ce - cb == 1
    # pre-fix behavior: the unbounded parse happily crosses into the
    # sibling element...
    _, p = _vint_decode(region, cb, strip_marker=True)
    assert p > ce
    # ...the bounded decode-path call fails closed instead
    with pytest.raises(MkvFormatError, match="truncated VINT"):
        _vint_decode(region, cb, strip_marker=True, end=ce)
