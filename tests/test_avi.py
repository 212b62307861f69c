"""MJPEG-AVI container codec (multimodal/avi.py) + the Spark video
surface built on it (attach_avi_assets / video_frame_stats).

The container layer composes with the JPEG codec the way MJPEG works
in the wild: RIFF chunk grammar (shared with the WAV parser), AVI
header lists, per-frame 00dc chunks, keyframe idx1. Tests pin the
round trip byte-exactly, the index cross-check, word-alignment pads,
foreign-chunk tolerance, fail-closed rejection of malformed streams,
and the end-to-end Spark pipeline against locally-computed stats.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nebuia_vector_db_spark.multimodal.avi import (
    AviFormatError,
    _chunk,
    _list,
    decode_avi_mjpeg,
    encode_avi_mjpeg,
)
from nebuia_vector_db_spark.multimodal.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)


def _jpeg_frames(n=3, blocks_per_row=16, block_rows=4, shift=7):
    frames, grids = [], []
    for k in range(n):
        grid = (
            (np.arange(blocks_per_row * block_rows, dtype=np.int64) + k * shift)
            % 256
        ).astype(np.uint8).reshape(block_rows, blocks_per_row)
        img = np.kron(grid, np.ones((8, 8), dtype=np.uint8))
        frames.append(encode_jpeg_gray(img, quality=100))
        grids.append(grid)
    return frames, grids


def test_container_round_trip_byte_exact():
    frames, _ = _jpeg_frames()
    avi = encode_avi_mjpeg(frames, fps=12, width=128, height=32)
    out = decode_avi_mjpeg(avi)
    assert out["fps"] == 12
    assert out["width"] == 128 and out["height"] == 32
    assert out["n_frames"] == 3
    assert out["frames"] == frames  # byte-identical demux


def test_frames_decode_to_original_pixels():
    frames, grids = _jpeg_frames()
    out = decode_avi_mjpeg(encode_avi_mjpeg(frames, 8, 128, 32))
    for fb, grid in zip(out["frames"], grids):
        px = decode_jpeg_gray(fb)
        assert np.array_equal(px, np.kron(grid, np.ones((8, 8), np.uint8)))


def test_odd_size_frames_pad_correctly():
    # odd payload sizes force the RIFF word-alignment pad byte on
    # both the 00dc chunks and the idx1 accounting
    raw = [b"\x01\x02\x03", b"\x04\x05\x06\x07", b"\x09"]
    out = decode_avi_mjpeg(encode_avi_mjpeg(raw, fps=5, width=1, height=1))
    assert out["frames"] == raw


def test_junk_chunk_tolerated():
    frames, _ = _jpeg_frames(n=2)
    avi = bytearray(encode_avi_mjpeg(frames, 8, 128, 32))
    # splice a JUNK chunk immediately after the RIFF form type
    junk = _chunk(b"JUNK", b"\x00" * 11)
    patched = bytes(avi[:12]) + junk + bytes(avi[12:])
    patched = (
        patched[:4]
        + struct.pack("<I", len(patched) - 8)
        + patched[8:]
    )
    assert decode_avi_mjpeg(patched)["frames"] == frames


def test_rec_grouped_frames_collected():
    # hand-mux frames inside a LIST('rec ') grouping (interleaved-AVI
    # convention); no idx1 — decoder must still demux them in order
    frames, _ = _jpeg_frames(n=2)
    avih = struct.pack("<IIIIIIIIIIIIII", 125000, 0, 0, 0, 2, 0, 1, 0,
                       128, 32, 0, 0, 0, 0)
    strh = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0, 0, 0,
                       0, 1, 8, 0, 2, 0, 0xFFFFFFFF, 0, 0, 0, 128, 32)
    strf = struct.pack("<IiiHH4sIiiII", 40, 128, 32, 1, 24, b"MJPG",
                       128 * 32 * 3, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))
    rec = _list(b"rec ", b"".join(_chunk(b"00dc", f) for f in frames))
    movi = _list(b"movi", rec)
    avi = _chunk(b"RIFF", b"AVI " + hdrl + movi)
    out = decode_avi_mjpeg(avi)
    assert out["frames"] == frames and out["fps"] == 8


def test_idx1_offset_corruption_rejected():
    frames, _ = _jpeg_frames(n=2)
    avi = bytearray(encode_avi_mjpeg(frames, 8, 128, 32))
    idx_pos = bytes(avi).rfind(b"idx1")
    # idx1 entry layout: ckid(4) flags(4) offset(4) size(4)
    off_pos = idx_pos + 8 + 8
    avi[off_pos:off_pos + 4] = struct.pack(
        "<I", struct.unpack_from("<I", avi, off_pos)[0] + 2
    )
    with pytest.raises(AviFormatError, match="idx1 offset"):
        decode_avi_mjpeg(bytes(avi))


def test_idx1_size_corruption_rejected():
    frames, _ = _jpeg_frames(n=2)
    avi = bytearray(encode_avi_mjpeg(frames, 8, 128, 32))
    idx_pos = bytes(avi).rfind(b"idx1")
    size_pos = idx_pos + 8 + 12
    avi[size_pos:size_pos + 4] = struct.pack("<I", 3)
    with pytest.raises(AviFormatError, match="idx1 size"):
        decode_avi_mjpeg(bytes(avi))


def test_header_frame_count_mismatch_rejected():
    frames, _ = _jpeg_frames(n=2)
    avi = bytearray(encode_avi_mjpeg(frames, 8, 128, 32))
    # avih dwTotalFrames is the 5th dword of the avih payload
    avih_pos = bytes(avi).find(b"avih")
    avi[avih_pos + 8 + 16 : avih_pos + 8 + 20] = struct.pack("<I", 9)
    with pytest.raises(AviFormatError, match="declares 9 frames"):
        decode_avi_mjpeg(bytes(avi))


def test_non_mjpeg_codec_rejected():
    frames, _ = _jpeg_frames(n=1)
    avi = bytearray(encode_avi_mjpeg(frames, 8, 128, 32))
    strh_pos = bytes(avi).find(b"strh")
    avi[strh_pos + 8 + 4 : strh_pos + 8 + 8] = b"H264"
    with pytest.raises(AviFormatError, match="unsupported video codec"):
        decode_avi_mjpeg(bytes(avi))


def test_basic_malformations_rejected():
    frames, _ = _jpeg_frames(n=1)
    avi = encode_avi_mjpeg(frames, 8, 128, 32)
    for bad, pat in (
        (b"", "not a RIFF"),
        (b"RIFX" + avi[4:], "not a RIFF"),
        (avi[:8] + b"WAVE" + avi[12:], "not 'AVI '"),
        (avi[:40], "truncated"),
    ):
        with pytest.raises(AviFormatError, match=pat):
            decode_avi_mjpeg(bad)
    with pytest.raises(AviFormatError):
        encode_avi_mjpeg([], 8, 1, 1)
    with pytest.raises(AviFormatError):
        encode_avi_mjpeg([b"x"], 0, 1, 1)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_never_crash_avi_decoder(payload):
    try:
        decode_avi_mjpeg(payload)
    except AviFormatError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=3000),
    st.integers(min_value=0, max_value=255),
)
def test_mutated_avi_fails_closed(cut, flip_to):
    """Truncations must raise; single-byte flips either raise the
    typed error or still demux to a list of frame byte-strings (flips
    inside JPEG frame payloads are legal at the container level)."""
    frames, _ = _jpeg_frames(n=2)
    good = encode_avi_mjpeg(frames, 8, 128, 32)
    cut_at = min(cut, len(good) - 1)
    if cut_at < len(good) - 1:
        with pytest.raises(AviFormatError):
            decode_avi_mjpeg(good[:cut_at])
    mutated = bytearray(good)
    mutated[cut % len(good)] = flip_to
    try:
        out = decode_avi_mjpeg(bytes(mutated))
        assert isinstance(out["frames"], list)
        assert all(isinstance(f, bytes) for f in out["frames"])
    except AviFormatError:
        pass


def test_spark_video_pipeline_end_to_end(spark):
    """attach → demux → per-frame decode → stats, validated against a
    local numpy replay of the same windowing + pixel arithmetic;
    docs shorter than one 64-byte window are dropped."""
    from nebuia_vector_db_spark.multimodal.assets import (
        attach_avi_assets,
        video_frame_stats,
    )

    texts = [
        ("a" * 30, 1),                      # < 64 bytes -> dropped
        ("x" * 64, 2),                      # exactly one window
        ("".join(chr(33 + (i % 90)) for i in range(200)), 3),
    ]
    docs = spark.createDataFrame(
        [(t, i) for t, i in texts], "text string, doc_id long"
    )
    got = (
        video_frame_stats(attach_avi_assets(docs))
        .orderBy("doc_id", "frame_id")
        .collect()
    )

    expected = []
    for t, i in texts:
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int64)
        if len(b) < 64:
            continue
        n_win = (len(b) - 64) // 48 + 1
        prev = None
        for k in range(n_win):
            w = b[k * 48 : k * 48 + 64]
            delta = 0.0 if prev is None else float(
                np.abs(w - prev).sum()
            ) / 64.0
            expected.append(
                (i, k, 8, 128, 32, float(w.sum()) / 64.0,
                 int(w.max()), delta)
            )
            prev = w
    assert len(got) == len(expected)
    for row, exp in zip(got, expected):
        assert (
            row.doc_id, row.frame_id, row.fps, row.width, row.height,
        ) == exp[:5]
        assert row.frame_mean == exp[5]      # exact: /2^k arithmetic
        assert row.frame_max == exp[6]
        assert row.delta_mean == exp[7]


def test_absolute_offset_idx1_accepted():
    """Round 6 (ADVICE r4): many muxers (old VfW included) write idx1
    offsets absolute from the file start rather than relative to the
    'movi' fourCC; the decoder must accept both conventions — and
    still reject an index that matches neither."""
    frames, _ = _jpeg_frames(n=3)
    good = encode_avi_mjpeg(frames, 8, 128, 32)
    baseline = decode_avi_mjpeg(good)

    movi_fcc = good.find(b"movi")
    idx_pos = good.rfind(b"idx1")
    n_entries = struct.unpack_from("<I", good, idx_pos + 4)[0] // 16
    avi = bytearray(good)
    for i in range(n_entries):
        off_pos = idx_pos + 8 + 16 * i + 8
        rel = struct.unpack_from("<I", avi, off_pos)[0]
        avi[off_pos:off_pos + 4] = struct.pack("<I", rel + movi_fcc)
    out = decode_avi_mjpeg(bytes(avi))
    assert out["frames"] == baseline["frames"]

    # a uniform shift that is NEITHER convention still fails
    bad = bytearray(good)
    for i in range(n_entries):
        off_pos = idx_pos + 8 + 16 * i + 8
        rel = struct.unpack_from("<I", bad, off_pos)[0]
        bad[off_pos:off_pos + 4] = struct.pack("<I", rel + movi_fcc + 2)
    with pytest.raises(AviFormatError, match="idx1 offset"):
        decode_avi_mjpeg(bytes(bad))


def test_nonzero_video_stream_decodes():
    """Round 6 (ADVICE r4): an AVI whose video is stream 01 (e.g. an
    audio strl declared first) used to decode to 'no video frames' —
    chunk ids were hardcoded to 00dc/00db. Hand-mux an audio+video
    file with the video as stream 1."""
    frames, _ = _jpeg_frames(n=2)
    avih = struct.pack("<IIIIIIIIIIIIII", 125000, 0, 0, 0, 2, 0, 2, 0,
                       128, 32, 0, 0, 0, 0)
    strh_aud = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"auds", b"\0\0\0\0",
                           0, 0, 0, 0, 1, 8000, 0, 16000, 0, 0xFFFFFFFF,
                           1, 0, 0, 0, 0)
    strf_aud = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)  # PCM fmt
    strh_vid = struct.pack("<4s4sIHHIIIIIIIIhhhh", b"vids", b"MJPG", 0,
                           0, 0, 0, 1, 8, 0, 2, 0, 0xFFFFFFFF, 0, 0, 0,
                           128, 32)
    strf_vid = struct.pack("<IiiHH4sIiiII", 40, 128, 32, 1, 24, b"MJPG",
                           128 * 32 * 3, 0, 0, 0, 0)
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh_aud) + _chunk(b"strf", strf_aud))
        + _list(b"strl", _chunk(b"strh", strh_vid) + _chunk(b"strf", strf_vid)),
    )
    movi_payload = b"movi"
    idx_entries = []
    for i, f in enumerate(frames):
        # interleave a fake audio chunk before each video frame
        audio = _chunk(b"00wb", b"\x80" * 100)
        idx_entries.append(struct.pack("<4sIII", b"00wb", 0,
                                       len(movi_payload), 100))
        movi_payload += audio
        idx_entries.append(struct.pack("<4sIII", b"01dc", 0x10,
                                       len(movi_payload), len(f)))
        movi_payload += _chunk(b"01dc", f)
    movi = _chunk(b"LIST", movi_payload)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    avi = _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)
    out = decode_avi_mjpeg(avi)
    assert out["frames"] == frames
    assert out["fps"] == 8 and out["n_frames"] == 2
