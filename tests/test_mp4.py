"""ISO-BMFF (MP4) container codec (multimodal/mp4.py) + the
container-sniffing Spark video path.

The demuxer reconstructs per-sample byte ranges from the GENERAL
stsc/stco/stsz chunk arithmetic, so tests cover both the muxer's
single-chunk layout and a hand-built one-chunk-per-sample layout, the
co64 64-bit offset path, largesize box headers, and fail-closed
rejection of malformed streams.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nebuia_vector_db_spark.multimodal.jpeg import (
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from nebuia_vector_db_spark.multimodal.mp4 import (
    Mp4FormatError,
    _box,
    _full,
    decode_mp4_mjpeg,
    encode_mp4_mjpeg,
)


def _jpeg_frames(n=4):
    frames, grids = [], []
    for k in range(n):
        grid = (
            ((np.arange(64, dtype=np.int64) + k * 11) % 256)
            .astype(np.uint8).reshape(4, 16)
        )
        frames.append(
            encode_jpeg_gray(np.kron(grid, np.ones((8, 8), np.uint8)), 100)
        )
        grids.append(grid)
    return frames, grids


def test_container_round_trip_byte_exact():
    frames, _ = _jpeg_frames()
    out = decode_mp4_mjpeg(encode_mp4_mjpeg(frames, 8, 128, 32))
    assert out["fps"] == 8
    assert (out["width"], out["height"]) == (128, 32)
    assert out["n_frames"] == 4
    assert out["frames"] == frames


def test_frames_decode_to_original_pixels():
    frames, grids = _jpeg_frames()
    out = decode_mp4_mjpeg(encode_mp4_mjpeg(frames, 12, 128, 32))
    for fb, grid in zip(out["frames"], grids):
        assert np.array_equal(
            decode_jpeg_gray(fb), np.kron(grid, np.ones((8, 8), np.uint8))
        )


def _remux_chunk_per_sample(frames, co64=False):
    """Hand-mux: one chunk per sample, samples NOT contiguous (1-byte
    junk gaps) — exercises the general stsc/stco arithmetic the
    single-chunk encoder never produces."""
    base = encode_mp4_mjpeg(frames, 8, 128, 32)
    # rebuild: keep ftyp, write per-sample mdat with gaps, patch stbl
    ftyp = base[: struct.unpack_from(">I", base, 0)[0]]
    mdat_payload = bytearray()
    offsets = []
    for f in frames:
        mdat_payload += b"\xAA"  # junk gap before each sample
        offsets.append(len(ftyp) + 8 + len(mdat_payload))
        mdat_payload += f
    mdat = _box(b"mdat", bytes(mdat_payload))

    # reuse the original moov but replace stsc + stco, then bump each
    # ancestor container's size field by the byte delta (moov/trak/
    # mdia/minf/stbl each occur exactly once in this stream)
    moov_off = len(ftyp) + struct.unpack_from(">I", base, len(ftyp))[0]
    moov = bytes(base[moov_off:])
    stsc_new = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, 1, 1))
    fmt = ">Q" if co64 else ">I"
    ctype = b"co64" if co64 else b"stco"
    stco_new = _full(
        ctype, 0, 0,
        struct.pack(">I", len(offsets))
        + b"".join(struct.pack(fmt, o) for o in offsets),
    )

    def _replace(buf: bytes, old_type: bytes, new_box: bytes):
        i = buf.find(old_type) - 4
        size = struct.unpack_from(">I", buf, i)[0]
        return buf[:i] + new_box + buf[i + size :], len(new_box) - size

    moov, d1 = _replace(moov, b"stsc", stsc_new)
    moov, d2 = _replace(moov, b"stco", stco_new)
    out = bytearray(moov)
    for name in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        i = out.find(name) - 4
        size = struct.unpack_from(">I", out, i)[0]
        out[i : i + 4] = struct.pack(">I", size + d1 + d2)
    return bytes(ftyp) + mdat + bytes(out)


@pytest.mark.parametrize("co64", [False, True])
def test_general_chunk_arithmetic(co64):
    frames, _ = _jpeg_frames(3)
    remuxed = _remux_chunk_per_sample(frames, co64=co64)
    out = decode_mp4_mjpeg(remuxed)
    assert out["frames"] == frames


def test_largesize_mdat_header():
    frames, _ = _jpeg_frames(2)
    base = encode_mp4_mjpeg(frames, 8, 128, 32)
    ftyp_size = struct.unpack_from(">I", base, 0)[0]
    mdat_size = struct.unpack_from(">I", base, ftyp_size)[0]
    mdat_body = base[ftyp_size + 8 : ftyp_size + mdat_size]
    # rewrite mdat with a 64-bit largesize header (+8 bytes shift)
    big_mdat = (
        struct.pack(">I", 1) + b"mdat"
        + struct.pack(">Q", len(mdat_body) + 16) + mdat_body
    )
    moov = bytearray(base[ftyp_size + mdat_size :])
    # stco offsets shift by 8
    i = bytes(moov).find(b"stco") + 4 + 4 + 4  # type + verflags + count
    old = struct.unpack_from(">I", moov, i)[0]
    moov[i : i + 4] = struct.pack(">I", old + 8)
    out = decode_mp4_mjpeg(base[:ftyp_size] + big_mdat + bytes(moov))
    assert out["frames"] == frames


def test_basic_malformations_rejected():
    frames, _ = _jpeg_frames(1)
    mp4 = encode_mp4_mjpeg(frames, 8, 128, 32)
    with pytest.raises(Mp4FormatError):
        decode_mp4_mjpeg(b"")
    ftyp_size = struct.unpack_from(">I", mp4, 0)[0]
    with pytest.raises(Mp4FormatError, match="ftyp"):
        decode_mp4_mjpeg(
            _box(b"free", b"\x00" * (ftyp_size - 8)) + mp4[ftyp_size:]
        )
    with pytest.raises(Mp4FormatError, match="moov"):
        decode_mp4_mjpeg(mp4[: struct.unpack_from(">I", mp4, 0)[0]]
                         + _box(b"mdat", b"xx"))
    # non-MJPEG sample entry fourcc
    bad = bytearray(mp4)
    i = bytes(bad).find(b"mjpg")
    bad[i : i + 4] = b"avc1"
    with pytest.raises(Mp4FormatError, match="sample format"):
        decode_mp4_mjpeg(bytes(bad))
    with pytest.raises(Mp4FormatError):
        encode_mp4_mjpeg([], 8, 1, 1)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_never_crash_mp4_decoder(payload):
    try:
        decode_mp4_mjpeg(payload)
    except Mp4FormatError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=3000),
    st.integers(min_value=0, max_value=255),
)
def test_mutated_mp4_fails_closed(cut, flip_to):
    frames, _ = _jpeg_frames(2)
    good = encode_mp4_mjpeg(frames, 8, 128, 32)
    cut_at = min(cut, len(good) - 1)
    with pytest.raises(Mp4FormatError):
        decode_mp4_mjpeg(good[:cut_at])
    mutated = bytearray(good)
    mutated[cut % len(good)] = flip_to
    try:
        out = decode_mp4_mjpeg(bytes(mutated))
        assert isinstance(out["frames"], list)
    except Mp4FormatError:
        pass


def test_spark_mp4_pipeline_matches_avi(spark):
    """The MP4 attach path produces byte-different containers but the
    container-sniffing video_frame_stats emits IDENTICAL rows to the
    AVI path — same windows, same frames, two demuxers."""
    from nebuia_vector_db_spark.multimodal.assets import (
        attach_avi_assets,
        attach_mp4_assets,
        video_frame_stats,
    )

    texts = [("".join(chr(33 + (i % 90)) for i in range(200)), 3),
             ("x" * 64, 2)]
    docs = spark.createDataFrame(
        [(t, i) for t, i in texts], "text string, doc_id long"
    )
    avi = sorted(
        video_frame_stats(attach_avi_assets(docs)).collect(),
        key=lambda r: (r.doc_id, r.frame_id),
    )
    mp4 = sorted(
        video_frame_stats(attach_mp4_assets(docs)).collect(),
        key=lambda r: (r.doc_id, r.frame_id),
    )
    assert len(avi) == len(mp4) > 0
    for ra, rm in zip(avi, mp4):
        assert ra.asDict() == rm.asDict()
