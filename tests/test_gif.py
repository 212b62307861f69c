"""GIF codec (multimodal/gif.py): LZW, animation, interlacing — and
the Spark animated-frames surface built on it.

GIF is the lossless animated container: decoded palette indices must
equal the encoded arrays bit-for-bit, through genuine variable-width
LZW (with the 4096-entry table reset), 255-byte sub-block chaining,
GCE delay parsing, and the 4-pass interlace row permutation.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nebuia_vector_db_spark.multimodal.gif import (
    GifFormatError,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    grayscale_palette,
)


def test_single_frame_round_trip():
    rng = np.random.default_rng(1)
    f = rng.integers(0, 256, (13, 21), dtype=np.uint8)
    out = decode_gif(encode_gif([f]))
    assert np.array_equal(out["frames"][0], f)
    assert (out["width"], out["height"]) == (21, 13)
    assert np.array_equal(out["palette"], grayscale_palette())


def test_animation_round_trip_with_delays():
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 256, (9, 16), dtype=np.uint8)
              for _ in range(5)]
    out = decode_gif(encode_gif(frames, delay_cs=7))
    assert all(np.array_equal(a, b)
               for a, b in zip(out["frames"], frames))
    assert out["delays_cs"] == [7] * 5
    assert out["offsets"] == [(0, 0)] * 5


def test_interlaced_round_trip():
    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (23, 17), dtype=np.uint8)
    assert np.array_equal(
        decode_gif(encode_gif([g], interlace=True))["frames"][0], g
    )


def test_small_palettes_round_trip():
    rng = np.random.default_rng(4)
    for n in (2, 4, 16, 64):
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        f = rng.integers(0, n, (12, 12), dtype=np.uint8)
        out = decode_gif(encode_gif([f], palette=pal))
        assert np.array_equal(out["frames"][0], f)
        assert np.array_equal(out["palette"], pal)


def test_lzw_table_reset_path():
    """A 16k-pixel random frame overflows the 4096-entry LZW table,
    forcing the Clear-code reset on encode and decode."""
    rng = np.random.default_rng(5)
    big = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif([big]))["frames"][0], big)


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=300), st.integers(2, 8))
def test_lzw_primitive_round_trips(data, code_size):
    arr = np.frombuffer(data, dtype=np.uint8) % (1 << code_size)
    if len(arr) == 0:
        return
    dec = _lzw_decode(_lzw_encode(arr, code_size), code_size, len(arr))
    assert np.array_equal(dec, arr)


def test_validation_errors():
    with pytest.raises(GifFormatError, match="zero frames"):
        encode_gif([])
    with pytest.raises(GifFormatError, match="power of two"):
        encode_gif([np.zeros((2, 2), np.uint8)],
                   palette=np.zeros((3, 3), np.uint8))
    f = np.full((2, 2), 5, np.uint8)
    with pytest.raises(GifFormatError, match="outside the palette"):
        encode_gif([f], palette=np.zeros((4, 3), np.uint8))
    with pytest.raises(GifFormatError, match="not a GIF"):
        decode_gif(b"JIF89a" + b"\x00" * 20)


def test_frame_rectangle_bounds_checked():
    good = bytearray(encode_gif([np.zeros((4, 4), np.uint8)]))
    pos = bytes(good).rfind(b"\x2c")
    # image descriptor: widen the frame beyond the logical screen
    good[pos + 5 : pos + 7] = struct.pack("<H", 99)
    with pytest.raises(GifFormatError, match="outside the screen"):
        decode_gif(bytes(good))


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=300))
def test_random_bytes_never_crash_gif_decoder(payload):
    try:
        decode_gif(payload)
    except GifFormatError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=2000),
    st.integers(min_value=0, max_value=255),
)
def test_mutated_gif_fails_closed(cut, flip_to):
    rng = np.random.default_rng(6)
    frames = [rng.integers(0, 256, (8, 8), dtype=np.uint8)
              for _ in range(3)]
    good = encode_gif(frames)
    cut_at = min(cut, len(good) - 1)
    if cut_at < len(good) - 1:
        with pytest.raises(GifFormatError):
            decode_gif(good[:cut_at])
    mutated = bytearray(good)
    mutated[cut % len(good)] = flip_to
    try:
        out = decode_gif(bytes(mutated))
        assert isinstance(out["frames"], list)
    except GifFormatError:
        pass


def test_spark_gif_pipeline_end_to_end(spark):
    """attach -> decode -> per-frame stats, validated against a local
    numpy replay; GIF is lossless so everything is exact."""
    from nebuia_vector_db_spark.multimodal.assets import (
        attach_gif_assets,
        gif_frame_stats,
    )

    texts = [
        ("s" * 10, 1),                     # < 64 bytes -> dropped
        ("y" * 64, 2),                     # single frame (GCE still set)
        ("".join(chr(33 + (i % 80)) for i in range(170)), 3),
    ]
    docs = spark.createDataFrame(
        [(t, i) for t, i in texts], "text string, doc_id long"
    )
    got = (
        gif_frame_stats(attach_gif_assets(docs))
        .orderBy("doc_id", "frame_id")
        .collect()
    )
    expected = []
    for t, i in texts:
        b = np.frombuffer(t.encode(), dtype=np.uint8).astype(np.int64)
        if len(b) < 64:
            continue
        prev = None
        for k in range((len(b) - 64) // 48 + 1):
            w = b[k * 48 : k * 48 + 64]
            delta = 0.0 if prev is None else float(
                np.abs(w - prev).sum()) / 64.0
            expected.append(
                (i, k, 8, 8, 10, float(w.sum()) / 64.0, int(w.max()), delta)
            )
            prev = w
    assert len(got) == len(expected)
    for row, exp in zip(got, expected):
        assert (row.doc_id, row.frame_id, row.width, row.height,
                row.delay_cs) == exp[:5]
        assert row.frame_mean == exp[5]
        assert row.frame_max == exp[6]
        assert row.delta_mean == exp[7]


def test_per_frame_local_palettes_reported():
    """Round 6 (ADVICE r4): a frame with a local color table used to
    overwrite the single "palette" slot, so multi-palette GIFs
    reported only the LAST frame's colors. decode_gif now returns
    per-frame ``palettes`` (and ``palette`` = frame 0's)."""
    import struct

    f1 = (np.arange(8, dtype=np.uint8) % 4).reshape(2, 4)
    f2 = ((np.arange(8, dtype=np.uint8) + 1) % 4).reshape(2, 4)
    p_global = np.array(
        [[0, 0, 0], [85, 85, 85], [170, 170, 170], [255, 255, 255]],
        np.uint8,
    )
    p_local = p_global[::-1].copy()
    gif = bytearray(encode_gif([f1, f2], palette=p_global))
    # splice a local color table into the SECOND image descriptor:
    # set its local-table flag (depth bits) and insert the palette
    h, w = f1.shape
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    pos = gif.rfind(desc)
    assert pos > gif.find(desc) >= 0  # found the second frame's
    depth = 2  # 4 colors
    gif[pos + 9] = 0x80 | (depth - 1)
    gif[pos + 10 : pos + 10] = p_local.tobytes()
    out = decode_gif(bytes(gif))
    assert np.array_equal(out["palette"], p_global)
    assert np.array_equal(out["palettes"][0], p_global)
    assert np.array_equal(out["palettes"][1], p_local)
    # frames themselves are untouched index data
    assert np.array_equal(out["frames"][0], f1)
    assert np.array_equal(out["frames"][1], f2)
