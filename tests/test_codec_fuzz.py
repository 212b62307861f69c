"""Adversarial-input robustness for the three real codecs: arbitrary
bytes (including truncations/mutations of valid streams) must raise
the codec's typed error — never crash, hang, or mis-decode silently —
because at 100 TB a corrupt payload WILL occur and a decoder that
segfaults a Python worker takes the whole task with it."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nebuia_vector_db_spark.multimodal.jpeg import (
    JpegFormatError,
    decode_jpeg_gray,
    encode_jpeg_gray,
)
from nebuia_vector_db_spark.multimodal.png import decode_png, encode_png
from nebuia_vector_db_spark.multimodal.wav import (
    WavFormatError,
    decode_wav,
    encode_wav,
)


@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_never_crash_decoders(payload):
    for decode, errs in (
        (decode_jpeg_gray, (JpegFormatError,)),
        (decode_wav, (WavFormatError,)),
        (decode_png, (ValueError,)),  # png raises its own ValueError family
    ):
        try:
            decode(payload)
        except errs:
            pass  # clean rejection is the contract


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=800),
    st.integers(min_value=0, max_value=255),
    st.integers(min_value=0, max_value=3),
)
def test_mutated_valid_streams_fail_closed(cut, flip_to, which):
    """Truncate a VALID stream at an arbitrary point / flip one byte:
    the decoder either raises its typed error or returns a
    well-formed result (flips inside pixel/sample data legitimately
    decode) — anything else (crash, hang, wrong type) fails."""
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    samples = np.arange(-50, 50, dtype=np.int16)
    good = [
        encode_jpeg_gray(img, 90),
        encode_wav(samples, 8000),
        encode_png(img),
    ][which % 3]
    decode, errs = [
        (decode_jpeg_gray, (JpegFormatError,)),
        (decode_wav, (WavFormatError,)),
        (decode_png, (ValueError,)),
    ][which % 3]

    cut_at = min(cut, len(good) - 1)
    truncated = good[:cut_at]
    if cut_at < len(good) - 2:
        # real truncation must raise; losing only the 2-byte trailer
        # (JPEG EOI) leaves a complete payload many decoders accept
        with pytest.raises(errs):
            decode(bytes(truncated))
    else:
        try:
            decode(bytes(truncated))
        except errs:
            pass

    mutated = bytearray(good)
    mutated[cut % len(good)] = flip_to
    try:
        out = decode(bytes(mutated))
        assert isinstance(out, (tuple, np.ndarray))
    except errs:
        pass


@settings(max_examples=60, deadline=None)
@given(st.binary(min_size=0, max_size=400))
def test_random_bytes_never_crash_color_decoder(payload):
    from nebuia_vector_db_spark.multimodal.jpeg import decode_jpeg

    try:
        decode_jpeg(payload)
    except JpegFormatError:
        pass


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=2000),
    st.integers(min_value=0, max_value=255),
    st.sampled_from(["420", "444"]),
)
def test_mutated_color_jpeg_fails_closed(cut, flip_to, sub):
    """Truncations / single-byte flips of a valid COLOR stream either
    raise JpegFormatError or decode to a well-formed (h, w, 3) array
    (flips inside entropy data legitimately decode to wrong pixels)."""
    from nebuia_vector_db_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    img = (
        np.arange(16 * 24 * 3, dtype=np.uint8)
        .reshape(16, 24, 3)
    )
    good = encode_jpeg_color(img, 90, subsampling=sub)

    cut_at = min(cut, len(good) - 1)
    if cut_at < len(good) - 2:
        with pytest.raises(JpegFormatError):
            decode_jpeg(bytes(good[:cut_at]))
    mutated = bytearray(good)
    mutated[cut % len(good)] = flip_to
    try:
        out = decode_jpeg(bytes(mutated))
        assert isinstance(out, np.ndarray)
        assert out.ndim in (2, 3)
    except JpegFormatError:
        pass


# ---------------------------------------------------------------- MP2
@settings(max_examples=120, deadline=None)
@given(st.binary(min_size=0, max_size=600))
def test_random_bytes_never_crash_mp2_decoder(payload):
    from nebuia_vector_db_spark.multimodal.mpegaudio import (
        Mp2FormatError,
        decode_mp2,
    )

    try:
        decode_mp2(payload)
    except Mp2FormatError:
        pass  # clean rejection is the contract


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=2000),
    st.integers(min_value=0, max_value=255),
)
def test_mutated_valid_mp2_stream_fails_closed(pos, flip_to):
    """Flip one byte anywhere in a valid Layer II stream (or truncate
    there): the decoder must raise Mp2FormatError or return decoded
    frames with in-range fields — flips inside the sample-code region
    legitimately decode to different codes, but never crash or emit a
    code outside its class range (the range checks are part of the
    parse)."""
    import random as _random

    from nebuia_vector_db_spark.multimodal.mpegaudio import (
        Mp2FormatError,
        decode_mp2,
    )
    from tests.test_mpegaudio import _random_frame

    rng = _random.Random(11)
    data = bytearray(
        b"".join(
            __import__(
                "nebuia_vector_db_spark.multimodal.mpegaudio",
                fromlist=["encode_mp2_frame"],
            ).encode_mp2_frame(_random_frame(rng))
            for _ in range(2)
        )
    )
    pos = pos % len(data)
    # truncation
    try:
        decode_mp2(bytes(data[:pos]))
    except Mp2FormatError:
        pass
    # single-byte flip
    data[pos] = flip_to
    try:
        frames = decode_mp2(bytes(data))
    except Mp2FormatError:
        return
    for fr in frames:
        coded = [sb for sb in range(27) if fr.allocation[sb]]
        assert len(fr.codes) == len(coded)
        for pos_, sb in enumerate(coded):
            steps = fr.allocation[sb]
            assert all(0 <= v < steps for v in fr.codes[pos_])
            assert all(0 <= i < 63 for i in fr.scf_idx[pos_])
