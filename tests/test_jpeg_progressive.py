"""Progressive JPEG (SOF2, T.81 Annex G) — spectral selection +
successive approximation, both directions.

The central invariant: the progressive encoder shares the baseline's
DCT/quantization front end and the decoder reconstructs the EXACT
quantized coefficients through a completely different entropy layer
(EOBn runs, ZRL-with-correction-bits, DC/AC refinement scans,
per-scan optimized Huffman tables) — so progressive decode must equal
baseline decode BIT-FOR-BIT on every image. Any protocol
mis-sequencing (the classic bugs: correction bits attached to the
wrong ZRL, EOB runs not flushed at restarts, point transform done as
an arithmetic shift on AC) breaks that equality on random inputs.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nebuia_vector_db_spark.multimodal.jpeg import (
    JpegFormatError,
    _build_huffman,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg_color,
    encode_jpeg_gray,
    encode_jpeg_progressive,
)


def _rand_img(seed, h, w, channels=0):
    rng = np.random.default_rng(seed)
    shape = (h, w) if channels == 0 else (h, w, channels)
    return rng.integers(0, 256, shape, dtype=np.uint8)


# ------------------------------------------------------------- equivalence
@settings(max_examples=25, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=1, max_value=64),
    st.integers(min_value=30, max_value=100),
)
def test_progressive_equals_baseline_gray(seed, h, w, q):
    img = _rand_img(seed, h, w)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_gray(img, q)),
        decode_jpeg(encode_jpeg_progressive(img, q)),
    )


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=0, max_value=10_000),
    st.integers(min_value=1, max_value=48),
    st.integers(min_value=1, max_value=48),
    st.integers(min_value=30, max_value=100),
    st.sampled_from(["420", "444"]),
)
def test_progressive_equals_baseline_color(seed, h, w, q, sub):
    img = _rand_img(seed, h, w, 3)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_color(img, q, subsampling=sub)),
        decode_jpeg(encode_jpeg_progressive(img, q, subsampling=sub)),
    )


def test_flat_image_maximal_eob_runs():
    """A constant image is all end-of-band blocks: the EOBn run length
    covers every block of each AC scan (r > 0 paths on both sides)."""
    flat = np.full((64, 96), 130, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_gray(flat, 80)),
        decode_jpeg(encode_jpeg_progressive(flat, 80)),
    )


def test_smooth_gradient_sparse_spectra():
    gy, gx = np.mgrid[0:48, 0:80]
    smooth = ((gy * 2 + gx) % 256).astype(np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_gray(smooth, 70)),
        decode_jpeg(encode_jpeg_progressive(smooth, 70)),
    )


def test_restart_markers_in_every_scan():
    """RSTn inside progressive scans: DC predictors and EOB runs
    reset at each interval, in gray and in both color layouts."""
    img = _rand_img(5, 33, 50)
    base = decode_jpeg(encode_jpeg_gray(img, 80))
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, 80, restart_interval=3)),
        base,
    )
    c = _rand_img(6, 33, 50, 3)
    for sub in ("420", "444"):
        assert np.array_equal(
            decode_jpeg(
                encode_jpeg_progressive(
                    c, 80, subsampling=sub, restart_interval=2
                )
            ),
            decode_jpeg(encode_jpeg_color(c, 80, subsampling=sub)),
        )


def test_custom_scan_scripts():
    img = _rand_img(9, 29, 41)
    base = decode_jpeg(encode_jpeg_gray(img, 85))
    # spectral selection only (no successive approximation)
    spectral = [([0], 0, 0, 0, 0), ([0], 1, 5, 0, 0),
                ([0], 6, 20, 0, 0), ([0], 21, 63, 0, 0)]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, 85, scans=spectral)), base
    )
    # deep successive-approximation chain (3 refinement passes)
    deep = [([0], 0, 0, 0, 3), ([0], 0, 0, 3, 2), ([0], 0, 0, 2, 1),
            ([0], 0, 0, 1, 0), ([0], 1, 63, 0, 3), ([0], 1, 63, 3, 2),
            ([0], 1, 63, 2, 1), ([0], 1, 63, 1, 0)]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(img, 85, scans=deep)), base
    )


# ---------------------------------------------------------------- huffman
def test_built_huffman_tables_are_valid_and_decodable():
    """K.2 builder output: length counts consistent, no code longer
    than 16, and the canonical code set is prefix-free."""
    rng = np.random.default_rng(0)
    for _ in range(20):
        freq = np.zeros(256, dtype=np.int64)
        syms = rng.choice(256, size=rng.integers(1, 100), replace=False)
        freq[syms] = rng.integers(1, 10_000, size=len(syms))
        bits, vals = _build_huffman(freq)
        assert len(bits) == 16 and sum(bits) == len(vals)
        assert set(vals) == set(int(s) for s in syms)
        codes = _canonical_codes(bits, vals)
        # prefix-free: no code is a prefix of another
        as_strings = sorted(
            format(c, f"0{l}b") for c, l in codes.values()
        )
        for a, b in zip(as_strings, as_strings[1:]):
            assert not b.startswith(a)
        # the all-ones maximal code must remain unused (T.81)
        maxlen = max(l for _, l in codes.values())
        assert format((1 << maxlen) - 1, f"0{maxlen}b") not in as_strings


def test_single_symbol_scan_builds_a_table():
    freq = np.zeros(256, dtype=np.int64)
    freq[0] = 17
    bits, vals = _build_huffman(freq)
    assert vals == [0] and sum(bits) == 1


# ------------------------------------------------------------- fail-closed
def test_progressive_validation_errors():
    img = _rand_img(1, 16, 16)
    with pytest.raises(JpegFormatError, match="single-component"):
        encode_jpeg_progressive(
            _rand_img(1, 16, 16, 3), 80, scans=[([0, 1], 1, 5, 0, 0)]
        )
    with pytest.raises(JpegFormatError, match="Se=0"):
        encode_jpeg_progressive(img, 80, scans=[([0], 0, 5, 0, 0)])


@settings(max_examples=80, deadline=None)
@given(
    st.integers(min_value=2, max_value=3000),
    st.integers(min_value=0, max_value=255),
)
def test_mutated_progressive_fails_closed(cut, flip_to):
    img = _rand_img(2, 17, 25)
    good = encode_jpeg_progressive(img, 80)
    cut_at = min(cut, len(good) - 1)
    if cut_at < len(good) - 2:
        with pytest.raises(JpegFormatError):
            decode_jpeg(good[:cut_at])
    mutated = bytearray(good)
    mutated[cut % len(good)] = flip_to
    try:
        out = decode_jpeg(bytes(mutated))
        assert isinstance(out, np.ndarray)
    except JpegFormatError:
        pass


def test_progressive_stream_through_spark_decode(spark):
    """A progressive stream attached as a binary asset decodes through
    the same decode_image_real mapInPandas kernel as baseline JPEG
    (magic-sniffed to decode_jpeg, which dispatches on SOF marker) —
    and, because both encoders share the quantization front end, the
    decoded stats are identical to the baseline stream's."""
    import pandas as pd
    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.multimodal.assets import decode_image_real

    imgs = {i: _rand_img(i, 24, 32) for i in range(1, 4)}

    def _assets(encoder):
        rows = [
            (i, encoder(img), "image/jpeg")
            for i, img in imgs.items()
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, payload binary, mime string"
        )
        return df.select(
            "doc_id", "payload",
            F.struct(
                F.col("mime"),
                F.lit(32).alias("declared_width"),
                F.lit(24).alias("declared_height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ).alias("asset_meta"),
        )

    base = decode_image_real(
        _assets(lambda im: encode_jpeg_gray(im, 85))
    ).orderBy("doc_id").collect()
    prog = decode_image_real(
        _assets(lambda im: encode_jpeg_progressive(im, 85))
    ).orderBy("doc_id").collect()
    assert len(base) == len(prog) == 3
    for rb, rp in zip(base, prog):
        assert rb.asDict() == rp.asDict()
