"""Baseline JPEG codec (multimodal/jpeg.py): DCT vs the literal T.81
definition, round-trip fidelity, marker handling, malformed rejection."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nebuia_vector_db_spark.multimodal.jpeg import (
    JpegFormatError,
    _dct2,
    _idct2,
    decode_jpeg_gray,
    encode_jpeg_gray,
    quality_qtable,
)


def _dct2_reference(block: np.ndarray) -> np.ndarray:
    """Four-loop transcription of the T.81 A.3.3 FDCT definition —
    validates the matrix form independently."""
    out = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8)
            cv = np.sqrt(1 / 8) if v == 0 else np.sqrt(2 / 8)
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[u, v] = cu * cv * s
    return out


def test_dct_matches_spec_definition():
    rng = np.random.default_rng(3)
    block = rng.uniform(-128, 127, size=(8, 8))
    np.testing.assert_allclose(
        _dct2(block), _dct2_reference(block), atol=1e-9
    )
    # and the inverse really inverts
    np.testing.assert_allclose(_idct2(_dct2(block)), block, atol=1e-9)


def test_flat_image_round_trips_exactly():
    img = np.full((16, 24), 130, dtype=np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img, 90))
    np.testing.assert_array_equal(dec, img)


@pytest.mark.parametrize("shape", [(8, 8), (33, 41), (64, 48), (5, 100)])
def test_round_trip_psnr(shape):
    rng = np.random.default_rng(7)
    # smooth-ish content: random low-frequency mixture
    y, x = np.mgrid[0 : shape[0], 0 : shape[1]]
    img = (
        128
        + 60 * np.sin(x / 9.0)
        + 50 * np.cos(y / 7.0)
        + rng.normal(0, 4, size=shape)
    ).clip(0, 255).astype(np.uint8)
    dec = decode_jpeg_gray(encode_jpeg_gray(img, 90))
    assert dec.shape == img.shape
    mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
    psnr = 10 * np.log10(255**2 / mse) if mse else 99.0
    assert psnr > 35.0, f"psnr {psnr:.1f} too low"


def test_quality_scales_size_and_error():
    y, x = np.mgrid[0:40, 0:40]
    img = (128 + 60 * np.sin(x / 5.0) * np.cos(y / 6.0)).astype(np.uint8)
    lo, hi = encode_jpeg_gray(img, 20), encode_jpeg_gray(img, 95)
    assert len(lo) < len(hi)
    err_lo = np.abs(
        decode_jpeg_gray(lo).astype(int) - img.astype(int)
    ).mean()
    err_hi = np.abs(
        decode_jpeg_gray(hi).astype(int) - img.astype(int)
    ).mean()
    assert err_hi < err_lo
    assert quality_qtable(50)[0, 0] == 16  # K.1 unscaled at q=50


def test_foreign_app_segments_are_skipped():
    img = np.full((8, 8), 99, dtype=np.uint8)
    payload = bytearray(encode_jpeg_gray(img, 90))
    # splice an APP1 (EXIF-style) segment right after SOI
    app1 = b"\xff\xe1" + struct.pack(">H", 8) + b"Exif\x00\x00"
    spliced = bytes(payload[:2]) + app1 + bytes(payload[2:])
    np.testing.assert_array_equal(decode_jpeg_gray(spliced), img)


def test_rejects_malformed():
    img = np.full((8, 8), 50, dtype=np.uint8)
    good = encode_jpeg_gray(img, 90)
    with pytest.raises(JpegFormatError):
        decode_jpeg_gray(b"\x00\x01" + good[2:])  # no SOI
    with pytest.raises(JpegFormatError):
        decode_jpeg_gray(good[:20])  # truncated before SOS
    # a BASELINE stream relabeled as SOF2 is still rejected (its SOS
    # carries Ss=0..Se=63, invalid for a progressive scan) — SOF2
    # itself is now fully supported, see test_jpeg_progressive.py
    prog = bytearray(good)
    idx = bytes(prog).find(b"\xff\xc0")
    prog[idx + 1] = 0xC2
    with pytest.raises(JpegFormatError, match="spectral"):
        decode_jpeg_gray(bytes(prog))
    # lossless (SOF3) stays out of scope and fails closed
    sof3 = bytearray(good)
    sof3[idx + 1] = 0xC3
    with pytest.raises(JpegFormatError, match="SOF0/SOF2"):
        decode_jpeg_gray(bytes(sof3))
    with pytest.raises(JpegFormatError):
        encode_jpeg_gray(np.zeros((0, 4), dtype=np.uint8))


def test_entropy_stream_byte_stuffing_round_trips():
    """Content tuned to produce 0xFF bytes in the entropy stream —
    the un-stuffing path must still round-trip."""
    rng = np.random.default_rng(11)
    for seed in range(5):
        img = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
        dec = decode_jpeg_gray(encode_jpeg_gray(img, 99))
        assert dec.shape == img.shape


def test_spark_jpeg_attach_and_real_decode(spark, sf_smoke):
    """End-to-end through the engine surface: text -> real JPEG bytes
    -> sniffed decode -> stats from decoded pixels. Lossy codec, so
    stats are tolerance-checked against the source bytes."""
    from nebuia_vector_db_spark.multimodal.assets import (
        attach_jpeg_assets,
        decode_image_real,
    )
    from nebuia_vector_db_spark.sources.registry import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(12)
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    decoded = decode_image_real(attach_jpeg_assets(docs, width=32)).collect()
    assert len(decoded) == len([t for t in src.values() if t])
    for r in decoded:
        b = src[r["doc_id"]].encode("utf-8")
        import math

        h = math.ceil(len(b) / 32)
        assert (r["width"], r["height"]) == (32, h)
        buf = np.zeros(h * 32)
        buf[: len(b)] = np.frombuffer(b, dtype=np.uint8)
        assert abs(r["mean_px"] - buf.mean()) < 3.0  # lossy tolerance


def test_restart_markers_round_trip():
    """DRI + RSTn: byte-aligned entropy segments with DC reset — the
    resync mechanism parallel decoders rely on. Exact on flat-block
    q=100 content and PSNR-clean on random content, across intervals
    that do and don't divide the MCU count."""
    rng = np.random.default_rng(5)
    # exact path: constant 8x8 blocks at q=100
    grid = rng.integers(0, 256, size=(6, 7), dtype=np.uint8)
    img = np.kron(grid, np.ones((8, 8), dtype=np.uint8))
    for interval in (1, 4, 5, 42):
        dec = decode_jpeg_gray(
            encode_jpeg_gray(img, quality=100, restart_interval=interval)
        )
        np.testing.assert_array_equal(dec, img)
    # lossy path: random content, many 0xFF-prone segments
    noisy = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)
    dec = decode_jpeg_gray(
        encode_jpeg_gray(noisy, quality=95, restart_interval=3)
    )
    assert dec.shape == noisy.shape
    ref = decode_jpeg_gray(encode_jpeg_gray(noisy, quality=95))
    np.testing.assert_array_equal(dec, ref)  # restarts change nothing


# ------------------------------------------------------------------- color
def test_color_flat_patches_round_trip_exactly():
    """Flat 16x16 color patches at q=100: every DCT is DC-only and
    every quant step is 1, and the 2x2 chroma box filter averages a
    constant — so BOTH 4:2:0 and 4:4:4 round-trip bit-exactly. This is
    the reference-pixel validation that needs no external decoder."""
    import numpy as np

    from nebuia_vector_db_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(42)
    tiles = rng.integers(0, 256, size=(3, 5, 3), dtype=np.uint8)
    img = tiles.repeat(16, axis=0).repeat(16, axis=1)
    for sub in ("420", "444"):
        dec = decode_jpeg(encode_jpeg_color(img, 100, subsampling=sub))
        np.testing.assert_array_equal(dec, img)


def test_color_gradient_psnr_and_subsampling_tradeoff():
    import numpy as np

    from nebuia_vector_db_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    yy, xx = np.mgrid[0:64, 0:80]
    img = np.stack(
        [(yy * 2) % 256, (xx * 3) % 256, (yy + xx) % 256], axis=-1
    ).astype(np.uint8)

    def psnr(sub):
        dec = decode_jpeg(encode_jpeg_color(img, 90, subsampling=sub))
        mse = np.mean((dec.astype(float) - img.astype(float)) ** 2)
        return 10 * np.log10(255**2 / mse)

    p420, p444 = psnr("420"), psnr("444")
    assert p420 > 35.0
    assert p444 > p420, "4:4:4 must beat 4:2:0 on chroma-detailed input"
    # 4:2:0 spends fewer bytes on the same image
    b420 = len(encode_jpeg_color(img, 90, subsampling="420"))
    b444 = len(encode_jpeg_color(img, 90, subsampling="444"))
    assert b420 < b444


def test_color_odd_dimensions_and_restart_markers():
    import numpy as np

    from nebuia_vector_db_spark.multimodal.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    enc_rst = encode_jpeg_color(img, 95, subsampling="420", restart_interval=3)
    enc = encode_jpeg_color(img, 95, subsampling="420")
    assert b"\xff\xdd" in enc_rst  # DRI present
    a, b = decode_jpeg(enc_rst), decode_jpeg(enc)
    assert a.shape == img.shape
    np.testing.assert_array_equal(a, b)  # resync path decodes identically


def test_color_convert_matches_literal_jfif_formulas():
    import numpy as np

    from nebuia_vector_db_spark.multimodal.jpeg import (
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    rng = np.random.default_rng(9)
    x = rng.integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    y, cb, cr = rgb_to_ycbcr(x)
    for i in range(4):
        for j in range(6):
            r, g, b = (float(v) for v in x[i, j])
            assert abs(y[i, j] - (0.299 * r + 0.587 * g + 0.114 * b)) < 1e-9
            assert (
                abs(cb[i, j] - (-0.168735892 * r - 0.331264108 * g + 0.5 * b + 128))
                < 1e-9
            )
            assert (
                abs(cr[i, j] - (0.5 * r - 0.418687589 * g - 0.081312411 * b + 128))
                < 1e-9
            )
    # inverse transform recovers the input (pre-quantization)
    back = ycbcr_to_rgb(y, cb, cr)
    assert np.abs(back.astype(int) - x.astype(int)).max() <= 1


def test_gray_decode_of_color_stream_returns_luma():
    import numpy as np

    from nebuia_vector_db_spark.multimodal.jpeg import (
        decode_jpeg,
        decode_jpeg_gray,
        encode_jpeg_color,
        rgb_to_ycbcr,
    )

    img = np.full((16, 16, 3), [200, 30, 90], dtype=np.uint8)
    enc = encode_jpeg_color(img, 100)
    g = decode_jpeg_gray(enc)
    assert g.shape == (16, 16)
    y, _, _ = rgb_to_ycbcr(decode_jpeg(enc))
    np.testing.assert_array_equal(
        g, np.clip(np.round(y), 0, 255).astype(np.uint8)
    )
