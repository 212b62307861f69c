"""Pure-stdlib PNG codec tests (multimodal/png.py) + the Spark-side
real-decode path (decode_image_real / attach_png_assets).

The checked-in fixture ``tests/fixtures/filtered_sample.png`` was
produced by an INDEPENDENT forward-filtering implementation (every
row cycles through filter types 0..4), so decoding it cross-checks
the library's unfiltering rather than round-tripping its own encoder.
"""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from nebuia_vector_db_spark.multimodal.png import (
    PNG_SIGNATURE,
    decode_png,
    encode_png,
)

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


# ---------------------------------------------------------- codec unit tests


def test_decode_checked_in_png_with_all_filter_types():
    data = open(os.path.join(FIXTURES, "filtered_sample.png"), "rb").read()
    expected = np.load(
        os.path.join(FIXTURES, "filtered_sample_pixels.npy")
    )
    w, h, px = decode_png(data)
    assert (w, h) == (13, 20)
    assert px.shape == (20, 13, 3)
    assert (px == expected).all()


@pytest.mark.parametrize("nch", [1, 2, 3, 4])
def test_encode_decode_roundtrip(nch):
    rng = np.random.default_rng(nch)
    img = rng.integers(0, 256, size=(7, 11, nch), dtype=np.uint8)
    w, h, px = decode_png(encode_png(img))
    assert (w, h) == (11, 7)
    assert (px == img).all()


def test_grayscale_2d_input():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    w, h, px = decode_png(encode_png(img))
    assert (w, h) == (8, 8)
    assert (px[:, :, 0] == img).all()


def test_palette_decode():
    # hand-built color-type-3 PNG: 2x2, palette of 3 colors
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    raw = bytes([0, 0, 1, 0, 2, 1])  # two rows, filter 0, indices
    idat = zlib.compress(raw)

    def chunk(ct, body):
        return (
            struct.pack(">I", len(body))
            + ct
            + body
            + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF)
        )

    png = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
    w, h, px = decode_png(png)
    assert (w, h) == (2, 2)
    assert (px[0, 0] == [255, 0, 0]).all()
    assert (px[0, 1] == [0, 255, 0]).all()
    assert (px[1, 0] == [0, 0, 255]).all()
    assert (px[1, 1] == [0, 255, 0]).all()


def test_bad_signature_rejected():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + b"\x00" * 32)


def test_corrupt_crc_rejected():
    data = bytearray(encode_png(np.zeros((4, 4), dtype=np.uint8)))
    data[-5] ^= 0xFF  # flip a byte inside IEND's CRC
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(data))


def test_corrupt_pixel_data_rejected():
    img = np.full((4, 4), 7, dtype=np.uint8)
    data = bytearray(encode_png(img))
    # flip a byte inside IDAT's body (after the 8-byte sig + 25-byte
    # IHDR chunk + 8-byte IDAT header) — CRC must catch it
    data[8 + 25 + 8 + 2] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(data))


def test_truncated_rejected():
    data = encode_png(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        decode_png(data[: len(data) // 2])


def test_interlaced_rejected():
    def chunk(ct, body):
        return (
            struct.pack(">I", len(body))
            + ct
            + body
            + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF)
        )

    raw = zlib.compress(bytes([0, 1]))
    png = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 1))
        + chunk(b"IDAT", raw)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="Adam7"):
        decode_png(png)


def test_sixteen_bit_rejected():
    def chunk(ct, body):
        return (
            struct.pack(">I", len(body))
            + ct
            + body
            + struct.pack(">I", zlib.crc32(ct + body) & 0xFFFFFFFF)
        )

    png = (
        PNG_SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes([0, 0, 1])))
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="depth"):
        decode_png(png)


# ------------------------------------------------------- Spark-side decode


def test_attach_png_assets_roundtrip_spark(spark, sf_smoke):
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(20)
    from nebuia_vector_db_spark.multimodal.assets import (
        attach_png_assets,
        decode_image_real,
    )

    assets = attach_png_assets(docs)
    decoded = decode_image_real(assets).collect()
    src = {
        r["doc_id"]: r["text"].encode("utf-8")
        for r in docs.select("doc_id", "text").collect()
        if r["text"]
    }
    assert len(decoded) == len(src)
    for row in decoded:
        b = src[row["doc_id"]]
        h = -(-len(b) // 32)
        assert row["width"] == 32
        assert row["height"] == h
        assert row["n_pixels"] == 32 * h
        # pixels ARE the text bytes zero-padded to the pixel count
        assert row["max_px"] == max(b)
        assert row["mean_px"] == pytest.approx(sum(b) / (32 * h))


def test_decode_image_real_is_real_png_bytes(spark, sf_smoke):
    """The payloads attach_png_assets emits are genuine PNG files —
    signature + chunk walk + CRCs all validate."""
    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet").limit(3)
    from nebuia_vector_db_spark.multimodal.assets import attach_png_assets

    payloads = [
        bytes(r["payload"])
        for r in attach_png_assets(docs).select("payload").collect()
    ]
    assert payloads
    for data in payloads:
        assert data[:8] == PNG_SIGNATURE
        w, h, px = decode_png(data)  # full CRC-validated decode
        assert w == 32 and h >= 1 and px.shape == (h, 32, 1)
