"""FLAC subset codec (multimodal/flac.py): bit-lossless round trips,
compression on predictable signals, fail-closed malformed handling,
decoder coverage for spec features the encoder doesn't emit
(partition orders > 0, escape partitions), and the Spark end-to-end
attach -> decode path."""

from __future__ import annotations

import numpy as np
import pytest

from nebuia_vector_db_spark.multimodal import flac
from nebuia_vector_db_spark.multimodal.flac import (
    FlacFormatError,
    decode_flac,
    encode_flac,
)


def _cases():
    rng = np.random.default_rng(42)
    return {
        "tone": (
            np.sin(2 * np.pi * 440 * np.arange(2000) / 8000) * 12000
        ).astype(np.int16),
        "noise": rng.integers(-32768, 32768, 1500).astype(np.int16),
        "ramp": np.arange(-500, 700, dtype=np.int16),
        "const": np.full(300, -123, dtype=np.int16),
        "tiny": np.array([1, -2, 3], dtype=np.int16),
        "empty": np.zeros(0, dtype=np.int16),
        "extremes": np.array([-32768, 32767] * 64, dtype=np.int16),
    }


def test_roundtrip_bit_exact_all_signal_classes():
    for name, pcm in _cases().items():
        enc = encode_flac(pcm, 8000, block_size=256)
        sr, dec = decode_flac(enc)
        assert sr == 8000
        assert np.array_equal(dec, pcm), name


def test_compression_on_predictable_signals():
    ramp = np.arange(-500, 700, dtype=np.int16)
    enc = encode_flac(ramp, 8000, block_size=256)
    assert len(enc) < len(ramp) * 2 / 4  # > 4x on piecewise-linear
    tone = (
        np.sin(2 * np.pi * 440 * np.arange(4000) / 8000) * 12000
    ).astype(np.int16)
    assert len(encode_flac(tone, 8000)) < 4000 * 2 / 1.3  # > 1.3x


def test_malformed_streams_rejected():
    pcm = np.arange(-100, 100, dtype=np.int16)
    enc = bytearray(encode_flac(pcm, 8000, block_size=64))
    with pytest.raises(FlacFormatError):
        decode_flac(b"fLaX" + bytes(enc[4:]))
    with pytest.raises(FlacFormatError):
        decode_flac(bytes(enc[: len(enc) // 2]))  # truncated
    # flip one PCM-carrying bit near the end: a frame CRC-16 (or the
    # reconstruction MD5) must catch it
    bad = bytearray(enc)
    bad[-3] ^= 0x10
    with pytest.raises(FlacFormatError):
        decode_flac(bytes(bad))


def test_decoder_handles_partitioned_and_escape_residuals():
    """Hand-build subframe payloads for spec features the encoder
    never emits: partition order 1 and the 0b1111 escape (raw n-bit
    residuals)."""
    # order-0 fixed subframe, bs=8, partition order 1 (two partitions)
    w = flac._BitWriter()
    w.write(0, 1)
    w.write(0b001000, 6)  # FIXED order 0
    w.write(0, 1)
    w.write(0b00, 2)  # rice, 4-bit params
    w.write(1, 4)  # partition order 1
    vals = [0, 1, -1, 2, 3, -3, 4, -4]
    zz = [(v << 1) if v >= 0 else ((-v << 1) - 1) for v in vals]
    w.write(1, 4)  # k=1 for first partition
    for u in zz[:4]:
        w.write_unary(u >> 1)
        w.write(u & 1, 1)
    w.write(0b1111, 4)  # escape for second partition
    w.write(5, 5)  # raw 5-bit residuals
    for v in vals[4:]:
        w.write(v & 0x1F, 5)
    w.align()
    r = flac._BitReader(bytes(w.out))
    out = flac._decode_subframe(r, 8)
    assert list(out) == vals


def test_spark_attach_decode_end_to_end(spark, sf_smoke):
    from nebuia_vector_db_spark.multimodal.assets import (
        attach_flac_assets,
        decode_audio_flac,
    )
    from nebuia_vector_db_spark.sources.registry import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    got = decode_audio_flac(attach_flac_assets(docs)).collect()
    assert len(got) == 40
    for r in got:
        doc = r["doc_id"]
        n = doc % 300 + 150
        i = np.arange(n, dtype=np.int64)
        x = ((doc * 7 + i) % 256) * 256 - 32768
        assert r["n_samples"] == n
        assert r["peak"] == int(np.abs(x).max())
        assert r["mean_sample"] == pytest.approx(x.sum() / n)
        # the sawtooth genuinely compresses through the fixed predictors
        assert r["compression_x"] > 1.5


def test_lpc_subframes_win_on_autoregressive_signals():
    """A near-AR(1) signal is where FIXED polynomial predictors lose
    to real LPC: the encoder must pick LPC (bit cost) and the decoder
    must reconstruct exactly; disabling LPC (by checking the stream
    contains an LPC subframe type) guards against silent fallback."""
    rng = np.random.default_rng(7)
    ar = np.zeros(3000)
    for i in range(1, 3000):
        ar[i] = 0.95 * ar[i - 1] + rng.normal() * 500
    pcm = np.clip(ar, -32768, 32767).astype(np.int16)
    enc = encode_flac(pcm, 8000, block_size=256)
    sr, dec = decode_flac(enc)
    assert np.array_equal(dec, pcm)
    assert len(enc) < len(pcm) * 2 / 1.25  # > 1.25x on AR(1)
    # the LPC machinery itself: quantized Levinson-Durbin predictor,
    # integer residuals, exact reconstruction
    blk = pcm[:256].astype(np.int64)
    a = flac._lpc_coeffs(blk, 8)
    q, shift = flac._quantize_lpc(a, 12)
    res = flac._lpc_residual(blk, q, shift)
    assert np.array_equal(
        flac._lpc_restore(res, list(blk[:8]), list(q), shift), blk
    )
    # LPC residuals are materially smaller than the best FIXED ones
    fixed_best = min(
        int(np.abs(flac._fixed_residual(blk, o)).sum())
        for o in range(5)
    )
    assert int(np.abs(res).sum()) < fixed_best


def test_roundtrip_property_random_signals():
    """Hypothesis-style fuzz (deterministic seeds): random int16
    signals of random lengths and block sizes must roundtrip
    bit-exact — the lossless invariant across the CONSTANT/VERBATIM/
    FIXED/LPC/partitioning decision space."""
    rng = np.random.default_rng(1234)
    for trial in range(30):
        n = int(rng.integers(0, 900))
        kind = trial % 3
        if kind == 0:
            pcm = rng.integers(-32768, 32768, n).astype(np.int16)
        elif kind == 1:  # smooth: random walk (LPC/FIXED territory)
            pcm = np.clip(
                np.cumsum(rng.integers(-300, 301, n)), -32768, 32767
            ).astype(np.int16)
        else:  # blocky: long constant runs
            pcm = np.repeat(
                rng.integers(-32768, 32768, max(n // 50, 1)), 50
            )[:n].astype(np.int16)
        bs = int(rng.choice([32, 64, 128, 256, 4096]))
        enc = encode_flac(pcm, 8000, block_size=bs)
        sr, dec = decode_flac(enc)
        assert sr == 8000
        assert np.array_equal(dec, pcm), (trial, n, bs)
