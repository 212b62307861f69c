"""WAV codec (multimodal/wav.py) + the real audio decode path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nebuia_vector_db_spark.multimodal.wav import (
    WavFormatError,
    decode_wav,
    encode_wav,
)


def test_round_trip_mono():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32768, size=1001, dtype=np.int16)
    payload = encode_wav(samples, 16000)
    rate, decoded = decode_wav(payload)
    assert rate == 16000
    assert decoded.shape == (1001, 1)
    np.testing.assert_array_equal(decoded[:, 0], samples)


def test_round_trip_stereo():
    rng = np.random.default_rng(8)
    samples = rng.integers(-32768, 32768, size=(500, 2), dtype=np.int16)
    rate, decoded = decode_wav(encode_wav(samples, 44100))
    assert rate == 44100
    np.testing.assert_array_equal(decoded, samples)


def test_odd_data_size_is_word_aligned():
    # 1 frame of mono = 2 bytes (even), so force oddness via a foreign
    # chunk; the encoder itself always emits even data, but the decoder
    # must honour pad bytes after odd-size foreign chunks.
    samples = np.array([123, -456], dtype=np.int16)
    base = encode_wav(samples, 8000)
    # splice an odd-size foreign chunk (5 bytes + pad) after "WAVE"
    foreign = b"JUNK" + struct.pack("<I", 5) + b"abcde" + b"\x00"
    body = base[12:]
    spliced = b"RIFF" + struct.pack("<I", 4 + len(foreign) + len(body)) + b"WAVE" + foreign + body
    rate, decoded = decode_wav(spliced)
    assert rate == 8000
    np.testing.assert_array_equal(decoded[:, 0], samples)


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],  # truncated header
        lambda b: b"RIFX" + b[4:],  # bad magic
        lambda b: b[:8] + b"EVAW" + b[12:],  # bad form type
        lambda b: b[: len(b) - 4],  # truncated data chunk
    ],
)
def test_rejects_malformed(mutate):
    payload = encode_wav(np.array([1, 2, 3], dtype=np.int16), 8000)
    with pytest.raises(WavFormatError):
        decode_wav(bytes(mutate(payload)))


def test_rejects_non_pcm16():
    payload = bytearray(encode_wav(np.array([1], dtype=np.int16), 8000))
    # bits-per-sample field lives at offset 12+8+14 in the canonical layout
    struct.pack_into("<H", payload, 34, 8)
    with pytest.raises(WavFormatError, match="bits=8"):
        decode_wav(bytes(payload))


def test_spark_attach_and_decode_real(spark, sf_smoke):
    from nebuia_vector_db_spark.multimodal.assets import (
        attach_wav_assets,
        decode_audio_real,
    )
    from nebuia_vector_db_spark.sources.registry import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(10)
    decoded = decode_audio_real(attach_wav_assets(docs, rate=8000))
    rows = {r["doc_id"]: r for r in decoded.collect()}
    assert rows
    for doc_id, r in rows.items():
        n = doc_id % 400 + 100
        i = np.arange(n, dtype=np.int64)
        x = (doc_id * 7919 + i * 104729) % 65536 - 32768
        assert r["sample_rate"] == 8000
        assert r["n_samples"] == n
        assert r["duration_ms"] == n * 1000 // 8000
        assert r["peak"] == int(np.abs(x).max())
        assert r["mean_sample"] == pytest.approx(x.mean(), abs=1e-9)
        assert r["rms"] == pytest.approx(
            float(np.sqrt((x * x).mean())), abs=1e-9
        )
