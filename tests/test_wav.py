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


# --------------------------------------------------------- IMA ADPCM
def test_adpcm_snr_on_tonal_content():
    """IMA ADPCM (WAV format 0x11): 4 bits/sample at ~3.9x
    compression must stay within the codec's known quality envelope —
    >24 dB SNR on a two-tone signal, >30 dB on a slow sine."""
    import numpy as np

    from nebuia_vector_db_spark.multimodal.wav import (
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    t = np.arange(8000)
    two_tone = (
        12000 * np.sin(2 * np.pi * 440 * t / 8000)
        + 6000 * np.sin(2 * np.pi * 97 * t / 8000)
    ).astype(np.int16)
    slow = (14000 * np.sin(2 * np.pi * 40 * t / 8000)).astype(np.int16)
    for sig, floor_db in ((two_tone, 24.0), (slow, 30.0)):
        enc = encode_wav_adpcm(sig, 8000)
        rate, dec = decode_wav_adpcm(enc)
        assert rate == 8000 and len(dec) == len(sig)
        err = dec[:, 0].astype(np.float64) - sig
        snr = 10 * np.log10(
            (sig.astype(np.float64) ** 2).mean() / (err**2).mean()
        )
        assert snr > floor_db, (snr, floor_db)
        assert len(enc) < len(sig) * 2 / 3.5  # real compression


def test_adpcm_known_vector_and_determinism():
    """Pin the exact nibble stream of a tiny fixed signal (computed
    from the literal IMA spec state machine) — any drift in the
    quantizer/index arithmetic breaks this byte-for-byte."""
    import struct

    import numpy as np

    from nebuia_vector_db_spark.multimodal.wav import encode_wav_adpcm

    sig = np.array(
        [0, 200, 500, 300, -100, -800, -1500, -400, 0], dtype=np.int16
    )
    enc = encode_wav_adpcm(sig, 8000, samples_per_block=9)
    i = enc.find(b"data")
    size = struct.unpack_from("<I", enc, i + 4)[0]
    assert list(enc[i + 8 : i + 8 + size]) == [0, 0, 0, 0, 119, 247, 255, 19]
    assert encode_wav_adpcm(sig, 8000, samples_per_block=9) == enc


def test_adpcm_block_independence_and_fact_trim():
    """Blocks decode independently (each header restarts the
    predictor) and the fact chunk trims padding of the final
    partial block."""
    import numpy as np

    from nebuia_vector_db_spark.multimodal.wav import (
        decode_wav_adpcm,
        encode_wav_adpcm,
    )

    rng = np.random.default_rng(0)
    sig = rng.integers(-3000, 3000, 700, dtype=np.int16)  # 2 blocks, padded
    rate, dec = decode_wav_adpcm(encode_wav_adpcm(sig, 16000, 505))
    assert len(dec) == 700  # fact-trimmed, not 1010


def test_adpcm_fails_closed():
    import numpy as np
    import pytest

    from nebuia_vector_db_spark.multimodal.wav import (
        WavFormatError,
        decode_wav,
        decode_wav_adpcm,
        encode_wav,
        encode_wav_adpcm,
    )

    sig = np.arange(100, dtype=np.int16)
    enc = encode_wav_adpcm(sig, 8000)
    with pytest.raises(WavFormatError):
        decode_wav_adpcm(enc[:30])
    with pytest.raises(WavFormatError, match="not IMA ADPCM"):
        decode_wav_adpcm(encode_wav(sig, 8000))  # PCM into ADPCM decoder
    with pytest.raises(WavFormatError):
        decode_wav(enc)  # ADPCM into the PCM decoder
    with pytest.raises(WavFormatError, match="8\\*k"):
        encode_wav_adpcm(sig, 8000, samples_per_block=10)
    with pytest.raises(WavFormatError):
        encode_wav_adpcm(np.array([], dtype=np.int16), 8000)


def test_spark_audio_decode_sniffs_adpcm(spark):
    """decode_audio_real detects the fmt codec id and routes ADPCM
    payloads through the IMA decoder — PCM and ADPCM clips of the
    same signal coexist in one DataFrame and the ADPCM stats land
    within the codec's error envelope of the PCM truth."""
    import numpy as np
    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.multimodal.assets import decode_audio_real
    from nebuia_vector_db_spark.multimodal.wav import (
        encode_wav,
        encode_wav_adpcm,
    )

    t = np.arange(4000)
    sig = (10000 * np.sin(2 * np.pi * 50 * t / 8000)).astype(np.int16)
    rows = [
        (1, encode_wav(sig, 8000)),
        (2, encode_wav_adpcm(sig, 8000)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    assets = df.select(
        "doc_id", "payload",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(None).cast("int").alias("declared_width"),
            F.lit(None).cast("int").alias("declared_height"),
            F.lit(500).cast("long").alias("duration_ms"),
        ).alias("asset_meta"),
    )
    out = {r.doc_id: r for r in decode_audio_real(assets).collect()}
    assert out[1].n_samples == out[2].n_samples == 4000
    assert out[1].sample_rate == out[2].sample_rate == 8000
    # lossy but close: RMS within 3%, peak within 5%
    assert abs(out[2].rms - out[1].rms) / out[1].rms < 0.03
    assert abs(out[2].peak - out[1].peak) / out[1].peak < 0.05
