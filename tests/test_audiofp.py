"""Acoustic fingerprint near-dup (operators/audiofp.py, round 11 —
VERDICT r10 task #3): kernel exactness against a from-scratch
pure-Python reference, lossless re-encode invariance (WAV ↔ FLAC ↔
raw PCM must collide at hamming 0), the lossy IMA-ADPCM envelope
(tonal signals within hamming ≤ 3, distinct signals far), and the
Spark end-to-end pair pipeline shared with dedup_dhash. The
`dedup_audiofp` registry row additionally hash-certifies the whole
pipeline against a DuckDB replay."""

from __future__ import annotations

import numpy as np
import pytest

from nebuia_vector_db_spark.multimodal.flac import encode_flac
from nebuia_vector_db_spark.multimodal.wav import (
    encode_wav,
    encode_wav_adpcm,
)
from nebuia_vector_db_spark.operators.audiofp import (
    HALF_PERIODS,
    T_BLOCKS,
    audio_fingerprint_bands,
    decode_pcm_any,
    fingerprint_bands,
)


def _ref_fp(samples) -> list[int]:
    """From-scratch reference: plain Python ints, no numpy — the
    independent re-derivation of the documented arithmetic
    (block t = (i*T)//n; square-wave correlation; energy c²;
    bit = E·16 > ΣE)."""
    x = [int(v) for v in samples]
    n = len(x)
    words = []
    for t in range(T_BLOCKS):
        e = []
        for h in HALF_PERIODS:
            c = sum(
                x[i] * (1 - 2 * ((i // h) % 2))
                for i in range(n)
                if (i * T_BLOCKS) // n == t
            )
            e.append(c * c)
        tot = sum(e)
        words.append(
            sum(
                1 << b
                for b in range(len(HALF_PERIODS))
                if e[b] * len(HALF_PERIODS) > tot
            )
        )
    return words


def _ham(a, b) -> int:
    return sum(bin(x ^ y).count("1") for x, y in zip(a, b))


def _saw(key: int) -> np.ndarray:
    """The attach_audio_dup_assets generator, reproduced."""
    n = key % 200 + 120
    i = np.arange(n, dtype=np.int64)
    return (((key * 37 + i * (key + 2)) % 256) * 256 - 32768).astype(
        np.int16
    )


def _triangle(key: int, n: int = 2000, amp: int = 8000) -> np.ndarray:
    """Smooth tonal signal inside ADPCM's tracking envelope: a
    triangle wave of period 64·(key+1) samples."""
    i = np.arange(n)
    p = 64 * (key + 1)
    tri = np.abs((i % p) - p / 2) / (p / 2) * 2 - 1
    return (tri * amp).astype(np.int16)


def test_kernel_matches_pure_python_reference():
    rng = np.random.default_rng(7)
    for n in (7, 120, 319, 1000):
        x = rng.integers(-32768, 32768, size=n).astype(np.int16)
        assert fingerprint_bands(x) == _ref_fp(x), n
    # and the fixture generator's signals
    for key in (0, 3, 41, 126):
        assert fingerprint_bands(_saw(key)) == _ref_fp(_saw(key))


def test_words_are_16bit_and_short_clips_rejected():
    x = np.array([5, -5, 7, -7, 9, -9], dtype=np.int16)
    words = fingerprint_bands(x)
    assert len(words) == 4 and all(0 <= w < 65536 for w in words)
    with pytest.raises(ValueError):
        fingerprint_bands(np.array([1, 2, 3], dtype=np.int16))


def test_lossless_reencode_collides_exactly():
    """WAV and FLAC of the same signal decode to identical PCM, so
    the fingerprints must be bit-identical — for every fixture key
    shape, not just a lucky one."""
    for key in (0, 5, 13, 40, 126):
        s = _saw(key)
        fp_raw = fingerprint_bands(s)
        r_wav, m_wav = decode_pcm_any(encode_wav(s, 8000))
        r_flac, m_flac = decode_pcm_any(
            encode_flac(s, 8000, block_size=128)
        )
        assert r_wav == r_flac == 8000
        assert np.array_equal(m_wav, s) and np.array_equal(m_flac, s)
        assert fingerprint_bands(m_wav) == fp_raw
        assert fingerprint_bands(m_flac) == fp_raw


def test_adpcm_reencode_within_envelope_distinct_far():
    """IMA ADPCM is lossy; for tonal signals inside its tracking
    envelope the fingerprint must survive within the blocking
    radius (hamming ≤ 3 ⇒ ≥ 1 identical band ⇒ pair still found),
    while distinct signals stay far apart."""
    fps = {}
    for key in range(6):
        s = _triangle(key)
        _, adpcm = decode_pcm_any(encode_wav_adpcm(s, 8000))
        h = _ham(fingerprint_bands(s), fingerprint_bands(adpcm))
        assert h <= 3, (key, h)
        fps[key] = fingerprint_bands(s)
    for a in range(6):
        for b in range(a + 1, 6):
            assert _ham(fps[a], fps[b]) > 3, (a, b)


def test_cross_key_separation_of_fixture_corpus():
    """Distinct signal keys (distinct sawtooth slopes) must not fall
    inside the max_hamming=3 blocking radius — the property that
    keeps the registry row's pair list duplicate-driven."""
    fps = [fingerprint_bands(_saw(k)) for k in range(0, 127, 7)]
    for a in range(len(fps)):
        for b in range(a + 1, len(fps)):
            assert _ham(fps[a], fps[b]) > 3, (a, b)


def test_spark_end_to_end_pairs(spark):
    """Planted WAV↔FLAC duplicates through the full distributed path:
    decode → fingerprint → band blocking → XOR+POPCNT verify, with
    pair recall 1.0 on the planted set and hamming 0 for every
    lossless re-encode pair."""
    from nebuia_vector_db_spark.multimodal.assets import (
        attach_audio_dup_assets,
    )
    from nebuia_vector_db_spark.operators.imagehash import (
        hash_band_pairs,
    )

    docs = spark.range(0, 60).select(F_col_id())
    assets = attach_audio_dup_assets(docs, n_keys=20)
    hashed = audio_fingerprint_bands(assets)
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hash_band_pairs(hashed, max_hamming=3).collect()
    }
    # every same-key pair (keys 0..19, docs 0..59 → 3 docs/key) is
    # found at hamming 0; doc parity differs within each triple, so
    # WAV↔FLAC pairs are present by construction
    want = {
        (a, b)
        for a in range(60)
        for b in range(a + 1, 60)
        if a % 20 == b % 20
    }
    assert want <= set(got)
    assert all(got[p] == 0 for p in want)
    # n_samples survives the decode (metadata sanity)
    ns = {
        r["doc_id"]: r["n_samples"] for r in hashed.collect()
    }
    assert ns[0] == (0 % 20) % 200 + 120


def F_col_id():
    from pyspark.sql import functions as F

    return F.col("id").alias("doc_id")


# ---------------------------------------------------------------- props
def test_fingerprint_algebraic_invariances():
    """Hypothesis properties of the kernel: (a) positive integer gain
    scales every correlation by c, every energy by c², so the
    cross-multiplied bits — and the fingerprint — are invariant;
    (b) polarity inversion (x → −x) flips every correlation's sign
    but not its energy, so the fingerprint is invariant; (c) the
    numpy kernel equals the pure-Python reference on arbitrary
    signals (not just the fixture's)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=T_BLOCKS,
            max_size=400,
        ),
        st.integers(min_value=1, max_value=9),
    )
    def prop(xs, gain):
        x = np.array(xs, dtype=np.int64)
        fp = fingerprint_bands(x)
        assert fingerprint_bands(x * gain) == fp
        assert fingerprint_bands(-x) == fp
        assert fp == _ref_fp(x)

    prop()


def test_lossy_probe_signals_envelope_and_separation():
    """Round 12: the 16 curated tonal signals behind
    dedup_audiofp_lossy — every WAV↔ADPCM planted pair within
    hamming ≤ 3 with the maximum EXACTLY 3 (the verify boundary is
    exercised), every cross-signal distance ≥ 4 (no spurious pairs at
    the threshold)."""
    import itertools

    from nebuia_vector_db_spark.multimodal.assets import (
        _lossy_probe_signal,
    )

    def _ham(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(a, b))

    fps = {}
    planted = []
    for key in range(16):
        x = _lossy_probe_signal(key)
        _, dec = decode_pcm_any(encode_wav_adpcm(x, 8000))
        a = fingerprint_bands(x)
        b = fingerprint_bands(dec)
        fps[key] = (a, b)
        planted.append(_ham(a, b))
    assert max(planted) == 3, planted  # at the boundary, inside it
    assert all(h <= 3 for h in planted)
    cross = min(
        _ham(a, b)
        for k1, k2 in itertools.combinations(range(16), 2)
        for a in fps[k1]
        for b in fps[k2]
    )
    assert cross >= 4, cross


def test_lossy_assets_pair_every_planted_duplicate(spark, sf_smoke):
    """End-to-end through Spark: every selected doc's WAV/ADPCM pair
    (2d, 2d+1) must come out of hash_band_pairs at hamming ≤ 3."""
    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.multimodal.assets import (
        attach_audio_lossy_assets,
    )
    from nebuia_vector_db_spark.operators.imagehash import hash_band_pairs

    docs = spark.read.parquet(f"{sf_smoke}/documents.parquet")
    sel = [
        r[0]
        for r in docs.where(F.col("doc_id") % 16 == 0)
        .select("doc_id")
        .collect()
    ]
    hashed = audio_fingerprint_bands(attach_audio_lossy_assets(docs))
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in hash_band_pairs(
            hashed, max_hamming=3, max_band_df=64
        ).collect()
    }
    assert sel
    for d in sel:
        assert (2 * d, 2 * d + 1) in pairs, d
