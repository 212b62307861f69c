"""Acoustic fingerprinting for multimodal near-dedup (round 11,
VERDICT r10 task #3) — the missing third of the image / text / audio
dedup triad: catches RE-ENCODED audio duplicates (the same recording
stored as WAV by one crawler and FLAC or IMA-ADPCM by another) that
byte hashing can never see, because the fingerprint is computed from
the DECODED PCM, not the container bytes.

The fingerprint is a **spectral-band sign hash** in the
Haitsma-Kalker (ISMIR 2002, "A highly robust audio fingerprint
system") family, built so that — like ``dedup_dhash`` — the ENTIRE
pipeline is integer-exact and therefore SQL-replayable:

- the clip is cut into ``T_BLOCKS`` = 4 equal time blocks
  (block of sample ``i`` is ``(i*4)//n`` — the same expression the
  DuckDB oracle uses);
- per block, 16 band energies come from **square-wave correlators**
  instead of a float FFT: band ``b`` correlates the samples against a
  ±1 square wave of half-period ``HALF_PERIODS[b]`` (log-spaced 1…64
  samples — at 8 kHz, fundamentals 4 kHz down to ~62 Hz). A square
  wave is the integer-exact stand-in for the sine basis (its
  correlation picks up the fundamental plus odd harmonics — Walsh
  functions, the classic hardware trick), so the correlation
  ``c = Σ x[i]·sq_b(i)`` is an exact int64 sum and the energy
  ``c²`` an exact Python int;
- bit (t, b) = 1 iff ``E(t,b)·16 > Σ_b' E(t,b')`` — energy vs the
  block's MEAN energy, decided by integer cross-multiplication (the
  ``dedup_dhash`` discipline: no float division anywhere). Mean-
  compare bits survive codec quantization noise far better than
  adjacent-band compares (measured: IMA-ADPCM re-encodes of tonal
  signals keep hamming ≤ 3; full-swing modular sawtooths — a
  worst-case ADPCM cannot track — do not, and are documented as out
  of the robustness envelope);
- the 4 per-block 16-bit words double as the pigeonhole LSH bands:
  :func:`~nebuia_vector_db_spark.operators.imagehash.hash_band_pairs`
  is reused UNCHANGED for blocking (band equi-join + broadcast
  anti-join hot-band guard) and exact XOR+POPCNT verification.

Lossless re-encodes (WAV ↔ FLAC) decode to identical PCM, so their
fingerprints are bit-identical (hamming 0) — the property the
``dedup_audiofp`` registry row hash-certifies end-to-end against a
DuckDB replay of decode → correlators → bits → bands → blocking →
verify. Lossy re-encodes (IMA ADPCM) land within a small hamming
radius for signals inside the codec's tracking envelope — pinned by
tests/test_audiofp.py, the same split as pHash (robustness pytest)
vs dHash (SQL oracle).

Scale shape (100 TB): fingerprinting is ONE map-side Arrow-batched
pass over the audio scan (decode dominates; the correlator grid is
O(samples × 16) int64 numpy) — no shuffle until the band join, which
is posting-list-shaped with the skew-safe hot-band guard. Exact-int
discipline holds at any clip length: block correlations accumulate
in int64 (safe below ~2^48 samples) and are squared as Python ints,
so there is no overflow cliff to document away.

Reference parity note: the reference engine stores opaque binary
assets and has no curation ops at all (main.go:162-167 is the entire
API); this is the LLM-pipeline extension tier (SURVEY §2.3), sibling
of operators/imagehash.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

T_BLOCKS = 4
# log-spaced square-wave half-periods, in samples: 16 bands from the
# Nyquist alternation (h=1) down to a 128-sample period (~62 Hz at
# 8 kHz). Mirrored by the VALUES list in ORACLE_DEDUP_AUDIOFP.
HALF_PERIODS = (1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64)

_FP_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, "
    "b0 long, b1 long, b2 long, b3 long"
)


def fingerprint_bands(x: np.ndarray) -> list[int]:
    """Four 16-bit fingerprint words from a mono int-PCM buffer.

    Pure function of the sample values — the unit the pure-Python
    reference in tests/test_audiofp.py re-derives. Clips shorter than
    ``T_BLOCKS`` samples have no stable block grid and must be
    filtered by the caller."""
    x = np.asarray(x, dtype=np.int64).ravel()
    n = x.size
    if n < T_BLOCKS:
        raise ValueError(f"clip too short for fingerprint: {n} samples")
    i = np.arange(n, dtype=np.int64)
    bt = (i * T_BLOCKS) // n  # same expression as the SQL oracle
    energy: list[list[int]] = [
        [0] * len(HALF_PERIODS) for _ in range(T_BLOCKS)
    ]
    for bi, h in enumerate(HALF_PERIODS):
        sq = 1 - 2 * ((i // h) % 2)
        acc = np.zeros(T_BLOCKS, dtype=np.int64)
        np.add.at(acc, bt, x * sq)
        for t in range(T_BLOCKS):
            c = int(acc[t])
            energy[t][bi] = c * c  # Python int: exact at any length
    words = []
    for t in range(T_BLOCKS):
        tot = sum(energy[t])
        v = 0
        for b in range(len(HALF_PERIODS)):
            if energy[t][b] * len(HALF_PERIODS) > tot:
                v |= 1 << b
        words.append(v)
    return words


def decode_pcm_any(raw: bytes) -> tuple[int, np.ndarray]:
    """Sniff-decode an audio payload to ``(rate, mono int16 array)``:
    FLAC by magic, RIFF/WAVE via the shared codec sniffer
    (multimodal/wav.py::sniff_decode — 0x11 → IMA ADPCM, else
    PCM)."""
    if raw[:4] == b"fLaC":
        from nebuia_vector_db_spark.multimodal.flac import decode_flac

        rate, frames = decode_flac(raw)
    else:
        from nebuia_vector_db_spark.multimodal.wav import sniff_decode

        rate, frames = sniff_decode(raw)
    mono = frames[:, 0] if frames.ndim > 1 else frames
    return rate, mono


def audio_fingerprint_bands(
    assets: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Decode every audio payload (WAV-PCM / WAV-ADPCM / FLAC by
    sniffing) and emit ``(doc_id, sample_rate, n_samples, b0..b3)`` —
    the acoustic fingerprint as four 16-bit band ints, ready for
    :func:`~nebuia_vector_db_spark.operators.imagehash.hash_band_pairs`.
    Clips shorter than ``T_BLOCKS`` samples are skipped (no stable
    block grid). Map-side Arrow batches; the payload column is pruned
    unless projected — the same plumbing contract as
    ``image_dhash_bands``."""
    cols = assets.select(F.col(id_col).alias("doc_id"), payload_col)

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in ("doc_id", "sample_rate", "n_samples", "b")
            }
            for doc, payload in zip(pdf["doc_id"], pdf[payload_col]):
                rate, mono = decode_pcm_any(bytes(payload))
                if mono.size < T_BLOCKS:
                    continue
                out["doc_id"].append(doc)
                out["sample_rate"].append(rate)
                out["n_samples"].append(int(mono.size))
                out["b"].append(fingerprint_bands(mono))
            bands = np.array(out.pop("b"), dtype=np.int64).reshape(-1, 4)
            yield pd.DataFrame(
                {
                    "doc_id": out["doc_id"],
                    "sample_rate": pd.array(
                        out["sample_rate"], dtype="int32"
                    ),
                    "n_samples": out["n_samples"],
                    **{f"b{k}": bands[:, k] for k in range(4)},
                }
            )

    return cols.mapInPandas(_fp, _FP_SCHEMA)
