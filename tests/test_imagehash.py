"""Perceptual image hashing (operators/imagehash.py): dHash exactness
and invariances, pHash contract, pigeonhole recall of the banded pair
join, and the skew-safe hot-band guard. The registry row
`dedup_dhash` is additionally hash-certified against the DuckDB
replay (tools/oracle_check.py)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from nebuia_vector_db_spark.multimodal.png import encode_png
from nebuia_vector_db_spark.operators.imagehash import (
    _dhash_bands,
    _phash_bands,
    hash_band_pairs,
    image_dhash_bands,
    image_phash_bands,
)


def _img(seed: int, h: int = 48, w: int = 32) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def _assets(spark, imgs: dict[int, np.ndarray], level: int = 6):
    rows = [
        (i, bytearray(encode_png(px, compresslevel=level)))
        for i, px in imgs.items()
    ]
    return spark.createDataFrame(rows, "doc_id long, payload binary")


def test_dhash_reencode_invariant_and_md5_not(spark):
    """The point of a PERCEPTUAL hash: the same pixels re-encoded to a
    different byte stream (compresslevel 1 vs 9) md5-differ but
    dHash-match exactly — the duplicate class exact byte dedup
    misses."""
    px = _img(1)
    lo = encode_png(px, compresslevel=1)
    hi = encode_png(px, compresslevel=9)
    assert hashlib.md5(lo).hexdigest() != hashlib.md5(hi).hexdigest()
    a = _assets(spark, {1: px}, level=1).unionAll(
        _assets(spark, {2: px}, level=9)
    )
    got = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
           for r in image_dhash_bands(a).collect()}
    assert got[1] == got[2]
    p = {r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
         for r in image_phash_bands(a).collect()}
    assert p[1] == p[2]


def test_dhash_and_phash_brightness_invariant():
    """Uniform brightness shift: dHash compares block MEANS (the
    shift cancels in the cross-multiplied inequality); pHash drops
    the DC coefficient. Both hashes must be bit-identical."""
    px = _img(2)
    brighter = np.clip(px.astype(np.int64) + 40, 0, 255).astype(np.uint8)
    # avoid clipping artifacts: keep the test image in [0, 215]
    px = (px % 216).astype(np.uint8)
    brighter = (px + 40).astype(np.uint8)
    assert _dhash_bands(px) == _dhash_bands(brighter)
    assert _phash_bands(px) == _phash_bands(brighter)


def test_dhash_edit_locality():
    """A local edit (one quadrant zeroed) flips SOME bits but nowhere
    near all 64 — near-dup distance, not a rehash."""
    px = _img(3)
    edited = px.copy()
    edited[:12, :8] = 0
    a, b = _dhash_bands(px), _dhash_bands(edited)
    ham = sum(bin(x ^ y).count("1") for x, y in zip(a, b))
    assert 0 < ham <= 16


def test_band_pairs_match_bruteforce(spark):
    """Pigeonhole recall: within hamming <= 3 the banded join finds
    EXACTLY the brute-force pair set (4 bands of 16 bits, 3 errors
    cannot touch every band)."""
    base = _img(7)
    imgs = {0: base}
    # near dups: small local edits of base
    for i in range(1, 5):
        e = base.copy()
        e[: 2 * i, :4] = 255
        imgs[i] = e
    # far images
    for i in range(5, 12):
        imgs[i] = _img(100 + i)
    hashed = image_dhash_bands(_assets(spark, imgs)).cache()
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in hash_band_pairs(hashed, max_hamming=3).collect()
    }
    hs = {r["doc_id"]: [r["b0"], r["b1"], r["b2"], r["b3"]]
          for r in hashed.collect()}
    want = set()
    for a in hs:
        for b in hs:
            if a < b:
                ham = sum(
                    bin(x ^ y).count("1") for x, y in zip(hs[a], hs[b])
                )
                if ham <= 3:
                    want.add((a, b, ham))
    assert got == want
    assert want  # the fixture must actually contain near-dups
    hashed.unpersist()


def test_hot_band_guard_drops_degenerate_buckets(spark):
    """An all-identical-image flood (the web-scale all-black
    thumbnail) exceeds max_band_df and its postings are dropped
    map-side: no pairs emitted from the hot bucket, while a distinct
    small cluster still pairs."""
    flat = np.full((48, 32), 128, dtype=np.uint8)
    imgs = {i: flat for i in range(10)}
    other = _img(9)
    imgs[100] = other
    imgs[101] = other
    hashed = image_dhash_bands(_assets(spark, imgs))
    got = {
        (r["doc_a"], r["doc_b"])
        for r in hash_band_pairs(
            hashed, max_hamming=3, max_band_df=4
        ).collect()
    }
    assert (100, 101) in got
    assert not any(a < 100 and b < 100 for a, b in got)


def test_dhash_oracle_grid_replay():
    """The numpy grid must equal a literal pure-Python replay of the
    oracle's arithmetic ((row*8)//H, (col*9)//W, cross-multiplied
    sums) — the same expression DuckDB runs."""
    px = _img(11, h=13, w=32)  # non-divisible height: uneven bands
    h, w = px.shape
    s = [[0] * 9 for _ in range(8)]
    n = [[0] * 9 for _ in range(8)]
    for r in range(h):
        for c in range(w):
            br, bc = (r * 8) // h, (c * 9) // w
            s[br][bc] += int(px[r, c])
            n[br][bc] += 1
    bands = []
    for k in range(4):
        val = 0
        for dr in range(2):
            r = 2 * k + dr
            for c in range(8):
                if s[r][c] * n[r][c + 1] > s[r][c + 1] * n[r][c]:
                    val |= 1 << (dr * 8 + c)
        bands.append(val)
    assert _dhash_bands(px) == bands


def test_dhash_rejects_tiny_images(spark):
    """Images without a stable 8x9 grid are skipped, not mis-hashed."""
    imgs = {1: _img(5, h=4, w=32), 2: _img(6, h=48, w=32)}
    got = image_dhash_bands(_assets(spark, imgs)).collect()
    assert [r["doc_id"] for r in got] == [2]


def test_band_cache_is_releasable(spark):
    """Pre-empted r9-style ADVICE: hash_band_pairs persists the banded
    relation (its lineage holds the image decode and feeds the hot
    groupBy + both join sides); the persist is releasable."""
    from nebuia_vector_db_spark.operators import imagehash as ih

    ih.release_cached_relations()
    imgs = {1: _img(21), 2: _img(21)}
    hashed = image_dhash_bands(_assets(spark, imgs))
    ih.hash_band_pairs(hashed, max_hamming=3).collect()
    assert len(ih._CACHED_RELATIONS) == 1
    assert ih.release_cached_relations() == 1
