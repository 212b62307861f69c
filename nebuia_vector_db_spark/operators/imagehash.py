"""Perceptual image hashing for multimodal near-dedup (round 10,
VERDICT r9 task #4) — the LAION-style pass that catches re-encoded /
lightly-edited image duplicates exact byte hashing misses.

Two hashes over the DECODED pixel buffer (real codec path —
multimodal/png.py, multimodal/jpeg.py — via Arrow-batched
mapInPandas, map-side, no shuffle):

- **dHash** (difference hash, the `dedup_dhash` registry row):
  an 8×9 block-mean grid, one bit per horizontally adjacent cell
  pair. Every comparison is decided by CROSS-MULTIPLIED INTEGER
  SUMS (``s_l·n_r > s_r·n_l``) — no float division anywhere — so
  DuckDB replays the hash bit-for-bit from the source bytes and the
  differential certifies decode → grid → bits → bands → blocking →
  verify end to end (the same SQL-replayed-sketch discipline as
  ``dedup_simhash``).
- **pHash** (DCT hash, :func:`image_phash_bands`): 32×32 area
  resize → 2-D DCT-II → low-frequency 8×8 block (DC excluded) →
  sign-vs-median bits. Float DCT is not SQL-replayable; its
  contract (re-encode invariance, uniform-brightness invariance —
  the DC exclusion — and edit locality) is pinned by
  tests/test_imagehash.py instead.

Both emit the 64-bit hash as FOUR 16-bit band ints ``b0..b3``: the
bands double as the LSH blocking key (pigeonhole: hamming ≤ 3 ⇒ at
least one of 4 bands equal), so the sketch IS the index — and the
packed values stay far from int64 sign trouble.

Scale shape (100 TB): hashing is one map-side pass over the image
scan (decode dominates; the grid sums are O(pixels) numpy). Pair
generation is a band equi-join — the same posting-list scaling as
MinHash banding — with the hot-band guard done skew-safe: a
partial-agg groupBy finds over-``max_band_df`` (band, value) groups
and a BROADCAST anti-join drops their postings map-side, so no join
task ever sees an unbounded bucket (the operators/dedup.py round-9
shape; an all-black-thumbnail band at web scale is exactly such a
group). Verification is exact Hamming (XOR + POPCNT inside codegen)
on the ≤ ``max_hamming``-certified candidates, precision 1.0.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators._cache import (
    cached_relation_registry,
)

# Persisted band relations handed out by hash_band_pairs: the banded
# relation feeds the hot-band groupBy AND both self-join sides, and
# its lineage holds the image DECODE (the dominant cost) — uncached it
# would decode every image up to 4x. Same releasable-registry shape as
# operators/dedup.py / textvec.py (the r9 ADVICE pattern); bench.py's
# release step drops all three registries between phases.
_CACHED_RELATIONS, release_cached_relations = cached_relation_registry()


_BANDS_SCHEMA = (
    "doc_id long, width int, height int, "
    "b0 long, b1 long, b2 long, b3 long"
)


def _decode_any(b: bytes) -> tuple[int, int, np.ndarray]:
    from nebuia_vector_db_spark.multimodal.jpeg import decode_jpeg_gray
    from nebuia_vector_db_spark.multimodal.png import decode_png

    if b[:2] == b"\xff\xd8":
        px = decode_jpeg_gray(b)
        return px.shape[1], px.shape[0], px
    return decode_png(b)


def _gray2d(px: np.ndarray) -> np.ndarray:
    """Collapse (H, W[, C]) to an integer 2-D buffer. Multi-channel
    input uses the integer CHANNEL SUM, not a float luma mix: every
    cell scales by the same ×C, so the cross-multiplied mean
    comparisons are unchanged and the hash stays integer-exact."""
    if px.ndim == 3:
        return px.astype(np.int64).sum(axis=2)
    return px.astype(np.int64)


def _dhash_bands(px: np.ndarray) -> list[int]:
    """4×16-bit dHash bands from a (H, W) uint8 buffer, H ≥ 8, W ≥ 9.

    Grid assignment mirrors the SQL oracle exactly: row band
    ``(row·8)//H`` (8 bands), col band ``(col·9)//W`` (9 bands); the
    bit for (r, c) is 1 iff cell (r, c)'s mean exceeds cell
    (r, c+1)'s, decided in integers."""
    px = _gray2d(px)
    h, w = px.shape
    v = px
    br = (np.arange(h) * 8) // h
    bc = (np.arange(w) * 9) // w
    s = np.zeros((8, 9), dtype=np.int64)
    np.add.at(s, (br[:, None], bc[None, :]), v)
    n = (
        np.bincount(br, minlength=8)[:, None]
        * np.bincount(bc, minlength=9)[None, :]
    )
    bits = (s[:, :8] * n[:, 1:]) > (s[:, 1:] * n[:, :8])  # (8, 8)
    weights = 1 << np.arange(8, dtype=np.int64)
    rows = bits @ weights  # per-row byte
    return [int(rows[2 * k] + (rows[2 * k + 1] << 8)) for k in range(4)]


def image_dhash_bands(
    assets: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Decode every image payload (PNG/JPEG by magic number) and emit
    (doc_id, width, height, b0..b3) — the dHash as four 16-bit band
    ints. Images shorter than 8 rows or narrower than 9 columns are
    skipped (no stable 8×9 grid). Map-side Arrow batches; the
    payload column is pruned unless projected."""
    cols = assets.select(F.col(id_col).alias("doc_id"), payload_col)

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in ("doc_id", "width", "height", "b")
            }
            for doc, payload in zip(pdf["doc_id"], pdf[payload_col]):
                w, h, px = _decode_any(bytes(payload))
                if h < 8 or w < 9:
                    continue
                out["doc_id"].append(doc)
                out["width"].append(w)
                out["height"].append(h)
                out["b"].append(_dhash_bands(px))
            bands = np.array(out.pop("b"), dtype=np.int64).reshape(-1, 4)
            yield pd.DataFrame(
                {**out, **{f"b{k}": bands[:, k] for k in range(4)}}
            )

    return cols.mapInPandas(_hash, _BANDS_SCHEMA)


def _area_resize(px: np.ndarray, out_h: int = 32, out_w: int = 32):
    """Block-mean resize with the same floor-partition grid as dHash
    (float means here — pHash is float anyway)."""
    h, w = px.shape
    br = (np.arange(h) * out_h) // max(h, 1)
    bc = (np.arange(w) * out_w) // max(w, 1)
    s = np.zeros((out_h, out_w))
    np.add.at(s, (br[:, None], bc[None, :]), px.astype(np.float64))
    n = (
        np.bincount(br, minlength=out_h)[:, None]
        * np.bincount(bc, minlength=out_w)[None, :]
    ).astype(np.float64)
    n[n == 0] = 1.0
    return s / n


def _dct2(m: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D DCT-II via the explicit cosine basis (no scipy
    in this container)."""
    n = m.shape[0]
    k = np.arange(n)
    basis = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    basis *= np.sqrt(2.0 / n)
    basis[0] /= np.sqrt(2.0)
    return basis @ m @ basis.T


def _phash_bands(px: np.ndarray) -> list[int]:
    """pHash: 32×32 area resize → DCT-II → the 8×8 low-frequency
    corner with DC dropped → sign vs the median of the remaining 63
    coefficients. DC exclusion makes the hash invariant to uniform
    brightness shifts (pinned by tests)."""
    d = _dct2(_area_resize(_gray2d(px)))[:8, :8].copy()
    flat = d.flatten()[1:]  # drop DC
    med = float(np.median(flat))
    bits = np.zeros(64, dtype=bool)
    bits[1:] = flat > med
    b = bits.reshape(8, 8)
    weights = 1 << np.arange(8, dtype=np.int64)
    rows = (b @ weights).astype(np.int64)
    return [int(rows[2 * k] + (rows[2 * k + 1] << 8)) for k in range(4)]


def image_phash_bands(
    assets: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """pHash twin of :func:`image_dhash_bands`: same output shape,
    same banding, so :func:`hash_band_pairs` works unchanged."""
    cols = assets.select(F.col(id_col).alias("doc_id"), payload_col)

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in ("doc_id", "width", "height", "b")
            }
            for doc, payload in zip(pdf["doc_id"], pdf[payload_col]):
                w, h, px = _decode_any(bytes(payload))
                if h < 1 or w < 1:
                    continue
                out["doc_id"].append(doc)
                out["width"].append(w)
                out["height"].append(h)
                out["b"].append(_phash_bands(px))
            bands = np.array(out.pop("b"), dtype=np.int64).reshape(-1, 4)
            yield pd.DataFrame(
                {**out, **{f"b{k}": bands[:, k] for k in range(4)}}
            )

    return cols.mapInPandas(_hash, _BANDS_SCHEMA)


def hash_band_pairs(
    hashed: DataFrame,
    max_hamming: int = 3,
    max_band_df: int = 64,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs from banded 64-bit hashes: pigeonhole blocking
    (4 bands of 16 bits — hamming ≤ 3 guarantees ≥ 1 equal band, so
    recall is 1.0 within ``max_hamming`` ≤ 3 among un-dropped bands)
    → DISTINCT candidates → exact XOR+POPCNT verify. Hot (band,
    value) groups with > ``max_band_df`` members are dropped via
    partial-agg groupBy + broadcast anti-join (skew-safe: hot
    postings die map-side, never crossing the wire)."""
    from pyspark import StorageLevel

    bands = hashed.select(
        id_col,
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(F.array("b0", "b1", "b2", "b3")).alias("k", "val"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CACHED_RELATIONS.append(bands)
    hot = (
        bands.groupBy("k", "val")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") > max_band_df)
        .select("k", "val")
    )
    kept = bands.join(F.broadcast(hot), ["k", "val"], "left_anti")
    a = kept.alias("a")
    b = kept.alias("b")
    ham = sum(
        F.bit_count(
            F.col(f"a.b{k}").bitwiseXOR(F.col(f"b.b{k}"))
        )
        for k in range(4)
    )
    return (
        a.join(b, on=["k", "val"])
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            ham.cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
