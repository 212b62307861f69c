"""Video near-dup temporal alignment (operators/videofp.py, round 11
— VERDICT r10 task #4): cross-container frame-hash identity (the
same footage re-muxed through RIFF/ISO-BMFF/EBML must hash
identically per frame), trimmed-copy alignment at the right offset,
edit locality of the hash sequence, the hand-built alignment
semantics (offsets, thresholds, hot-shingle guard). The
`dedup_video` registry row additionally hash-certifies the whole
pipeline against a DuckDB replay across two containers."""

from __future__ import annotations

from pyspark.sql import functions as F

from nebuia_vector_db_spark.multimodal.assets import (
    attach_avi_assets,
    attach_mkv_assets,
    attach_mp4_assets,
)
from nebuia_vector_db_spark.operators.videofp import (
    video_align_pairs,
    video_frame_dhash,
)

# 8 windows of 64 bytes at hop 48: 64 + 7*48 = 400 chars
_TEXT = "".join(chr(ord("a") + (i * 7 + i // 13) % 26) for i in range(400))


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _hashes(df):
    return {
        (r["doc_id"], r["frame_id"]): (r["h0"], r["h1"], r["h2"], r["h3"])
        for r in df.collect()
    }


def test_cross_container_frame_hashes_identical(spark):
    docs = _docs(spark, [(1, _TEXT)])
    h_avi = _hashes(video_frame_dhash(attach_avi_assets(docs)))
    h_mkv = _hashes(video_frame_dhash(attach_mkv_assets(docs)))
    h_mp4 = _hashes(video_frame_dhash(attach_mp4_assets(docs)))
    assert len(h_avi) == 8
    assert h_avi == h_mkv == h_mp4


def test_edit_locality_and_trim_offset(spark):
    """Corrupting one text window flips only the frames that cover
    it (hop 48 < win 64 → at most 2 frames); dropping the first
    window shifts the sequence by exactly one frame."""
    edited = _TEXT[:200] + "XXXXXXXX" + _TEXT[208:]
    trimmed = _TEXT[48:]
    docs = _docs(spark, [(1, _TEXT), (2, edited), (3, trimmed)])
    h = _hashes(video_frame_dhash(attach_avi_assets(docs)))
    orig = [h[(1, p)] for p in range(8)]
    ed = [h[(2, p)] for p in range(8)]
    changed = [p for p in range(8) if orig[p] != ed[p]]
    assert changed and all(3 <= p <= 4 for p in changed), changed
    tr = [h[(3, p)] for p in range(7)]
    assert tr == orig[1:]


def test_align_pairs_semantics(spark):
    """Hand-built hash sequences (no decode): a re-mux pair aligns
    at offset 0 over the full length; a trimmed pair at offset 1; a
    noisy copy passes only while total ≤ max_avg·n; an unrelated
    clip never pairs."""
    rows = []

    def seq(doc, hashes, start=0):
        for p, hw in enumerate(hashes):
            rows.append((doc, start + p, *hw))

    base = [(i * 3 + 1, i * 5 + 2, i * 7 + 3, i * 11 + 4) for i in range(8)]
    seq(10, base)                      # original
    seq(11, base)                      # exact re-mux
    seq(12, base[1:])                  # trimmed: frame p == orig p+1
    noisy = [tuple(w ^ (1 if p == 0 else 0) for w in hw)
             for p, hw in enumerate(base)]
    seq(13, noisy)                     # 4 bits flipped in frame 0 only
    seq(14, [(9999 - i, 8888 - i, 7777 - i, 6666 + i) for i in range(8)])
    fh = spark.createDataFrame(
        rows, "doc_id long, frame_id int, h0 long, h1 long, h2 long, h3 long"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["offset"]): (
            r["n_aligned"],
            r["total_hamming"],
        )
        for r in video_align_pairs(fh, min_aligned=4).collect()
    }
    assert got[(10, 11, 0)] == (8, 0)
    assert got[(10, 12, 1)] == (7, 0)
    assert got[(11, 12, 1)] == (7, 0)
    # noisy copy: 4 flipped bits total over 8 frames ≤ 3·8
    assert got[(10, 13, 0)] == (8, 4)
    assert not any(14 in (a, b) for a, b, _ in got)
    # tighter budget rejects the noisy pair only via the avg test
    strict = {
        (r["doc_a"], r["doc_b"], r["offset"])
        for r in video_align_pairs(
            fh, min_aligned=4, max_avg_hamming=0
        ).collect()
    }
    assert (10, 11, 0) in strict and (10, 13, 0) not in strict


def test_shingles_never_span_skipped_frames(spark):
    """A clip with a hole in its frame sequence (an undecodable frame
    was skipped) must not form shingles across the gap — a spliced
    (4,6,7) window has no aligned counterpart and would break the
    pigeonhole promise. The pair is still found via the intact runs
    on either side when they are long enough."""
    base = [(i * 3 + 1, i * 5 + 2, i * 7 + 3, i * 11 + 4) for i in range(9)]
    rows = [(20, p, *hw) for p, hw in enumerate(base)]
    # copy with frame 4 missing (skipped at decode)
    rows += [(21, p, *hw) for p, hw in enumerate(base) if p != 4]
    fh = spark.createDataFrame(
        rows, "doc_id long, frame_id int, h0 long, h1 long, h2 long, h3 long"
    )
    got = {
        (r["doc_a"], r["doc_b"], r["offset"]): (
            r["n_aligned"],
            r["total_hamming"],
        )
        for r in video_align_pairs(fh, min_aligned=4).collect()
    }
    # found at offset 0 over the 8 shared frames, hamming 0 — via the
    # intact 0-3 and 5-8 runs; no spurious offsets from gap-spliced
    # shingles
    assert got == {(20, 21, 0): (8, 0)}


def test_hot_shingle_guard_drops_degenerate_band(spark):
    """65 clips sharing one constant hash sequence exceed the 64-df
    cap on every shingle — the guard must drop them all (no 65²
    pair storm), while two distinct-sequence duplicates still
    pair."""
    rows = []
    for doc in range(65):
        for p in range(6):
            rows.append((doc, p, 7, 7, 7, 7))
    uniq = [(i * 13 + 5, i * 17 + 1, i * 19 + 2, i * 23 + 3) for i in range(6)]
    for doc in (100, 101):
        for p, hw in enumerate(uniq):
            rows.append((doc, p, *hw))
    fh = spark.createDataFrame(
        rows, "doc_id long, frame_id int, h0 long, h1 long, h2 long, h3 long"
    )
    got = {
        (r["doc_a"], r["doc_b"])
        for r in video_align_pairs(fh, min_aligned=4).collect()
    }
    assert got == {(100, 101)}


def test_spark_end_to_end_remux_and_trim(spark):
    """Full pipeline on real containers: AVI original + MKV re-mux +
    trimmed AVI per doc; expected alignments with hamming 0."""
    t2 = "".join(chr(ord("A") + (i * 11 + i // 7) % 26) for i in range(400))
    base = _docs(spark, [(1, _TEXT), (2, t2)])
    a = base.select((F.col("doc_id") * 3).alias("doc_id"), "text")
    b = base.select((F.col("doc_id") * 3 + 1).alias("doc_id"), "text")
    c = base.select(
        (F.col("doc_id") * 3 + 2).alias("doc_id"),
        F.expr("substring(text, 49)").alias("text"),
    )
    assets = (
        attach_avi_assets(a)
        .unionByName(attach_mkv_assets(b))
        .unionByName(attach_avi_assets(c))
    )
    got = {
        (r["doc_a"], r["doc_b"], r["offset"]): (
            r["n_aligned"],
            r["total_hamming"],
        )
        for r in video_align_pairs(
            video_frame_dhash(assets), min_aligned=4
        ).collect()
    }
    for d in (1, 2):
        assert got[(3 * d, 3 * d + 1, 0)] == (8, 0)
        assert got[(3 * d, 3 * d + 2, 1)] == (7, 0)
        assert got[(3 * d + 1, 3 * d + 2, 1)] == (7, 0)
    # the two docs' clips never pair with each other
    assert not any(a // 3 != b // 3 for a, b, _ in got)
