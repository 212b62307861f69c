"""Multimodal columns: opaque binary payloads + typed metadata.

The reference is text+vector only (main.go:25-75); this is the
mandated multimodal extension surface. Design per the north star:

- an asset is an opaque ``BINARY`` payload column plus a typed
  metadata struct (mime, declared dims) — the payload is never parsed
  by Catalyst, so scans prune it unless the query projects it;
- decode / feature-extract / frame-sample run as **Arrow-batched
  ``mapInPandas``** — one Python invocation per Arrow batch, payloads
  arriving as zero-copy bytes. That shape (iterator of pandas
  DataFrames in, iterator out) is exactly what a real PIL/ffmpeg
  decoder plugs into;
- codecs and containers are REAL: PNG (zlib DEFLATE + CRC + Paeth),
  JPEG (baseline + progressive SOF2, grayscale + YCbCr color), WAV
  (RIFF chunk walk + PCM-16), MJPEG-AVI (RIFF mux/demux + idx1),
  ISO-BMFF MP4 (box grammar + full sample tables), and animated GIF
  (variable-width LZW + GCE + interlacing) — all pure stdlib/numpy,
  so the registry round-trip rows exercise genuine compressed/
  container bytes end to end — plus lossy IMA-ADPCM audio (WAV
  format 0x11, 4 bits/sample). ``decode_image_real`` magic-sniffs
  PNG vs JPEG; ``video_frame_stats`` sniffs RIFF vs ftyp vs EBML
  (Matroska, multimodal/mkv.py — all three video containers real);
  ``decode_audio_real`` sniffs the fmt codec id (PCM vs ADPCM).
  Round 7 adds a REAL lossy perceptual codec: MPEG-1 Audio Layer II
  (multimodal/mpegaudio.py — full bitstream layer per ISO 11172-3
  Table B.2a, designed near-PR filterbank; `mm_mp2_audio` row).
  Round 9 adds H.264 baseline INTRA (multimodal/h264.py — Annex-B
  NAL + emulation prevention, exp-Golomb SPS/PPS/IDR headers, I_PCM,
  I_16x16 V/H/DC intra prediction, CAVLC zero-block nC contexts;
  `mm_h264_iframes` row). The general CAVLC residual tables are a
  DOCUMENTED scope cut (h264.py SCOPE NOTE: no conformance vectors
  in this container — a mistranscribed VLC table round-trips against
  itself, so in-repo tests cannot certify it; I_PCM carries content
  losslessly instead). MP3 Layer III / AAC / Opus are CLOSED OUT by
  the same certification argument, not left as vague TODOs: their
  entropy layers are large tabulated Huffman codebooks (ISO 11172-3
  Table B.7; AAC's scalefactor/spectrum books) with no closed form,
  and with no conformance vectors in this container a mistranscribed
  table still round-trips against an in-repo encoder — so a
  "Layer III" decoder here could not honestly claim spec compliance.
  The perceptual-codec capability IS exercised end to end by Layer
  II (same QMF subband architecture as Layer III minus MDCT+Huffman,
  `mm_mp2_audio` row); interop with real-world MP3/AAC payloads
  remains an executor-install point (PIL/ffmpeg);
  ``decode_image_features`` additionally keeps a *deterministic fake
  decode* (dims from md5, pixel stats = byte stats) whose arithmetic
  any SQL engine can replay — the fully-hash-checkable variant.

Scale: payload columns dominate storage; keep them in their own
parquet column (columnar pruning makes metadata-only queries cheap)
and size ``spark.sql.files.maxPartitionBytes`` so a task's batch of
payloads fits executor memory. mapInPandas streams batches — no
per-partition materialization.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("declared_width", T.IntegerType()),
        T.StructField("declared_height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def _fake_dim(payload: Column, hex_off: int) -> Column:
    """1..64, derived from the payload's md5 — the deterministic stand-in
    for a real header parse; mirrored in SQL by the oracle."""
    return (
        F.conv(F.substring(F.md5(payload), hex_off, 4), 16, 10).cast("long") % 64 + 1
    ).cast("int")


def attach_fake_assets(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Derive a deterministic binary asset per document (payload =
    UTF-8 bytes of the text — a stand-in for real image/audio bytes)
    with typed metadata. Purely columnar, no Python."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            _fake_dim(payload, 1).alias("declared_width"),
            _fake_dim(payload, 5).alias("declared_height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("asset_meta"),
    )


_FEATURE_SCHEMA = (
    "doc_id long, width int, height int, n_bytes long, "
    "mean_byte double, max_byte int"
)


def decode_image_features(assets: DataFrame) -> DataFrame:
    """Fake 'decode' + feature extraction over Arrow batches.

    Treats the payload bytes as the pixel buffer: width/height from the
    metadata struct (≙ header parse), byte stats ≙ pixel stats. A real
    decoder replaces the body of ``_decode`` only — the Spark plumbing
    (schema, mapInPandas batch iteration) is the production shape.
    """
    import hashlib  # noqa: F401  (imported for parity with real decoders)

    cols = assets.select(
        "doc_id",
        "payload",
        F.col("asset_meta.declared_width").alias("w"),
        F.col("asset_meta.declared_height").alias("h"),
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            buf = [bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": pdf["w"].astype("int32"),
                    "height": pdf["h"].astype("int32"),
                    "n_bytes": [len(b) for b in buf],
                    "mean_byte": [
                        (sum(b) / len(b)) if b else 0.0 for b in buf
                    ],
                    "max_byte": [max(b) if b else 0 for b in buf],
                }
            )

    return cols.mapInPandas(_decode, schema=_FEATURE_SCHEMA)


def attach_png_assets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 32,
) -> DataFrame:
    """Derive a REAL PNG asset per document: the text's UTF-8 bytes
    become the pixel buffer of a ``width``-pixel-wide grayscale image
    (zero-padded to fill the last row) and are encoded through
    :mod:`nebuia_vector_db_spark.multimodal.png` — real DEFLATE
    stream, real CRC, a file any PNG viewer opens. Runs as
    Arrow-batched mapInPandas (compression is Python work), map-side,
    no shuffle. Because the pixels ARE the text bytes, a SQL oracle
    can replay pixel statistics of the decoded image from the text
    column — making the full encode→decode round trip hash-checkable
    (registry row `mm_png_roundtrip`)."""
    import math

    from nebuia_vector_db_spark.multimodal.png import encode_png

    cols = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads, heights = [], [], []
            for doc, text in zip(pdf["doc_id"], pdf[text_col]):
                b = (text or "").encode("utf-8")
                if not b:
                    continue
                h = math.ceil(len(b) / width)
                buf = np.zeros(h * width, dtype=np.uint8)
                buf[: len(b)] = np.frombuffer(b, dtype=np.uint8)
                ids.append(doc)
                payloads.append(encode_png(buf.reshape(h, width)))
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "mime": ["image/png"] * len(ids),
                    "declared_width": [width] * len(ids),
                    "declared_height": heights,
                }
            )

    flat = cols.mapInPandas(
        _enc,
        schema=(
            "doc_id long, payload binary, mime string, "
            "declared_width int, declared_height int"
        ),
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.col("mime"),
            F.col("declared_width"),
            F.col("declared_height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("asset_meta"),
    )


_REAL_DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_pixels long, "
    "mean_px double, max_px int"
)


def decode_image_real(assets: DataFrame) -> DataFrame:
    """REAL image decode over Arrow batches, format-sniffed by magic
    number: PNG (:mod:`..multimodal.png` — zlib inflate, CRC
    validation, filters 0-4 incl. Paeth) and baseline JPEG
    (:mod:`..multimodal.jpeg` — marker parse, canonical Huffman
    entropy decode, dequant + IDCT; grayscale AND 3-component YCbCr
    with subsampling, collapsed to luma here — per-channel stats live
    in :func:`decode_image_color_real`). Emits per-image stats from
    the ACTUAL decoded pixel buffer: parsed header dims, pixel count,
    mean/max pixel value.

    Other container formats (video/audio containers, progressive
    JPEG) still need an executor-side codec install (PIL/ffmpeg) and
    raise cleanly per payload via the signature check — the
    mapInPandas plumbing is identical either way, so a deployment
    swaps only the decode call. Same shape as
    :func:`decode_image_features`: map-side, payload pruned unless
    projected, no shuffle."""
    from nebuia_vector_db_spark.multimodal.jpeg import decode_jpeg_gray
    from nebuia_vector_db_spark.multimodal.png import decode_png

    cols = assets.select("doc_id", "payload")

    def _decode_any(b: bytes):
        if b[:2] == b"\xff\xd8":
            px = decode_jpeg_gray(b)
            return px.shape[1], px.shape[0], px
        return decode_png(b)

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, npx, means, maxes = [], [], [], [], [], []
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = _decode_any(bytes(pay))
                ids.append(doc)
                ws.append(w)
                hs.append(h)
                npx.append(w * h)
                means.append(float(px.mean()))
                maxes.append(int(px.max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": ws,
                    "height": hs,
                    "n_pixels": npx,
                    "mean_px": means,
                    "max_px": maxes,
                }
            )

    return cols.mapInPandas(_decode, schema=_REAL_DECODE_SCHEMA)


def sample_frames(
    assets: DataFrame, frame_bytes: int = 16, stride: int = 4
) -> DataFrame:
    """'Video' frame sampling over the opaque payload: split the byte
    stream into fixed-size frames, keep every ``stride``-th. Pure
    columnar (no Python) — the pattern for keyframe subsampling where
    the payload is a real container format and a mapInPandas decoder
    replaces the byte slicing."""
    n_frames = (F.length("payload") / frame_bytes).cast("long").alias("n_frames")
    kept = assets.select("doc_id", F.length("payload").alias("n_bytes"), n_frames)
    return kept.select(
        "doc_id",
        "n_bytes",
        "n_frames",
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride)).alias(
            "sampled_frame_ids"
        ),
        F.size(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
        ).cast("long").alias("n_sampled"),
    ).where(F.col("n_frames") > 0)


def audio_windows(
    assets: DataFrame, win_bytes: int = 256, hop_bytes: int = 128
) -> DataFrame:
    """'Audio' windowing over the opaque payload: fixed-size windows
    with hop (the STFT/feature-frame access pattern), one output row
    per full window, content-addressed by the window's md5.

    The mapInPandas body is the real decode integration point — a
    deployment swaps the byte slice + md5 for sample decoding and
    RMS/FFT features over exactly the same Arrow batch plumbing and
    schema; windowing stays map-side with no shuffle either way. The
    md5 makes the fake exactly SQL-reproducible, so the registry row
    (`mm_audio_windows`) is a full content hash check, not rows-only.
    """
    import hashlib

    cols = assets.select("doc_id", "payload")

    def _win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, wids, starts, hashes = [], [], [], []
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(pay)
                n = len(b)
                if n < win_bytes:
                    continue
                n_win = (n - win_bytes) // hop_bytes + 1
                for w in range(n_win):
                    s = w * hop_bytes
                    doc_ids.append(doc)
                    wids.append(w)
                    starts.append(s)
                    hashes.append(
                        hashlib.md5(b[s : s + win_bytes]).hexdigest()
                    )
            yield pd.DataFrame(
                {
                    "doc_id": doc_ids,
                    "window_id": wids,
                    "start_byte": starts,
                    "window_md5": hashes,
                }
            )

    return cols.mapInPandas(
        _win,
        schema="doc_id long, window_id long, start_byte long, window_md5 string",
    )


def scene_changes(
    assets: DataFrame, frame_bytes: int = 16, threshold: int = 500
) -> DataFrame:
    """Temporal operator over the 'video' payload: consecutive-frame
    byte deltas (sum of absolute per-byte differences), emitting the
    frames whose delta clears ``threshold`` — the scene-cut /
    keyframe-selection access pattern. One numpy reshape+diff per
    payload inside an Arrow batch; a real deployment swaps the byte
    math for decoded-luma histogram distance over the same plumbing.
    Map-side only, no shuffle; ``frame_id`` is the LATER frame of the
    pair. The fake is exact byte arithmetic, so the registry row
    (`mm_scene_changes`) is fully SQL-replayed, not rows-only."""
    import numpy as np

    cols = assets.select("doc_id", "payload")

    def _cuts(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_fid, out_delta = [], [], []
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                b = np.frombuffer(bytes(pay), dtype=np.uint8)
                nf = len(b) // frame_bytes
                if nf < 2:
                    continue
                fr = (
                    b[: nf * frame_bytes]
                    .reshape(nf, frame_bytes)
                    .astype(np.int32)
                )
                deltas = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
                for i in np.nonzero(deltas >= threshold)[0]:
                    out_doc.append(doc)
                    out_fid.append(int(i) + 1)
                    out_delta.append(int(deltas[i]))
            yield pd.DataFrame(
                {
                    "doc_id": out_doc,
                    "frame_id": out_fid,
                    "delta": out_delta,
                }
            )

    return cols.mapInPandas(
        _cuts, schema="doc_id long, frame_id long, delta long"
    )


def attach_wav_assets(
    docs: DataFrame, id_col: str = "doc_id", rate: int = 8000
) -> DataFrame:
    """Derive a REAL WAV asset per document: a deterministic int16 PCM
    signal (pure modular arithmetic over ``doc_id`` and the sample
    index, so a SQL oracle can regenerate every sample) encoded through
    :mod:`nebuia_vector_db_spark.multimodal.wav` — genuine RIFF
    container, fmt/data chunks, word alignment. Arrow-batched
    mapInPandas, map-side, no shuffle.

    Generator (mirrored by ORACLE_MM_WAV in queries.py):
      n_samples(doc) = doc_id % 400 + 100
      sample[i]      = (doc_id * 7919 + i * 104729) % 65536 - 32768
    """
    import numpy as np

    from nebuia_vector_db_spark.multimodal.wav import encode_wav

    cols = docs.select(F.col(id_col).alias("doc_id"))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, durs = [], [], []
            for doc in pdf["doc_id"]:
                n = int(doc) % 400 + 100
                i = np.arange(n, dtype=np.int64)
                samples = (
                    (int(doc) * 7919 + i * 104729) % 65536 - 32768
                ).astype(np.int16)
                ids.append(doc)
                payloads.append(encode_wav(samples, rate))
                durs.append(n * 1000 // rate)
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "duration_ms": durs}
            )

    flat = cols.mapInPandas(
        _enc, schema="doc_id long, payload binary, duration_ms long"
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.lit(None).cast("int").alias("declared_width"),
            F.lit(None).cast("int").alias("declared_height"),
            F.col("duration_ms"),
        ).alias("asset_meta"),
    )


_AUDIO_DECODE_SCHEMA = (
    "doc_id long, sample_rate int, n_samples long, duration_ms long, "
    "peak int, mean_sample double, rms double"
)


def decode_audio_real(assets: DataFrame) -> DataFrame:
    """REAL audio decode over Arrow batches: parse the RIFF/WAVE
    container (chunk walk, fmt validation) with the pure-stdlib codec
    and emit per-clip stats from the ACTUAL decoded samples — sample
    rate and duration from the header, peak = max(|s|), mean sample
    value, RMS. All stats are exact-integer accumulations divided once
    (and sqrt'd once), so they are bit-reproducible by a SQL oracle
    that regenerates the PCM signal — `mm_audio_real` is a full
    content-hash row, not rows-only.

    Same plumbing contract as :func:`decode_image_real`: map-side
    mapInPandas, payload pruned unless projected, no shuffle; a
    deployment swaps the codec call for libsndfile/ffmpeg only.
    """
    import math

    from nebuia_vector_db_spark.multimodal.wav import sniff_decode

    cols = assets.select("doc_id", "payload")

    # codec dispatch lives in ONE place (wav.py::sniff_decode —
    # round-11 dedup of the chunk walk with operators/audiofp.py)
    _sniff_decode = sniff_decode

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, rates, ns, durs, peaks, means, rmss = (
                [], [], [], [], [], [], []
            )
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                rate, frames = _sniff_decode(bytes(pay))
                s = frames[:, 0].astype(np.int64)  # mono stats
                n = len(s)
                ids.append(doc)
                rates.append(rate)
                ns.append(n)
                durs.append(n * 1000 // rate)
                peaks.append(int(np.abs(s).max()) if n else 0)
                means.append(float(s.sum()) / n if n else 0.0)
                rmss.append(
                    math.sqrt(float((s * s).sum()) / n) if n else 0.0
                )
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "n_samples": ns,
                    "duration_ms": durs,
                    "peak": pd.array(peaks, dtype="int32"),
                    "mean_sample": means,
                    "rms": rmss,
                }
            )

    return cols.mapInPandas(_decode, schema=_AUDIO_DECODE_SCHEMA)


def attach_jpeg_assets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 32,
    quality: int = 90,
) -> DataFrame:
    """Derive a REAL baseline-JPEG asset per document — the lossy
    sibling of :func:`attach_png_assets`: the text's UTF-8 bytes
    become a ``width``-wide grayscale pixel buffer encoded through
    :mod:`nebuia_vector_db_spark.multimodal.jpeg` (forward DCT,
    Annex-K quantization at ``quality``, canonical Huffman entropy
    coding — a stream any baseline decoder opens). Because JPEG is
    lossy there is no exact SQL oracle; fidelity is pinned by
    tests (PSNR + dimension round trip). Arrow-batched mapInPandas,
    map-side, no shuffle."""
    import math

    from nebuia_vector_db_spark.multimodal.jpeg import encode_jpeg_gray

    cols = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads, heights = [], [], []
            for doc, text in zip(pdf["doc_id"], pdf[text_col]):
                b = (text or "").encode("utf-8")
                if not b:
                    continue
                h = math.ceil(len(b) / width)
                buf = np.zeros(h * width, dtype=np.uint8)
                buf[: len(b)] = np.frombuffer(b, dtype=np.uint8)
                ids.append(doc)
                payloads.append(
                    encode_jpeg_gray(buf.reshape(h, width), quality)
                )
                heights.append(h)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "mime": ["image/jpeg"] * len(ids),
                    "declared_width": [width] * len(ids),
                    "declared_height": heights,
                }
            )

    flat = cols.mapInPandas(
        _enc,
        schema=(
            "doc_id long, payload binary, mime string, "
            "declared_width int, declared_height int"
        ),
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.col("mime"),
            F.col("declared_width"),
            F.col("declared_height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("asset_meta"),
    )


def attach_jpeg_lossless_assets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    blocks_per_row: int = 16,
    progressive: bool = False,
) -> DataFrame:
    """JPEG asset constructed to round-trip EXACTLY: each UTF-8 byte
    of the text becomes one constant 8×8 block, encoded at
    quality=100 — where the scaled Annex-K table is all ones and a
    flat block's spectrum is a single integer DC coefficient, so
    quantization drops nothing. The decoder still runs the full
    marker parse / Huffman entropy decode / dequant / IDCT; the
    decoded pixel stats are replayable from the text column in SQL
    (registry row `mm_jpeg_roundtrip`) — a hash-checked oracle for a
    codec that is lossy in general. Byte count pads to a full block
    row with zero blocks.

    ``progressive=True`` emits the same coefficients as a SOF2
    progressive stream (spectral selection + successive approximation
    scans, per-scan optimized Huffman tables) — exactness is
    coefficient-level, so the construction stays lossless through the
    entirely different Annex-G entropy layer (registry row
    `mm_jpeg_progressive`)."""
    import math

    from nebuia_vector_db_spark.multimodal.jpeg import (
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    enc = (
        (lambda im: encode_jpeg_progressive(im, quality=100))
        if progressive
        else (lambda im: encode_jpeg_gray(im, quality=100))
    )
    cols = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads, heights = [], [], []
            for doc, text in zip(pdf["doc_id"], pdf[text_col]):
                b = (text or "").encode("utf-8")
                if not b:
                    continue
                n_rows = math.ceil(len(b) / blocks_per_row)
                vals = np.zeros(n_rows * blocks_per_row, dtype=np.uint8)
                vals[: len(b)] = np.frombuffer(b, dtype=np.uint8)
                grid = vals.reshape(n_rows, blocks_per_row)
                img = np.kron(grid, np.ones((8, 8), dtype=np.uint8))
                ids.append(doc)
                payloads.append(enc(img))
                heights.append(n_rows * 8)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "mime": ["image/jpeg"] * len(ids),
                    "declared_width": [blocks_per_row * 8] * len(ids),
                    "declared_height": heights,
                }
            )

    flat = cols.mapInPandas(
        _enc,
        schema=(
            "doc_id long, payload binary, mime string, "
            "declared_width int, declared_height int"
        ),
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.col("mime"),
            F.col("declared_width"),
            F.col("declared_height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("asset_meta"),
    )


_AUDIO_WINDOW_SCHEMA = (
    "doc_id long, window_id long, start_sample long, "
    "win_rms double, win_peak int"
)


def audio_windows_real(
    assets: DataFrame, win_samples: int = 256, hop_samples: int = 128
) -> DataFrame:
    """REAL windowed audio features: decode the WAV container
    (multimodal/wav.py) and emit per-window RMS + peak from the
    ACTUAL PCM samples — the STFT-frame access pattern
    ``audio_windows`` fakes with byte md5s, now on decoded audio.
    One vectorized stride-trick pass per clip inside an Arrow batch;
    map-side, no shuffle. Window stats are exact-integer
    accumulations, so a SQL oracle that regenerates the PCM signal
    replays them bit-for-bit (registry row `mm_audio_windows_real`)."""
    import math

    from nebuia_vector_db_spark.multimodal.wav import decode_wav

    cols = assets.select("doc_id", "payload")

    def _win(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, wids, starts, rmss, peaks = [], [], [], [], []
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                _, frames = decode_wav(bytes(pay))
                s = frames[:, 0].astype(np.int64)
                n = len(s)
                if n < win_samples:
                    continue
                n_win = (n - win_samples) // hop_samples + 1
                idx = (
                    np.arange(n_win)[:, None] * hop_samples
                    + np.arange(win_samples)[None, :]
                )
                w = s[idx]  # (n_win, win_samples)
                sq = (w * w).sum(axis=1)
                for k in range(n_win):
                    ids.append(doc)
                    wids.append(k)
                    starts.append(k * hop_samples)
                    rmss.append(math.sqrt(float(sq[k]) / win_samples))
                    peaks.append(int(np.abs(w[k]).max()))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "window_id": wids,
                    "start_sample": starts,
                    "win_rms": rmss,
                    "win_peak": pd.array(peaks, dtype="int32"),
                }
            )

    return cols.mapInPandas(_win, schema=_AUDIO_WINDOW_SCHEMA)


def attach_jpeg_color_assets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tiles_per_row: int = 8,
) -> DataFrame:
    """COLOR (YCbCr 4:2:0) JPEG asset constructed to round-trip
    EXACTLY: each consecutive byte TRIPLE of the text becomes one flat
    16×16 RGB tile (missing trailing channel bytes are zero), encoded
    at quality=100 with 2×2 chroma subsampling. A flat 16×16 tile
    survives 4:2:0 losslessly — its chroma is constant so the 2×2 box
    filter is exact, every DCT is a lone integer DC coefficient, and
    the q=100 tables are all ones — so the stream exercises the FULL
    color pipeline (RGB↔YCbCr, subsample/upsample, two quantizer +
    Huffman table pairs, interleaved MCUs) while the decoded image
    equals the constructed one bit-for-bit. Decoded per-channel stats
    are replayable from the text column in SQL (registry row
    ``mm_color_roundtrip``). Arrow-batched mapInPandas, map-side."""
    import math

    from nebuia_vector_db_spark.multimodal.jpeg import encode_jpeg_color

    cols = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    width = tiles_per_row * 16

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads, heights = [], [], []
            for doc, text in zip(pdf["doc_id"], pdf[text_col]):
                b = (text or "").encode("utf-8")
                if not b:
                    continue
                ntri = math.ceil(len(b) / 3)
                nrows = math.ceil(ntri / tiles_per_row)
                rgb = np.zeros(nrows * tiles_per_row * 3, dtype=np.uint8)
                rgb[: len(b)] = np.frombuffer(b, dtype=np.uint8)
                grid = rgb.reshape(nrows, tiles_per_row, 3)
                img = grid.repeat(16, axis=0).repeat(16, axis=1)
                ids.append(doc)
                payloads.append(
                    encode_jpeg_color(img, quality=100, subsampling="420")
                )
                heights.append(nrows * 16)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "mime": ["image/jpeg"] * len(ids),
                    "declared_width": [width] * len(ids),
                    "declared_height": heights,
                }
            )

    flat = cols.mapInPandas(
        _enc,
        schema=(
            "doc_id long, payload binary, mime string, "
            "declared_width int, declared_height int"
        ),
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.col("mime"),
            F.col("declared_width"),
            F.col("declared_height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("asset_meta"),
    )


_COLOR_STATS_SCHEMA = (
    "doc_id long, width int, height int, n_pixels bigint, "
    "mean_r double, mean_g double, mean_b double, max_px int"
)


def decode_image_color_real(assets: DataFrame) -> DataFrame:
    """REAL color decode over Arrow batches: full baseline-JPEG parse
    (interleaved YCbCr MCUs, chroma upsample, JFIF color convert) via
    :func:`..multimodal.jpeg.decode_jpeg`, emitting per-image
    per-CHANNEL stats from the decoded RGB buffer. Grayscale streams
    decode too (their single plane reports identical channel means).
    Same scale shape as :func:`decode_image_real`: map-side, payload
    pruned unless projected, no shuffle."""
    from nebuia_vector_db_spark.multimodal.jpeg import decode_jpeg

    cols = assets.select("doc_id", "payload")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "width", "height", "n_pixels",
                "mean_r", "mean_g", "mean_b", "max_px",
            )}
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_jpeg(bytes(pay))
                if px.ndim == 2:
                    px = np.stack([px, px, px], axis=-1)
                h, w = px.shape[:2]
                rows["doc_id"].append(doc)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_pixels"].append(h * w)
                rows["mean_r"].append(float(px[..., 0].mean()))
                rows["mean_g"].append(float(px[..., 1].mean()))
                rows["mean_b"].append(float(px[..., 2].mean()))
                rows["max_px"].append(int(px.max()))
            yield pd.DataFrame(rows)

    return cols.mapInPandas(_decode, schema=_COLOR_STATS_SCHEMA)


def attach_avi_assets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    win_bytes: int = 64,
    hop_bytes: int = 48,
    fps: int = 8,
    blocks_per_row: int = 16,
    container: str = "avi",
) -> DataFrame:
    """Derive a REAL MJPEG-AVI video asset per document (round 4):
    sliding ``win_bytes``-byte windows of the text (hop
    ``hop_bytes``, the STFT framing ``audio_windows_real`` uses for
    audio) each become one exact-by-construction flat-block JPEG
    frame (each byte = a constant 8x8 block, quality=100 — see
    ``attach_jpeg_lossless_assets``), and the frames are muxed into
    a genuine RIFF/AVI container (multimodal/avi.py: hdrl/strl
    headers, 00dc movi chunks, keyframe idx1). The whole clip is
    lossless end to end, so pixel-level per-frame stats and
    scene-change deltas replay exactly from the text bytes in SQL
    (registry row `mm_video_frames`). Documents shorter than one
    window are dropped, mirroring ``audio_windows_real``.

    Arrow-batched mapInPandas, map-side, no shuffle; the payload is
    an opaque binary column until a query decodes it.
    """
    import math

    from nebuia_vector_db_spark.multimodal.avi import encode_avi_mjpeg
    from nebuia_vector_db_spark.multimodal.jpeg import encode_jpeg_gray
    from nebuia_vector_db_spark.multimodal.mkv import encode_mkv_mjpeg
    from nebuia_vector_db_spark.multimodal.mp4 import encode_mp4_mjpeg

    muxers = {
        "avi": (encode_avi_mjpeg, "video/x-msvideo"),
        "mp4": (encode_mp4_mjpeg, "video/mp4"),
        "mkv": (encode_mkv_mjpeg, "video/x-matroska"),
    }
    if container not in muxers:
        raise ValueError(f"unsupported container {container!r}")
    mux, mime = muxers[container]
    if win_bytes % blocks_per_row:
        raise ValueError("win_bytes must be a multiple of blocks_per_row")
    width = blocks_per_row * 8
    height = (win_bytes // blocks_per_row) * 8
    cols = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        ones = np.ones((8, 8), dtype=np.uint8)
        for pdf in batches:
            ids, payloads, n_frames_col = [], [], []
            for doc, text in zip(pdf["doc_id"], pdf[text_col]):
                b = (text or "").encode("utf-8")
                if len(b) < win_bytes:
                    continue
                n_win = (len(b) - win_bytes) // hop_bytes + 1
                arr = np.frombuffer(b, dtype=np.uint8)
                frames = []
                for k in range(n_win):
                    w = arr[k * hop_bytes : k * hop_bytes + win_bytes]
                    grid = w.reshape(-1, blocks_per_row)
                    frames.append(
                        encode_jpeg_gray(np.kron(grid, ones), quality=100)
                    )
                ids.append(doc)
                payloads.append(
                    mux(frames, fps=fps, width=width, height=height)
                )
                n_frames_col.append(n_win)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "mime": [mime] * len(ids),
                    "declared_width": [width] * len(ids),
                    "declared_height": [height] * len(ids),
                    "duration_ms": [
                        int(n * 1000 / fps) for n in n_frames_col
                    ],
                }
            )

    flat = cols.mapInPandas(
        _enc,
        schema=(
            "doc_id long, payload binary, mime string, "
            "declared_width int, declared_height int, duration_ms long"
        ),
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            "mime", "declared_width", "declared_height", "duration_ms"
        ).alias("asset_meta"),
    )


def attach_mkv_assets(
    docs: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    win_bytes: int = 64,
    hop_bytes: int = 48,
    fps: int = 8,
    blocks_per_row: int = 16,
) -> "DataFrame":
    """Matroska twin of :func:`attach_avi_assets`: identical sliding
    windows and exact flat-block JPEG frames, muxed through the EBML
    grammar (multimodal/mkv.py — VINT ids/sizes, Tracks/Cluster/
    SimpleBlock) instead of RIFF or ISO-BMFF. Registry row
    `mm_mkv_frames` reuses the AVI oracle verbatim — same frames,
    third real demuxer."""
    return attach_avi_assets(
        docs, text_col=text_col, id_col=id_col, win_bytes=win_bytes,
        hop_bytes=hop_bytes, fps=fps, blocks_per_row=blocks_per_row,
        container="mkv",
    )


def attach_mp4_assets(
    docs: "DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
    win_bytes: int = 64,
    hop_bytes: int = 48,
    fps: int = 8,
    blocks_per_row: int = 16,
) -> "DataFrame":
    """ISO-BMFF twin of :func:`attach_avi_assets`: identical sliding
    windows and exact flat-block JPEG frames, muxed into an MP4
    (multimodal/mp4.py — ftyp/mdat/moov with full sample tables)
    instead of a RIFF AVI. Same frames, second real demuxer — the
    registry row `mm_mp4_frames` reuses the AVI oracle verbatim."""
    return attach_avi_assets(
        docs, text_col=text_col, id_col=id_col, win_bytes=win_bytes,
        hop_bytes=hop_bytes, fps=fps, blocks_per_row=blocks_per_row,
        container="mp4",
    )


_VIDEO_FRAME_SCHEMA = (
    "doc_id long, frame_id int, fps int, width int, height int, "
    "frame_mean double, frame_max int, delta_mean double"
)


def video_frame_stats(assets: DataFrame) -> DataFrame:
    """REAL video decode: demux the container — magic-sniffed, RIFF
    AVI (``RIFF..AVI ``) or ISO-BMFF MP4 (``ftyp`` at offset 4) —
    JPEG-decode every frame, and emit per-frame pixel stats plus the
    pixel-level scene-change signal (mean |frame_k - frame_{k-1}|) —
    the decoded sibling of the byte-delta ``scene_changes``.
    frame_mean and delta_mean are integer pixel sums divided by a
    power of two, so they are bit-exact doubles and SQL replays them
    with no rounding epsilon. Arrow-batched mapInPandas, map-side, no
    shuffle; each clip decodes independently, so 100 TB of video
    partitions like any other binary column."""
    from nebuia_vector_db_spark.multimodal.avi import (
        AviFormatError,
        decode_avi_mjpeg,
    )
    from nebuia_vector_db_spark.multimodal.jpeg import decode_jpeg_gray
    from nebuia_vector_db_spark.multimodal.mkv import decode_mkv_mjpeg
    from nebuia_vector_db_spark.multimodal.mp4 import decode_mp4_mjpeg

    cols = assets.select("doc_id", "payload")

    def _demux(raw: bytes) -> dict:
        if raw[:4] == b"RIFF":
            return decode_avi_mjpeg(raw)
        if len(raw) > 8 and raw[4:8] == b"ftyp":
            return decode_mp4_mjpeg(raw)
        if raw[:4] == b"\x1aE\xdf\xa3":
            return decode_mkv_mjpeg(raw)
        raise AviFormatError("unrecognized video container magic")

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "frame_id", "fps", "width", "height",
                "frame_mean", "frame_max", "delta_mean",
            )}
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                clip = _demux(bytes(pay))
                prev = None
                for k, fb in enumerate(clip["frames"]):
                    px = decode_jpeg_gray(fb).astype(np.int64)
                    n_px = px.size
                    rows["doc_id"].append(doc)
                    rows["frame_id"].append(k)
                    rows["fps"].append(clip["fps"])
                    rows["width"].append(px.shape[1])
                    rows["height"].append(px.shape[0])
                    rows["frame_mean"].append(int(px.sum()) / n_px)
                    rows["frame_max"].append(int(px.max()))
                    rows["delta_mean"].append(
                        0.0 if prev is None
                        else int(np.abs(px - prev).sum()) / n_px
                    )
                    prev = px
            pdf_out = pd.DataFrame(rows)
            pdf_out["frame_id"] = pdf_out["frame_id"].astype("int32")
            pdf_out["fps"] = pdf_out["fps"].astype("int32")
            pdf_out["width"] = pdf_out["width"].astype("int32")
            pdf_out["height"] = pdf_out["height"].astype("int32")
            pdf_out["frame_max"] = pdf_out["frame_max"].astype("int32")
            yield pdf_out

    return cols.mapInPandas(_stats, schema=_VIDEO_FRAME_SCHEMA)


def attach_gif_assets(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    win_bytes: int = 64,
    hop_bytes: int = 48,
    delay_cs: int = 10,
) -> DataFrame:
    """Animated-GIF asset per document (round 4): the same sliding
    byte windows as ``attach_avi_assets``, but each 64-byte window
    becomes an 8×8 palette-index frame under the identity grayscale
    palette — GIF is LOSSLESS, so no flat-block construction is
    needed: the decoded indices ARE the text bytes, LZW-compressed
    through a genuine variable-width code stream. Documents shorter
    than one window are dropped. Arrow-batched mapInPandas,
    map-side, no shuffle."""
    from nebuia_vector_db_spark.multimodal.gif import encode_gif

    side = int(win_bytes ** 0.5)
    if side * side != win_bytes:
        raise ValueError("win_bytes must be a perfect square")
    cols = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, payloads, n_frames_col = [], [], []
            for doc, text in zip(pdf["doc_id"], pdf[text_col]):
                b = (text or "").encode("utf-8")
                if len(b) < win_bytes:
                    continue
                n_win = (len(b) - win_bytes) // hop_bytes + 1
                arr = np.frombuffer(b, dtype=np.uint8)
                frames = [
                    arr[k * hop_bytes : k * hop_bytes + win_bytes]
                    .reshape(side, side)
                    for k in range(n_win)
                ]
                ids.append(doc)
                payloads.append(encode_gif(frames, delay_cs=delay_cs))
                n_frames_col.append(n_win)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "payload": payloads,
                    "mime": ["image/gif"] * len(ids),
                    "declared_width": [side] * len(ids),
                    "declared_height": [side] * len(ids),
                    "duration_ms": [
                        n * delay_cs * 10 for n in n_frames_col
                    ],
                }
            )

    flat = cols.mapInPandas(
        _enc,
        schema=(
            "doc_id long, payload binary, mime string, "
            "declared_width int, declared_height int, duration_ms long"
        ),
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            "mime", "declared_width", "declared_height", "duration_ms"
        ).alias("asset_meta"),
    )


_GIF_FRAME_SCHEMA = (
    "doc_id long, frame_id int, width int, height int, delay_cs int, "
    "frame_mean double, frame_max int, delta_mean double"
)


def gif_frame_stats(assets: DataFrame) -> DataFrame:
    """Decode animated GIFs and emit per-frame index stats plus the
    consecutive-frame delta — the lossless sibling of
    ``video_frame_stats``: decoded palette indices equal the source
    bytes exactly, so SQL replays every number with no epsilon
    (integer sums over a power-of-two count). Map-side mapInPandas."""
    from nebuia_vector_db_spark.multimodal.gif import decode_gif

    cols = assets.select("doc_id", "payload")

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {k: [] for k in (
                "doc_id", "frame_id", "width", "height", "delay_cs",
                "frame_mean", "frame_max", "delta_mean",
            )}
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                clip = decode_gif(bytes(pay))
                prev = None
                for k, (fr, delay) in enumerate(
                    zip(clip["frames"], clip["delays_cs"])
                ):
                    px = fr.astype(np.int64)
                    rows["doc_id"].append(doc)
                    rows["frame_id"].append(k)
                    rows["width"].append(px.shape[1])
                    rows["height"].append(px.shape[0])
                    rows["delay_cs"].append(delay)
                    rows["frame_mean"].append(int(px.sum()) / px.size)
                    rows["frame_max"].append(int(px.max()))
                    rows["delta_mean"].append(
                        0.0 if prev is None
                        else int(np.abs(px - prev).sum()) / px.size
                    )
                    prev = px
            pdf_out = pd.DataFrame(rows)
            for c in ("frame_id", "width", "height", "delay_cs",
                      "frame_max"):
                pdf_out[c] = pdf_out[c].astype("int32")
            yield pdf_out

    return cols.mapInPandas(_stats, schema=_GIF_FRAME_SCHEMA)


def _mp2_frame_plan(doc_id: int, n_frames: int):
    """The deterministic MP2 construction shared by the encoder kernel
    and (replayed in SQL) ORACLE_MM_MP2 — every quantity is integer
    modular arithmetic over (doc_id, frame, subband, sample):

      alloc_idx(f, sb)  = (doc_id + f + sb) % cap(sb)
          cap = 8 for sb < 11, 7 for 11 <= sb < 23, 3 for sb >= 23
          (caps keep the worst-case frame inside the 256 kbps budget)
      scfsi(sb)         = (doc_id + sb) % 4
      base_scf(sb, p)   = (doc_id * 7 + sb * 5 + p * 11) % 63
      code(f, sb, s)    = (doc_id * 13 + f * 17 + sb * 7 + s) % steps

    The per-part EFFECTIVE scalefactor applies the scfsi sharing
    pattern to the base indices (only transmitted ones survive)."""
    from nebuia_vector_db_spark.multimodal import mpegaudio as M

    frames = []
    for f in range(n_frames):
        allocation, coded = [], []
        for sb in range(M.SBLIMIT):
            _, ladder = M.alloc_table(sb)
            cap = 8 if sb < 11 else (7 if sb < 23 else 3)
            steps = ladder[(doc_id + f + sb) % cap]
            allocation.append(steps)
            if steps:
                coded.append(sb)
        scfsi, scf_idx, codes = [], [], []
        for sb in coded:
            pat = (doc_id + sb) % 4
            base = [(doc_id * 7 + sb * 5 + p * 11) % 63 for p in range(3)]
            scfsi.append(pat)
            scf_idx.append(
                M._scf_expand(pat, M._scf_transmitted(pat, base))
            )
            steps = allocation[sb]
            codes.append(
                [
                    (doc_id * 13 + f * 17 + sb * 7 + s) % steps
                    for s in range(36)
                ]
            )
        frames.append(
            M.Mp2Frame(
                bitrate_kbps=256,
                sample_rate=48000,
                allocation=allocation,
                scfsi=scfsi,
                scf_idx=scf_idx,
                codes=codes,
            )
        )
    return frames


def attach_audio_dup_assets(
    docs: DataFrame,
    id_col: str = "doc_id",
    rate: int = 8000,
    n_keys: int = 127,
) -> DataFrame:
    """Audio corpus WITH planted re-encoded duplicates, for the
    acoustic near-dup pass (operators/audiofp.py, round 11): every
    document maps to a signal KEY (``doc_id % n_keys``), documents
    sharing a key carry the SAME deterministic sawtooth signal, and
    the codec alternates by doc parity — even doc_ids encode WAV
    (RIFF PCM-16), odd ones FLAC. Both are lossless, so same-key
    clips decode to identical PCM through two different real codecs —
    exactly the duplicate class byte-hashing misses and the
    fingerprint must catch.

    Generator (mirrored by ORACLE_DEDUP_AUDIOFP in queries.py):
      key(doc)    = doc_id % n_keys
      n_samples   = key % 200 + 120
      sample[i]   = ((key*37 + i*(key+2)) % 256) * 256 - 32768
    Distinct keys get distinct sawtooth slopes (key+2), i.e. distinct
    fundamentals — measured pairwise fingerprint hamming ≥ 5 across
    keys, 0 within a key."""
    import numpy as np

    from nebuia_vector_db_spark.multimodal.flac import encode_flac
    from nebuia_vector_db_spark.multimodal.wav import encode_wav

    cols = docs.select(F.col(id_col).alias("doc_id"))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, mimes = [], [], []
            for doc in pdf["doc_id"]:
                key = int(doc) % n_keys
                n = key % 200 + 120
                i = np.arange(n, dtype=np.int64)
                samples = (
                    ((key * 37 + i * (key + 2)) % 256) * 256 - 32768
                ).astype(np.int16)
                ids.append(doc)
                if int(doc) % 2 == 0:
                    payloads.append(encode_wav(samples, rate))
                    mimes.append("audio/wav")
                else:
                    payloads.append(
                        encode_flac(samples, rate, block_size=128)
                    )
                    mimes.append("audio/flac")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "mime": mimes}
            )

    flat = cols.mapInPandas(
        _enc, schema="doc_id long, payload binary, mime string"
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.col("mime"),
            F.lit(None).cast("int").alias("declared_width"),
            F.lit(None).cast("int").alias("declared_height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("asset_meta"),
    )


def _lossy_probe_signal(key: int):
    """One of 16 curated TONAL test signals (round 12): two
    superposed triangle waves (ADPCM-friendly constant slopes) plus a
    square wave aligned with fingerprint correlator
    ``HALF_PERIODS[key]`` (a per-key band marker). Curated so that the
    IMA ADPCM re-encode stays within the fingerprint's hamming ≤ 3
    envelope for EVERY key (max planted hamming exactly 3 — the
    boundary is exercised, not avoided) while distinct keys stay ≥ 4
    apart (no spurious cross pairs at the verify threshold). All
    integer arithmetic — ORACLE_DEDUP_AUDIOFP_LOSSY replays it in
    closed form."""
    import numpy as np

    half_periods = (1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64)
    n = key * 12 + 140
    i = np.arange(n, dtype=np.int64)

    def tri(m: int, s: int):
        ph = i % (2 * m)
        return np.where(ph < m, ph, 2 * m - ph) * s - (s * m) // 2

    h = half_periods[key]
    x = (
        tri(4 * key + 6, 320)
        + tri(70 - 4 * key, 280)
        + 1200 * (1 - 2 * ((i // h) % 2))
    )
    return np.clip(x, -32768, 32767).astype(np.int16)


def attach_audio_lossy_assets(
    docs: DataFrame,
    id_col: str = "doc_id",
    rate: int = 8000,
    every: int = 16,
) -> DataFrame:
    """LOSSY re-encode duplicate pairs for the acoustic fingerprint's
    robustness boundary (round 12, VERDICT r11 task #6): each selected
    document (``doc_id % every == 0``) maps to one of 16 curated tonal
    signals (``key = (doc_id // every) % 16`` —
    :func:`_lossy_probe_signal`) and becomes TWO clips — synthetic id
    ``2·doc_id`` is lossless WAV PCM-16, ``2·doc_id+1`` is an IMA
    ADPCM re-encode (WAV format 0x11, 4 bits/sample — a REAL lossy
    codec whose quantization noise perturbs the decoded PCM). The
    fingerprint must still match at hamming ≤ 3; the ADPCM state
    machine is deterministic, so a recursive-CTE oracle
    (ORACLE_DEDUP_AUDIOFP_LOSSY) replays encoder+decoder sample-exactly
    and the whole lossy envelope is hash-certified, not just
    pytest-pinned."""
    from nebuia_vector_db_spark.multimodal.wav import (
        encode_wav,
        encode_wav_adpcm,
    )

    cols = docs.where(F.col(id_col) % every == 0).select(
        F.col(id_col).alias("doc_id")
    )

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, mimes = [], [], []
            for doc in pdf["doc_id"]:
                key = (int(doc) // every) % 16
                samples = _lossy_probe_signal(key)
                ids.append(int(doc) * 2)
                payloads.append(encode_wav(samples, rate))
                mimes.append("audio/wav")
                ids.append(int(doc) * 2 + 1)
                payloads.append(encode_wav_adpcm(samples, rate))
                mimes.append("audio/wav;codec=ima-adpcm")
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "mime": mimes}
            )

    flat = cols.mapInPandas(
        _enc, schema="doc_id long, payload binary, mime string"
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.col("mime"),
            F.lit(None).cast("int").alias("declared_width"),
            F.lit(None).cast("int").alias("declared_height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("asset_meta"),
    )


def attach_flac_assets(
    docs: DataFrame, id_col: str = "doc_id", rate: int = 8000
) -> DataFrame:
    """Derive a REAL FLAC asset per document: a deterministic sawtooth
    int16 signal (piecewise-linear, so the fixed predictors genuinely
    compress it — and pure modular arithmetic, so a SQL oracle can
    regenerate every sample) encoded through the pure-Python FLAC
    subset codec (multimodal/flac.py — STREAMINFO + MD5, framed Rice-
    coded fixed-predictor subframes, CRC-8/CRC-16). Arrow-batched
    mapInPandas, map-side, no shuffle.

    Generator (mirrored by ORACLE_MM_FLAC in queries.py):
      n_samples(doc) = doc_id % 300 + 150
      sample[i]      = ((doc_id * 7 + i) % 256) * 256 - 32768
    """
    import numpy as np

    from nebuia_vector_db_spark.multimodal.flac import encode_flac

    cols = docs.select(F.col(id_col).alias("doc_id"))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads, raws = [], [], []
            for doc in pdf["doc_id"]:
                n = int(doc) % 300 + 150
                i = np.arange(n, dtype=np.int64)
                samples = (
                    ((int(doc) * 7 + i) % 256) * 256 - 32768
                ).astype(np.int16)
                ids.append(doc)
                # 128-sample frames: short clips still get multiple
                # frames, so a sawtooth wrap spike lands in a small
                # (or partitionable) frame instead of poisoning one
                # odd-length frame's single Rice partition
                payloads.append(encode_flac(samples, rate, block_size=128))
                raws.append(n * 2)
            yield pd.DataFrame(
                {"doc_id": ids, "payload": payloads, "raw_bytes": raws}
            )

    flat = cols.mapInPandas(
        _enc, schema="doc_id long, payload binary, raw_bytes long"
    )
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("audio/flac").alias("mime"),
            F.lit(None).cast("int").alias("declared_width"),
            F.lit(None).cast("int").alias("declared_height"),
            F.col("raw_bytes").alias("duration_ms"),
        ).alias("asset_meta"),
    )


def decode_audio_flac(assets: DataFrame) -> DataFrame:
    """REAL FLAC decode over Arrow batches: full stream parse
    (STREAMINFO, frame CRC-8/CRC-16, Rice residual decode, fixed-
    predictor reconstruction, PCM MD5 verification) and per-clip
    stats from the DECODED samples — the same exact-integer stat
    discipline as :func:`decode_audio_real`, so `mm_flac_audio` is a
    full content-hash row certifying the compressed round trip is
    lossless end-to-end. Also reports the achieved compression
    (raw/encoded bytes; test- and bench-checked, not oracle-checked —
    the encoded size is codec-internal)."""
    import math

    from nebuia_vector_db_spark.multimodal.flac import decode_flac

    cols = assets.select("doc_id", "payload")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, rates, ns, peaks, means, rmss, comps = (
                [], [], [], [], [], [], []
            )
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(pay)
                rate, samples = decode_flac(raw)
                s = samples.astype(np.int64)
                n = len(s)
                ids.append(doc)
                rates.append(rate)
                ns.append(n)
                peaks.append(int(np.abs(s).max()) if n else 0)
                means.append(float(s.sum()) / n if n else 0.0)
                rmss.append(
                    math.sqrt(float((s * s).sum()) / n) if n else 0.0
                )
                comps.append((n * 2) / len(raw) if len(raw) else 0.0)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "sample_rate": pd.array(rates, dtype="int32"),
                    "n_samples": ns,
                    "peak": pd.array(peaks, dtype="int32"),
                    "mean_sample": means,
                    "rms": rmss,
                    "compression_x": comps,
                }
            )

    return cols.mapInPandas(
        _decode,
        schema=(
            "doc_id long, sample_rate int, n_samples long, peak int, "
            "mean_sample double, rms double, compression_x double"
        ),
    )


def attach_mp2_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a REAL MPEG-1 Layer II asset per document: the
    deterministic frame plan above, packed through the genuine Layer
    II bitstream encoder (multimodal/mpegaudio.py — header, Table
    B.2a allocation, scfsi, scalefactors, grouped/plain codes).
    Arrow-batched mapInPandas, map-side, no shuffle.

    n_frames(doc) = doc_id % 3 + 1."""
    from nebuia_vector_db_spark.multimodal.mpegaudio import encode_mp2

    cols = docs.select(F.col(id_col).alias("doc_id"))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc in pdf["doc_id"]:
                n_frames = int(doc) % 3 + 1
                ids.append(doc)
                payloads.append(
                    encode_mp2(_mp2_frame_plan(int(doc), n_frames))
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    flat = cols.mapInPandas(_enc, schema="doc_id long, payload binary")
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("audio/mpeg").alias("mime"),
            F.lit(None).cast("int").alias("declared_width"),
            F.lit(None).cast("int").alias("declared_height"),
            ((F.col("doc_id") % 3 + 1) * 24).alias("duration_ms"),
        ).alias("asset_meta"),
    )


_MP2_DECODE_SCHEMA = (
    "doc_id long, n_frames int, bitrate_kbps int, sample_rate int, "
    "total_bytes long, n_samples long, n_coded int, sum_steps long, "
    "sum_codes long, max_code int, sum_scf long"
)


def decode_audio_mp2(assets: DataFrame) -> DataFrame:
    """REAL perceptual-codec decode over Arrow batches: parse the
    Layer II stream (sync/header validation, Table B.2a allocation,
    scfsi expansion, grouped-code unpacking) and emit per-doc stats
    computed from the DECODED frames — exact integers throughout, so
    the SQL oracle that replays the frame plan proves the whole
    bitstream layer (a packing or parsing bug anywhere shifts a sum).
    ``sum_scf`` sums the per-part EFFECTIVE scalefactor indices, so
    the scfsi sharing patterns are hash-checked too. Map-side, no
    shuffle; the dequantized float path is pinned by
    tests/test_mpegaudio.py (SNR + grid identities)."""
    from nebuia_vector_db_spark.multimodal.mpegaudio import (
        SBLIMIT,
        decode_mp2,
    )

    cols = assets.select("doc_id", "payload")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(pay)
                frames = decode_mp2(raw)
                n_coded = sum_steps = sum_codes = sum_scf = 0
                max_code = 0
                for fr in frames:
                    coded = [
                        sb for sb in range(SBLIMIT) if fr.allocation[sb]
                    ]
                    n_coded += len(coded)
                    for pos, sb in enumerate(coded):
                        sum_steps += fr.allocation[sb]
                        sum_scf += sum(fr.scf_idx[pos])
                        for v in fr.codes[pos]:
                            sum_codes += v
                            max_code = max(max_code, v)
                rows.append(
                    (
                        doc,
                        len(frames),
                        frames[0].bitrate_kbps,
                        frames[0].sample_rate,
                        len(raw),
                        len(frames) * 1152,
                        n_coded,
                        sum_steps,
                        sum_codes,
                        max_code,
                        sum_scf,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_frames", "bitrate_kbps", "sample_rate",
                    "total_bytes", "n_samples", "n_coded", "sum_steps",
                    "sum_codes", "max_code", "sum_scf",
                ],
            )

    return cols.mapInPandas(_decode, schema=_MP2_DECODE_SCHEMA)


# ----------------------------------------------------------- H.264 intra
def _h264_plan(doc_id: int):
    """The deterministic H.264 I-frame construction shared by the
    encoder kernel and (replayed in SQL) ORACLE_MM_H264 — every
    quantity is integer modular arithmetic over (doc_id, mbx, i, j):

      w_mbs = 2 + doc_id % 3,  h_mbs = 2 + doc_id % 2
      mb row 0 = I_PCM:
        luma(mbx, i, j) = (doc_id*31 + mbx*17 + i*5 + j*3) % 200 + 20
        cb(mbx, i, j)   = (doc_id*7  + mbx*13 + i*11 + j)  % 200 + 20
        cr(mbx, i, j)   = (doc_id*5  + mbx*19 + i*3 + j*7) % 200 + 20
      mb rows >= 1 = I_16x16 Vertical prediction (CBP 0): each luma
      column inherits the PCM bottom-row sample above it — pixel
      reconstruction is exact integer math the oracle replays.

    The 20..219 sample range keeps PCM payloads free of zero bytes so
    emulation prevention stays out of the CLOSED-FORM replay (the EP
    path itself is pinned by tests/test_h264.py with planted 00 00 01
    runs)."""
    import numpy as np

    from nebuia_vector_db_spark.multimodal.h264 import PRED_V, H264Plan

    w_mbs = 2 + doc_id % 3
    h_mbs = 2 + doc_id % 2
    i16 = np.arange(16, dtype=np.int64)
    i8 = np.arange(8, dtype=np.int64)
    mbs = []
    for mbx in range(w_mbs):
        y = (
            doc_id * 31 + mbx * 17 + i16[:, None] * 5 + i16[None, :] * 3
        ) % 200 + 20
        cb = (
            doc_id * 7 + mbx * 13 + i8[:, None] * 11 + i8[None, :]
        ) % 200 + 20
        cr = (
            doc_id * 5 + mbx * 19 + i8[:, None] * 3 + i8[None, :] * 7
        ) % 200 + 20
        mbs.append(
            (
                "pcm",
                y.astype(np.uint8),
                cb.astype(np.uint8),
                cr.astype(np.uint8),
            )
        )
    mbs.extend([("i16", PRED_V)] * (w_mbs * (h_mbs - 1)))
    return H264Plan(w_mbs, h_mbs, mbs)


def attach_h264_assets(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Derive a REAL H.264 baseline I-frame asset per document: the
    deterministic plan above through the genuine Annex-B encoder
    (multimodal/h264.py — SPS/PPS/IDR NALs, exp-Golomb headers, I_PCM
    samples with emulation prevention, I_16x16 mb syntax with the
    CAVLC zero-coefficient luma-DC block). Arrow-batched mapInPandas,
    map-side, no shuffle."""
    from nebuia_vector_db_spark.multimodal.h264 import encode_h264_iframe

    cols = docs.select(F.col(id_col).alias("doc_id"))

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for doc in pdf["doc_id"]:
                ids.append(doc)
                payloads.append(encode_h264_iframe(_h264_plan(int(doc))))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    flat = cols.mapInPandas(_enc, schema="doc_id long, payload binary")
    return flat.select(
        "doc_id",
        "payload",
        F.struct(
            F.lit("video/h264").alias("mime"),
            ((F.col("doc_id") % 3 + 2) * 16).cast("int").alias(
                "declared_width"
            ),
            ((F.col("doc_id") % 2 + 2) * 16).cast("int").alias(
                "declared_height"
            ),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("asset_meta"),
    )


_H264_DECODE_SCHEMA = (
    "doc_id long, width int, height int, n_mbs int, n_pcm_mbs int, "
    "n_i16_mbs int, sum_luma long, max_luma int, sum_pcm_luma long, "
    "sum_pcm_chroma long"
)


def decode_video_h264(assets: DataFrame) -> DataFrame:
    """REAL H.264 decode over Arrow batches: parse the Annex-B stream
    (NAL split, emulation-byte removal, SPS/PPS/slice headers,
    macroblock layer incl. the always-present CAVLC luma-DC block
    under real nC contexts — I_PCM tops force the nC >= 8 FLC path)
    and reconstruct every pixel via the spec's intra prediction. Stats
    are exact integers over the RECONSTRUCTED frame, so the SQL oracle
    replaying the plan certifies headers, PCM passthrough, emulation
    handling, AND the prediction arithmetic end to end. Map-side, no
    shuffle."""
    from nebuia_vector_db_spark.multimodal.h264 import decode_h264

    cols = assets.select("doc_id", "payload")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for doc, pay in zip(pdf["doc_id"], pdf["payload"]):
                frame = decode_h264(bytes(pay))
                w_mbs = frame.sps.width_mbs
                y = frame.y.astype(np.int64)
                sum_pcm_luma = sum_pcm_chroma = 0
                n_pcm = 0
                for idx, kind in enumerate(frame.mb_types):
                    if kind != "pcm":
                        continue
                    n_pcm += 1
                    mbx, mby = idx % w_mbs, idx // w_mbs
                    sum_pcm_luma += int(
                        y[
                            mby * 16 : mby * 16 + 16,
                            mbx * 16 : mbx * 16 + 16,
                        ].sum()
                    )
                    for plane in (frame.cb, frame.cr):
                        sum_pcm_chroma += int(
                            plane[
                                mby * 8 : mby * 8 + 8,
                                mbx * 8 : mbx * 8 + 8,
                            ].astype(np.int64).sum()
                        )
                rows.append(
                    (
                        doc,
                        y.shape[1],
                        y.shape[0],
                        len(frame.mb_types),
                        n_pcm,
                        len(frame.mb_types) - n_pcm,
                        int(y.sum()),
                        int(y.max()),
                        sum_pcm_luma,
                        sum_pcm_chroma,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "n_mbs", "n_pcm_mbs",
                    "n_i16_mbs", "sum_luma", "max_luma", "sum_pcm_luma",
                    "sum_pcm_chroma",
                ],
            )

    return cols.mapInPandas(_decode, schema=_H264_DECODE_SCHEMA)
