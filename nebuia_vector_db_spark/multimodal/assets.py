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
- the actual codec is STUBBED: this container has no image/audio
  libraries. ``decode_image_real`` raises ``NotImplementedError`` and
  documents the integration point; ``decode_image_features`` computes
  a *deterministic fake decode* over the raw bytes (dims derived from
  md5, pixel stats = byte stats) so the Spark-side plumbing — schema,
  batch shape, partitioning — is fully real and oracle-testable.

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


def decode_image_real(assets: DataFrame) -> DataFrame:
    """The real-codec integration point — NOT IMPLEMENTED here (no
    PIL/opencv/ffmpeg in this environment by design).

    A deployment installs the codec on executors and swaps the batch
    body::

        from PIL import Image
        img = Image.open(io.BytesIO(payload))
        width, height = img.size  # then real pixel stats / resize

    Everything else (schema, mapInPandas, partitioning) is shared with
    :func:`decode_image_features`.
    """
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real image decode requires an image library on the executors; "
            "use decode_image_features (deterministic fake) in this environment"
        ) from e
    raise NotImplementedError("wire PIL decode here when available")


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
