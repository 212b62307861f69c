"""Multimodal plumbing (multimodal/assets.py): schema, mapInPandas
batch shape, determinism, and the stubbed real-codec gate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.multimodal.assets import (
    attach_fake_assets,
    decode_image_features,
    decode_image_real,
    sample_frames,
)
from nebuia_vector_db_spark.sources.registry import load_table


def test_asset_schema_and_payload(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    assets = attach_fake_assets(docs)
    assert dict(assets.dtypes)["payload"] == "binary"
    row = assets.join(docs, "doc_id").select("payload", "text").head()
    assert bytes(row["payload"]) == row["text"].encode("utf-8")
    meta = assets.select("asset_meta.*").head()
    assert 1 <= meta["declared_width"] <= 64
    assert 1 <= meta["declared_height"] <= 64


def test_decode_features_match_python(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    feats = decode_image_features(attach_fake_assets(docs))
    got = {r["doc_id"]: r for r in feats.collect()}
    for r in docs.select("doc_id", "text").collect():
        b = r["text"].encode("utf-8")
        f = got[r["doc_id"]]
        assert f["n_bytes"] == len(b)
        assert f["max_byte"] == max(b)
        assert abs(f["mean_byte"] - sum(b) / len(b)) < 1e-9


def test_decode_is_deterministic(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(50)
    a = decode_image_features(attach_fake_assets(docs)).orderBy("doc_id").collect()
    b = decode_image_features(attach_fake_assets(docs)).orderBy("doc_id").collect()
    assert a == b


def test_frame_sample_counts(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    out = sample_frames(attach_fake_assets(docs), frame_bytes=16, stride=4)
    for r in out.collect():
        assert r["n_frames"] == r["n_bytes"] // 16
        ids = r["sampled_frame_ids"]
        assert ids == list(range(0, r["n_frames"], 4))
        assert r["n_sampled"] == len(ids)


def test_real_decode_rejects_non_png_payloads(spark, sf_smoke):
    """decode_image_real is a REAL codec since round 3 (stdlib PNG);
    feeding it non-PNG bytes (attach_fake_assets = raw text bytes)
    must fail cleanly at execution with the signature error, not
    produce garbage stats."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    docs = load_table(spark, sf_smoke, "documents").limit(1)
    with pytest.raises((PythonException, Py4JJavaError), match="not a PNG"):
        decode_image_real(attach_fake_assets(docs)).collect()


def test_payload_prunable(spark, sf_smoke):
    """Metadata-only queries must not read the payload column — the
    parquet scan's ReadSchema excludes it (columnar pruning)."""
    import os
    import shutil
    import tempfile

    docs = load_table(spark, sf_smoke, "documents")
    path = os.path.join(tempfile.mkdtemp(prefix="mm_prune_"), "assets.parquet")
    attach_fake_assets(docs).write.parquet(path)
    meta_only = spark.read.parquet(path).select("doc_id", "asset_meta.mime")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan
    shutil.rmtree(os.path.dirname(path), ignore_errors=True)


def test_audio_windows_boundaries_and_hashes(spark):
    import hashlib

    from nebuia_vector_db_spark.multimodal.assets import audio_windows

    payload = bytes(range(256)) * 2  # 512 bytes → 3 windows at 256/128
    df = spark.createDataFrame(
        [(1, bytearray(payload)), (2, bytearray(b"short"))],
        "doc_id long, payload binary",
    )
    rows = audio_windows(df, win_bytes=256, hop_bytes=128).collect()
    got = {(r["doc_id"], r["window_id"]): r for r in rows}
    assert set(got) == {(1, 0), (1, 1), (1, 2)}  # doc 2 too short
    for w in range(3):
        s = w * 128
        assert got[(1, w)]["start_byte"] == s
        assert (
            got[(1, w)]["window_md5"]
            == hashlib.md5(payload[s : s + 256]).hexdigest()
        )
