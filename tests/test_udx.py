"""User-extensible function surface (functions/udx.py): Python UDTF
via SQL LATERAL + grouped-aggregate pandas UDAF."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.udx import (
    ChunkTextUDTF,
    label_centroids_udaf,
    register_udtfs,
)
from nebuia_vector_db_spark.sources.registry import load_table


def test_chunk_udtf_lateral_sql(spark, sf_smoke):
    register_udtfs(spark)
    docs = load_table(spark, sf_smoke, "documents").limit(10)
    docs.createOrReplaceTempView("udtf_docs")
    out = spark.sql(
        """
        SELECT d.doc_id, c.chunk_id, c.chunk_text
        FROM udtf_docs d, LATERAL chunk_text(d.text, 16, 4) c
        """
    ).collect()
    assert out

    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r["chunk_id"])
        words = [w for w in src[doc_id].split(" ") if w]
        # chunk_ids are dense from 0; every chunk is <= 16 words;
        # consecutive chunks overlap by exactly 4 words (step 12)
        assert [r["chunk_id"] for r in rows] == list(range(len(rows)))
        for i, r in enumerate(rows):
            piece = r["chunk_text"].split(" ")
            assert len(piece) <= 16
            assert piece == words[i * 12 : i * 12 + 16]
        # full coverage: concatenating de-overlapped chunks == text
        rebuilt = rows[0]["chunk_text"].split(" ")
        for r in rows[1:]:
            rebuilt += r["chunk_text"].split(" ")[4:]
        assert rebuilt == words


def test_chunk_udtf_empty_and_null():
    gen = ChunkTextUDTF()
    assert list(gen.eval(None, 8, 2)) == []
    assert list(gen.eval("", 8, 2)) == []
    assert list(gen.eval("one two", 8, 2)) == [(0, "one two")]


def test_mean_vector_udaf_matches_numpy(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    got = {
        r["label"]: np.asarray(r["centroid"])
        for r in label_centroids_udaf(emb).collect()
    }
    rows = emb.select("label", "embedding").collect()
    want: dict = {}
    for r in rows:
        want.setdefault(r["label"], []).append(
            np.asarray(r["embedding"], dtype=np.float64)
        )
    assert set(got) == set(want)
    for label, vs in want.items():
        np.testing.assert_allclose(
            got[label], np.mean(np.stack(vs), axis=0), rtol=0, atol=1e-12
        )
