"""Binary quantization (operators/bq.py)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.bq import (
    bq_encode,
    bq_similarity_bits,
    bq_topk,
    bq_topk_rerank,
    encode_query_bits,
)


def _df(spark, mat):
    pdf = pd.DataFrame(
        {"vec_id": range(len(mat)), "embedding": [list(r) for r in mat]}
    )
    return spark.createDataFrame(pdf)


def _np_words(mat):
    """NumPy reference packer: bit j of word w = mat[:, w*64+j] > 0."""
    n, d = mat.shape
    nwords = -(-d // 64)
    out = np.zeros((n, nwords), dtype=np.uint64)
    for i in range(d):
        w, j = divmod(i, 64)
        out[:, w] |= (mat[:, i] > 0).astype(np.uint64) << np.uint64(j)
    return out.astype(np.int64)  # wrap to signed, matching LongType


def test_encode_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 64))
    mat[0, :] = 0.0  # all-zero vector -> word 0
    mat[1, :] = 1.0  # all-positive -> word -1 (all 64 bits set)
    rows = bq_encode(_df(spark, mat), dim=64).orderBy("vec_id").collect()
    ref = _np_words(mat)
    got = np.array([[r["bq_w0"]] for r in rows], dtype=np.int64)
    assert np.array_equal(got, ref)
    assert rows[0]["bq_w0"] == 0
    assert rows[1]["bq_w0"] == -1


def test_encode_multiword_and_partial_tail(spark):
    """96 dims -> 2 words; the tail word uses only its low 32 bits."""
    rng = np.random.default_rng(8)
    mat = rng.normal(size=(25, 96))
    rows = bq_encode(_df(spark, mat), dim=96).orderBy("vec_id").collect()
    ref = _np_words(mat)
    got = np.array([[r["bq_w0"], r["bq_w1"]] for r in rows], dtype=np.int64)
    assert np.array_equal(got, ref)
    # tail word never touches bits >= 32
    assert all((np.uint64(r["bq_w1"]) >> np.uint64(32)) == 0 for r in rows)


def test_query_encoder_matches_spark_packing(spark):
    rng = np.random.default_rng(9)
    mat = rng.normal(size=(10, 64))
    spark_words = [
        r["bq_w0"]
        for r in bq_encode(_df(spark, mat), dim=64).orderBy("vec_id").collect()
    ]
    for i in range(10):
        assert encode_query_bits(mat[i])[0] == spark_words[i]


def test_sim_bits_equals_pm1_dot(spark):
    """d - 2*hamming must equal the exact ±1 dot product."""
    rng = np.random.default_rng(10)
    mat = rng.normal(size=(60, 64))
    q = rng.normal(size=64)
    qwords = encode_query_bits(q)
    enc = bq_encode(_df(spark, mat), dim=64)
    rows = (
        enc.withColumn("sim_bits", bq_similarity_bits(qwords, 64))
        .orderBy("vec_id")
        .collect()
    )
    qs = np.where(q > 0, 1, -1)
    for r in rows:
        ms = np.where(mat[r["vec_id"]] > 0, 1, -1)
        assert r["sim_bits"] == int(ms @ qs)


def test_topk_matches_numpy_and_is_shuffle_free(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(200, 64))
    q = rng.normal(size=64)
    df = _df(spark, mat).repartition(8)
    got = bq_topk(df, q, 10).select("vec_id", "sim_bits").collect()
    qs = np.where(q > 0, 1, -1)
    sims = (np.where(mat > 0, 1, -1) @ qs).astype(int)
    order = sorted(range(200), key=lambda i: (-sims[i], i))[:10]
    assert [r["vec_id"] for r in got] == order
    assert [r["sim_bits"] for r in got] == [sims[i] for i in order]
    plan = bq_topk(df, q, 10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[0]


def test_rerank_returns_exact_scores_and_validates_k(spark):
    rng = np.random.default_rng(12)
    mat = rng.normal(size=(120, 64))
    q = rng.normal(size=64)
    df = _df(spark, mat)
    got = bq_topk_rerank(df, q, 5, rerank_k=120).collect()
    # rerank_k = n  =>  identical to exact brute-force top-k
    qn = q / np.linalg.norm(q)
    exact = mat @ qn
    order = sorted(range(120), key=lambda i: (-exact[i], i))[:5]
    assert [r["vec_id"] for r in got] == order
    for r, i in zip(got, order):
        assert r["similarity"] == pytest.approx(exact[i], rel=1e-9)
    with pytest.raises(ValueError):
        bq_topk_rerank(df, q, 10, rerank_k=5)


def test_dim_word_validation():
    with pytest.raises(ValueError):
        bq_similarity_bits([1, 2], 64)  # 64 dims need exactly 1 word
    with pytest.raises(ValueError):
        bq_encode(None, dim=0)  # dim must be positive
