"""SQ8 scalar quantization (operators/sq.py)."""

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.sq import (
    sq8_encode,
    sq8_similarity,
    sq8_topk,
)


def _df(spark, mat):
    pdf = pd.DataFrame(
        {"vec_id": range(len(mat)), "embedding": [list(r) for r in mat]}
    )
    return spark.createDataFrame(pdf)


def test_codes_bounded_and_roundtrip_error(spark):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(50, 16)).astype(np.float64)
    rows = sq8_encode(_df(spark, mat)).collect()
    for r in rows:
        codes = np.array(r["sq8_codes"])
        assert codes.min() >= -127 and codes.max() <= 127
        deq = codes * r["sq8_scale"]
        x = mat[r["vec_id"]]
        # per-dim error <= scale/2 by construction
        assert np.abs(deq - x).max() <= r["sq8_scale"] / 2 + 1e-12


def test_zero_vector_encodes_to_zero(spark):
    rows = sq8_encode(_df(spark, [[0.0] * 8])).collect()
    assert all(c == 0 for c in rows[0]["sq8_codes"])


def test_similarity_close_to_exact_and_topk_overlap(spark):
    rng = np.random.default_rng(4)
    mat = rng.normal(size=(300, 32))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    q = mat[11]
    df = _df(spark, mat)
    got = sq8_topk(df, q.tolist(), 10, tie_cols=["vec_id"]).collect()
    # int8 on unit vectors: relative sim error well under 1%
    exact = mat @ q
    for r in got:
        assert abs(r["similarity"] - exact[r["vec_id"]]) < 0.01
    # query itself must be rank 1
    assert got[0]["vec_id"] == 11
    want = set(np.argsort(-exact)[:10].tolist())
    assert len({r["vec_id"] for r in got} & want) >= 9


def test_sq8_plan_is_single_stage_topk(spark):
    from nebuia_vector_db_spark.plans.inspect import (
        _executed_plan,
        shuffle_count,
    )

    rng = np.random.default_rng(5)
    df = _df(spark, rng.normal(size=(40, 8)))
    out = sq8_topk(df, [1.0] * 8, 5, tie_cols=["vec_id"])
    assert shuffle_count(out) == 0
    assert "TakeOrderedAndProject" in _executed_plan(out)
