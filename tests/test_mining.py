"""operators/mining.py — hard-negative mining.

The vs_hard_negatives oracle row hash-certifies the full pipeline
against DuckDB; these tests pin semantics the hash can't isolate:
NULL-label exclusion, self-exclusion, k validation, and a brute-force
reference on a tiny controlled corpus.
"""

import math

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.mining import hard_negatives


def _corpus(spark):
    rows = [
        (0, [1.0, 0.0], "a"),
        (1, [0.9, 0.1], "a"),   # same label as query 0 — never a negative
        (2, [0.8, 0.2], "b"),
        (3, [0.7, 0.3], "b"),
        (4, [0.6, 0.4], None),  # unknown label — conservatively excluded
        (5, [0.0, 1.0], "c"),
    ]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    )


def _queries(corpus, ids):
    return corpus.where(F.col("vec_id").isin(ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("query_label"),
    )


def test_hard_negatives_reference(spark):
    corpus = _corpus(spark)
    out = hard_negatives(
        _queries(corpus, [0]),
        corpus,
        k=3,
        tie_cols=["vec_id"],
        exclude_ids=("query_id", "vec_id"),
    ).collect()
    got = [(r.vec_id, r.rk) for r in sorted(out, key=lambda r: r.rk)]
    # label 'a' (ids 0,1) and NULL (id 4) excluded; ranked by cosine
    # against normalized [1,0]: id2=0.8, id3=0.7, id5=0.0
    assert got == [(2, 1), (3, 2), (5, 3)]
    sims = {r.vec_id: r.similarity for r in out}
    assert math.isclose(sims[2], 0.8, rel_tol=1e-12)
    # query's own label never appears among negatives
    assert all(r.label != "a" for r in out)


def test_hard_negatives_null_and_self_exclusion(spark):
    corpus = _corpus(spark)
    out = hard_negatives(
        _queries(corpus, [2]),
        corpus,
        k=10,
        tie_cols=["vec_id"],
        exclude_ids=("query_id", "vec_id"),
    ).collect()
    ids = {r.vec_id for r in out}
    assert 2 not in ids  # self excluded
    assert 4 not in ids  # NULL label excluded
    assert 3 not in ids  # same label 'b' excluded
    assert ids == {0, 1, 5}


def test_hard_negatives_without_exclude_ids_keeps_other_labels_only(spark):
    corpus = _corpus(spark)
    out = hard_negatives(_queries(corpus, [0]), corpus, k=10).collect()
    assert {r.vec_id for r in out} == {2, 3, 5}


def test_hard_negatives_k_validation(spark):
    corpus = _corpus(spark)
    with pytest.raises(ValueError):
        hard_negatives(_queries(corpus, [0]), corpus, k=0)


def test_column_collision_fails_fast(spark):
    corpus = _corpus(spark)
    # un-aliased query side shares 'label'/'embedding' with the corpus
    with pytest.raises(ValueError, match="share column"):
        hard_negatives(
            corpus.withColumnRenamed("vec_id", "query_id").withColumn(
                "query_vec", F.col("embedding")
            ).withColumn("query_label", F.col("label")),
            corpus,
            k=1,
        )


def test_rocchio_matches_pure_python_reference(spark):
    """Integer-exact expansion: Spark ≡ a from-scratch reference of
    the documented recurrence (floor micro quantization, BIGINT
    accumulation, alpha·k scaling instead of division)."""
    from nebuia_vector_db_spark.operators.mining import rocchio_expand

    rows = [
        (0, [1.0, 0.0, -0.5]),
        (1, [0.9, 0.1, 0.0]),
        (2, [0.8, 0.2, 0.3]),
        (3, [-0.7, 0.3, 0.9]),
        (4, [0.6, -0.4, 0.2]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qs = emb.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    got = rocchio_expand(qs, emb, fb_k=2, alpha_pct=100, beta_pct=75)
    got = list(got.collect()[0].expanded_vec)

    vecs = {i: v for i, v in rows}
    n = math.sqrt(sum_lr(vecs[0]))
    qv = [x / n for x in vecs[0]]
    sims = sorted(
        ((dot_lr(vecs[i], qv), i) for i in vecs), key=lambda t: (-t[0], t[1])
    )[:2]
    fb = [
        sum(math.floor(vecs[i][d] * 1e6 + 0.5) for _, i in sims)
        for d in range(3)
    ]
    qm = [math.floor(x * 1e6 + 0.5) for x in qv]
    want = [float(100 * 2 * qm[d] + 75 * fb[d]) for d in range(3)]
    assert got == want


def sum_lr(v):
    a = 0.0
    for x in v:
        a += x * x
    return a


def dot_lr(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def test_rocchio_validation(spark):
    from nebuia_vector_db_spark.operators.mining import rocchio_expand

    emb = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    qs = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    with pytest.raises(ValueError):
        rocchio_expand(qs, emb, fb_k=0)
    with pytest.raises(ValueError):
        rocchio_expand(qs, emb, fb_k=1, alpha_pct=-1)
