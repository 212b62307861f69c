"""Model-based quality classifier (operators/classifier.py):
distillation agreement, determinism, scoring-plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.text import quality_score
from nebuia_vector_db_spark.operators.classifier import (
    score_quality,
    train_quality_classifier,
)
from nebuia_vector_db_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def labeled(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    q = docs.withColumn("_q", quality_score("text"))
    thr = q.agg(F.expr("percentile(_q, 0.5)")).collect()[0][0]
    return q.withColumn("label", F.col("_q") >= F.lit(float(thr))).cache()


def test_distillation_beats_majority_on_holdout(spark, labeled):
    clf = train_quality_classifier(
        labeled.where(F.col("doc_id") % 2 == 0), F.col("label")
    )
    out = score_quality(labeled, clf).join(
        labeled.select("doc_id", "label"), "doc_id"
    )
    hold = out.where(F.col("doc_id") % 2 == 1)
    acc = hold.agg(
        F.avg((F.col("pred") == F.col("label")).cast("double"))
    ).collect()[0][0]
    base = hold.agg(
        F.greatest(
            F.avg(F.col("label").cast("double")),
            1 - F.avg(F.col("label").cast("double")),
        )
    ).collect()[0][0]
    assert acc > base + 0.1  # clearly better than predicting the mode
    assert out.count() == labeled.count()


def test_training_is_deterministic(spark, labeled):
    train = labeled.where(F.col("doc_id") % 2 == 0)
    a = train_quality_classifier(train, F.col("label"))
    b = train_quality_classifier(train, F.col("label"))
    pa = {r["doc_id"]: r["prob"] for r in score_quality(labeled, a).collect()}
    pb = {r["doc_id"]: r["prob"] for r in score_quality(labeled, b).collect()}
    assert pa == pb  # zero init + fixed partitioning -> identical fit


def test_scoring_is_shuffle_free(spark, labeled):
    clf = train_quality_classifier(
        labeled.where(F.col("doc_id") % 2 == 0), F.col("label")
    )
    plan = (
        score_quality(labeled, clf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan  # broadcast-coefficient projection


def test_scoring_works_on_a_stream_identically(spark, sf_smoke, labeled):
    """The broadcast-coefficient projection is stateless, so the same
    model scores a file stream append-safely — AvailableNow output
    equals the batch scorer bit-for-bit (the deployment shape shared
    with streaming/quality.py)."""
    import os

    from nebuia_vector_db_spark.streaming.events import run_to_memory

    clf = train_quality_classifier(
        labeled.where(F.col("doc_id") % 2 == 0), F.col("label")
    )
    docs = load_table(spark, sf_smoke, "documents")
    want = sorted(tuple(r) for r in score_quality(docs, clf).collect())
    phys = spark.read.parquet(
        os.path.join(sf_smoke, "documents.parquet")
    ).schema
    stream = (
        spark.readStream.schema(phys)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_smoke)
    )
    out = score_quality(stream, clf)
    assert out.isStreaming
    got = sorted(
        tuple(r) for r in run_to_memory(out, "t_clf_stream").collect()
    )
    assert got == want
