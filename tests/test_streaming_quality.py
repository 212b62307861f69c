"""Streaming LM quality filter (streaming/quality.py): AvailableNow
output must equal the batch scorer bit-for-bit, the plan must stay
stateless/append-safe, and the artifact must honor model pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators import lm
from nebuia_vector_db_spark.sources.registry import load_table
from nebuia_vector_db_spark.streaming.events import run_to_memory
from nebuia_vector_db_spark.streaming.quality import (
    lm_artifact,
    perplexity_filter_stream,
)


@pytest.fixture(scope="module")
def model(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    return lm.train_bigram_lm(docs.where(F.col("lang") == "en"))


def _docs_stream(spark, sf_smoke):
    phys = spark.read.parquet(
        os.path.join(sf_smoke, "documents.parquet")
    ).schema
    return (
        spark.readStream.schema(phys)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_smoke)
    )


def test_stream_equals_batch_scorer_exactly(spark, sf_smoke, model):
    docs = load_table(spark, sf_smoke, "documents")
    want = sorted(
        tuple(r)
        for r in lm.perplexity(docs, model, keep_avg_nll=3.42).collect()
    )
    out = perplexity_filter_stream(
        _docs_stream(spark, sf_smoke), lm_artifact(model),
        keep_avg_nll=3.42,
    )
    assert out.isStreaming
    got = sorted(
        tuple(r) for r in run_to_memory(out, "t_stream_ppl").collect()
    )
    assert got == want


def test_stream_plan_is_stateless(spark, sf_smoke, model):
    out = perplexity_filter_stream(
        _docs_stream(spark, sf_smoke), lm_artifact(model)
    )
    # no aggregation/state: the logical plan must be projection+filter
    plan = out._jdf.queryExecution().logical().toString()
    assert "Aggregate" not in plan
    assert "Join" not in plan


def test_artifact_respects_pruning_and_scalars(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    full = lm_artifact(
        lm.train_bigram_lm(docs.where(F.col("lang") == "en"))
    )
    pruned = lm_artifact(
        lm.train_bigram_lm(docs.where(F.col("lang") == "en"), min_count=3)
    )
    assert len(pruned.big) < len(full.big)
    # backoff scalars always computed unpruned
    assert (pruned.total_tokens, pruned.vocab_size) == (
        full.total_tokens,
        full.vocab_size,
    )


def test_short_documents_dropped_like_batch(spark, model):
    df = spark.createDataFrame(
        [(1, "one"), (2, ""), (3, "two words")], "doc_id long, text string"
    )
    got = perplexity_filter_stream(df, lm_artifact(model)).collect()
    assert [r["doc_id"] for r in got] == [3]


def test_empty_artifact_rejected(spark, model):
    art = lm_artifact(model)
    art.total_tokens = 0
    with pytest.raises(ValueError):
        perplexity_filter_stream(None, art)


def test_lm_artifact_row_cap_guards_driver_memory(spark, sf_smoke):
    """VERDICT r9 watch item: the broadcast deployment path must fail
    loudly on an over-budget vocabulary instead of driver-OOMing in
    the collect, pointing at the batch scorer."""
    import pytest

    from nebuia_vector_db_spark.operators.lm import train_bigram_lm
    from nebuia_vector_db_spark.sources.registry import load_table

    docs = load_table(spark, sf_smoke, "documents").limit(40)
    model = train_bigram_lm(docs.where("lang = 'en'"))
    with pytest.raises(ValueError, match="max_artifact_rows"):
        lm_artifact(model, max_artifact_rows=3)
    # within budget: builds normally
    art = lm_artifact(model)
    assert art.total_tokens > 0
