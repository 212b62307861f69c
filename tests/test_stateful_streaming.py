"""applyInPandasWithState (streaming/stateful.py): state must carry
across micro-batches — the fixture is split into multiple files and
replayed one file per trigger, so any per-batch-only implementation
would undercount."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.sources.registry import load_table
from nebuia_vector_db_spark.streaming.stateful import (
    OUTPUT_SCHEMA,
    running_user_totals,
)


@pytest.fixture(scope="module")
def multi_file_events(spark):
    """sf0.001 events split into 4 files (≙ 4 micro-batches)."""
    src = load_table(spark, os.environ.get("SPARK_GRAFT_SMOKE_DIR", "/root/testdata/sf0.001"), "events")
    d = tempfile.mkdtemp(prefix="stateful_events_")
    src.repartition(4).write.parquet(os.path.join(d, "in"))
    yield d, src
    shutil.rmtree(d, ignore_errors=True)


def test_state_carries_across_batches(spark, multi_file_events):
    d, src = multi_file_events
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "in"))
    )
    out = running_user_totals(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("t_running_totals")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(d, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode emits one row per user per batch; the LAST emission
    # per user is the final running total
    sink = spark.table("t_running_totals")
    assert sink.schema == OUTPUT_SCHEMA
    final = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 6))
        for r in sink.groupBy("user_id")
        .agg(
            F.max_by("n_events", "n_events").alias("n_events"),
            F.max_by("sum_value", "n_events").alias("sum_value"),
        )
        .collect()
    }
    want = {
        r["user_id"]: (r["n"], round(r["s"], 6))
        for r in src.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert final == want

    # multiple batches actually happened (state was exercised): with 4
    # input files and 1 file/trigger, users appearing in >1 file emit
    # >1 row into the update sink
    emissions = sink.groupBy("user_id").count()
    assert emissions.where(F.col("count") > 1).count() > 0
