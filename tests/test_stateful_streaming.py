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


def test_funnel_state_matches_batch_funnel(spark, sf_smoke):
    """Final streaming-funnel state must reproduce the batch funnel's
    stage counts: users with t1/t2/t3 set == stages 1/2/3."""
    from nebuia_vector_db_spark.queries import q_events_funnel
    from nebuia_vector_db_spark.streaming.events import (
        read_events_stream,
        run_to_memory,
    )
    from nebuia_vector_db_spark.streaming.stateful import funnel_user_state

    out = run_to_memory(
        funnel_user_state(read_events_stream(spark, sf_smoke)),
        "t_funnel_state",
        output_mode="update",
    )
    # update mode emits cumulative rows; slots only ever fill, so the
    # per-user max of each slot is the final state
    final = out.groupBy("user_id").agg(
        F.max("t1_us").alias("t1"),
        F.max("t2_us").alias("t2"),
        F.max("t3_us").alias("t3"),
    )
    got = {
        1: final.where(F.col("t1") > 0).count(),
        2: final.where(F.col("t2") > 0).count(),
        3: final.where(F.col("t3") > 0).count(),
    }
    want = {
        r["stage"]: r["n_users"]
        for r in q_events_funnel(spark, sf_smoke).collect()
    }
    assert got == want


def test_funnel_state_idempotent_under_duplicate_delivery(spark, sf_smoke, tmp_path):
    """At-least-once delivery: replaying every event a second time must
    not advance any user's funnel past its exactly-once state (filled
    slots ignore duplicates; ordering guards reject stale events)."""
    from nebuia_vector_db_spark.sources.registry import load_table
    from nebuia_vector_db_spark.streaming.events import run_to_memory
    from nebuia_vector_db_spark.streaming.stateful import funnel_user_state

    src = load_table(spark, sf_smoke, "events")
    d = str(tmp_path / "replayed_funnel")
    src.write.parquet(d, mode="overwrite")
    src.write.parquet(d, mode="append")

    stream = spark.readStream.schema(src.schema).parquet(d)
    out = run_to_memory(
        funnel_user_state(stream), "t_funnel_dup", output_mode="update"
    )
    final_dup = (
        out.groupBy("user_id")
        .agg(
            F.max("t1_us").alias("t1"),
            F.max("t2_us").alias("t2"),
            F.max("t3_us").alias("t3"),
        )
        .collect()
    )
    from nebuia_vector_db_spark.queries import q_events_funnel

    want = {
        r["stage"]: r["n_users"]
        for r in q_events_funnel(spark, sf_smoke).collect()
    }
    got = {
        1: sum(1 for r in final_dup if r["t1"] > 0),
        2: sum(1 for r in final_dup if r["t2"] > 0),
        3: sum(1 for r in final_dup if r["t3"] > 0),
    }
    assert got == want


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeMapState:
    def __init__(self):
        self._m = {}

    def containsKey(self, k):
        return tuple(k) in self._m

    def getValue(self, k):
        return self._m[tuple(k)]

    def updateValue(self, k, v):
        self._m[tuple(k)] = tuple(v)

    def keys(self):
        return iter(self._m.keys())


class _FakeHandle:
    def __init__(self):
        self.states = {}

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeValueState())

    def getMapState(self, name, kschema, vschema, ttlDurationMs=None):
        return self.states.setdefault(name, _FakeMapState())


def test_transform_with_state_processor_logic_with_fake_handle():
    """The EventProfileProcessor's state machine, driven directly:
    typed map/value state accumulates across calls (≙ micro-batches)
    and seq increments per emission. Exercised against a dict-backed
    handle because this environment lacks the protobuf runtime the
    live transformWithState channel needs (see skip below)."""
    import pandas as pd

    from nebuia_vector_db_spark.streaming.stateful import (
        _profile_processor_cls,
    )

    proc = _profile_processor_cls()()
    proc.init(_FakeHandle())
    b1 = pd.DataFrame(
        {"event_type": ["a", "a", "b"], "value": [1.0, 2.0, 3.0]}
    )
    (out1,) = list(proc.handleInputRows((7,), iter([b1]), None))
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "n_types": 2, "n_events": 3,
        "sum_value": 6.0, "seq": 1,
    }
    b2 = pd.DataFrame({"event_type": ["c", "a"], "value": [4.0, 5.0]})
    (out2,) = list(proc.handleInputRows((7,), iter([b2]), None))
    assert out2.iloc[0].to_dict() == {
        "user_id": 7, "n_types": 3, "n_events": 5,
        "sum_value": 15.0, "seq": 2,
    }


def test_transform_with_state_profile_live_stream(spark, multi_file_events):
    """Live transformWithStateInPandas run — requires the protobuf
    runtime for the state-server channel; skipped (documented gate)
    where it is absent. The processor logic itself is covered by the
    fake-handle test above."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip(
            "google.protobuf not installed: transformWithState's "
            "driver-worker channel cannot start in this environment"
        )
    from nebuia_vector_db_spark.streaming.stateful import user_profile_stream

    d, src = multi_file_events
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(d, "in"))
    )
    q = (
        user_profile_stream(stream)
        .writeStream.format("memory")
        .queryName("t_tws_profile")
        .outputMode("update")
        .option("checkpointLocation", os.path.join(d, "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        """
        SELECT user_id, n_types, n_events, sum_value FROM (
          SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY seq DESC) rn
          FROM t_tws_profile) WHERE rn = 1
        """
    ).collect()
    got = {
        r["user_id"]: (r["n_types"], r["n_events"], round(r["sum_value"], 6))
        for r in rows
    }
    expected = {
        r["user_id"]: (r["nt"], r["ne"], round(r["sv"], 6))
        for r in src.groupBy("user_id")
        .agg(
            F.countDistinct("event_type").alias("nt"),
            F.count("*").alias("ne"),
            F.sum("value").alias("sv"),
        )
        .collect()
    }
    assert got == expected
