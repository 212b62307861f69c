"""Watermark-boundary tests for the stream-stream join
(streaming/events.py::join_streams) — VERDICT r2 #8: the one
streaming path that only had a happy-path test.

Setup: two file-source streams fed one parquet file per micro-batch
(``maxFilesPerTrigger=1`` + AvailableNow), so the watermark advances
between batches deterministically:

- batch 1 carries "clock" rows at 10:30 on BOTH sides, so at batch 2
  each side's watermark is 10:30 − 30 min = 10:00;
- a right row arriving in batch 2 with event time >= 10:00 is LATE
  but WITHIN the watermark → must still join its batch-1 left row;
- a right row with event time < 10:00 arriving in batch 3 — a FULL
  batch after the watermark passed it, so the end-of-batch-2 state
  cleanup has evicted the matching left row (left.ts + gap = 9:55 <
  10:00) — must produce no join output. (It arrives one batch later
  than the within-watermark case on purpose: Spark drops too-late
  join inputs best-effort, but state eviction at a completed batch
  boundary is the hard guarantee.)

join gap = 5 minutes, watermark delay = 30 minutes.
"""

from __future__ import annotations

import os
import time
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nebuia_vector_db_spark.streaming.events import (
    join_streams,
    run_to_memory,
)

_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def _t(hh: int, mm: int) -> datetime:
    return datetime(2024, 3, 1, hh, mm, 0)


def _write_batch(path: str, seq: int, rows: list[tuple[int, datetime]]):
    tbl = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(tbl, os.path.join(path, f"{seq:03d}.parquet"))
    # the file source orders batches by modification time — keep the
    # second file strictly newer
    time.sleep(1.1)


@pytest.fixture()
def boundary_dirs(spark, tmp_path_factory):
    left_dir = str(tmp_path_factory.mktemp("ss_left"))
    right_dir = str(tmp_path_factory.mktemp("ss_right"))

    # ---- batch 1 files
    _write_batch(
        left_dir,
        0,
        [
            (1, _t(10, 0)),   # matched in batch 1
            (2, _t(9, 50)),   # its purchase arrives too late (beyond)
            (4, _t(10, 15)),  # its purchase arrives late-but-within
            (99, _t(10, 30)),  # clock: left watermark -> 10:00
        ],
    )
    _write_batch(
        right_dir,
        0,
        [
            (1, _t(10, 2)),    # matches left u1 (gap 2 min)
            (98, _t(10, 30)),  # clock: right watermark -> 10:00
        ],
    )
    # ---- batch 2 files (processed with watermark = 10:00)
    _write_batch(left_dir, 1, [(97, _t(10, 31))])
    _write_batch(
        right_dir,
        1,
        [(4, _t(10, 18))],  # >= 10:00 watermark: late but accepted
    )
    # ---- batch 3: beyond-watermark right row, AFTER the batch-2
    # state cleanup evicted left u2 (9:50 + 5 min < 10:00)
    _write_batch(right_dir, 2, [(2, _t(9, 53))])
    return left_dir, right_dir


def test_join_streams_watermark_boundary(spark, boundary_dirs):
    left_dir, right_dir = boundary_dirs
    spark.conf.set("spark.sql.streaming.fileSource.maxFilesPerTrigger", "1")
    try:
        left = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(left_dir)
        )
        right = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(right_dir)
            .select("user_id", F.col("ts").alias("ts_r"))
        )
        out = join_streams(
            left, right, watermark="30 minutes", max_gap="5 minutes"
        )
        got = {
            (r["user_id"], r["ts"], r["ts_r"])
            for r in run_to_memory(out, "ss_boundary").collect()
        }
    finally:
        spark.conf.unset("spark.sql.streaming.fileSource.maxFilesPerTrigger")

    # u1: same-batch match
    assert (1, _t(10, 0), _t(10, 2)) in got
    # u4: right row arrived one batch later, within the watermark
    assert (4, _t(10, 15), _t(10, 18)) in got
    # u2: right row beyond the watermark — dropped, no output
    assert not any(r[0] == 2 for r in got)
    # clock rows never join (no shared key within the gap)
    assert not any(r[0] in (97, 98, 99) for r in got)


def test_join_streams_gap_boundary_inclusive(spark, tmp_path_factory):
    """The time-range predicate is inclusive on both ends: a purchase
    exactly at click ts and exactly at click ts + gap both join; one
    second beyond does not."""
    left_dir = str(tmp_path_factory.mktemp("gap_left"))
    right_dir = str(tmp_path_factory.mktemp("gap_right"))
    _write_batch(left_dir, 0, [(1, _t(12, 0)), (2, _t(12, 0)), (3, _t(12, 0))])
    tbl = pa.table(
        {
            "user_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(
                [
                    _t(12, 0),  # at ts: joins
                    _t(12, 5),  # at ts + gap: joins
                    datetime(2024, 3, 1, 12, 5, 1),  # 1 s beyond: no
                ],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(tbl, os.path.join(right_dir, "000.parquet"))

    left = spark.readStream.schema(_SCHEMA).parquet(left_dir)
    right = (
        spark.readStream.schema(_SCHEMA)
        .parquet(right_dir)
        .select("user_id", F.col("ts").alias("ts_r"))
    )
    out = join_streams(
        left, right, watermark="30 minutes", max_gap="5 minutes"
    )
    got = {
        r["user_id"] for r in run_to_memory(out, "ss_gap").collect()
    }
    assert got == {1, 2}


def test_join_streams_left_outer_emits_nulls_after_watermark(
    spark, tmp_path_factory
):
    """leftOuter stream-stream join: a left row with no match emits
    with null right columns, but only after the watermark proves no
    match can still arrive. Clock batches push the watermark well past
    every real row's match window; the final batch gives the engine a
    trigger in which to evict + emit the outer rows."""
    left_dir = str(tmp_path_factory.mktemp("lo_left"))
    right_dir = str(tmp_path_factory.mktemp("lo_right"))

    _write_batch(
        left_dir,
        0,
        [(1, _t(10, 0)), (2, _t(10, 1)), (99, _t(10, 30))],
    )
    _write_batch(right_dir, 0, [(1, _t(10, 2)), (98, _t(10, 30))])
    # clock batches: advance watermark far past 10:06 (u2's window)
    _write_batch(left_dir, 1, [(99, _t(13, 0))])
    _write_batch(right_dir, 1, [(98, _t(13, 0))])
    _write_batch(left_dir, 2, [(99, _t(16, 0))])
    _write_batch(right_dir, 2, [(98, _t(16, 0))])

    left = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(left_dir)
    )
    right = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(right_dir)
        .select("user_id", F.col("ts").alias("ts_r"))
    )
    out = join_streams(
        left, right, watermark="30 minutes", max_gap="5 minutes",
        how="leftOuter",
    )
    rows = run_to_memory(out, "ss_left_outer").collect()
    matched = {(r["user_id"], r["ts"]) for r in rows if r["ts_r"] is not None}
    outer = {(r["user_id"], r["ts"]) for r in rows if r["ts_r"] is None}

    assert (1, _t(10, 0)) in matched        # real match, right side kept
    assert (2, _t(10, 1)) in outer          # no match -> null emission
    assert (99, _t(10, 30)) in outer        # early clock also times out
    # no row is emitted both matched and outer
    assert not ({(1, _t(10, 0))} & outer)
