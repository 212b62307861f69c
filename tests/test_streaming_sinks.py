"""Streaming upsert sink (streaming/sinks.py): multi-batch CDC merge
must converge to the same snapshot as a batch latest-wins upsert over
all the change rows."""

from __future__ import annotations

import pandas as pd

from nebuia_vector_db_spark.streaming.sinks import upsert_sink


def _write_changes(spark, src_dir):
    """Two parquet files = two AvailableNow micro-batches (file source
    batches per file). Key 1 is updated across batches, key 2 within
    one batch, key 3 only inserted."""
    b1 = pd.DataFrame(
        {
            "k": [1, 2, 2],
            "version": [1, 1, 2],
            "val": ["one-v1", "two-v1", "two-v2"],
        }
    )
    b2 = pd.DataFrame(
        {"k": [1, 3], "version": [2, 1], "val": ["one-v2", "three-v1"]}
    )
    spark.createDataFrame(b1).coalesce(1).write.parquet(
        src_dir, mode="append"
    )
    spark.createDataFrame(b2).coalesce(1).write.parquet(
        src_dir, mode="append"
    )
    return spark.read.parquet(src_dir).schema


def test_upsert_sink_converges_to_latest_per_key(spark, tmp_path):
    src = str(tmp_path / "changes")
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    schema = _write_changes(spark, src)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = upsert_sink(stream, snap, ["k"], "version", ckpt)
    q.awaitTermination()

    got = {
        r["k"]: (r["version"], r["val"])
        for r in spark.read.parquet(snap).collect()
    }
    assert got == {
        1: (2, "one-v2"),
        2: (2, "two-v2"),
        3: (1, "three-v1"),
    }


def test_upsert_sink_replay_is_idempotent(spark, tmp_path):
    """Re-running the same input through a FRESH checkpoint (an
    at-least-once redelivery of every batch) must leave the snapshot
    unchanged — the merge is idempotent by construction."""
    src = str(tmp_path / "changes2")
    snap = str(tmp_path / "snap2")
    schema = _write_changes(spark, src)

    for i in range(2):  # second pass replays all rows into the result
        ckpt = str(tmp_path / f"ckpt_{i}")
        stream = spark.readStream.schema(schema).parquet(src)
        q = upsert_sink(stream, snap, ["k"], "version", ckpt)
        q.awaitTermination()

    got = {
        r["k"]: (r["version"], r["val"])
        for r in spark.read.parquet(snap).collect()
    }
    assert got == {
        1: (2, "one-v2"),
        2: (2, "two-v2"),
        3: (1, "three-v1"),
    }


def test_snapshot_sink_appends_all_rows_exactly_once(spark, tmp_path):
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable
    from nebuia_vector_db_spark.streaming.sinks import snapshot_sink

    src = str(tmp_path / "snap_src")
    for i in range(3):
        spark.range(i * 10, i * 10 + 10).selectExpr(
            "id AS k", "CAST(id * 2 AS LONG) AS v"
        ).coalesce(1).write.mode("append").parquet(src)

    table = str(tmp_path / "snap_tbl")
    stream = (
        spark.readStream.schema("k long, v long")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = snapshot_sink(stream, table, str(tmp_path / "ckpt_a"), app_id="w1")
    q.awaitTermination()

    tbl = SnapshotTable(spark, table)
    assert tbl.read().count() == 30
    ops = [h["op"] for h in tbl.history()]
    assert ops[0] == "create" and set(ops[1:]) <= {"append"}
    assert tbl.meta("stream_watermarks")["w1"] == len(ops) - 1


def test_snapshot_sink_replay_is_idempotent(spark, tmp_path):
    """A fresh checkpoint redelivers every batch (worst-case
    at-least-once replay); the batch-id watermark inside the commit
    log must swallow all of them."""
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable
    from nebuia_vector_db_spark.streaming.sinks import snapshot_sink

    src = str(tmp_path / "snap_src2")
    spark.range(0, 25).selectExpr("id AS k", "id AS v").coalesce(
        2
    ).write.parquet(src)

    table = str(tmp_path / "snap_tbl2")
    for i in range(2):
        stream = spark.readStream.schema("k long, v long").parquet(src)
        q = snapshot_sink(stream, table, str(tmp_path / f"ckpt_b{i}"), app_id="w1")
        q.awaitTermination()

    tbl = SnapshotTable(spark, table)
    assert tbl.read().count() == 25, "replayed batches must not re-append"
    assert sorted(r["k"] for r in tbl.read().collect()) == list(range(25))


def test_snapshot_sink_two_independent_streams_do_not_collide(spark, tmp_path):
    """Two different streaming queries (distinct app_ids, both with
    batch ids starting at 0) feed one table: per-app watermark lanes
    mean neither swallows the other's batches."""
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable
    from nebuia_vector_db_spark.streaming.sinks import snapshot_sink

    table = str(tmp_path / "snap_multi")
    for w, lo in (("wa", 0), ("wb", 100)):
        src = str(tmp_path / f"src_{w}")
        spark.range(lo, lo + 20).selectExpr("id k", "id v").coalesce(
            2
        ).write.parquet(src)
        stream = spark.readStream.schema("k long, v long").parquet(src)
        q = snapshot_sink(
            stream, table, str(tmp_path / f"ck_{w}"), app_id=w
        )
        q.awaitTermination()

    tbl = SnapshotTable(spark, table)
    assert tbl.read().count() == 40, "second stream's batch 0 must land"
    marks = tbl.meta("stream_watermarks")
    assert set(marks) == {"wa", "wb"}


def test_transactional_append_racing_apps_keep_both_lanes(spark, tmp_path):
    """Two apps drive exactly-once appends CONCURRENTLY, with every
    batch delivered twice (at-least-once replay). The expected_parent
    protocol must serialize them without losing either lane's
    watermark: total rows = one copy of each distinct batch, and each
    lane's mark is its own max batch id (ADVICE r3 TOCTOU fix)."""
    import threading

    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable
    from nebuia_vector_db_spark.streaming.sinks import transactional_append

    path = str(tmp_path / "t")
    errs = []

    def _drive(app, lo):
        try:
            for bid in range(3):
                df = spark.range(lo + bid * 10, lo + bid * 10 + 10).selectExpr(
                    "id AS k"
                )
                transactional_append(spark, path, df, bid, app, retries=20)
                # at-least-once redelivery of the same batch
                transactional_append(spark, path, df, bid, app, retries=20)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=_drive, args=("appA", 0))
    t2 = threading.Thread(target=_drive, args=("appB", 1000))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    tbl = SnapshotTable(spark, path)
    got = tbl.read()
    assert got.count() == 60, "each distinct batch lands exactly once"
    marks = tbl.meta("stream_watermarks")
    assert marks == {"appA": 2, "appB": 2}
    # a late replay of an old batch still acks without writing
    transactional_append(
        spark, path, spark.range(5).selectExpr("id AS k"), 0, "appA"
    )
    assert tbl.read().count() == 60
