"""Change-data-feed over SnapshotTable: the batch row-level delta
(SnapshotTable.changes), the streaming Python-Data-Source twin
(sources/changes_stream.py — commit versions as offsets), and the
exactly-once restart contract. The registry row `snap_change_feed`
additionally hash-certifies the batch feed against a DuckDB replay."""

from __future__ import annotations

import pytest

from nebuia_vector_db_spark.sources.changes_stream import (
    SnapshotChangesDataSource,
)
from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

SCHEMA = "id long, val string, ver long"


def _mk_table(spark, root):
    """create(v1, ids 0-5) → delete id>=4 (v2) → append id 10 (v3) →
    upsert: update id 1, insert id 11 (v4)."""
    df = spark.createDataFrame(
        [(i, f"v{i}", i) for i in range(6)], SCHEMA
    )
    tbl = SnapshotTable.create(spark, root, df.repartition(2))
    tbl.delete_where("id >= 4")
    tbl.append(spark.createDataFrame([(10, "new", 1)], SCHEMA))
    tbl.upsert(
        spark.createDataFrame([(1, "UPD", 99), (11, "ins", 1)], SCHEMA),
        ["id"],
        "ver",
    )
    return tbl


_WANT_ALL = sorted(
    [(i, f"v{i}", i, "insert", 1) for i in range(6)]
    + [(4, "v4", 4, "delete", 2), (5, "v5", 5, "delete", 2)]
    + [(10, "new", 1, "insert", 3)]
    + [(1, "v1", 1, "delete", 4), (1, "UPD", 99, "insert", 4),
       (11, "ins", 1, "insert", 4)]
)


def test_batch_changes_per_commit(spark, tmp_path):
    tbl = _mk_table(spark, str(tmp_path / "t"))
    got = sorted(tuple(r) for r in tbl.changes(0).collect())
    assert got == _WANT_ALL
    # sub-range: only the commits inside (2, 3]
    assert sorted(tuple(r) for r in tbl.changes(2, 3).collect()) == [
        (10, "new", 1, "insert", 3)
    ]
    # an update is the delete+insert pair at ONE version (CDF shape)
    v4 = sorted(tuple(r) for r in tbl.changes(3, 4).collect())
    assert v4 == [
        (1, "UPD", 99, "insert", 4),
        (1, "v1", 1, "delete", 4),
        (11, "ins", 1, "insert", 4),
    ]
    # empty range: no rows, full change schema
    empty = tbl.changes(4, 4)
    assert empty.count() == 0
    assert empty.columns == ["id", "val", "ver", "_change",
                             "_commit_version"]
    with pytest.raises(ValueError):
        tbl.changes(5, 4)


def test_stream_equals_batch_and_start_version(spark, tmp_path):
    root = str(tmp_path / "t")
    tbl = _mk_table(spark, root)
    spark.dataSource.register(SnapshotChangesDataSource)
    feed = (
        spark.readStream.format("nebuia_snapshot_changes")
        .option("path", root)
        .load()
    )
    q = (
        feed.writeStream.format("memory")
        .queryName("cdc_all")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(tuple(r) for r in spark.table("cdc_all").collect())
    assert got == _WANT_ALL
    # startVersion skips the history before it (exclusive bound)
    feed2 = (
        spark.readStream.format("nebuia_snapshot_changes")
        .option("path", root)
        .option("startVersion", 2)
        .load()
    )
    q2 = (
        feed2.writeStream.format("memory")
        .queryName("cdc_tail")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    tail = sorted(tuple(r) for r in spark.table("cdc_tail").collect())
    assert tail == sorted(
        tuple(r) for r in tbl.changes(2).collect()
    )


def test_stream_exactly_once_across_restart(spark, tmp_path):
    """The restart contract: a checkpointed query resumes from the
    last committed version — new commits arrive exactly once, old
    ones are never re-emitted."""
    root = str(tmp_path / "t")
    tbl = _mk_table(spark, root)
    spark.dataSource.register(SnapshotChangesDataSource)
    ckpt = str(tmp_path / "ckpt")
    sink = str(tmp_path / "sink")

    def run_once():
        q = (
            spark.readStream.format("nebuia_snapshot_changes")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    first = sorted(
        tuple(r) for r in spark.read.parquet(sink).collect()
    )
    assert first == _WANT_ALL
    # no new commits: a re-run adds nothing
    run_once()
    assert sorted(
        tuple(r) for r in spark.read.parquet(sink).collect()
    ) == _WANT_ALL
    # new commit: ONLY its delta arrives after restart
    tbl.delete_where("id = 10")
    run_once()
    final = sorted(
        tuple(r) for r in spark.read.parquet(sink).collect()
    )
    assert final == sorted(_WANT_ALL + [(10, "new", 1, "delete", 5)])


def test_changes_with_array_columns(spark, tmp_path):
    """Array cells: frozen to tuples for the multiset diff, emitted
    intact (the embeddings-table shape)."""
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0])],
        "id long, emb array<double>",
    )
    root = str(tmp_path / "t")
    tbl = SnapshotTable.create(spark, root, df)
    tbl.delete_where("id = 2")
    got = sorted(
        (r["id"], tuple(r["emb"]), r["_change"], r["_commit_version"])
        for r in tbl.changes(0).collect()
    )
    assert got == sorted(
        [
            (1, (1.0, 2.0), "insert", 1),
            (2, (3.0, 4.0), "insert", 1),
            (2, (3.0, 4.0), "delete", 2),
        ]
    )
    spark.dataSource.register(SnapshotChangesDataSource)
    feed = (
        spark.readStream.format("nebuia_snapshot_changes")
        .option("path", root)
        .load()
    )
    q = (
        feed.writeStream.format("memory")
        .queryName("cdc_arr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    sgot = sorted(
        (r["id"], tuple(r["emb"]), r["_change"], r["_commit_version"])
        for r in spark.table("cdc_arr").collect()
    )
    assert sgot == got


def test_changes_touch_only_churned_files(spark, tmp_path):
    """The 100 TB property: a commit's change feed reads the files the
    commit touched, never the whole table — pinned by counting the
    scan paths in the step delta."""
    df = spark.createDataFrame(
        [(i, f"v{i}", i) for i in range(100)], SCHEMA
    )
    root = str(tmp_path / "t")
    tbl = SnapshotTable.create(
        spark, root, df.repartitionByRange(10, "id")
    )
    tbl.delete_where("id = 7")  # one file holds id 7
    added, removed = tbl._step_delta(2)
    assert len(removed) == 1  # only the hit file was rewritten
    assert len(added) <= 1
    n_total = tbl.n_files()
    assert n_total >= 9  # the rest of the table was never touched
