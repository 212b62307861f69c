"""SnapshotTable (sources/snapshot.py): atomic commits, copy-on-write
delete/upsert, time travel, file-level data skipping, vacuum."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.sources.snapshot import (
    CommitConflictError,
    SnapshotTable,
    _file_may_match,
)


@pytest.fixture()
def base_df(spark):
    return spark.range(0, 1000).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("bucket"),
        F.concat(F.lit("row-"), F.col("id")).alias("payload"),
        F.lit(1).cast("long").alias("ver"),
    )


def test_create_read_history(spark, base_df, tmp_path):
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base_df)
    assert tbl.current_version() == 1
    got = tbl.read()
    assert got.count() == 1000
    assert [f.name for f in got.schema.fields] == ["k", "bucket", "payload", "ver"]
    (h,) = tbl.history()
    assert h["op"] == "create" and h["n_rows"] == 1000


def test_append_and_time_travel(spark, base_df, tmp_path):
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base_df)
    more = spark.range(1000, 1200).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("bucket"),
        F.concat(F.lit("row-"), F.col("id")).alias("payload"),
        F.lit(2).cast("long").alias("ver"),
    )
    v2 = tbl.append(more)
    assert v2 == 2
    assert tbl.read().count() == 1200
    assert tbl.read(version=1).count() == 1000  # time travel


def test_cow_delete_rewrites_only_hit_files(spark, tmp_path):
    # range-partition on bucket so files hold disjoint buckets
    df = (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 4).alias("bucket"),
            F.lit(1).cast("long").alias("ver"),
        )
        .repartitionByRange(4, "bucket")
    )
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), df)
    before = {f["path"] for f in tbl._snapshot()["files"]}
    tbl.delete_where(F.col("bucket") == 2)
    snap = tbl._snapshot()
    after = {f["path"] for f in snap["files"]}
    # most files carried forward by reference (same path objects)
    assert snap["carried_files"] >= 1
    assert snap["rewrote_files"] >= 1
    assert before & after, "carried files must keep their original paths"
    got = tbl.read()
    assert got.where(F.col("bucket") == 2).count() == 0
    assert got.count() == 1500
    # the pre-delete snapshot still reads completely
    assert tbl.read(version=1).count() == 2000


def test_commit_conflict_is_detected(spark, base_df, tmp_path):
    """Two writers that both read parent=1 cannot both commit v2: the
    exclusive create of the versioned snapshot file is the CAS."""
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base_df)
    snap = tbl._snapshot(1)
    body = {k: snap[k] for k in ("op", "schema", "files")}
    # the racing writer lands version 2 first
    with open(os.path.join(tbl._snap_dir, "v00000002.json"), "x") as f:
        json.dump(body, f)
    with pytest.raises(CommitConflictError):
        tbl._commit(dict(body), expected_parent=1)
    # retrying on the NEW parent succeeds (optimistic-concurrency loop)
    assert tbl._commit(dict(body), expected_parent=2) == 3


def test_data_skipping_prunes_files(spark, tmp_path):
    df = (
        spark.range(0, 10_000)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .repartitionByRange(8, "k")
    )
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), df)
    n_all = tbl.n_files()
    assert n_all >= 8
    where = [("k", ">=", 9000)]
    n_scanned = tbl.pruned_file_count(where)
    assert n_scanned < n_all, "stats pruning must drop provably-dead files"
    got = tbl.read(where=where)
    assert got.count() == 1000
    assert got.agg(F.min("k")).head()[0] == 9000
    # equality predicate outside every file's range scans nothing
    assert tbl.pruned_file_count([("k", "=", -5)]) == 0
    assert tbl.read(where=[("k", "=", -5)]).count() == 0


def test_upsert_matches_global_merge(spark, base_df, tmp_path):
    from nebuia_vector_db_spark.operators.maintenance import upsert_latest

    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), base_df.repartitionByRange(4, "k")
    )
    updates = spark.range(500, 600).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("bucket"),
        F.lit("UPDATED").alias("payload"),
        F.lit(9).cast("long").alias("ver"),
    )
    tbl.upsert(updates, key_cols=["k"], version_col="ver")
    got = tbl.read()
    assert got.count() == 1000
    assert got.where(F.col("payload") == "UPDATED").count() == 100
    expected = upsert_latest(base_df, updates, ["k"], "ver")
    sym_diff = got.exceptAll(expected).count() + expected.exceptAll(got).count()
    assert sym_diff == 0
    snap = tbl._snapshot()
    assert snap["carried_files"] >= 1, "upsert must carry unaffected files"


def test_vacuum_removes_only_unreferenced(spark, base_df, tmp_path):
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base_df)
    tbl.delete_where("k < 100")
    res = tbl.vacuum(keep_last=1)
    assert res["removed_snapshots"] == 1
    assert res["removed_data_files"] >= 1
    assert tbl.read().count() == 900  # current snapshot intact
    assert tbl.versions() == [2]
    with pytest.raises(FileNotFoundError):
        tbl._snapshot(1)


def test_stats_check_is_conservative():
    f = {"stats": {"a": [10, 20]}}
    assert _file_may_match(f, [("a", "=", 15)])
    assert not _file_may_match(f, [("a", "=", 25)])
    assert not _file_may_match(f, [("a", ">", 20)])
    assert _file_may_match(f, [("a", ">=", 20)])
    assert not _file_may_match(f, [("a", "<", 10)])
    assert _file_may_match(f, [("a", "<=", 10)])
    # missing stats or mixed types: never prune
    assert _file_may_match({"stats": {}}, [("a", "=", 1)])
    assert _file_may_match(f, [("a", "=", "zzz")])


def test_schema_evolution_additive(spark, base_df, tmp_path):
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base_df)
    evolved = spark.range(1000, 1100).select(
        F.col("id").alias("k"),
        (F.col("id") % 10).alias("bucket"),
        F.lit("new").alias("payload"),
        F.lit(2).cast("long").alias("ver"),
        F.lit("fr").alias("lang"),  # new column
    )
    # without merge_schema the new column is dropped (strict align)
    tbl.append(evolved)
    assert "lang" not in tbl.read().columns
    # with merge_schema the column is added; old files read as NULL
    tbl.append(evolved, merge_schema=True)
    got = tbl.read()
    assert "lang" in got.columns
    assert got.where(F.col("lang").isNull()).count() == 1100
    assert got.where(F.col("lang") == "fr").count() == 100
    # old snapshots keep the old schema (time travel is schema-stable)
    assert "lang" not in tbl.read(version=1).columns


def test_compact_packs_small_files(spark, tmp_path):
    df = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("v")
    )
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), df.repartition(12)
    )
    assert tbl.n_files() >= 12
    v = tbl.compact(small_file_bytes=64 * 1024 * 1024, target_partitions=2)
    assert v == 2
    snap = tbl._snapshot()
    assert snap["op"] == "compact"
    assert tbl.n_files() <= 3
    got = tbl.read()
    assert got.count() == 5000
    assert got.agg(F.sum("k")).head()[0] == sum(range(5000))
    # pre-compaction snapshot still time-travels
    assert tbl.read(version=1).count() == 5000
    # compacting an already-compact table is a no-op
    assert tbl.compact(small_file_bytes=1) == v


def test_bloom_prunes_point_lookups_where_minmax_cannot(spark, tmp_path):
    """Hash-distributed high-cardinality key: every file spans the
    full [min, max] range, so footer stats prune nothing — the
    per-file Bloom filter is what kills dead files on `k = ?`."""
    df = spark.range(0, 20_000).select(
        F.col("id").alias("k"), (F.col("id") % 5).alias("v")
    ).repartition(8)  # round-robin: all files cover the whole k range
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), df, bloom_cols=["k"]
    )
    n_all = tbl.n_files()
    assert n_all >= 8
    # a present key: exactly one file truly holds it; bloom scans few
    hit = [("k", "=", 12_345)]
    assert tbl.pruned_file_count(hit) <= 2
    assert tbl.read(where=hit).count() == 1
    # an absent key inside the global range: min/max can't prune, the
    # blooms almost surely all reject (8 files x 1% FP)
    miss = [("k", "=", 20_001)]
    assert tbl.pruned_file_count(miss) <= 1
    assert tbl.read(where=miss).count() == 0
    # numeric canonicalization: float literal matches stored int
    assert tbl.read(where=[("k", "=", 12_345.0)]).count() == 1


def test_concurrent_appends_with_retry_lose_nothing(spark, tmp_path):
    """Two writers race real commits; with_retry resolves conflicts
    and the table converges with every row from both writers."""
    import threading

    base = spark.range(0, 100).selectExpr("id k")
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base)
    errs = []

    def _writer(lo):
        try:
            local = SnapshotTable(spark, str(tmp_path / "t"))
            for i in range(3):
                df = spark.range(lo + i * 100, lo + i * 100 + 100).selectExpr(
                    "id k"
                )
                local.with_retry("append", df)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    t1 = threading.Thread(target=_writer, args=(1_000,))
    t2 = threading.Thread(target=_writer, args=(10_000,))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errs
    got = tbl.read()
    assert got.count() == 100 + 6 * 100
    assert tbl.current_version() == 7  # 1 create + 6 serialized appends
    # each writer's rows all arrived
    assert got.where((F.col("k") >= 1_000) & (F.col("k") < 1_300)).count() == 300
    assert got.where(F.col("k") >= 10_000).count() == 300


def test_with_retry_gives_up_after_budget(spark, base_df, tmp_path, monkeypatch):
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base_df)

    def _always_conflict(*a, **k):
        raise CommitConflictError("simulated")

    monkeypatch.setattr(tbl, "append", _always_conflict)
    with pytest.raises(CommitConflictError, match="simulated"):
        tbl.with_retry("append", base_df.limit(1), retries=2)


def test_vacuum_age_guard_spares_young_files(spark, base_df, tmp_path):
    """The concurrent-writer guard: unreferenced files younger than
    min_file_age_seconds survive vacuum (an in-flight commit's data
    exists before its snapshot does)."""
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), base_df)
    tbl.delete_where("k < 100")
    res = tbl.vacuum(keep_last=1, min_file_age_seconds=3600)
    assert res["removed_data_files"] == 0, "young files must survive"
    # old snapshot metadata is still dropped, current content intact
    assert tbl.read().count() == 900
    res2 = tbl.vacuum(keep_last=1, min_file_age_seconds=0)
    assert res2["removed_data_files"] >= 1
    assert tbl.read().count() == 900


def test_maintenance_commits_preserve_app_metadata(spark, base_df, tmp_path):
    """Application metadata (stream watermarks, index centroids) must
    survive EVERY commit kind — a compaction that dropped them would
    un-dedupe streams and break snapshot indexes."""
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), base_df,
        extra_meta={"stream_watermarks": {"w1": 5}, "centroids": [[1.0, 2.0]]},
    )
    tbl.append(base_df.limit(10))
    tbl.delete_where("k < 50")
    tbl.compact(small_file_bytes=1 << 30, target_partitions=1)
    tbl.optimize_zorder(["k", "bucket"], n_partitions=2)
    tbl.upsert(
        base_df.limit(5).withColumn("ver", F.lit(9).cast("long")),
        key_cols=["k"], version_col="ver",
    )
    assert tbl.meta("stream_watermarks") == {"w1": 5}
    assert tbl.meta("centroids") == [[1.0, 2.0]]
    # explicit extra_meta still overrides on append
    tbl.append(
        base_df.limit(1),
        extra_meta={"stream_watermarks": {"w1": 6}},
    )
    assert tbl.meta("stream_watermarks") == {"w1": 6}
    assert tbl.meta("centroids") == [[1.0, 2.0]]


def test_cow_delete_matching_rewrites_only_hit_files(spark, tmp_path):
    """delete_matching (round 15): the relational twin of
    delete_where — same COW accounting (unaffected files carried by
    reference), rows matched via the keys relation's anti-join, no
    literal predicate; key columns absent from the table raise."""
    import pytest as _pt

    df = (
        spark.range(0, 2000)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 4).alias("bucket"),
            F.lit(1).cast("long").alias("ver"),
        )
        .repartitionByRange(4, "bucket")
    )
    tbl = SnapshotTable.create(spark, str(tmp_path / "t"), df)
    before = {f["path"] for f in tbl._snapshot()["files"]}
    # delete 100 specific keys, all inside bucket 2's files
    keys = spark.range(0, 2000).where(
        (F.col("id") % 4 == 2) & (F.col("id") < 400)
    ).select(F.col("id").alias("k"))
    tbl.delete_matching(keys)
    snap = tbl._snapshot()
    after = {f["path"] for f in snap["files"]}
    assert snap["carried_files"] >= 1
    assert snap["rewrote_files"] >= 1
    assert before & after, "carried files must keep their original paths"
    got = tbl.read()
    assert got.count() == 1900
    assert got.join(keys, "k", "left_semi").count() == 0
    # multi-column keys: (k, bucket) both must match
    two = spark.createDataFrame(
        [(402, 2), (403, 1)], "k long, bucket long"
    )
    tbl.delete_matching(two)
    got2 = tbl.read()
    assert got2.where(F.col("k") == 402).count() == 0
    assert got2.where(F.col("k") == 403).count() == 1  # bucket is 3
    with _pt.raises(ValueError, match="delete_matching"):
        tbl.delete_matching(
            spark.createDataFrame([(1,)], "nope long")
        )


def test_overwrite_is_one_commit_full_replace(spark, base_df, tmp_path):
    """overwrite(df) (round 15): ONE commit whose file set is
    entirely new — readers flip atomically (version advances by
    exactly 1, never an empty intermediate), old snapshots stay
    time-travelable, and the change feed replays the version as
    full-table delete+insert deltas."""
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), base_df.repartition(3)
    )
    v1 = tbl.current_version()
    replacement = spark.range(5).select(
        F.col("id").alias("k"),
        F.lit(0).cast("long").alias("bucket"),
        F.lit("NEW").alias("payload"),
        F.lit(1).cast("long").alias("ver"),
    )
    v2 = tbl.overwrite(replacement)
    assert v2 == v1 + 1
    got = tbl.read()
    assert got.count() == 5
    assert got.where(F.col("payload") != "NEW").count() == 0
    assert tbl.read(v1).count() == base_df.count()  # time travel
    feed = tbl.changes(v1, v2)
    assert (
        feed.where(F.col("_change") == "delete").count()
        == base_df.count()
    )
    assert feed.where(F.col("_change") == "insert").count() == 5
