"""Storage maintenance: latest-wins upsert + small-file compaction."""

from __future__ import annotations

import glob
import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.maintenance import (
    compact_path,
    upsert_latest,
)
from nebuia_vector_db_spark.plans.inspect import shuffle_count


def _cur(spark):
    return spark.createDataFrame(
        [Row(k=i, version=1, val=f"v1-{i}") for i in range(10)]
    )


def test_upsert_latest_wins_and_inserts(spark):
    cur = _cur(spark)
    upd = spark.createDataFrame(
        [
            Row(k=3, version=2, val="v2-3"),
            Row(k=7, version=2, val="v2-7"),
            Row(k=99, version=1, val="new"),
        ]
    )
    out = {
        r["k"]: r
        for r in upsert_latest(cur, upd, ["k"], "version").collect()
    }
    assert len(out) == 11
    assert out[3]["val"] == "v2-3" and out[3]["version"] == 2
    assert out[7]["val"] == "v2-7"
    assert out[99]["val"] == "new"
    assert out[0]["val"] == "v1-0"  # untouched keys keep current


def test_upsert_stale_update_loses(spark):
    cur = _cur(spark).withColumn("version", F.lit(5))
    upd = spark.createDataFrame([Row(k=1, version=2, val="stale")])
    out = {
        r["k"]: r["val"]
        for r in upsert_latest(cur, upd, ["k"], "version").collect()
    }
    assert out[1] == "v1-1"


def test_upsert_version_tie_broken_deterministically(spark):
    cur = spark.createDataFrame([Row(k=1, version=1, val="a")])
    upd = spark.createDataFrame([Row(k=1, version=1, val="b")])
    out = upsert_latest(cur, upd, ["k"], "version", tie_cols=["val"]).collect()
    assert len(out) == 1 and out[0]["val"] == "b"  # max over the tie col


def test_upsert_is_single_shuffle(spark):
    """union (no exchange) + partial-agg max_by: exactly one shuffle
    on the key — the property that beats window row_number at scale."""
    out = upsert_latest(
        _cur(spark),
        spark.createDataFrame([Row(k=1, version=2, val="x")]),
        ["k"],
        "version",
    )
    assert shuffle_count(out) == 1


def test_compact_path_reduces_files_preserves_rows(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t")
    spark.range(0, 10_000).withColumn(
        "payload", F.md5(F.col("id").cast("string"))
    ).repartition(40).write.parquet(path)
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == 40

    before = sorted(
        (r["id"], r["payload"])
        for r in spark.read.parquet(path).collect()
    )
    stats = compact_path(spark, path, target_file_bytes=1 << 30)
    assert stats["compacted"] and stats["files_after"] < stats["files_before"]
    assert len(glob.glob(os.path.join(path, "*.parquet"))) == stats["files_after"]
    after = sorted(
        (r["id"], r["payload"])
        for r in spark.read.parquet(path).collect()
    )
    assert before == after
    assert stats["rows"] == 10_000


def test_compact_path_noop_when_already_compact(spark, tmp_path):
    path = os.path.join(str(tmp_path), "t2")
    spark.range(0, 100).coalesce(1).write.parquet(path)
    stats = compact_path(spark, path, target_file_bytes=1 << 30)
    assert not stats["compacted"]
    assert stats["files_before"] == stats["files_after"] == 1
