"""Round-16 optimization pins: the scan fan-out heuristic must read
the session's ACTUAL split size (ADVICE r15 — a lowered
spark.sql.files.maxPartitionBytes raises the estimated task count and
must suppress the repartition), and releasing the query-level memo
caches must drop the memo entries together with their persisted
relations (ADVICE r15 medium — stale memos served cold handles that
never re-cached)."""

from __future__ import annotations

import os

from nebuia_vector_db_spark.sources.registry import (
    _fan_out_scan,
    _max_partition_bytes,
    load_table,
)


def test_max_partition_bytes_reads_session_conf(spark):
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(1 << 20))
        assert _max_partition_bytes(spark) == 1 << 20
        spark.conf.set("spark.sql.files.maxPartitionBytes", "64m")
        assert _max_partition_bytes(spark) == 64 << 20
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1g")
        assert _max_partition_bytes(spark) == 1 << 30
        spark.conf.set("spark.sql.files.maxPartitionBytes", "128mb")
        assert _max_partition_bytes(spark) == 128 << 20
    finally:
        if old is None:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_lowered_split_size_suppresses_fan_out(spark, sf_smoke):
    """With a split size far below the file size the scan already
    yields >= parallelism/2 tasks, so the fan-out must be a no-op —
    the scale-adaptivity contract (at 100 TB the estimate always
    exceeds the target and no repartition is ever added)."""
    path = os.path.join(sf_smoke, "documents.parquet")
    df = spark.read.parquet(path)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes", None)
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1k")
        out = _fan_out_scan(spark, df, path)
        assert out is df, "fan-out fired despite enough estimated tasks"
    finally:
        if old is None:
            spark.conf.unset("spark.sql.files.maxPartitionBytes")
        else:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_fan_out_fires_on_single_row_group_fixture(spark, sf_smoke):
    path = os.path.join(sf_smoke, "documents.parquet")
    df = load_table(spark, sf_smoke, "documents", fan_out=True)
    plain = spark.read.parquet(path)
    # tiny file, default 128 MB splits → ~1 estimated task « cores/2
    assert df.rdd.getNumPartitions() > plain.rdd.getNumPartitions()


def test_release_query_caches_clears_memos(spark, sf_oracle):
    from nebuia_vector_db_spark import queries as Q

    postings = Q._shared_postings(spark, sf_oracle)
    assert Q._POSTINGS_CACHE, "memo did not populate"
    n = Q.release_query_caches()
    assert n >= 1
    assert not Q._POSTINGS_CACHE
    assert not Q._BANDS_CACHE and not Q._SETS_CACHE
    assert not Q._TEXT_INDEX_CACHE
    assert not postings.storageLevel.useMemory, (
        "release left the posting relation persisted"
    )
    # a later caller gets a FRESH cached relation, not the cold handle
    again = Q._shared_postings(spark, sf_oracle)
    assert again is not postings
    assert Q._POSTINGS_CACHE
    Q.release_query_caches()
