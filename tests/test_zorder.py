"""Z-order clustering (operators/zorder.py): Morton key correctness
and the measured multi-dimension pruning win over a linear sort."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.zorder import (
    cluster_by_zorder,
    column_ranges,
    zorder_key,
)
from nebuia_vector_db_spark.sources.snapshot import SnapshotTable


def _morton_py(vals, mins, maxs, bits):
    key = 0
    n = len(vals)
    levels = (1 << bits) - 1
    for ci, (x, mn, mx) in enumerate(zip(vals, mins, maxs)):
        span = max(mx - mn, 1)
        q = (x - mn) * levels // span
        q = max(0, min(q, levels))
        for b in range(bits):
            key |= ((q >> b) & 1) << (b * n + ci)
    return key


def test_key_matches_python_reference(spark):
    df = spark.range(0, 500).select(
        (F.col("id") * 7 % 301).alias("a"),
        (F.col("id") * 13 % 97).alias("b"),
    )
    mins, maxs = column_ranges(df, ["a", "b"])
    got = df.withColumn("z", zorder_key(["a", "b"], mins, maxs, bits=8)).collect()
    for r in got:
        assert r["z"] == _morton_py(
            [r["a"], r["b"]], mins, maxs, 8
        ), (r["a"], r["b"])


def test_out_of_range_values_clamp(spark):
    df = spark.createDataFrame([(-50,), (0,), (100,), (150,)], ["a"])
    got = df.withColumn(
        "z", zorder_key(["a"], [0], [100], bits=4)
    ).collect()
    zs = {r["a"]: r["z"] for r in got}
    assert zs[-50] == 0 and zs[0] == 0
    assert zs[100] == 15 and zs[150] == 15


def test_arg_validation(spark):
    with pytest.raises(ValueError):
        zorder_key(["a"] * 5, [0] * 5, [1] * 5)
    with pytest.raises(ValueError):
        zorder_key(["a", "b"], [0, 0], [1, 1], bits=32)


def test_zorder_prunes_on_both_dims_linear_only_on_one(spark, tmp_path):
    """The point of the operator: a box query on the SECOND dimension
    prunes files under z-order but not under a linear sort on the
    first, while the first dimension stays prunable under both."""
    n, parts = 40_000, 16
    df = spark.range(0, n).select(
        (F.hash(F.col("id")) % 1000 + 1000).alias("a"),
        (F.hash(F.col("id") + 7) % 1000 + 1000).alias("b"),
    )
    linear = df.repartitionByRange(parts, "a").sortWithinPartitions("a")
    zord = cluster_by_zorder(df, ["a", "b"], n_partitions=parts, bits=8)
    t_lin = SnapshotTable.create(spark, str(tmp_path / "lin"), linear)
    t_z = SnapshotTable.create(spark, str(tmp_path / "z"), zord)
    assert t_lin.n_files() >= parts and t_z.n_files() >= parts

    box_b = [("b", ">=", 1400), ("b", "<=", 1499)]
    box_a = [("a", ">=", 1400), ("a", "<=", 1499)]
    # linear layout: 'a' prunes hard, 'b' scans everything
    assert t_lin.pruned_file_count(box_a) <= 3
    assert t_lin.pruned_file_count(box_b) == t_lin.n_files()
    # z-order: BOTH dimensions prune. Range-partitioner boundary
    # sampling shifts file cut points a little run to run, so assert
    # a robust win (a 100/1000 box must drop >=1/4 of the files on
    # EITHER dimension — typical runs drop ~10/16) rather than an
    # exact fraction.
    assert t_z.pruned_file_count(box_a) <= t_z.n_files() * 3 // 4
    assert t_z.pruned_file_count(box_b) <= t_z.n_files() * 3 // 4

    # pruned reads stay value-correct
    expected = df.where(
        (F.col("b") >= 1400) & (F.col("b") <= 1499)
    ).count()
    assert t_z.read(where=box_b).count() == expected


def test_snapshot_optimize_zorder(spark, tmp_path):
    """OPTIMIZE ZORDER BY on a table created with a pruning-hostile
    layout: afterwards, box queries prune on both dimensions and the
    content is unchanged."""
    df = spark.range(0, 30_000).select(
        (F.hash(F.col("id")) % 500 + 500).alias("a"),
        (F.hash(F.col("id") + 3) % 500 + 500).alias("b"),
    )
    tbl = SnapshotTable.create(
        spark, str(tmp_path / "t"), df.repartition(12)  # round-robin
    )
    box = [("b", ">=", 700), ("b", "<=", 749)]
    assert tbl.pruned_file_count(box) == tbl.n_files()  # nothing prunes
    before = tbl.read().groupBy().agg(
        F.count("*"), F.sum("a"), F.sum("b")
    ).head()

    v = tbl.optimize_zorder(["a", "b"], n_partitions=16)
    assert v == 2 and tbl._snapshot()["op"] == "optimize_zorder"
    assert tbl.pruned_file_count(box) <= tbl.n_files() // 2
    after = tbl.read().groupBy().agg(
        F.count("*"), F.sum("a"), F.sum("b")
    ).head()
    assert tuple(before) == tuple(after)
    expected = df.where((F.col("b") >= 700) & (F.col("b") <= 749)).count()
    assert tbl.read(where=box).count() == expected
