"""Connected components over dup-pair edges (operators/components.py)."""

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.components import (
    connected_components,
    dedup_groups,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


def test_two_components(spark):
    e = _edges(spark, [(1, 2), (2, 3), (7, 8)])
    got = {
        (r["node"], r["group_id"])
        for r in connected_components(e).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (7, 7), (8, 7)}


def test_long_chain_converges_logarithmically(spark):
    # a 64-node path: diameter 63 >> max_iter 25 — only passes because
    # pointer jumping compresses chains geometrically per round
    e = _edges(spark, [(i, i + 1) for i in range(63)])
    got = connected_components(e, max_iter=25)
    assert got.where(F.col("group_id") != 0).count() == 0
    assert got.count() == 64


def test_edge_order_and_direction_invariant(spark):
    e1 = _edges(spark, [(5, 9), (2, 9), (1, 2)])
    e2 = _edges(spark, [(9, 5), (2, 1), (9, 2)])  # reversed/reordered
    r1 = sorted(map(tuple, connected_components(e1).collect()))
    r2 = sorted(map(tuple, connected_components(e2).collect()))
    assert r1 == r2 == [(1, 1), (2, 1), (5, 1), (9, 1)]


def test_dedup_groups_sizes_and_keep_rule(spark):
    e = _edges(spark, [(4, 2), (2, 6), (10, 11)])
    rows = {r["doc_id"]: r for r in dedup_groups(e).collect()}
    assert rows[2]["group_id"] == 2 and rows[2]["group_size"] == 3
    assert rows[4]["group_size"] == 3 and rows[6]["group_size"] == 3
    assert rows[10]["group_id"] == 10 and rows[10]["group_size"] == 2
    # keep-first rule: exactly one doc per group with doc_id == group_id
    keepers = [d for d, r in rows.items() if r["group_id"] == d]
    assert sorted(keepers) == [2, 10]


def test_nonconvergence_raises(spark):
    e = _edges(spark, [(i, i + 1) for i in range(40)])
    with pytest.raises(RuntimeError):
        connected_components(e, max_iter=2)
