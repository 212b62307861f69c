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


def test_random_graph_matches_union_find(spark):
    """50k-edge random graph on 20k nodes vs a driver-side union-find
    — exercises multi-round convergence, big components, and
    singletons-in-pairs at a size where a wrong fixpoint can't hide."""
    import numpy as np

    rng = np.random.default_rng(42)
    a = rng.integers(0, 20_000, size=50_000)
    b = rng.integers(0, 20_000, size=50_000)
    keep = a != b
    edges = list(zip(a[keep].tolist(), b[keep].tolist()))

    parent = list(range(20_000))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    nodes_in_edges = {u for e in edges for u in e}
    want = {n: find(n) for n in nodes_in_edges}
    # canonical label = component min; path-compressed roots ARE the
    # min because union always points the larger root at the smaller
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["group_id"]
        for r in connected_components(df).collect()
    }
    assert got == want
