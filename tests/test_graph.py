"""operators/graph.py — integer-exact PageRank.

The oracle row (graph_pagerank) hash-certifies the full pipeline
against DuckDB's unrolled-CTE replay; these tests pin the recurrence
against a from-scratch pure-Python reference on adversarial shapes
(dangling nodes, parallel edges, self-loops, sink-only nodes) plus the
checkpoint path and the degenerate parameter space.
"""

import random
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.graph import (
    graph_nodes,
    out_degrees,
    pagerank_exact,
)


def _ref_pagerank(edges, iters, damping_pct=85, init_micro=1_000_000):
    nodes = {u for e in edges for u in e}
    deg = defaultdict(int)
    for u, _ in edges:
        deg[u] += 1
    tel = (init_micro * (100 - damping_pct)) // 100
    r = {u: init_micro for u in nodes}
    for _ in range(iters):
        inc = defaultdict(int)
        for u, v in edges:
            inc[v] += (r[u] * damping_pct) // (100 * deg[u])
        r = {u: tel + inc[u] for u in nodes}
    return r


def _run(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {
        r.node: r.rank_micro for r in pagerank_exact(df, **kw).collect()
    }


def test_pagerank_matches_reference_adversarial(spark):
    # dangling node 3 (sink), parallel edge 0->2 twice, self-loop 4->4,
    # node 5 appears only as a destination
    edges = [(0, 1), (0, 2), (0, 2), (1, 2), (2, 0), (2, 3), (4, 4), (1, 5)]
    for iters in (0, 1, 3, 6):
        assert _run(spark, edges, iters=iters) == _ref_pagerank(
            edges, iters
        ), iters


def test_pagerank_checkpoint_path_identical(spark):
    edges = [(i, (i * 7 + 1) % 20) for i in range(20)] + [
        (i, (i * 3 + 5) % 20) for i in range(20)
    ]
    base = _run(spark, edges, iters=5)
    # force the lineage cut mid-run; results must be unchanged
    assert _run(spark, edges, iters=5, checkpoint_every=2) == base
    assert base == _ref_pagerank(edges, 5)


def test_pagerank_mass_conservation_bound(spark):
    # total mass never exceeds n * init (dangling + floor remainders
    # only LEAK mass under the documented variant)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)]
    got = _run(spark, edges, iters=4)
    assert sum(got.values()) <= 4 * 1_000_000
    assert all(v >= 150_000 for v in got.values())  # teleport floor


def test_pagerank_param_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_exact(df, damping_pct=101)
    with pytest.raises(ValueError):
        pagerank_exact(df, iters=-1)
    with pytest.raises(ValueError):
        pagerank_exact(df, checkpoint_every=0)
    from nebuia_vector_db_spark.operators.graph import label_propagation

    with pytest.raises(ValueError):
        label_propagation(df, checkpoint_every=0)


def test_nodes_and_degrees(spark):
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 2), (2, 3)], "src long, dst long"
    )
    assert {r.node for r in graph_nodes(edges).collect()} == {0, 1, 2, 3}
    deg = {r.node: r.out_deg for r in out_degrees(edges).collect()}
    # parallel edges count multiply; sinks get explicit 0
    assert deg == {0: 3, 1: 0, 2: 1, 3: 0}


def _ref_lpa(edges, iters):
    sym = set()
    for u, v in edges:
        sym.add((u, v))
        sym.add((v, u))
    nbrs = defaultdict(set)
    for u, v in sym:
        nbrs[v].add(u)
    lab = {u: u for e in sym for u in e}
    for _ in range(iters):
        new = {}
        for v in lab:
            cnt = defaultdict(int)
            for u in nbrs[v]:
                cnt[lab[u]] += 1
            new[v] = (
                sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
                if cnt
                else v
            )
        lab = new
    return lab


def test_label_propagation_matches_reference(spark):
    from nebuia_vector_db_spark.operators.graph import label_propagation

    # two triangles bridged by one edge, plus a self-loop singleton;
    # parallel + reversed edges exercise the undirected-closure dedup
    edges = [(0, 1), (1, 2), (0, 2), (2, 0), (3, 4), (4, 5), (3, 5),
             (2, 3), (6, 6), (0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    for iters in (0, 1, 4):
        got = {
            r.node: r.community
            for r in label_propagation(df, iters=iters).collect()
        }
        assert got == _ref_lpa(edges, iters), iters


def test_label_propagation_separates_cliques(spark):
    from nebuia_vector_db_spark.operators.graph import label_propagation

    # two 4-cliques with NO bridge: each converges to its min label
    cliq = lambda base: [
        (base + i, base + j) for i in range(4) for j in range(i + 1, 4)
    ]
    df = spark.createDataFrame(
        cliq(0) + cliq(10), "src long, dst long"
    )
    got = {
        r.node: r.community
        for r in label_propagation(df, iters=4).collect()
    }
    assert {got[i] for i in range(4)} == {0}
    assert {got[10 + i] for i in range(4)} == {10}


def test_label_propagation_checkpoint_identical(spark):
    from nebuia_vector_db_spark.operators.graph import label_propagation

    edges = [(i, (i * 3 + 1) % 12) for i in range(12)]
    df = spark.createDataFrame(edges, "src long, dst long")
    base = {
        r.node: r.community
        for r in label_propagation(df, iters=5).collect()
    }
    chk = {
        r.node: r.community
        for r in label_propagation(df, iters=5, checkpoint_every=2).collect()
    }
    assert base == chk == _ref_lpa(edges, 5)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_pagerank_edge_order_and_partitioning_invariant(spark, seed):
    """The micro-unit claim, property-tested: integer sums are
    order-independent, so shuffling the edge list AND changing its
    partitioning must reproduce bit-identical ranks (a float
    implementation fails this — partition boundaries change the
    summation order)."""
    rng = random.Random(seed)
    n = rng.randint(4, 24)
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(rng.randint(n, 3 * n))
    ]
    want = _ref_pagerank(edges, 3)
    shuffled = edges[:]
    rng.shuffle(shuffled)
    for parts in (1, 7):
        df = spark.createDataFrame(
            shuffled, "src long, dst long"
        ).repartition(parts)
        got = {
            r.node: r.rank_micro
            for r in pagerank_exact(df, iters=3).collect()
        }
        assert got == want, (seed, parts)


def test_pagerank_string_node_ids(spark):
    # node type is generic — domains/URLs are the production key
    edges = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "a.com"), ("c.com", "a.com")],
        "src string, dst string",
    )
    got = {r.node: r.rank_micro for r in pagerank_exact(edges, iters=2).collect()}
    ref = _ref_pagerank(
        [("a.com", "b.com"), ("b.com", "a.com"), ("c.com", "a.com")], 2
    )
    assert got == ref


def test_personalized_pagerank_seed_gating(spark):
    """PPR (round 13): teleport mass lands only on seeds — a node
    unreachable from any seed ranks 0; seeds keep teleport mass; and
    personalize=None stays byte-identical to the classic recurrence."""
    from nebuia_vector_db_spark.operators.graph import (
        pagerank_exact,
        release_cached_relations,
    )

    # 1 -> 2 -> 3, and isolated-from-seeds 4 -> 5
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r["node"]: r["rank_micro"]
        for r in pagerank_exact(
            edges, iters=3, personalize=seeds
        ).collect()
    }
    release_cached_relations()
    # hand-rolled recurrence: r0 = (1e6, 0, 0, 0, 0)
    # r1: n1=150000; n2=(1e6*85)//100=850000; n3=0; n4=n5=0
    # r2: n1=150000; n2=127500; n3=722500; others 0
    # r3: n1=150000; n2=127500; n3=108375
    assert got == {1: 150000, 2: 127500, 3: 108375, 4: 0, 5: 0}
    # default personalize=None ≡ the pre-r13 classic recurrence
    classic = {
        r["node"]: r["rank_micro"]
        for r in pagerank_exact(edges, iters=2).collect()
    }
    release_cached_relations()
    # r0 all 1e6; r1: tp=150000; n2 += 850000, n3 += 850000, n5 += 850000
    # (out-deg 1 each); n1=n4=150000
    # r2: n1=150000, n2=150000+127500, n3=150000+850000, n4=150000,
    #     n5=150000+127500
    assert classic == {
        1: 150000, 2: 277500, 3: 1000000, 4: 150000, 5: 277500,
    }


def test_hits_matches_pure_python_reference(spark):
    """hits_exact ≡ a from-scratch pure-Python integer HITS on a small
    directed graph with a dangling node (no out-edges → hub 0) and an
    unreferenced node (no in-edges → auth 0)."""
    from nebuia_vector_db_spark.operators.graph import (
        hits_exact,
        release_cached_relations,
    )

    edges = [(1, 2), (1, 3), (2, 3), (4, 3), (3, 5), (6, 1)]
    nodes = sorted({u for e in edges for u in e})
    auth = {v: 1_000_000 for v in nodes}
    hub = {}
    for _ in range(3):
        hub = {u: sum(auth[v] for s, v in edges if s == u) for u in nodes}
        auth = {v: sum(hub[u] for u, d in edges if d == v) for v in nodes}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits_exact(df, iters=3).collect()
    }
    release_cached_relations()
    assert got == {v: (hub[v], auth[v]) for v in nodes}
    assert got[5][0] == 0  # dangling: no out-edges → hub 0
    assert got[6][1] == 0  # unreferenced: no in-edges → auth 0


def test_hits_unnormalized_ranking_equals_normalized(spark):
    """The docstring's linearity claim: at the same iteration count,
    the unnormalized integer scores rank nodes identically to classic
    L1-normalized float HITS (quantization breaks ties only between
    EQUAL integer scores, so compare order of distinct values)."""
    from nebuia_vector_db_spark.operators.graph import (
        hits_exact,
        release_cached_relations,
    )

    edges = [
        (i, (i * 7 + 3) % 11) for i in range(11)
    ] + [(i, (i * 5 + 1) % 11) for i in range(11)]
    nodes = sorted({u for e in edges for u in e})
    auth = {v: 1.0 for v in nodes}
    hub = {}
    for _ in range(3):
        hub = {u: sum(auth[v] for s, v in edges if s == u) for u in nodes}
        z = sum(hub.values())
        hub = {u: h / z for u, h in hub.items()}
        auth = {v: sum(hub[u] for u, d in edges if d == v) for v in nodes}
        z = sum(auth.values())
        auth = {v: a / z for v, a in auth.items()}
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: (r["hub_micro"], r["auth_micro"])
        for r in hits_exact(df, iters=3).collect()
    }
    release_cached_relations()
    for key, ref in ((0, hub), (1, auth)):
        ints = sorted(nodes, key=lambda v: (got[v][key], v))
        floats = sorted(nodes, key=lambda v: (round(ref[v], 12), v))
        assert ints == floats


def test_hits_rejects_bad_iters(spark):
    from nebuia_vector_db_spark.operators.graph import hits_exact

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="iters"):
        hits_exact(df, iters=0)
