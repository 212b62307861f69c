"""IVF index (operators/ann.py): exactness at full probe, recall and
scan-fraction at partial probe."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.ann import build_ivf_index, recall_at_k
from nebuia_vector_db_spark.operators.topk import topk_search
from nebuia_vector_db_spark.sources.registry import load_table


def _emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_full_probe_equals_exact(spark, sf_smoke):
    emb = _emb(spark, sf_smoke)
    index = build_ivf_index(emb, n_cells=4)
    q = [float(x) for x in emb.where(F.col("vec_id") == 5).head()["embedding"]]
    exact = [
        (r["vec_id"], round(r["similarity"], 9))
        for r in topk_search(emb, q, 10, tie_cols=["vec_id"]).collect()
    ]
    approx = [
        (r["vec_id"], round(r["similarity"], 9))
        for r in index.search(q, 10, nprobe=index.n_cells, tie_cols=["vec_id"]).collect()
    ]
    assert exact == approx


def test_partial_probe_recall_and_pruning(spark, sf_oracle):
    emb = _emb(spark, sf_oracle).cache()
    index = build_ivf_index(emb, n_cells=8)
    q = [float(x) for x in emb.where(F.col("vec_id") == 11).head()["embedding"]]

    # pruning actually prunes: candidate set < corpus
    cells = index.probe_cells(q, nprobe=2)
    n_total = emb.count()
    n_cand = index.assigned.where(F.col("ivf_cell").isin(cells)).count()
    assert 0 < n_cand < n_total

    # probing more cells can only improve recall; full probe is 1.0
    r2 = recall_at_k(index, emb, q, k=10, nprobe=2)
    r_full = recall_at_k(index, emb, q, k=10, nprobe=index.n_cells)
    assert 0.0 <= r2 <= r_full == 1.0
    # the query's own cell is probed first → its exact NN (itself) found
    assert r2 >= 0.1


def test_cell_assignment_covers_corpus(spark, sf_smoke):
    emb = _emb(spark, sf_smoke)
    index = build_ivf_index(emb, n_cells=4)
    assert index.assigned.where(F.col("ivf_cell").isNull()).count() == 0
    cells = {r[0] for r in index.assigned.select("ivf_cell").distinct().collect()}
    assert cells <= set(range(index.n_cells))


def test_saved_ivf_index_search_prunes_partitions(spark, sf_oracle, tmp_path_factory):
    """Persisted index: the nprobe cell filter must reach the scan as a
    PartitionFilter (only probed cells' files read) and return the same
    rows as the in-memory index."""
    from nebuia_vector_db_spark.operators.ann import (
        build_ivf_index,
        load_ivf_index,
        save_ivf_index,
    )
    from nebuia_vector_db_spark.plans.inspect import explain_str
    from nebuia_vector_db_spark.sources.registry import load_table

    emb = load_table(spark, sf_oracle, "embeddings")
    idx = build_ivf_index(emb, n_cells=8)
    path = str(tmp_path_factory.mktemp("ivf_idx"))
    save_ivf_index(idx, path)
    loaded = load_ivf_index(spark, path)
    assert (loaded.centroids == idx.centroids).all()

    q = [0.125] * 64
    got = loaded.search(q, 5, nprobe=2, tie_cols=["vec_id"])
    plan = explain_str(got)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cell" in m.group(1), plan
    want = {
        r["vec_id"] for r in idx.search(q, 5, nprobe=2, tie_cols=["vec_id"]).collect()
    }
    assert {r["vec_id"] for r in got.collect()} == want


def test_assign_to_cells_matches_mllib_transform(spark, sf_oracle):
    """Our broadcast-GEMM assignment (the append path) must agree with
    MLlib's model.transform (the build path) — otherwise append and
    rebuild would route the same vector differently."""
    from nebuia_vector_db_spark.operators.ann import assign_to_cells

    emb = _emb(spark, sf_oracle)
    index = build_ivf_index(emb, n_cells=8)
    ours = {
        r["vec_id"]: r["ivf_cell"]
        for r in assign_to_cells(emb, index.centroids)
        .select("vec_id", "ivf_cell")
        .collect()
    }
    mllib = {
        r["vec_id"]: r["ivf_cell"]
        for r in index.assigned.select("vec_id", "ivf_cell").collect()
    }
    assert ours == mllib


def test_append_equals_full_rebuild(spark, sf_oracle, tmp_path_factory):
    """VERDICT r2 #6 round trip: save(assign(A)) + append(B) must hold
    exactly the same cell contents as save(assign(A∪B)) with the same
    centroids, and searches over both must match."""
    from nebuia_vector_db_spark.operators.ann import (
        IVFIndex,
        append_to_ivf_index,
        assign_to_cells,
        save_ivf_index,
    )

    emb = _emb(spark, sf_oracle).cache()
    part_a = emb.where(F.col("vec_id") % 5 != 0)
    part_b = emb.where(F.col("vec_id") % 5 == 0)
    assert part_b.count() > 0

    # centroids trained once on part A (the "yesterday" corpus)
    base = build_ivf_index(part_a, n_cells=8)

    inc_path = str(tmp_path_factory.mktemp("ivf_inc"))
    full_path = str(tmp_path_factory.mktemp("ivf_full"))
    save_ivf_index(base, inc_path)
    appended = append_to_ivf_index(spark, inc_path, part_b)

    full = IVFIndex(
        assign_to_cells(emb, base.centroids), base.centroids, "embedding"
    )
    save_ivf_index(full, full_path)
    from nebuia_vector_db_spark.operators.ann import load_ivf_index

    reloaded_full = load_ivf_index(spark, full_path)

    rows_inc = sorted(
        (r["vec_id"], r["ivf_cell"])
        for r in appended.assigned.select("vec_id", "ivf_cell").collect()
    )
    rows_full = sorted(
        (r["vec_id"], r["ivf_cell"])
        for r in reloaded_full.assigned.select("vec_id", "ivf_cell").collect()
    )
    assert rows_inc == rows_full
    assert len(rows_inc) == emb.count()

    q = [float(x) for x in emb.where(F.col("vec_id") == 5).head()["embedding"]]
    res_inc = [
        (r["vec_id"], round(r["similarity"], 9))
        for r in appended.search(q, 10, nprobe=3, tie_cols=["vec_id"]).collect()
    ]
    res_full = [
        (r["vec_id"], round(r["similarity"], 9))
        for r in reloaded_full.search(q, 10, nprobe=3, tie_cols=["vec_id"]).collect()
    ]
    assert res_inc == res_full
    emb.unpersist()


def test_snapshot_index_round_trip_append_and_time_travel(
    spark, sf_oracle, tmp_path_factory
):
    """Snapshot-backed index persistence: load ≡ original, append is
    one atomic commit matching the plain-append layout, and the
    pre-append index version remains searchable (time travel)."""
    from nebuia_vector_db_spark.operators.ann import (
        append_to_ivf_index_snapshot,
        build_ivf_index,
        load_ivf_index_snapshot,
        save_ivf_index_snapshot,
    )

    emb = _emb(spark, sf_oracle).cache()
    part_a = emb.where(F.col("vec_id") % 5 != 0)
    part_b = emb.where(F.col("vec_id") % 5 == 0)
    base = build_ivf_index(part_a, n_cells=8)

    path = str(tmp_path_factory.mktemp("ivf_snap")) + "/t"
    tbl = save_ivf_index_snapshot(base, path)
    loaded = load_ivf_index_snapshot(spark, path)
    assert (loaded.centroids == base.centroids).all()

    q = [float(x) for x in emb.where(F.col("vec_id") == 7).head()["embedding"]]
    want = [
        (r["vec_id"], round(r["similarity"], 9))
        for r in base.search(q, 10, nprobe=8, tie_cols=["vec_id"]).collect()
    ]
    got = [
        (r["vec_id"], round(r["similarity"], 9))
        for r in loaded.search(q, 10, nprobe=8, tie_cols=["vec_id"]).collect()
    ]
    assert got == want

    appended = append_to_ivf_index_snapshot(spark, path, part_b)
    assert appended.assigned.count() == emb.count()
    # one atomic commit landed
    assert tbl.current_version() == 2
    assert tbl._snapshot()["op"] == "append"
    # cell assignment matches routing through the same frozen centroids
    from nebuia_vector_db_spark.operators.ann import assign_to_cells

    want_cells = sorted(
        (r["vec_id"], r["ivf_cell"])
        for r in assign_to_cells(emb, base.centroids)
        .select("vec_id", "ivf_cell")
        .collect()
    )
    got_cells = sorted(
        (r["vec_id"], r["ivf_cell"])
        for r in appended.assigned.select("vec_id", "ivf_cell").collect()
    )
    assert got_cells == want_cells

    # time travel: version 1 is still the pre-append index
    old = load_ivf_index_snapshot(spark, path, version=1)
    assert old.assigned.count() == part_a.count()
    old_res = [
        (r["vec_id"], round(r["similarity"], 9))
        for r in old.search(q, 10, nprobe=8, tie_cols=["vec_id"]).collect()
    ]
    assert old_res == want


def test_search_batch_full_probe_equals_knn_join(spark, sf_oracle):
    """nprobe == n_cells: batch ANN must be EXACTLY the exact batch
    kNN (same ids, same sims, same ranks) — the oracle contract the
    vs_ivf_batch registry row rides on."""
    from nebuia_vector_db_spark.operators.topk import knn_join

    emb = _emb(spark, sf_oracle).cache()
    index = build_ivf_index(emb, n_cells=8)
    queries = (
        emb.where(F.col("vec_id").isin(0, 3, 11))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("query_vec"),
        )
    )
    want = {
        (r["query_id"], r["vec_id"], round(r["similarity"], 9), r["rk"])
        for r in knn_join(queries, emb, k=5, tie_cols=["vec_id"]).collect()
    }
    got = {
        (r["query_id"], r["vec_id"], round(r["similarity"], 9), r["rk"])
        for r in index.search_batch(
            queries, 5, nprobe=index.n_cells, tie_cols=["vec_id"]
        ).collect()
    }
    assert got == want


def test_search_batch_partial_probe_respects_mask_and_k(spark, sf_oracle):
    """Partial probe: every returned candidate's cell must have been
    probed FOR THAT QUERY, each query gets <= k rows, and similarities
    are the true dots (no approximation in the kernel itself)."""
    import numpy as np

    from nebuia_vector_db_spark.functions.vector import normalize_query

    emb = _emb(spark, sf_oracle).cache()
    index = build_ivf_index(emb, n_cells=8)
    qrows = emb.where(F.col("vec_id").isin(2, 9)).select(
        "vec_id", "embedding"
    ).collect()
    queries = spark.createDataFrame(
        [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in qrows],
        "query_id long, query_vec array<double>",
    )
    out = index.search_batch(queries, 4, nprobe=2, tie_cols=["vec_id"]).collect()
    cell_of = {
        r["vec_id"]: r["ivf_cell"]
        for r in index.assigned.select("vec_id", "ivf_cell").collect()
    }
    qvec_of = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in qrows}
    emb_of = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.select("vec_id", "embedding").collect()
    }
    per_q: dict[int, int] = {}
    for r in out:
        probed = set(index.probe_cells(qvec_of[r["query_id"]], 2))
        assert cell_of[r["vec_id"]] in probed, "candidate outside probed cells"
        qn = np.asarray(normalize_query(qvec_of[r["query_id"]]))
        true_sim = float(emb_of[r["vec_id"]] @ qn)
        assert abs(r["similarity"] - true_sim) < 1e-9, "kernel must score exactly"
        per_q[r["query_id"]] = per_q.get(r["query_id"], 0) + 1
    assert all(v <= 4 for v in per_q.values())
    assert set(per_q) == {2, 9}


def test_deterministic_ivf_build_is_bit_stable(spark, sf_oracle):
    """Two deterministic builds from the same pinned sample produce
    identical centroids AND identical recall — the property that makes
    bench recall rows usable as regression signals."""
    import numpy as np

    from nebuia_vector_db_spark.operators.ann import (
        build_ivf_index_deterministic,
        recall_at_k_batch,
    )

    emb = _emb(spark, sf_oracle).cache()
    mat = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float32,
    )
    queries = [mat[i].astype(np.float64).tolist() for i in (1, 5, 13)]
    idx1 = build_ivf_index_deterministic(emb, 8, mat, seed=7)
    idx2 = build_ivf_index_deterministic(emb, 8, mat, seed=7)
    assert np.array_equal(idx1.centroids, idx2.centroids)
    r1 = recall_at_k_batch(idx1, emb, queries, k=10, nprobe=3)
    r2 = recall_at_k_batch(idx2, emb, queries, k=10, nprobe=3)
    assert r1 == r2
    r_full = recall_at_k_batch(idx1, emb, queries, k=10, nprobe=8)
    assert r_full == 1.0


def test_saved_index_search_batch_prunes_partitions(
    spark, sf_oracle, tmp_path_factory
):
    """Persisted index + BATCH search: the union-of-probed-cells
    filter must reach the scan as a PartitionFilter — at scale the
    batch pays for |union| cells' files, not the corpus."""
    import re

    from nebuia_vector_db_spark.operators.ann import (
        build_ivf_index,
        load_ivf_index,
        save_ivf_index,
    )
    from nebuia_vector_db_spark.plans.inspect import explain_str

    emb = _emb(spark, sf_oracle)
    idx = build_ivf_index(emb, n_cells=8)
    path = str(tmp_path_factory.mktemp("ivf_idx_b"))
    save_ivf_index(idx, path)
    loaded = load_ivf_index(spark, path)
    queries = (
        emb.where(F.col("vec_id").isin(0, 7))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("query_vec"),
        )
    )
    got = loaded.search_batch(queries, 5, nprobe=2, tie_cols=["vec_id"])
    plan = explain_str(got)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cell" in m.group(1), plan
    # and the results agree with the in-memory index's batch search
    want = {
        (r["query_id"], r["vec_id"], r["rk"])
        for r in idx.search_batch(
            queries, 5, nprobe=2, tie_cols=["vec_id"]
        ).collect()
    }
    assert {
        (r["query_id"], r["vec_id"], r["rk"]) for r in got.collect()
    } == want


def test_router_full_width_equals_flat_probe(spark, sf_oracle):
    """Round 9 (VERDICT r8 task #3): the two-level router with
    route_width == n_coarse degrades to EXACTLY the flat probe — the
    candidate set is every fine cell, the fine GEMM and stable
    ordering are identical — so routing is a pure cost optimization,
    never a silent semantic change."""
    from nebuia_vector_db_spark.operators.ann import (
        build_ivf_index_deterministic,
    )

    emb = _emb(spark, sf_oracle).cache()
    mat = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float32,
    )
    queries = [mat[i].astype(np.float64).tolist() for i in (1, 5, 13, 42)]
    flat = build_ivf_index_deterministic(emb, 16, mat, seed=7)
    routed = build_ivf_index_deterministic(emb, 16, mat, seed=7)
    routed.build_router(n_coarse=4, route_width=4)
    for q in queries:
        for nprobe in (1, 3, 8, 16):
            assert routed.probe_cells(q, nprobe) == flat.probe_cells(
                q, nprobe
            )


def test_router_build_is_deterministic(spark, sf_oracle):
    from nebuia_vector_db_spark.operators.ann import (
        build_ivf_index_deterministic,
    )

    emb = _emb(spark, sf_oracle)
    mat = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()],
        dtype=np.float32,
    )
    a = build_ivf_index_deterministic(emb, 16, mat, seed=7).build_router(
        n_coarse=4
    )
    b = build_ivf_index_deterministic(emb, 16, mat, seed=7).build_router(
        n_coarse=4
    )
    assert np.array_equal(a._router[0], b._router[0])
    assert np.array_equal(a._router[1], b._router[1])
    assert a._router[2] == b._router[2]


def test_router_search_batch_preserves_recall_on_clustered(spark):
    """On a clustered corpus with fine cells (the b12_fine geometry in
    miniature): routed batch search keeps the flat probe's recall
    while the router's fine GEMM touches only the routed coarse
    clusters' members, and the probed-cell union stays a small
    fraction of all cells for a diverse batch."""
    from nebuia_vector_db_spark.operators.ann import (
        build_ivf_index_deterministic,
        recall_at_k_batch,
    )

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(16, 16)) * 4.0
    cid = rng.integers(0, 16, size=8000)
    mat = centers[cid] + rng.normal(scale=0.5, size=(8000, 16))
    df = spark.createDataFrame(
        [(int(i), mat[i].tolist()) for i in range(len(mat))],
        "vec_id long, embedding array<double>",
    ).cache()
    queries = [
        (centers[c] + rng.normal(scale=0.5, size=16)).tolist()
        for c in range(8)
    ]
    idx = build_ivf_index_deterministic(df, 128, mat[:4000], seed=42)
    idx.assigned = idx.assigned.cache()
    flat_rec = recall_at_k_batch(idx, df, queries, k=10, nprobe=8)
    routed = build_ivf_index_deterministic(df, 128, mat[:4000], seed=42)
    routed.assigned = routed.assigned.cache()
    routed.build_router(n_coarse=16, route_width=4)
    routed_rec = recall_at_k_batch(routed, df, queries, k=10, nprobe=8)
    assert routed_rec >= flat_rec - 0.05, (flat_rec, routed_rec)
    assert routed_rec >= 0.9
    # diverse 8-component batch unions well under half the fine cells
    union = set()
    for q in queries:
        union.update(routed.probe_cells(q, 8))
    assert len(union) / routed.n_cells < 0.5
