"""Matryoshka prefix-dim funnel retrieval (operators/mrl.py, round
11): full-shortlist ≡ brute-force exactness, the materialized-prefix
column-pruning contract (the 100 TB scan argument), shortlist-rule
determinism, and both stages planning TakeOrderedAndProject. The
`vs_mrl_rerank` registry row additionally hash-certifies shortlist +
re-rank against a DuckDB replay."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.mrl import (
    attach_prefix,
    mrl_topk_rerank,
)
from nebuia_vector_db_spark.operators.topk import topk_search


def _emb(spark, sf):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def test_full_shortlist_equals_exact_topk(spark, sf_smoke):
    """shortlist ≥ |corpus| ⇒ the funnel IS brute force — the same
    full-probe ≡ exact contract the IVF/BQ tiers pin."""
    emb = _emb(spark, sf_smoke)
    q = [float(x) for x in emb.where("vec_id = 4").head()["embedding"]]
    n = emb.count()
    got = [
        (r["vec_id"], round(r["similarity"], 6))
        for r in mrl_topk_rerank(
            emb, q, 10, prefix_dim=16, shortlist=n, tie_cols=["vec_id"]
        ).collect()
    ]
    want = [
        (r["vec_id"], round(r["similarity"], 6))
        for r in topk_search(emb, q, 10, tie_cols=["vec_id"]).collect()
    ]
    assert got == want


def test_materialized_prefix_scan_prunes_full_vector(spark, tmp_path):
    """With attach_prefix written to storage, the OPERATOR's own
    shortlist scan must read prefix + key only (the 4×-fewer-bytes
    argument, checked on ReadSchema like the PQ codes scan) while
    the re-rank side reads the full vector through the broadcast
    semi-join. A mismatched materialized prefix must raise, not
    NULL-pad and rank garbage."""
    import pytest as _pytest

    from nebuia_vector_db_spark.plans.inspect import scan_read_schema

    emb = _emb(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "mrl")
    attach_prefix(emb, prefix_dim=16).write.parquet(path)
    stored = spark.read.parquet(path)
    q = [0.1] * 64
    funnel = mrl_topk_rerank(
        stored, q, 10, prefix_dim=16, shortlist=50,
        prefix_col="prefix", tie_cols=["vec_id"],
    )
    schemas = scan_read_schema(funnel)
    pruned = [
        sc for sc in schemas if "prefix" in sc and "embedding" not in sc
    ]
    assert pruned, schemas  # the shortlist scan never reads the vector
    # same rows as the slice-on-the-fly path
    got_stored = [r["vec_id"] for r in funnel.collect()]
    got_sliced = [
        r["vec_id"]
        for r in mrl_topk_rerank(
            emb, q, 10, prefix_dim=16, shortlist=50, tie_cols=["vec_id"]
        ).collect()
    ]
    assert got_stored == got_sliced
    # the guard is a per-row CASE (whole-column coverage, no eager
    # construction job) — a mismatched prefix fails at EXECUTION
    with _pytest.raises(Exception, match="dims"):
        mrl_topk_rerank(
            stored, q, 10, prefix_dim=8, shortlist=50,
            prefix_col="prefix", tie_cols=["vec_id"],
        ).collect()


def test_ragged_prefix_column_raises_not_mispads(spark):
    """One stale row deep in the table — a first-row probe would pass
    it and the coarse dot would NULL-pad; the per-row guard must
    surface it as an error (ADVICE r11)."""
    rows = [(i, [float(i)] * 64, [float(i)] * 16) for i in range(20)]
    rows.append((99, [9.0] * 64, [9.0] * 8))  # stale 8-dim prefix
    df = spark.createDataFrame(
        rows, "vec_id int, embedding array<float>, prefix array<float>"
    )
    with pytest.raises(Exception, match="dims"):
        mrl_topk_rerank(
            df, [1.0] * 64, 5, prefix_dim=16, shortlist=10,
            prefix_col="prefix", tie_cols=["vec_id"],
        ).collect()


def test_both_stages_take_ordered_and_validation(spark, sf_smoke):
    from nebuia_vector_db_spark.plans.inspect import explain_str

    emb = _emb(spark, sf_smoke)
    q = [1.0] + [0.0] * 63
    from nebuia_vector_db_spark.plans.inspect import shuffle_count

    funnel = mrl_topk_rerank(emb, q, 5, shortlist=20, tie_cols=["vec_id"])
    plan = explain_str(funnel)
    # both cuts are TakeOrderedAndProject (bounded heaps, driver
    # merge) and the whole funnel is SHUFFLE-FREE — Catalyst may fuse
    # the re-rank projection into the shortlist node, so pin the
    # properties (node present, zero exchanges), not the node count
    assert "TakeOrderedAndProject" in plan
    assert shuffle_count(funnel) == 0, plan
    with pytest.raises(ValueError):
        mrl_topk_rerank(emb, q, 10, shortlist=5)
