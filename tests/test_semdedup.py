"""SemDeDup (operators/semdedup.py): the keep rule, the pluggable
k-means clustering, the over-sized-cluster guard, and plan shape. The
registry row `dedup_semdedup` additionally hash-certifies the whole
md5-hyperplane pass against the DuckDB replay."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.semdedup import (
    md5_planes,
    rp_bucket,
    semdedup,
)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )


def test_keep_rule_drops_centroid_near_member(spark):
    """Two semantic duplicates + one far vector in one cluster: the
    duplicate CLOSER to the centroid is dropped, the edge example and
    the non-duplicate survive (Abbas et al. §3: keep the
    information-rich member)."""
    # force one bucket by making all vectors positive along the same
    # hyperplane signs: cluster assignment provided explicitly
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.98, 0.199, 0.0]),   # near-dup of 1
        (3, [0.0, 1.0, 0.0]),      # same cluster, not a duplicate
    ]
    buckets = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0)], "vec_id long, bucket long"
    )
    got = {
        r["vec_id"]: r
        for r in semdedup(
            _emb_df(spark, rows), threshold=0.9, dim=3, buckets=buckets
        ).collect()
    }
    assert {v for v, r in got.items() if r["dropped"]} == {
        max(
            (1, 2),
            key=lambda v: got[v]["sim_centroid"],
        )
    }
    assert not got[3]["dropped"]


def test_kmeans_clustering_plugs_in(spark, sf_oracle):
    """The paper's k-means clustering substitutes through buckets=
    (operators/ann.py IVF assignment) with the same output contract."""
    from nebuia_vector_db_spark.operators.ann import build_ivf_index

    emb = (
        spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    )
    idx = build_ivf_index(emb, n_cells=8)
    buckets = idx.assigned.select(
        "vec_id", F.col("ivf_cell").alias("bucket")
    )
    out = semdedup(emb, threshold=0.35, buckets=buckets)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert {r["bucket"] for r in rows} <= set(range(8))
    assert any(r["dropped"] for r in rows)  # real drops in-cluster
    # drops are a subset of above-threshold within-cluster pairs:
    # every dropped vec has a qualifying partner in its bucket
    by_bucket: dict[int, list] = {}
    fetched = emb.collect()
    vecs = {r["vec_id"]: r["embedding"] for r in fetched}
    bk = {r["vec_id"]: r["bucket"] for r in rows}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["vec_id"])

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    for r in rows:
        if r["dropped"]:
            assert any(
                v != r["vec_id"]
                and cos(vecs[v], vecs[r["vec_id"]]) >= 0.35
                for v in by_bucket[bk[r["vec_id"]]]
            )


def test_oversized_cluster_excluded_from_pairs(spark):
    """A cluster above max_bucket is excluded from pair generation
    (the quadratic-join guard): identical vectors inside it stay
    kept, while a small cluster still drops."""
    rows = [(i, [1.0, 0.0]) for i in range(10)]  # 10 identical, bucket 0
    rows += [(100, [0.0, 1.0]), (101, [0.0, 1.0])]  # bucket 1
    buckets = spark.createDataFrame(
        [(i, 0) for i in range(10)] + [(100, 1), (101, 1)],
        "vec_id long, bucket long",
    )
    got = {
        r["vec_id"]: r["dropped"]
        for r in semdedup(
            _emb_df(spark, rows),
            threshold=0.9,
            dim=2,
            max_bucket=5,
            buckets=buckets,
        ).collect()
    }
    assert not any(got[i] for i in range(10))  # guarded: all kept
    assert sorted(v for v in (100, 101) if got[v]) == [101]


def test_md5_planes_deterministic_and_bucket_expression(spark):
    p1 = md5_planes(3, 8)
    p2 = md5_planes(3, 8)
    assert p1 == p2
    assert all(-32768 <= x <= 32767 for row in p1 for x in row)
    df = _emb_df(spark, [(1, [float(i) for i in range(8)])])
    b = df.select(rp_bucket("embedding", 3, 8).alias("b")).head()["b"]
    want = 0
    for j in range(3):
        if sum(x * y for x, y in zip([float(i) for i in range(8)], p1[j])) > 0:
            want |= 1 << j
    assert b == want


def test_plan_centroid_broadcast_no_window(spark, sf_oracle):
    """Centroids (bounded by 2^n_planes) broadcast to the scoring
    join; no Window over a data-dependent key anywhere."""
    from nebuia_vector_db_spark.plans.inspect import explain_str

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet")
    plan = explain_str(semdedup(emb, threshold=0.35, n_planes=3))
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_scored_cache_is_releasable(spark):
    """Pre-empted r9-style ADVICE: semdedup persists its scored
    relation (it feeds both pair-join sides + the final projection);
    the persist registers in the releasable module cache."""
    from nebuia_vector_db_spark.operators import semdedup as sd

    sd.release_cached_relations()
    rows = [(1, [1.0, 0.0]), (2, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    sd.semdedup(df, threshold=0.9, n_planes=2, dim=2).collect()
    assert len(sd._CACHED_RELATIONS) == 1
    assert sd._CACHED_RELATIONS[0].storageLevel.useMemory
    assert sd.release_cached_relations() == 1
