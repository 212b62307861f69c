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


# --------------------------------------------------------------------------
# Incremental SemDeDup (round 14: incremental.py::SemDedupClusterIndex —
# the fourth incremental index family). The defining contract:
# ingest ≡ from-scratch semdedup over the post-commit corpus RESTRICTED
# to touched clusters. The `dedup_semdedup_incremental` registry row
# additionally hash-certifies the insert-commit path against DuckDB.
# --------------------------------------------------------------------------


def _semdedup_rows(df):
    return {
        (r["vec_id"], r["bucket"], round(r["sim_centroid"], 6), r["dropped"])
        for r in df.collect()
    }


def _from_scratch_touched(spark, corpus_df, touched_pred, **kw):
    """from-scratch semdedup over corpus_df restricted to buckets the
    predicate's vectors map to."""
    full = semdedup(corpus_df, **kw)
    touched = (
        corpus_df.where(touched_pred)
        .select(
            rp_bucket("embedding", kw["n_planes"], kw.get("dim", 64)).alias(
                "bucket"
            )
        )
        .distinct()
    )
    return full.join(touched, "bucket", "left_semi")


def test_semdedup_incremental_insert_commit(spark, sf_oracle, tmp_path):
    """An insert commit's decisions equal from-scratch semdedup over
    the post-commit corpus restricted to the delta's clusters — on the
    real corpus, where the delta lands in several clusters alongside
    pre-existing members whose sim_centroid SHIFTS with the centroid."""
    from nebuia_vector_db_spark.operators.incremental import (
        SemDedupClusterIndex,
        release_cached_relations,
    )
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    emb = spark.read.parquet(f"{sf_oracle}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    base = emb.where(F.col("vec_id") % 97 != 0)
    delta = emb.where(F.col("vec_id") % 97 == 0)
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), base)
    idx = SemDedupClusterIndex.create(
        spark, str(tmp_path / "i"), corpus=base,
        threshold=0.35, n_planes=6,
    )
    corpus.append(delta)
    got = _semdedup_rows(idx.ingest_commit(corpus))
    want = _semdedup_rows(
        _from_scratch_touched(
            spark, emb, F.col("vec_id") % 97 == 0,
            threshold=0.35, n_planes=6,
        )
    )
    release_cached_relations()
    from nebuia_vector_db_spark.operators import semdedup as sd

    sd.release_cached_relations()
    assert got == want and got
    # the output is cluster-complete: pre-existing members of touched
    # clusters are re-decided, not just the delta rows
    assert any(v % 97 != 0 for v, *_ in got)


def test_semdedup_incremental_delete_and_update_commits(spark, tmp_path):
    """Delete and update commits maintain the ledger exactly: the
    subtracted sums reproduce from-scratch centroids bit-for-bit, a
    deleted vector disappears from its cluster's decisions, and an
    updated vector is re-decided under its NEW embedding."""
    from nebuia_vector_db_spark.operators import semdedup as sd
    from nebuia_vector_db_spark.operators.incremental import (
        SemDedupClusterIndex,
        release_cached_relations,
    )
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    rows = [
        (1, [1.0, 0.1]), (2, [0.98, 0.12]), (3, [0.1, 1.0]),
        (4, [0.12, 0.97]), (5, [-1.0, -0.2]), (6, [-0.9, -0.25]),
    ]
    mk = lambda rs: spark.createDataFrame(
        rs, "vec_id long, embedding array<double>"
    )
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), mk(rows))
    idx = SemDedupClusterIndex.create(
        spark, str(tmp_path / "i"), corpus=mk(rows),
        threshold=0.9, n_planes=3, dim=2,
    )
    kw = dict(threshold=0.9, n_planes=3, dim=2)

    # delete commit: vec 2 leaves — its cluster re-decided without it
    corpus.delete_where("vec_id = 2")
    got = _semdedup_rows(idx.ingest_commit(corpus))
    now = mk([r for r in rows if r[0] != 2])
    want = _semdedup_rows(
        _from_scratch_touched(spark, now, F.lit(True), **kw).join(
            mk([rows[1]]).select(
                rp_bucket("embedding", 3, 2).alias("bucket")
            ).distinct(),
            "bucket",
            "left_semi",
        )
    )
    assert got == want and all(v != 2 for v, *_ in got)

    # update commit pair (COW delete + re-insert, the CDF convention):
    # vec 5 moves to the opposite orthant — decided under NEW embedding
    corpus.delete_where("vec_id = 5")
    idx.ingest_commit(corpus).collect()
    corpus.append(mk([(5, [0.95, 0.15])]))
    got = _semdedup_rows(idx.ingest_commit(corpus))
    now = mk([r for r in rows if r[0] not in (2, 5)] + [(5, [0.95, 0.15])])
    want = _semdedup_rows(
        _from_scratch_touched(
            spark, now, F.col("vec_id") == 5, **kw
        )
    )
    release_cached_relations()
    sd.release_cached_relations()
    assert got == want
    assert any(v == 5 for v, *_ in got)


def test_semdedup_incremental_param_guard_and_empty_seed(spark, tmp_path):
    from nebuia_vector_db_spark.operators.incremental import (
        SemDedupClusterIndex,
    )

    base = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    SemDedupClusterIndex.create(
        spark, str(tmp_path / "i"), corpus=base, n_planes=3, dim=2
    )
    with pytest.raises(ValueError, match="bucketing"):
        SemDedupClusterIndex(spark, str(tmp_path / "i"), n_planes=4, dim=2)
    SemDedupClusterIndex(spark, str(tmp_path / "i"), n_planes=3, dim=2)
    # empty seed declares the state schemas
    idx = SemDedupClusterIndex.create(
        spark, str(tmp_path / "e"), n_planes=3, dim=2
    )
    assert idx.assign.read().columns == ["_id", "bucket"]
    assert idx.cent.read().columns == ["bucket", "d", "qs", "n"]


def test_stream_driver_drives_semdedup_index(spark, tmp_path):
    """stream_semdedup_ingest mirrors the batch ingest: the decisions
    table after one drain equals from-scratch semdedup over the
    post-commit corpus restricted to the delta's clusters."""
    from nebuia_vector_db_spark.operators import semdedup as sd
    from nebuia_vector_db_spark.operators.incremental import (
        SemDedupClusterIndex,
        release_cached_relations,
        stream_semdedup_ingest,
    )
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    mk = lambda rs: spark.createDataFrame(
        rs, "vec_id long, embedding array<double>"
    )
    rows = [
        (1, [1.0, 0.1]), (2, [0.98, 0.12]), (3, [0.1, 1.0]),
        (4, [0.12, 0.97]), (5, [-1.0, -0.2]),
    ]
    cpath, ipath = str(tmp_path / "c"), str(tmp_path / "i")
    dpath, ck = str(tmp_path / "d"), str(tmp_path / "ck")
    corpus = SnapshotTable.create(spark, cpath, mk(rows))
    idx = SemDedupClusterIndex.create(
        spark, ipath, corpus=mk(rows), threshold=0.9, n_planes=3, dim=2
    )
    delta = [(9, [0.99, 0.11])]  # near-dup of 1/2's cluster
    corpus.append(mk(delta))
    q = stream_semdedup_ingest(spark, cpath, idx, dpath, ck)
    q.awaitTermination()
    got = _semdedup_rows(SnapshotTable(spark, dpath).read())
    want = _semdedup_rows(
        _from_scratch_touched(
            spark, mk(rows + delta), F.col("vec_id") == 9,
            threshold=0.9, n_planes=3, dim=2,
        )
    )
    release_cached_relations()
    sd.release_cached_relations()
    assert got == want and got


def test_semdedup_stream_replay_keeps_updated_assignment(spark, tmp_path):
    """The three-lane replay guard: redelivering an UPDATE commit's
    versions (fresh checkpoint, SAME app lane) must not re-run the COW
    retract — doing so would delete the doc's NEW assignment row while
    the watermark-guarded appends decline to rewrite it, losing the
    doc from the index and double-counting the centroid ledger."""
    from nebuia_vector_db_spark.operators import semdedup as sd
    from nebuia_vector_db_spark.operators.incremental import (
        SemDedupClusterIndex,
        release_cached_relations,
        stream_semdedup_ingest,
    )
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    mk = lambda rs: spark.createDataFrame(
        rs, "vec_id long, embedding array<double>"
    )
    base = [(1, [1.0, 0.1]), (2, [0.1, 1.0])]
    cpath, ipath = str(tmp_path / "c"), str(tmp_path / "i")
    dpath = str(tmp_path / "d")
    corpus = SnapshotTable.create(spark, cpath, mk(base))
    idx = SemDedupClusterIndex.create(
        spark, ipath, corpus=mk(base), n_planes=3, dim=2
    )
    corpus.delete_where("vec_id = 1")          # v2
    corpus.append(mk([(1, [-1.0, -0.1])]))     # v3: update re-insert
    q = stream_semdedup_ingest(
        spark, cpath, idx, dpath, str(tmp_path / "ck1"), app="sd"
    )
    q.awaitTermination()
    release_cached_relations()
    sd.release_cached_relations()
    assign = idx.assign.read().where("_id = 1").collect()
    assert len(assign) == 1
    ledger_rows = idx.cent.read().count()
    # redeliver the SAME versions: fresh checkpoint, same app lane
    q2 = stream_semdedup_ingest(
        spark, cpath, idx, dpath, str(tmp_path / "ck2"), app="sd"
    )
    q2.awaitTermination()
    release_cached_relations()
    sd.release_cached_relations()
    assert idx.assign.read().where("_id = 1").collect() == assign
    assert idx.cent.read().count() == ledger_rows  # no double ledger
    # and the ledger still folds to the LIVE state: the updated doc's
    # cluster centroid equals a from-scratch aggregation
    from nebuia_vector_db_spark.operators.semdedup import (
        centroids_from_rows,
        quantized_centroid_rows,
        rp_bucket,
    )

    live = mk([(1, [-1.0, -0.1]), (2, [0.1, 1.0])])
    want = {
        (r["bucket"], tuple(r["_c"]), r["n_members"])
        for r in centroids_from_rows(
            quantized_centroid_rows(
                live.select(
                    rp_bucket("embedding", 3, 2).alias("bucket"),
                    F.col("embedding").alias("_v"),
                )
            )
        ).collect()
    }
    got = {
        (r["bucket"], tuple(r["_c"]), r["n_members"])
        for r in centroids_from_rows(idx.cent.read()).collect()
    }
    assert got == want


def test_semdedup_batch_ingest_commit_is_idempotent(spark, tmp_path):
    """Re-running ingest_commit for the SAME corpus version (the
    crash-rerun shape) must not double-count the ledger or duplicate
    assignments — the batch driver rides the same watermark CAS as
    the stream loop (round-14 review fix)."""
    from nebuia_vector_db_spark.operators import semdedup as sd
    from nebuia_vector_db_spark.operators.incremental import (
        SemDedupClusterIndex,
        release_cached_relations,
    )
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    mk = lambda rs: spark.createDataFrame(
        rs, "vec_id long, embedding array<double>"
    )
    base = [(1, [1.0, 0.1]), (2, [0.1, 1.0])]
    corpus = SnapshotTable.create(spark, str(tmp_path / "c"), mk(base))
    idx = SemDedupClusterIndex.create(
        spark, str(tmp_path / "i"), corpus=mk(base), n_planes=3, dim=2
    )
    corpus.append(mk([(9, [0.98, 0.12])]))
    first = _semdedup_rows(idx.ingest_commit(corpus))
    n_assign = idx.assign.read().count()
    n_ledger = idx.cent.read().count()
    again = _semdedup_rows(idx.ingest_commit(corpus))  # same version
    release_cached_relations()
    sd.release_cached_relations()
    assert again == first
    assert idx.assign.read().count() == n_assign
    assert idx.cent.read().count() == n_ledger
