"""SemDeDup — semantic deduplication over embeddings (Abbas et al.
2023, "SemDeDup: Data-efficient learning at web-scale through semantic
deduplication"; round 10). The embedding-space sibling of the text
dedup tiers: cluster the corpus, compare pairs ONLY within a cluster,
and for every pair above the cosine threshold drop the member CLOSER
to the cluster centroid (the paper keeps the "edge" example of each
semantic duplicate group — it carries more information).

The reference engine stores exactly this data model (chunk embeddings,
main.go:30-35) but has no curation pass at all; this is the
LLM-pipeline extension tier (SURVEY §2.3).

Faithfulness and the oracle line: the paper clusters with k-means.
Here the DEFAULT clustering is a deterministic random-hyperplane sign
bucket whose planes are derived from md5 — fully SQL-replayable, so
the registry row `dedup_semdedup` hash-certifies the ENTIRE pass
(bucketing → quantized centroids → within-cluster pairs → keep rule)
against DuckDB. A k-means assignment (operators/ann.py's IVF build)
plugs in through the ``buckets`` parameter unchanged — pinned by a
test — but is not SQL-replayable (iterative fit), the same split as
dedup_simhash's md5/xxhash64 variants.

Determinism discipline:
- hyperplane components are integers from md5 hex (engine-identical);
- the bucket bit is the sign of the same ascending-order dot product
  both engines compute bit-identically (functions/vector.py::dot ==
  DuckDB list_dot_product — the discipline every vs_* row certifies);
- centroids are PER-DIMENSION QUANTIZED INTEGER MEANS: each component
  is floor(x·10⁶ + 0.5) summed as BIGINT then divided once — the
  aggregation order cannot change the result (queries.py::_dsum);
- the keep rule compares 6-dp-rounded centroid similarities with a
  vec-id tie-break — a total order.

Scale shape (100 TB): bucketing is map-side expression work (or the
Arrow GEMM fast path for wide plane sets); the centroid aggregation
shuffles map-side-combined (bucket, dim) partial sums — ≤ tasks ×
buckets × dim rows cross the wire, not the corpus; the pair join is
within-bucket only, with over-``max_bucket`` clusters excluded from
pair generation map-side (the same skew funnel guard as the band
joins — a giant near-empty-embedding cluster would otherwise go
quadratic). n_planes scales the cluster count as 2^planes ≈ N/target
like the paper's k ≈ √N guidance.
"""

from __future__ import annotations

import hashlib
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators._cache import (
    cached_relation_registry,
)

from nebuia_vector_db_spark.functions.vector import dot, l2_norm

_UNITS = 1_000_000

# Persisted scored relations handed out by semdedup: `scored` feeds
# both pair-join sides AND the final projection, and its lineage holds
# the bucketing + centroid aggregation — uncached it re-scans the
# embedding corpus up to 3x. Releasable-registry shape per the r9
# ADVICE pattern (operators/dedup.py / textvec.py).
_CACHED_RELATIONS, release_cached_relations = cached_relation_registry()


def md5_planes(
    n_planes: int, dim: int, prefix: str = "sd"
) -> list[list[float]]:
    """Deterministic hyperplanes both engines can rebuild: component
    (j, d) = int(md5(f"{prefix}{j}_{d}")[:4], 16) − 32768 — a signed
    16-bit integer, exactly representable as a double."""
    return [
        [
            float(
                int(
                    hashlib.md5(
                        f"{prefix}{j}_{d}".encode()
                    ).hexdigest()[:4],
                    16,
                )
                - 32768
            )
            for d in range(dim)
        ]
        for j in range(n_planes)
    ]


def rp_bucket(
    vec_col: str, n_planes: int, dim: int, prefix: str = "sd"
) -> F.Column:
    """Sign-sketch bucket id in [0, 2^n_planes): bit j = 1 iff
    dot(vec, plane_j) > 0 — pure codegen'd HOF expressions."""
    planes = md5_planes(n_planes, dim, prefix)
    bits = [
        F.when(dot(vec_col, planes[j]) > 0, F.lit(1 << j)).otherwise(
            F.lit(0)
        )
        for j in range(n_planes)
    ]
    return reduce(lambda a, b: a + b, bits).cast("long")


def quantized_centroid_rows(
    mem: DataFrame, vec_col: str = "_v", bucket_col: str = "bucket"
) -> DataFrame:
    """(bucket, d, qs, n) — per-(cluster, dimension) INTEGER partial
    sums: qs = Σ floor(x·10⁶ + 0.5) as BIGINT, n = member count.
    Order-independent by construction, which is what makes them (a)
    identical between engines (the oracle line) and (b) EXACTLY
    maintainable incrementally — a delta's rows add, a deletion's
    rows subtract, and the running sums equal a from-scratch pass
    bit-for-bit (incremental.py::SemDedupClusterIndex, round 14)."""
    return (
        mem.select(
            F.col(bucket_col).alias("bucket"),
            F.posexplode(vec_col).alias("d", "x"),
        )
        .groupBy("bucket", "d")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * _UNITS + F.lit(0.5))
            ).alias("qs"),
            F.count("*").cast("long").alias("n"),
        )
    )


def centroids_from_rows(rows: DataFrame) -> DataFrame:
    """(bucket, _c, n_members) centroid relation from (possibly
    multi-commit) quantized partial-sum rows: sums are folded with
    exact BIGINT adds, each dimension divided ONCE at the end, and
    clusters whose membership folded to zero (every member deleted)
    vanish. Input may carry several rows per (bucket, d) — the
    append-only incremental ledger shape."""
    return (
        rows.groupBy("bucket", "d")
        .agg(F.sum("qs").alias("qs"), F.sum("n").alias("n"))
        .where(F.col("n") > 0)
        .select(
            "bucket",
            "d",
            "n",
            (F.col("qs") / (F.lit(float(_UNITS)) * F.col("n"))).alias(
                "cd"
            ),
        )
        .groupBy("bucket")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d", "cd"))),
                lambda s: s["cd"],
            ).alias("_c"),
            F.max("n").alias("n_members"),
        )
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.45,
    n_planes: int = 6,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int = 128,
    buckets: DataFrame | None = None,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """One row per embedding: (vec_id, bucket, sim_centroid, dropped).

    ``dropped`` is true iff the vector loses ANY within-bucket pair
    with cosine ≥ ``threshold`` — the loser being the member with the
    HIGHER 6-dp centroid similarity (ties: higher id), so each
    duplicate group keeps its most centroid-distant member, per the
    paper. Pass ``buckets`` (vec_id → bucket) to substitute a k-means
    assignment for the default md5-hyperplane sketch. Pass
    ``centroids`` ((bucket, _c, n_members) — the
    :func:`centroids_from_rows` shape) to substitute externally
    maintained centroids for the in-pass aggregation; the incremental
    index supplies its exactly-maintained persisted sums this way, so
    a touched-cluster re-run scores members without re-aggregating
    them."""
    base = emb.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_v")
    )
    if buckets is None:
        mem = base.withColumn(
            "bucket", rp_bucket("_v", n_planes, dim)
        )
    else:
        mem = base.join(
            buckets.select(
                F.col(id_col).alias("vec_id"),
                F.col("bucket").cast("long").alias("bucket"),
            ),
            "vec_id",
        )
    # quantized-integer per-dimension centroid means (order-free)
    cent = (
        centroids_from_rows(quantized_centroid_rows(mem))
        if centroids is None
        else centroids.select("bucket", "_c", "n_members")
    )
    from pyspark import StorageLevel

    scored = mem.join(F.broadcast(cent), "bucket").select(
        "vec_id",
        "bucket",
        "_v",
        "n_members",
        F.floor(
            dot("_v", F.col("_c"))
            / (l2_norm("_v") * l2_norm(F.col("_c")))
            * F.lit(1_000_000)
            + F.lit(0.5)
        ).alias("_cq"),  # 6-dp centroid similarity in micro-units
    ).persist(StorageLevel.MEMORY_AND_DISK)
    _CACHED_RELATIONS.append(scored)
    small = scored.where(F.col("n_members") <= max_bucket)
    a = small.alias("a")
    b = small.alias("b")
    pair_cos = dot(F.col("a._v"), F.col("b._v")) / (
        l2_norm(F.col("a._v")) * l2_norm(F.col("b._v"))
    )
    losers = (
        a.join(b, on="bucket")
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .where(pair_cos >= F.lit(threshold))
        .select(
            F.when(
                (F.col("a._cq") > F.col("b._cq"))
                | (
                    (F.col("a._cq") == F.col("b._cq"))
                    & (F.col("a.vec_id") > F.col("b.vec_id"))
                ),
                F.col("a.vec_id"),
            )
            .otherwise(F.col("b.vec_id"))
            .alias("vec_id")
        )
        .distinct()
        .withColumn("_lost", F.lit(True))
    )
    # plain left join (no broadcast hint): the loser set scales with
    # the duplicate mass — potentially corpus-sized at 100 TB — so AQE
    # picks the strategy from the actual runtime size
    return scored.join(losers, "vec_id", "left").select(
        "vec_id",
        "bucket",
        (F.col("_cq") / F.lit(float(_UNITS))).alias("sim_centroid"),
        F.coalesce(F.col("_lost"), F.lit(False)).alias("dropped"),
    )
