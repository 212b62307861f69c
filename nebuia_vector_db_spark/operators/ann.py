"""Approximate nearest neighbor: IVF (inverted-file) index on Spark.

The reference has NO index — every query is a full brute-force scan of
the collection (main.go:197-237, O(N·d) per query). That is the right
baseline but cannot be the only path at 100 TB. Per BASELINE.json
(``spark_approach: "MLlib for batch index building"``) we build the
index as a *batch* job and keep serving batch-style too:

- **Build**: MLlib KMeans over (a sample of) the corpus → ``n_cells``
  centroids; every vector is assigned its nearest centroid id as an
  ``ivf_cell`` column. On a cluster you then ``partitionBy("ivf_cell")``
  (or bucket) the table so a cell is a partition — candidate pruning
  becomes *partition* pruning, the same mechanism that makes
  collection-scoped search cheap (SURVEY.md §2.1 O-2).
- **Query**: rank centroids by similarity to the query driver-side
  (n_cells is small — this is a NumPy matvec over the centroid matrix),
  take the ``nprobe`` best cells, and brute-force only those cells'
  vectors with the exact kernel. ``nprobe = n_cells`` degrades to the
  exact scan, which is how the oracle checks this operator end-to-end;
  small ``nprobe`` is the scale path (recall measured in tests).

Scale notes: the scored candidate set is ``nprobe/n_cells`` of the
corpus; top-k is still TakeOrderedAndProject (per-partition heap, no
shuffle). The centroid matrix lives on the driver (n_cells × d floats —
4 MB at 16k cells × 64 d), never shuffled.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.vector import normalize_query
from nebuia_vector_db_spark.operators.topk import topk_search


class IVFIndex:
    """A built IVF index: the corpus with an ``ivf_cell`` column plus
    the centroid matrix (driver-side NumPy)."""

    def __init__(self, assigned: DataFrame, centroids: np.ndarray, vec_col: str):
        self.assigned = assigned
        self.centroids = centroids  # (n_cells, d) float64
        self.vec_col = vec_col
        # two-level router state (build_router): coarse centroid
        # matrix, fine-cell -> coarse parent map, default route width
        self._router: tuple[np.ndarray, np.ndarray, int] | None = None

    @property
    def n_cells(self) -> int:
        return int(self.centroids.shape[0])

    def build_router(
        self, n_coarse: int | None = None, seed: int = 42,
        route_width: int | None = None,
    ) -> "IVFIndex":
        """Two-level centroid router (round 9, VERDICT r8 task #3).

        Clusters the FINE centroid matrix into ``n_coarse`` coarse
        centroids (seeded driver-side Lloyd's — deterministic) and
        records each fine cell's coarse parent. ``probe_cells`` then
        routes a query through two tiny GEMMs: rank the coarse
        centroids, keep the best ``route_width`` coarse clusters, and
        run the fine GEMM only over their member cells — ~route_width/
        n_coarse of the fine matrix instead of all of it. The probed
        CELL SET this yields is what bounds the scan; at the b12-fine
        geometry (C=512, n_coarse=16, width=4, nprobe=8) it matches
        the flat router's recall (1.0) while touching ~25% of the
        fine centroids per query (bench b12_fine_*).

        Why this matters at scale: the scan-fraction fix for diverse
        batches is FINER cells (the 64-cell b12 geometry saturates by
        pigeonhole — 16 disjoint queries × 8 probes ≥ 84% of 64
        cells; at C=512 the same batch unions 23%). Finer cells grow
        the routing GEMM linearly with C; this router keeps routing
        sublinear (√C coarse by default) so C can scale with corpus
        size (C ≈ √N) without the driver matvec becoming the
        bottleneck. Defaults: n_coarse = √C, route_width =
        max(4, n_coarse/4) — width n_coarse degrades to the exact
        flat router (test-pinned).
        """
        from nebuia_vector_db_spark.operators.pq import _kmeans_np

        c = self.n_cells
        n_coarse = int(n_coarse or max(1, round(c**0.5)))
        n_coarse = min(n_coarse, c)
        coarse = _kmeans_np(
            np.ascontiguousarray(self.centroids, dtype=np.float32),
            n_coarse,
            iters=25,
            seed=seed,
        )  # (n_coarse, d) float64
        co_sq = np.einsum("ij,ij->i", coarse, coarse)
        parent = np.argmin(
            self.centroids @ coarse.T * -2.0 + co_sq[None, :], axis=1
        ).astype(np.int32)
        width = int(route_width or max(4, n_coarse // 4))
        self._router = (coarse, parent, min(width, n_coarse))
        return self

    def _probe_one(self, qn: np.ndarray, nprobe: int) -> np.ndarray:
        """Probed cell ids for one normalized query (router-aware)."""
        if self._router is None:
            sims = self.centroids @ qn
            order = np.argsort(-sims, kind="stable")
            return order[: max(1, nprobe)]
        coarse, parent, width = self._router
        csims = coarse @ qn
        top_coarse = np.argsort(-csims, kind="stable")[:width]
        cand = np.flatnonzero(np.isin(parent, top_coarse))
        if cand.size == 0:  # degenerate coarse clustering
            cand = np.arange(self.n_cells)
        fsims = self.centroids[cand] @ qn
        order = np.argsort(-fsims, kind="stable")
        return cand[order[: max(1, nprobe)]]

    def probe_cells(self, qvec: Sequence[float], nprobe: int) -> list[int]:
        """Rank cells by dot(q/‖q‖, centroid) — driver-side matvec
        (two-level when :meth:`build_router` was called).

        Uses the same raw-stored-vector similarity as the search kernel
        (SURVEY.md §1.5-1) so cell ranking is consistent with scoring.
        """
        qn = np.asarray(normalize_query(qvec), dtype=np.float64)
        return [int(c) for c in self._probe_one(qn, nprobe)]

    def search(
        self,
        qvec: Sequence[float],
        k: int,
        nprobe: int,
        tie_cols: Sequence[str] = (),
        method: str = "sql",
    ) -> DataFrame:
        """Candidate-pruned exact-kernel top-k. ``nprobe == n_cells``
        is exactly the brute-force scan (modulo the extra isin filter,
        which Catalyst folds into the scan as a pushed predicate)."""
        cells = self.probe_cells(qvec, nprobe)
        cand = self.assigned.where(F.col("ivf_cell").isin(cells))
        return topk_search(
            cand, qvec, k, vec_col=self.vec_col, tie_cols=tie_cols, method=method
        ).drop("ivf_cell")

    def search_batch(
        self,
        queries_df: DataFrame,
        k: int,
        nprobe: int,
        query_id_col: str = "query_id",
        query_vec_col: str = "query_vec",
        sim_col: str = "similarity",
        tie_cols: Sequence[str] = (),
    ) -> DataFrame:
        """Batch ANN search (VERDICT r3 #5): a query *batch* routed
        through per-query probed cells in ONE corpus pass.

        ``knn_join`` scans the whole corpus for every batch;
        per-query ``search`` scans ``nprobe/n_cells`` but runs one job
        per query. This is both at once:

        - driver side: probe the ``nprobe`` best cells per query (a
          (B, C) matvec over the resident centroid matrix) and build a
          (C, B) boolean probe mask;
        - scan side: ONE pass over only the UNION of probed cells
          (``ivf_cell IN (...)`` → partition/stats pruning — the scan
          fraction is |union| / n_cells, not 1.0); inside the Arrow
          kernel one (n, d)·(d, B) GEMM scores every candidate against
          every query, the mask zeroes out pairs whose cell was not
          probed for that query (a candidate is charged only to the
          queries that probed its cell), and a per-query local
          argpartition cuts each batch to ≤ k rows per query;
        - global cut: the same bounded row_number window as
          ``knn_join`` (Partial WindowGroupLimit — tasks ship ≤ k rows
          per query).

        ``nprobe == n_cells`` makes this EXACTLY ``knn_join`` (every
        pair allowed, full scan) — which is how the oracle checks it
        end-to-end; small ``nprobe`` is the scale path (bench b12).
        """
        from collections.abc import Iterator

        import pyarrow as pa

        qrows = queries_df.select(query_id_col, query_vec_col).collect()
        qids = np.array([r[0] for r in qrows])
        qmat = np.vstack(
            [
                np.asarray(normalize_query(r[1]), dtype=np.float64)
                for r in qrows
            ]
        )  # (B, d)
        b = qmat.shape[0]
        nprobe = max(1, min(nprobe, self.n_cells))
        mask = np.zeros((self.n_cells, b), dtype=bool)
        if self._router is None:
            cell_sims = self.centroids @ qmat.T  # (C, B)
            # per-query top-nprobe cells -> (C, B) allow-mask
            probe_idx = np.argpartition(
                -cell_sims, nprobe - 1, axis=0
            )[:nprobe]
            mask[probe_idx, np.arange(b)[None, :]] = True
        else:
            # two-level route per query (B is small; each probe is two
            # tiny GEMMs over ~width/n_coarse of the fine matrix)
            for qi in range(b):
                mask[self._probe_one(qmat[qi], nprobe), qi] = True
        union_cells = [int(c) for c in np.flatnonzero(mask.any(axis=1))]

        cand = self.assigned.where(F.col("ivf_cell").isin(union_cells))
        vec_col = self.vec_col
        keep = [c for c in cand.columns if c not in (vec_col, "ivf_cell")]
        out_schema = ", ".join(
            [
                f"{n} {t}"
                for n, t in cand.dtypes
                if n not in (vec_col, "ivf_cell")
            ]
            + [f"{query_id_col} long", f"{sim_col} double"]
        )

        def _score(
            batches: Iterator[pa.RecordBatch],
        ) -> Iterator[pa.RecordBatch]:
            from nebuia_vector_db_spark.functions.vector import (
                arrow_list_to_matrix,
            )

            for rb in batches:
                mat = arrow_list_to_matrix(rb.column(vec_col))
                n = mat.shape[0]
                if n == 0:
                    continue
                cells = np.asarray(rb.column("ivf_cell")).astype(np.int64)
                sims = mat.astype(np.float64, copy=False) @ qmat.T  # (n, B)
                allowed = mask[cells]  # (n, B)
                masked = np.where(allowed, sims, -np.inf)
                kk = min(k, n)
                idx = np.argpartition(-masked, kk - 1, axis=0)[:kk]  # (kk, B)
                rows = idx.ravel(order="F")
                qcol = np.repeat(qids, kk)
                scol = np.take_along_axis(masked, idx, axis=0).ravel(
                    order="F"
                )
                live = np.isfinite(scol)  # drop not-probed pairs
                if not live.any():
                    continue
                take = pa.array(rows[live])
                arrays = [rb.column(c).take(take) for c in keep]
                arrays.append(pa.array(qcol[live]))
                arrays.append(pa.array(scol[live]))
                yield pa.RecordBatch.from_arrays(
                    arrays, names=[*keep, query_id_col, sim_col]
                )

        from nebuia_vector_db_spark.operators.topk import topk_per_group

        cut = cand.mapInArrow(_score, schema=out_schema)
        return topk_per_group(
            cut, [query_id_col], sim_col, k, tie_cols=tie_cols
        )


def build_ivf_index(
    df: DataFrame,
    n_cells: int,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 20,
) -> IVFIndex:
    """Fit KMeans (MLlib, distributed) and assign every row a cell.

    The fitted model's transform is a broadcast of the centroid matrix
    + per-row nearest-centroid argmin — no shuffle; the only shuffles
    are inside KMeans training itself (one agg per iteration).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn(
        "_ivf_feat", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    km = KMeans(
        k=n_cells,
        seed=seed,
        maxIter=max_iter,
        featuresCol="_ivf_feat",
        predictionCol="ivf_cell",
    )
    model = km.fit(feat)
    assigned = model.transform(feat).drop("_ivf_feat")
    centroids = np.vstack(
        [np.asarray(c, dtype=np.float64) for c in model.clusterCenters()]
    )
    return IVFIndex(assigned, centroids, vec_col)


def save_ivf_index(index: IVFIndex, path: str) -> None:
    """Persist the index with the corpus PHYSICALLY partitioned by
    cell (``partitionBy('ivf_cell')``) plus a tiny centroid table.

    This is the step that turns cell pruning into *partition* pruning:
    a reloaded index's ``search`` shows the ``ivf_cell IN (...)``
    predicate as a PartitionFilter on the scan — only the probed
    cells' files are read (test-pinned in tests/test_plans.py). At
    100 TB that is the difference between scanning nprobe/n_cells of
    the corpus and scanning all of it to filter.
    """
    import os

    spark = index.assigned.sparkSession
    index.assigned.write.partitionBy("ivf_cell").mode("overwrite").parquet(
        os.path.join(path, "cells")
    )
    cents = [
        (i, [float(x) for x in c]) for i, c in enumerate(index.centroids)
    ]
    spark.createDataFrame(
        cents, "cell int, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(path, "centroids"))


def load_ivf_index(
    spark, path: str, vec_col: str = "embedding"
) -> IVFIndex:
    """Reload a saved index: the cell-partitioned corpus scan (lazy,
    partition-prunable) + the centroid matrix (driver-side, tiny)."""
    import os

    assigned = spark.read.parquet(os.path.join(path, "cells"))
    rows = (
        spark.read.parquet(os.path.join(path, "centroids"))
        .orderBy("cell")
        .collect()
    )
    centroids = np.vstack(
        [np.asarray(r["centroid"], dtype=np.float64) for r in rows]
    )
    return IVFIndex(assigned, centroids, vec_col)


def assign_to_cells(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Assign every row its nearest centroid (squared-Euclidean
    argmin, ties to the lowest cell id — KMeans assignment semantics)
    WITHOUT retraining: the centroid matrix is broadcast and each
    Arrow batch does one (b, d)·(d, C) BLAS product. Map-side only,
    no shuffle — the kernel a 100 TB daily ingest runs to route new
    vectors into an existing index."""
    from collections.abc import Iterator

    import pyarrow as pa
    from pyspark.sql import types as T

    cents = np.ascontiguousarray(centroids, dtype=np.float64)
    bc = df.sparkSession.sparkContext.broadcast(cents)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField("ivf_cell", T.IntegerType())]
    )

    def _assign(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from nebuia_vector_db_spark.functions.vector import (
            arrow_list_to_matrix,
        )

        c = bc.value
        c_sq = np.einsum("ij,ij->i", c, c)
        for rb in batches:
            if rb.num_rows == 0:
                continue
            mat = arrow_list_to_matrix(rb.column(vec_col)).astype(
                np.float64, copy=False
            )
            # dist² = ‖x‖² − 2·x·c + ‖c‖²; ‖x‖² is constant per row so
            # argmin needs only the last two terms
            scores = mat @ c.T * -2.0 + c_sq[None, :]
            cells = np.argmin(scores, axis=1).astype(np.int32)
            yield rb.append_column(
                "ivf_cell", pa.array(cells, type=pa.int32())
            )

    return df.mapInArrow(_assign, schema=out_schema)


def append_to_ivf_index(
    spark, path: str, new_df: DataFrame, vec_col: str = "embedding"
) -> IVFIndex:
    """Incremental index maintenance (VERDICT r2 #6): route new
    vectors to the EXISTING centroids and append them to the saved
    cell partitions — no retrain, no rewrite of existing cells. This
    is the operation a daily ingest pipeline runs; a full
    ``build_ivf_index`` + ``save_ivf_index`` over the grown corpus
    WITH THE SAME centroids produces identical cell contents
    (test-pinned), so append is a pure optimization.

    The centroids are frozen: under distribution drift new vectors
    pile into few cells and probe pruning degrades. Monitor cell-size
    skew (``index.assigned.groupBy('ivf_cell').count()``) and retrain
    when the max/median ratio passes ~4× — the retrain is the same
    batch build, swapped in atomically by writing to a fresh path.
    """
    import os

    idx = load_ivf_index(spark, path, vec_col)
    assigned = assign_to_cells(new_df, idx.centroids, vec_col)
    assigned.write.partitionBy("ivf_cell").mode("append").parquet(
        os.path.join(path, "cells")
    )
    return load_ivf_index(spark, path, vec_col)


def build_ivf_index_deterministic(
    df: DataFrame,
    n_cells: int,
    sample_mat: np.ndarray,
    seed: int = 42,
    vec_col: str = "embedding",
    iters: int = 25,
) -> IVFIndex:
    """Bit-reproducible IVF build, for recall probes that must serve
    as regression signals (VERDICT r3 'what's wrong' #1: recall@10
    flapped 0.5→0.3 across rounds on identical code because MLlib
    KMeans' distributed float aggregation order varies run-to-run).

    Centroids come from the seeded driver-side vectorized Lloyd's
    (the same `_kmeans_np` PQ training uses) over a CALLER-PINNED
    sample matrix; assignment is the deterministic broadcast argmin
    kernel. Production builds stay on :func:`build_ivf_index` (MLlib,
    distributed); this variant trades training scale for exact
    reproducibility — sample_mat is driver-resident by construction.
    """
    from nebuia_vector_db_spark.operators.pq import _kmeans_np

    cents = _kmeans_np(
        np.ascontiguousarray(sample_mat, dtype=np.float32),
        n_cells,
        iters=iters,
        seed=seed,
    )  # float64 out
    assigned = assign_to_cells(df, cents, vec_col)
    return IVFIndex(assigned, cents, vec_col)


def recall_at_k_batch(
    index: IVFIndex,
    exact_corpus: DataFrame,
    queries: Sequence[Sequence[float]],
    k: int,
    nprobe: int,
    id_col: str = "vec_id",
) -> float:
    """Mean recall@k over a query set, in TWO jobs total (one batched
    exact kNN, one batched IVF search) instead of 2 jobs per query —
    the probe harness bench b5/b5c run on every round."""
    from collections import defaultdict

    from nebuia_vector_db_spark.operators.topk import knn_join

    spark = exact_corpus.sparkSession
    qdf = spark.createDataFrame(
        [(i, [float(x) for x in q]) for i, q in enumerate(queries)],
        "query_id long, query_vec array<double>",
    )
    exact: dict[int, set] = defaultdict(set)
    for r in (
        knn_join(qdf, exact_corpus, k=k, tie_cols=[id_col], method="arrow")
        .select("query_id", id_col)
        .collect()
    ):
        exact[r[0]].add(r[1])
    approx: dict[int, set] = defaultdict(set)
    for r in (
        index.search_batch(qdf, k, nprobe, tie_cols=[id_col])
        .select("query_id", id_col)
        .collect()
    ):
        approx[r[0]].add(r[1])
    return sum(
        len(exact[q] & approx[q]) / max(1, len(exact[q])) for q in exact
    ) / max(1, len(exact))


def recall_at_k(
    index: IVFIndex,
    exact_corpus: DataFrame,
    qvec: Sequence[float],
    k: int,
    nprobe: int,
    id_col: str = "vec_id",
) -> float:
    """Fraction of the exact top-k the pruned search recovers —
    the quality metric the nprobe knob trades against scan fraction."""
    exact_ids = {
        r[0]
        for r in topk_search(
            exact_corpus, qvec, k, vec_col=index.vec_col, tie_cols=[id_col]
        )
        .select(id_col)
        .collect()
    }
    approx_ids = {
        r[0]
        for r in index.search(qvec, k, nprobe, tie_cols=[id_col])
        .select(id_col)
        .collect()
    }
    return len(exact_ids & approx_ids) / max(1, len(exact_ids))


# ------------------------------------------------------- snapshot persistence
def save_ivf_index_snapshot(index: IVFIndex, path: str):
    """Persist the index as a :class:`SnapshotTable` — transactional
    index maintenance: every save/append is an atomic snapshot commit,
    so a reader mid-search keeps a complete index version (the plain
    ``save_ivf_index`` overwrite is not reader-safe), old versions
    time-travel until vacuum, and racing maintenance jobs serialize
    through the commit CAS.

    Layout: the assigned corpus range-partitioned + sorted on
    ``ivf_cell`` (each data file covers few cells, so the parquet
    min/max stats the snapshot records — and the row-group stats
    Catalyst pushes ``ivf_cell IN (...)`` against — prune probes), and
    the centroid matrix stored IN the snapshot json (``extra_meta``;
    json floats round-trip exactly), versioned atomically with the
    corpus it indexes."""
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    spark = index.assigned.sparkSession
    n_cells = int(index.centroids.shape[0])
    laid_out = index.assigned.repartitionByRange(
        max(4, n_cells // 4), "ivf_cell"
    ).sortWithinPartitions("ivf_cell")
    meta = {
        "centroids": [[float(x) for x in c] for c in index.centroids],
        "vec_col": index.vec_col,
    }
    return SnapshotTable.create(spark, path, laid_out, extra_meta=meta)


def load_ivf_index_snapshot(
    spark, path: str, version: int | None = None
) -> IVFIndex:
    """Reload an index snapshot (optionally a historical version —
    time travel for indexes: reproduce yesterday's retrieval exactly)."""
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(spark, path)
    cents = tbl.meta("centroids", version)
    vec_col = tbl.meta("vec_col", version) or "embedding"
    centroids = np.array(cents, dtype=np.float64)
    return IVFIndex(tbl.read(version), centroids, vec_col)


def append_to_ivf_index_snapshot(
    spark, path: str, new_df: DataFrame
) -> IVFIndex:
    """Incremental maintenance with transactional semantics: route new
    vectors to the frozen centroids (map-side broadcast-GEMM argmin)
    and land them in ONE atomic commit — concurrent readers see the
    old or the new index, never a half-appended one. Conflicts with a
    racing maintenance job retry through the commit CAS."""
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    tbl = SnapshotTable(spark, path)
    cents = tbl.meta("centroids")
    vec_col = tbl.meta("vec_col") or "embedding"
    centroids = np.array(cents, dtype=np.float64)
    assigned = assign_to_cells(new_df, centroids, vec_col)
    tbl.with_retry(
        "append",
        assigned,
        extra_meta={"centroids": cents, "vec_col": vec_col},
    )
    return IVFIndex(tbl.read(), centroids, vec_col)
