"""Product quantization (PQ) for memory-bounded ANN at corpus scale.

The reference brute-forces raw float vectors (main.go:197-237); IVF
(operators/ann.py) bounds the *scan*, PQ bounds the *bytes*: each
d-dim vector becomes ``m`` one-byte codewords (64-dim float32 → 8
bytes, 32× smaller), and queries score candidates with an asymmetric
distance table (ADC) — one (m × k) table of query-to-codeword dots,
then a per-row table-lookup sum. Composition with IVF (prune cells,
then ADC within probed cells, then exact re-rank of the short list)
is the standard 100 TB ANN stack (Jégou et al., TPAMI 2011).

Spark mapping:
- **train**: driver-side vectorized Lloyd's k-means per subspace on a
  bounded sample (≤ ``sample`` rows collected — training is the one
  legitimately driver-sized step; 100k × 64 f64 ≈ 51 MB).
- **encode**: one Arrow kernel per batch — (b, dsub)·(dsub, k) GEMM
  per subspace, argmin → codes. Map-side only, no shuffle.
- **search**: broadcast the tiny table, Arrow kernel does
  ``table[s, codes[:, s]].sum(axis=1)`` per batch, per-partition
  top-k cut, global TakeOrderedAndProject. The corpus read is codes
  only — raw vectors are touched ONLY for the exact re-rank of the
  ≤ ``rerank`` survivors (a semi-join by id).

Scoring matches the engine's similarity semantics — ``dot(q/‖q‖, x)``
with the stored vector raw (SURVEY §1.5-1) — approximated by the sum
of subspace dots against reconstructed codewords.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import numpy as np
import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.vector import normalize_query


def _kmeans_np(
    x: np.ndarray, k: int, iters: int, seed: int
) -> np.ndarray:
    """Vectorized Lloyd's k-means (driver-side, deterministic).

    k-means++-lite init: distinct random rows. Empty clusters are
    re-seeded from the farthest points so all k codewords stay live.
    """
    rng = np.random.default_rng(seed)
    x = np.ascontiguousarray(x, dtype=np.float32)
    n, d = x.shape
    k_eff = min(k, n)
    centers = x[rng.choice(n, size=k_eff, replace=False)].copy()
    x2 = np.einsum("ij,ij->i", x, x)  # hoisted; constant across iters
    prev = None
    # r15: one preallocated (n, k) score buffer reused across
    # iterations (np.matmul(out=) — bit-identical arithmetic, just no
    # fresh 2 MB allocation per iteration; the allocation was ~40% of
    # the measured per-iteration wall at n=2000, k=256)
    scores = np.empty((n, k_eff), dtype=np.float32)
    for _ in range(iters):
        # argmin ||x−c||² ≡ argmin (||c||² − 2x·c): one (n,k) buffer,
        # mutated in place — the ||x||² broadcast would only shift
        # every row by a constant
        np.matmul(x, centers.T, out=scores)
        scores *= -2.0
        scores += np.einsum("ij,ij->i", centers, centers)[None, :]
        assign = scores.argmin(axis=1)
        counts = np.bincount(assign, minlength=k_eff)
        sums = np.empty((k_eff, d), dtype=np.float64)
        for j in range(d):
            sums[:, j] = np.bincount(
                assign, weights=x[:, j], minlength=k_eff
            )
        live = counts > 0
        centers[live] = (
            sums[live] / counts[live, None]
        ).astype(np.float32)
        if not live.all():  # re-seed empties from the farthest points
            far = np.argsort(scores.min(axis=1) + x2)[-int((~live).sum()):]
            centers[~live] = x[far]
        if prev is not None and np.array_equal(assign, prev):
            break
        prev = assign
    if k_eff < k:  # degenerate tiny input: pad with copies
        centers = np.vstack([centers, centers[: k - k_eff]])
    return centers.astype(np.float64)


class PQIndex:
    """Trained codebooks + the encoded corpus (id[, cell], codes).

    With ``cell_centroids`` set this is IVF-PQ: codes quantize the
    RESIDUAL x − centroid(cell(x)). Flat PQ has no within-cluster
    resolution on clustered corpora (every member of a tight cluster
    maps to the same codewords → identical ADC scores, recall ≈ 0 —
    measured); residual encoding is what gives PQ its resolution where
    the data actually lives, and the score decomposes exactly:
    ``dot(q_n, x) ≈ dot(q_n, centroid) + Σ_s table[s, code_s]``."""

    def __init__(
        self,
        codes: DataFrame,
        codebooks: np.ndarray,  # (m, k, dsub) float64
        vec_col: str,
        id_col: str,
        cell_centroids: np.ndarray | None = None,  # (n_cells, d)
        cell_col: str = "ivf_cell",
        rotation: np.ndarray | None = None,  # (d, d) orthogonal (OPQ)
        encode_src: DataFrame | None = None,
    ):
        self.codes = codes
        self.codebooks = codebooks
        self.vec_col = vec_col
        self.id_col = id_col
        self.cell_centroids = cell_centroids
        self.cell_col = cell_col
        self.rotation = rotation
        # the projected raw-vector source when this index was built by
        # encode_pq in THIS plan (vs loaded/stored codes) — lets
        # search() fuse encode + ADC into ONE Arrow crossing (r16)
        self._encode_src = encode_src

    @property
    def m(self) -> int:
        return int(self.codebooks.shape[0])

    @property
    def k(self) -> int:
        return int(self.codebooks.shape[1])

    def adc_table(self, qvec: Sequence[float]) -> np.ndarray:
        """(m, k) inner products of the normalized query's subspace
        slices against every codeword — the whole query-side work.

        With an OPQ ``rotation`` R the codes quantize y = rR (the
        rotated residual), and ``dot(q, r) = dot(qR, rR)`` since R is
        orthogonal — so the query is rotated HERE, once, and the scan
        side is untouched (the cell term stays unrotated: it scores
        against raw-space centroids)."""
        qn = np.asarray(normalize_query(qvec), dtype=np.float64)
        if self.rotation is not None:
            qn = qn @ self.rotation
        dsub = self.codebooks.shape[2]
        return np.stack(
            [
                self.codebooks[s] @ qn[s * dsub : (s + 1) * dsub]
                for s in range(self.m)
            ]
        )

    def search(
        self,
        corpus: DataFrame,
        qvec: Sequence[float],
        topk: int,
        rerank: int = 0,
        tie_cols: Sequence[str] = (),
        nprobe: int | None = None,
    ) -> DataFrame:
        """ADC top-k over the codes; with ``rerank > 0`` the top
        ``rerank`` ADC candidates are re-scored EXACTLY against the raw
        vectors (semi-join on id) and the final top-k is exact within
        that candidate set — the memory-bounded near-exact path.

        On an IVF-PQ index, ``nprobe`` additionally restricts the ADC
        scan to the best cells (centroid ranking driver-side, same as
        operators/ann.py) — the composed prune-then-score stack.

        One Arrow crossing (r16, guide §4): on an encode_pq-built
        index whose codes are not persisted, the scan fuses encode +
        ADC into a single mapInArrow kernel (the two-crossing plan
        paid JVM→Python→JVM twice per run, and the second crossing
        re-decoded the codes column from Arrow lists). Stored or
        cached codes score through a single mapInArrow over the codes
        table (same math, list-offset decode instead of the old
        row-pickling pandas_udf). Scores are bit-identical across all
        paths: same argmin, same per-subspace accumulation order."""
        table = self.adc_table(qvec)
        m = self.m
        cut = max(topk, rerank)

        codes_src = self.codes
        cell_term = None
        probe = None
        if self.cell_centroids is not None:
            qn = np.asarray(normalize_query(qvec), dtype=np.float64)
            cell_dots = self.cell_centroids @ qn  # (n_cells,)
            if nprobe is not None:
                probe = [
                    int(c)
                    for c in np.argsort(-cell_dots, kind="stable")[
                        : max(1, nprobe)
                    ]
                ]
                codes_src = codes_src.where(
                    F.col(self.cell_col).isin(probe)
                )
            cell_term = cell_dots

        scored = self._adc_scored(codes_src, table, cell_term, probe, tie_cols)
        short = scored.orderBy(
            F.desc("adc_score"), *[F.col(c) for c in tie_cols]
        ).limit(cut)
        if not rerank:
            return short.select(self.id_col, "adc_score")
        from nebuia_vector_db_spark.functions.vector import dot

        qn = normalize_query(qvec)
        cand = corpus.join(
            F.broadcast(short.select(self.id_col)), self.id_col, "left_semi"
        )
        exact = cand.withColumn(
            "similarity", dot(F.col(self.vec_col), qn)
        )
        return (
            exact.orderBy(
                F.desc("similarity"), *[F.col(c) for c in tie_cols]
            )
            .limit(topk)
            .select(self.id_col, "similarity")
        )

    def _adc_scored(
        self,
        codes_src: DataFrame,
        table: np.ndarray,
        cell_term: np.ndarray | None,
        probe: list[int] | None,
        tie_cols: Sequence[str],
    ) -> DataFrame:
        """(id[, cell], adc_score) relation behind search()'s top-k
        cut — one Python crossing on every path (see search's note).
        The fused encode+ADC kernel fires only when the index was
        built by encode_pq in this plan AND the codes were not
        persisted by the caller (a cached/stored codes relation is
        the cheaper scan — re-encoding raw vectors would bypass it)."""
        from collections.abc import Iterator

        import pyarrow as pa

        m = self.m
        id_col, cell_col = self.id_col, self.cell_col
        has_cell = self.cell_centroids is not None
        avail = {id_col, cell_col} if has_cell else {id_col}
        if not set(tie_cols) <= avail:
            # exotic tie columns: keep every codes_src column (the
            # pre-r16 shape) and score via a vectorized UDF
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("double")
            def _adc(codes: pd.Series, cells: pd.Series) -> pd.Series:
                c = np.array(list(codes), dtype=np.int64)  # (b, m)
                if len(c) == 0:
                    return pd.Series([], dtype="float64")
                s = np.zeros(len(c), dtype=np.float64)
                for j in range(m):
                    s += table[j][c[:, j]]
                if cell_term is not None:
                    s += cell_term[cells.to_numpy(dtype=np.int64)]
                return pd.Series(s)

            cell_arg = F.col(cell_col) if has_cell else F.lit(0)
            return codes_src.withColumn(
                "adc_score", _adc(F.col("codes"), cell_arg)
            )

        stored = (
            self._encode_src is None
            or self.codes.storageLevel.useMemory
            or self.codes.storageLevel.useDisk
        )
        id_type = dict(
            (codes_src if stored else self._encode_src).dtypes
        )[id_col]
        out_cols = [id_col] + ([cell_col] if has_cell else [])
        out_schema = ", ".join(
            [f"{id_col} {id_type}"]
            + ([f"{cell_col} int"] if has_cell else [])
            + ["adc_score double"]
        )

        if stored:

            def _scan(
                batches: Iterator[pa.RecordBatch],
            ) -> Iterator[pa.RecordBatch]:
                for rb in batches:
                    n = rb.num_rows
                    if n == 0:
                        continue
                    codes = (
                        rb.column("codes")
                        .flatten()
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64, copy=False)
                        .reshape(n, m)
                    )
                    s = np.zeros(n, dtype=np.float64)
                    for j in range(m):
                        s += table[j][codes[:, j]]
                    arrays = [rb.column(id_col)]
                    if has_cell:
                        cells = (
                            rb.column(cell_col)
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)
                        )
                        if cell_term is not None:
                            s += cell_term[cells]
                        arrays.append(rb.column(cell_col))
                    arrays.append(pa.array(s))
                    yield pa.RecordBatch.from_arrays(
                        arrays, names=out_cols + ["adc_score"]
                    )

            src = codes_src.select(*out_cols, "codes")
            return src.mapInArrow(_scan, schema=out_schema)

        # fused encode + ADC over the raw-vector source (one crossing)
        codebooks = self.codebooks
        dsub = codebooks.shape[2]
        c_norm2 = np.einsum("skd,skd->sk", codebooks, codebooks)
        cell_centroids = self.cell_centroids
        rotation = self.rotation
        vec_col = self.vec_col
        src = self._encode_src
        if probe is not None:
            src = src.where(F.col(cell_col).isin(probe))

        def _fused(
            batches: Iterator[pa.RecordBatch],
        ) -> Iterator[pa.RecordBatch]:
            from nebuia_vector_db_spark.functions.vector import (
                arrow_list_to_matrix,
            )

            for rb in batches:
                n = rb.num_rows
                if n == 0:
                    continue
                mat = arrow_list_to_matrix(rb.column(vec_col)).astype(
                    np.float64, copy=False
                )
                cells = None
                if has_cell:
                    cells = (
                        rb.column(cell_col)
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64)
                    )
                    mat = mat - cell_centroids[cells]
                if rotation is not None:
                    mat = mat @ rotation
                codes = np.empty((n, m), dtype=np.int64)
                for sub in range(m):
                    xs = mat[:, sub * dsub : (sub + 1) * dsub]
                    codes[:, sub] = (
                        c_norm2[sub][None, :]
                        - 2.0 * (xs @ codebooks[sub].T)
                    ).argmin(axis=1)
                s = np.zeros(n, dtype=np.float64)
                for j in range(m):
                    s += table[j][codes[:, j]]
                arrays = [rb.column(id_col)]
                if has_cell:
                    if cell_term is not None:
                        s += cell_term[cells]
                    arrays.append(rb.column(cell_col))
                arrays.append(pa.array(s))
                yield pa.RecordBatch.from_arrays(
                    arrays, names=out_cols + ["adc_score"]
                )

        src = src.select(
            *out_cols, vec_col
        )
        return src.mapInArrow(_fused, schema=out_schema)


def pq_search_batch(
    index: PQIndex,
    corpus: DataFrame,
    queries_df: DataFrame,
    topk: int,
    rerank: int = 0,
    nprobe: int | None = None,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    tie_cols: Sequence[str] = (),
) -> DataFrame:
    """Batch IVF-PQ search: ONE pass over the codes serves a whole
    query batch (the PQ tier's twin of ``IVFIndex.search_batch``).

    Driver side: one (B, m, k) stack of ADC tables (an einsum over the
    codebooks — ~0.5 MB at B=16/m=16/k=256, closure-shipped) plus,
    on an IVF-PQ index, per-query probed-cell masks whose union
    bounds the scan. Scan side: per Arrow batch the (n, m) code
    matrix indexes every query's table (m gathers), the cell term is
    added per query, non-probed (row, query) pairs mask to -inf, and
    a per-query local argpartition cuts to ≤ max(topk, rerank) rows
    per query; the global cut is the bounded row_number window.

    With ``rerank > 0`` the per-query shortlists are re-scored
    EXACTLY: one inner join of the (query_id, id) shortlist against
    the raw corpus + a broadcast join of the normalized query vectors
    — only shortlist×1 rows are ever re-scored. ``rerank >= |corpus|``
    with full probe degrades to the exact batch kNN (test-pinned)."""
    from collections.abc import Iterator

    import pyarrow as pa

    from nebuia_vector_db_spark.functions.vector import (
        dot,
        l2_normalize,
    )
    from nebuia_vector_db_spark.operators.topk import topk_per_group

    qrows = queries_df.select(query_id_col, query_vec_col).collect()
    qids = np.array([r[0] for r in qrows])
    qmat = np.vstack(
        [np.asarray(normalize_query(r[1]), dtype=np.float64) for r in qrows]
    )  # (B, d)
    b = qmat.shape[0]
    m, k = index.m, index.k
    dsub = index.codebooks.shape[2]
    # OPQ: tables score rotated residuals, so rotate the queries; the
    # cell term below stays in raw space (see PQIndex.adc_table)
    qrot = qmat @ index.rotation if index.rotation is not None else qmat
    tables = np.einsum(
        "skd,bsd->bsk", index.codebooks, qrot.reshape(b, m, dsub)
    )  # (B, m, k)

    codes_src = index.codes
    cell_dots = None
    mask = None
    if index.cell_centroids is not None:
        cell_dots = index.cell_centroids @ qmat.T  # (C, B)
        if nprobe is not None:
            npb = max(1, min(nprobe, cell_dots.shape[0]))
            probe_idx = np.argpartition(-cell_dots, npb - 1, axis=0)[:npb]
            mask = np.zeros(cell_dots.shape, dtype=bool)
            mask[probe_idx, np.arange(b)[None, :]] = True
            union_cells = [
                int(c) for c in np.flatnonzero(mask.any(axis=1))
            ]
            codes_src = codes_src.where(
                F.col(index.cell_col).isin(union_cells)
            )
    cut = max(topk, rerank)
    has_cell = index.cell_centroids is not None
    cell_col = index.cell_col
    id_col = index.id_col
    id_type = dict(codes_src.dtypes)[id_col]
    out_schema = (
        f"{id_col} {id_type}, {query_id_col} long, adc_score double"
    )

    def _score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            codes = np.array(
                rb.column("codes").to_pylist(), dtype=np.int64
            )  # (n, m)
            scores = np.zeros((n, b), dtype=np.float64)
            for s in range(m):
                scores += tables[:, s, codes[:, s]].T  # (n, B)
            if has_cell:
                cells = np.asarray(rb.column(cell_col)).astype(np.int64)
                scores += cell_dots[cells]  # (n, B)
                if mask is not None:
                    scores = np.where(mask[cells], scores, -np.inf)
            kk = min(cut, n)
            idx = np.argpartition(-scores, kk - 1, axis=0)[:kk]  # (kk, B)
            rows = idx.ravel(order="F")
            qcol = np.repeat(qids, kk)
            scol = np.take_along_axis(scores, idx, axis=0).ravel(order="F")
            live = np.isfinite(scol)
            if not live.any():
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(id_col).take(pa.array(rows[live])),
                    pa.array(qcol[live]),
                    pa.array(scol[live]),
                ],
                names=[id_col, query_id_col, "adc_score"],
            )

    shortlisted = topk_per_group(
        codes_src.mapInArrow(_score, schema=out_schema),
        [query_id_col],
        "adc_score",
        cut,
        tie_cols=[id_col],
    )
    if not rerank:  # cut == topk: the shortlist IS the answer
        return shortlisted.select(query_id_col, id_col, "adc_score", "rk")
    qnorm = queries_df.select(
        query_id_col, l2_normalize(F.col(query_vec_col)).alias("_qn")
    )
    cand = corpus.join(
        F.broadcast(shortlisted.select(query_id_col, id_col)),
        id_col,
        "inner",
    ).join(F.broadcast(qnorm), query_id_col)
    exact = cand.withColumn(
        "similarity", dot(F.col(index.vec_col), F.col("_qn"))
    )
    return topk_per_group(
        exact, [query_id_col], "similarity", topk, tie_cols=tie_cols
    ).select(query_id_col, id_col, "similarity", "rk")


def train_pq(
    df: DataFrame,
    m: int = 8,
    k: int = 256,
    sample: int = 100_000,
    iters: int = 15,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_centroids: np.ndarray | None = None,
    cell_col: str = "ivf_cell",
    sample_matrix: np.ndarray | None = None,
) -> np.ndarray:
    """(m, k, dsub) codebooks from a bounded driver-side sample.

    With ``cell_centroids`` (IVF-PQ), codebooks are trained on the
    RESIDUALS x − centroid(cell(x)) — ``df`` must carry ``cell_col``
    (e.g. ``build_ivf_index(...).assigned``).

    The sample ships to the driver over Arrow (``toPandas``, not row
    ``collect`` — ~2× on a 100k sample), and the ``m`` independent
    per-subspace k-means run in a thread pool: the kernels are NumPy
    matmul/argmin which release the GIL, so training scales with
    driver cores while results stay bit-identical (each subspace
    keeps its own ``seed + s``).

    ``sample_matrix`` pins the training sample to a caller-supplied
    (n, d) matrix instead of a distributed ``limit(sample)`` draw
    (whose row set is not guaranteed stable across runs) — required
    when the trained codebooks must be bit-reproducible, e.g. the
    bench recall probes (VERDICT r3 #2). Cell assignment for the
    residual step is then computed driver-side against
    ``cell_centroids`` with the same squared-distance argmin the
    distributed kernel uses."""
    x = _training_residuals(
        df, sample, vec_col, cell_col, cell_centroids, sample_matrix
    )
    return _fit_books(x, m, k, iters, seed)


def _training_residuals(
    df, sample, vec_col, cell_col, cell_centroids, sample_matrix
) -> np.ndarray:
    """The bounded (n, d) training matrix — raw vectors or IVF
    residuals — shared by train_pq and train_opq."""
    if sample_matrix is not None:
        x = np.ascontiguousarray(sample_matrix, dtype=np.float64)[:sample]
        if cell_centroids is not None:
            c = np.ascontiguousarray(cell_centroids, dtype=np.float64)
            scores = x @ c.T * -2.0 + np.einsum("ij,ij->i", c, c)[None, :]
            x = x - c[np.argmin(scores, axis=1)]
        return x
    if cell_centroids is not None:
        pdf = df.select(vec_col, cell_col).limit(sample).toPandas()
        x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        cells = pdf[cell_col].to_numpy().astype(np.int64)
        return x - cell_centroids[cells]
    pdf = df.select(vec_col).limit(sample).toPandas()
    return np.stack(pdf[vec_col].to_numpy()).astype(np.float64)


def _fit_books(
    x: np.ndarray, m: int, k: int, iters: int, seed: int
) -> np.ndarray:
    """Per-subspace k-means in a thread pool (GIL-free NumPy kernels);
    deterministic per (input, seed) — each subspace keeps seed + s."""
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(m, os.cpu_count() or 1)) as ex:
        books = list(
            ex.map(
                lambda s: _kmeans_np(
                    x[:, s * dsub : (s + 1) * dsub], k, iters, seed + s
                ),
                range(m),
            )
        )
    return np.stack(books)


def _encode_np(y: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) codes for a driver-side matrix — the same argmin the
    distributed Arrow kernel runs (shared by OPQ training)."""
    m, _, dsub = books.shape
    c_norm2 = np.einsum("skd,skd->sk", books, books)
    codes = np.empty((y.shape[0], m), dtype=np.int64)
    for s in range(m):
        xs = y[:, s * dsub : (s + 1) * dsub]
        codes[:, s] = (c_norm2[s][None, :] - 2.0 * (xs @ books[s].T)).argmin(
            axis=1
        )
    return codes


def _reconstruct_np(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    m = books.shape[0]
    return np.concatenate(
        [books[s][codes[:, s]] for s in range(m)], axis=1
    )


def _eigen_allocation_rotation(x: np.ndarray, m: int) -> np.ndarray:
    """Parametric OPQ init (Ge et al., CVPR 2013 §4, 'OPQ-P' under a
    Gaussian assumption): R = PCA rotation with its eigenvectors
    PERMUTED so each of the m subspaces receives an (almost) equal
    product of eigenvalues — the allocation that minimizes the
    rate-distortion bound when each subspace gets the same code
    budget. Greedy balancing: walk eigenvalues in descending order,
    assign each to the not-yet-full subspace with the smallest
    running log-eigenvalue sum. Deterministic (no RNG)."""
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    xc = x - x.mean(axis=0, keepdims=True)
    cov = (xc.T @ xc) / max(1, xc.shape[0] - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    log_e = np.log(np.maximum(evals, 1e-12))
    # Balanced-partition greedy (LPT): every bucket ends with exactly
    # dsub items, so the balance objective is invariant to a uniform
    # shift of the logs — shift them non-negative first. (Without the
    # shift, all-negative logs make the min-sum bucket monotonically
    # MORE minimal as it receives items, so it hoards the whole top of
    # the spectrum — the worst possible allocation.)
    shifted = log_e - log_e.min()
    buckets: list[list[int]] = [[] for _ in range(m)]
    sums = np.zeros(m)
    # eigenvalues are already sorted descending, so descending shifted
    # log IS index order — iterate directly (an argsort here would
    # reorder ties nondeterministically across numpy versions)
    for i in range(d):
        open_b = [j for j in range(m) if len(buckets[j]) < dsub]
        j = min(open_b, key=lambda b: sums[b])
        buckets[j].append(i)
        sums[j] += shifted[i]
    perm = [i for b in buckets for i in b]
    return np.ascontiguousarray(evecs[:, perm])


def train_opq(
    df: DataFrame,
    m: int = 8,
    k: int = 256,
    sample: int = 100_000,
    iters: int = 15,
    opq_iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_centroids: np.ndarray | None = None,
    cell_col: str = "ivf_cell",
    sample_matrix: np.ndarray | None = None,
    init: str = "eigen",
) -> tuple[np.ndarray, np.ndarray]:
    """OPQ (Ge et al., CVPR 2013, non-parametric variant): learn an
    orthogonal rotation R so the PRODUCT structure of the codebooks
    fits the data — plain PQ quantizes each dsub-dim slice
    independently, so correlated/variance-skewed dimensions waste code
    budget; rotating first decorrelates and balances the subspaces.
    Round 6 (VERDICT r5 task #7): lifts codes-only (ADC) recall at the
    SAME bytes/vector — at 100 TB the codes-only path is what scans.

    Alternating minimization on the same bounded driver-side sample
    train_pq uses (deterministic per seed):
      1. fix R → train per-subspace codebooks on Y = X·R;
      2. fix codebooks → encode Y, reconstruct Ŷ, and solve the
         orthogonal Procrustes problem min_R ‖X·R − Ŷ‖_F via one SVD
         of XᵀŶ (R = U·Vᵀ).
    Query side: dot(q, x̂) = dot(q·R, ŷ) since R is orthogonal — the
    rotation is applied to the QUERY once per search, never to the
    scan (PQIndex.adc_table / pq_search_batch).

    ``init`` seeds the alternating minimization: ``"eigen"``
    (default) or ``"identity"`` (the original non-parametric start).
    ``"eigen"`` is
    Ge et al. §4's PARAMETRIC init: eigendecompose the sample
    covariance and allocate eigenvectors to the m subspaces balancing
    the per-subspace PRODUCT of eigenvalues (greedy on log-eigenvalue
    sums), so no subspace hoards variance. On strong-eigendecay data
    (real transformer embeddings) identity init can converge to a
    local optimum that misallocates code budget; the eigen init
    starts decorrelated-and-balanced, which both speeds convergence
    and lifts final ADC recall (round 7, VERDICT r6 task #3).

    Returns ``(rotation, codebooks)`` — feed both to
    :func:`encode_pq`."""
    x = _training_residuals(
        df, sample, vec_col, cell_col, cell_centroids, sample_matrix
    )
    d = x.shape[1]
    if init == "eigen":
        rot = _eigen_allocation_rotation(x, m)
    elif init == "identity":
        rot = np.eye(d, dtype=np.float64)
    else:
        raise ValueError(f"unknown OPQ init {init!r}")
    books = None
    for _ in range(max(1, opq_iters)):
        y = x @ rot
        books = _fit_books(y, m, k, iters, seed)
        y_hat = _reconstruct_np(_encode_np(y, books), books)
        u, _, vt = np.linalg.svd(x.T @ y_hat, full_matrices=False)
        rot = u @ vt
    # final codebook fit against the converged rotation
    books = _fit_books(x @ rot, m, k, iters, seed)
    return rot, books


def encode_pq(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_centroids: np.ndarray | None = None,
    cell_col: str = "ivf_cell",
    rotation: np.ndarray | None = None,
) -> PQIndex:
    """Map-side Arrow encoding: per batch, one GEMM + argmin per
    subspace; output is (id[, cell], codes array<int>) — at rest this
    is the 32× compressed representation (write it partitioned/bucketed
    like any table; raw vectors are only needed for re-rank). With
    ``cell_centroids`` the codes quantize residuals (IVF-PQ); with an
    OPQ ``rotation`` the (residual) vectors are rotated before the
    subspace split (one extra (b,d)·(d,d) GEMM per batch — still
    map-side, no shuffle)."""
    from collections.abc import Iterator

    import pyarrow as pa

    m, _, dsub = codebooks.shape
    # ||c||² per subspace, precomputed once; argmin ||x−c||² ≡
    # argmin (||c||² − 2x·c)
    c_norm2 = np.einsum("skd,skd->sk", codebooks, codebooks)
    residual = cell_centroids is not None

    def _encode(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from nebuia_vector_db_spark.functions.vector import (
            arrow_list_to_matrix,
        )

        for rb in batches:
            ids = rb.column(id_col)
            mat = arrow_list_to_matrix(rb.column(vec_col)).astype(
                np.float64, copy=False
            )
            if mat.shape[0] == 0:
                continue
            if residual:
                cells = rb.column(cell_col).to_numpy(zero_copy_only=False)
                mat = mat - cell_centroids[cells.astype(np.int64)]
            if rotation is not None:
                mat = mat @ rotation
            codes = np.empty((mat.shape[0], m), dtype=np.int64)
            for s in range(m):
                xs = mat[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = (
                    c_norm2[s][None, :] - 2.0 * (xs @ codebooks[s].T)
                ).argmin(axis=1)
            arrays = [ids]
            names = [id_col]
            if residual:
                arrays.append(rb.column(cell_col))
                names.append(cell_col)
            arrays.append(pa.array(list(codes), type=pa.list_(pa.int64())))
            names.append("codes")
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    if residual:
        src = df.select(id_col, cell_col, vec_col)
        schema = f"{id_col} long, {cell_col} int, codes array<long>"
    else:
        src = df.select(id_col, vec_col)
        schema = f"{id_col} long, codes array<long>"
    codes_df = src.mapInArrow(_encode, schema=schema)
    return PQIndex(
        codes_df, codebooks, vec_col, id_col,
        cell_centroids=cell_centroids, cell_col=cell_col,
        rotation=rotation, encode_src=src,
    )


def save_pq_index(index: PQIndex, path: str) -> None:
    """Persist the compressed corpus: codes partitioned by IVF cell
    when present (ADC probing then prunes partitions, same as
    save_ivf_index) plus the codebooks and optional cell centroids as
    tiny flattened tables. The raw-vector table is NOT copied — at
    rest the index is the 16-32× smaller representation; re-rank
    reads the original corpus by id."""
    import os

    spark = index.codes.sparkSession
    w = index.codes.write.mode("overwrite")
    if index.cell_centroids is not None:
        w = w.partitionBy(index.cell_col)
    w.parquet(os.path.join(path, "codes"))
    m, k, dsub = index.codebooks.shape
    books = [
        (s, c, [float(x) for x in index.codebooks[s, c]])
        for s in range(m)
        for c in range(k)
    ]
    spark.createDataFrame(
        books, "s int, c int, w array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(path, "codebooks")
    )
    if index.cell_centroids is not None:
        cents = [
            (i, [float(x) for x in v])
            for i, v in enumerate(index.cell_centroids)
        ]
        spark.createDataFrame(
            cents, "cell int, centroid array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "centroids")
        )
    if index.rotation is not None:
        rows = [
            (i, [float(x) for x in v]) for i, v in enumerate(index.rotation)
        ]
        spark.createDataFrame(
            rows, "i int, row array<double>"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "rotation")
        )


def append_to_pq_index(
    spark,
    path: str,
    new_df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
) -> "PQIndex":
    """Incremental PQ maintenance — the compressed-tier twin of
    ann.append_to_ivf_index: new vectors are routed to the EXISTING
    cell centroids (broadcast-GEMM argmin), encoded with the EXISTING
    codebooks (map-side Arrow, no shuffle), and their codes appended
    to the saved partitions. A full re-encode of the grown corpus with
    the same codebooks/centroids yields identical codes (test-pinned).

    Codebooks are frozen like centroids: under drift, quantization
    error creeps up — monitor mean ADC-vs-exact gap on a sampled
    query set and retrain (a fresh train_pq + staged swap) when it
    degrades. Never retrain in place: old codes are meaningless under
    new codebooks.
    """
    import os

    idx = load_pq_index(spark, path, vec_col, id_col, cell_col)
    src = new_df
    if idx.cell_centroids is not None and cell_col not in new_df.columns:
        from nebuia_vector_db_spark.operators.ann import assign_to_cells

        src = assign_to_cells(new_df, idx.cell_centroids, vec_col)
        # assign_to_cells names the column ivf_cell; align if custom
        if cell_col != "ivf_cell":
            src = src.withColumnRenamed("ivf_cell", cell_col)
    new_codes = encode_pq(
        src, idx.codebooks, vec_col, id_col,
        cell_centroids=idx.cell_centroids, cell_col=cell_col,
        rotation=idx.rotation,
    ).codes
    w = new_codes.write.mode("append")
    if idx.cell_centroids is not None:
        w = w.partitionBy(cell_col)
    w.parquet(os.path.join(path, "codes"))
    return load_pq_index(spark, path, vec_col, id_col, cell_col)


def load_pq_index(
    spark,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cell_col: str = "ivf_cell",
) -> PQIndex:
    """Reload: lazy (partition-prunable) codes scan + driver-side
    codebooks/centroids."""
    import os

    codes = spark.read.parquet(os.path.join(path, "codes"))
    rows = (
        spark.read.parquet(os.path.join(path, "codebooks"))
        .orderBy("s", "c")
        .collect()
    )
    m = 1 + max(r["s"] for r in rows)
    k = 1 + max(r["c"] for r in rows)
    dsub = len(rows[0]["w"])
    books = np.empty((m, k, dsub), dtype=np.float64)
    for r in rows:
        books[r["s"], r["c"]] = r["w"]
    cents = None
    cent_path = os.path.join(path, "centroids")
    try:
        crows = spark.read.parquet(cent_path).orderBy("cell").collect()
        cents = np.vstack(
            [np.asarray(r["centroid"], dtype=np.float64) for r in crows]
        )
    except Exception:
        cents = None  # flat-PQ index: no centroid table written
    rot = None
    try:
        rrows = spark.read.parquet(
            os.path.join(path, "rotation")
        ).orderBy("i").collect()
        rot = np.vstack(
            [np.asarray(r["row"], dtype=np.float64) for r in rrows]
        )
    except Exception:
        rot = None  # plain-PQ index: no rotation written
    return PQIndex(
        codes, books, vec_col, id_col,
        cell_centroids=cents, cell_col=cell_col, rotation=rot,
    )
