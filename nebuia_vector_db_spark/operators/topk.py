"""Top-k similarity search operators.

≙ reference O-6/O-7/O-9/O-10 (SURVEY.md §2.1): normalize query → dot
product per chunk → sort desc → truncate to k; multi-collection =
union + global top-k (main.go:232-237, 397-402).

Spark-first design notes (scale):

- ``orderBy(desc).limit(k)`` plans ``TakeOrderedAndProject``: an
  O(n log k) per-partition bounded heap + single driver merge of
  ``num_partitions × k`` rows — no global sort, no shuffle of the
  scan. Strictly better than the reference's O(n log n) full sort
  (SURVEY.md §4 P-7), and it scales: at 100 TB the driver merge is
  still only ``partitions × k`` rows.
- Batch kNN (many queries at once) broadcasts the small query side
  (never shuffles the corpus) and cuts per query with a bounded-heap
  window; the corpus-side shuffle for the window is partitioned by
  query_id — at B queries that is B×N rows, so for large B prefer the
  pandas_udf path which emits only k rows per (partition, query).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.vector import (
    arrow_list_to_matrix,
    dot,
    l2_normalize,
    normalize_query,
    numpy_dot_udf,
)


def topk_search(
    df: DataFrame,
    qvec: Sequence[float],
    k: int,
    vec_col: str = "embedding",
    sim_col: str = "similarity",
    tie_cols: Sequence[str] = (),
    method: str = "sql",
) -> DataFrame:
    """Exact brute-force top-k: sim = dot(q/‖q‖, v) (SURVEY §1.5-1).

    Deviations D-1/D-2: always sorted desc, deterministic tie-break.
    ``method='sql'`` = codegen'd HOF expression (oracle-exact);
    ``method='numpy'`` = Arrow/BLAS pandas_udf fast path.
    """
    if method == "arrow":
        return _arrow_topk(df, qvec, k, vec_col, sim_col, tie_cols)
    if method == "numpy":
        sim = numpy_dot_udf(qvec)(F.col(vec_col))
    else:
        sim = dot(F.col(vec_col), normalize_query(qvec))
    out = df.withColumn(sim_col, sim)
    order: list[Column] = [F.desc(sim_col), *[F.col(c) for c in tie_cols]]
    # orderBy+limit → TakeOrderedAndProject (per-partition heap, no shuffle)
    return out.orderBy(*order).limit(k)


def _arrow_topk(
    df: DataFrame,
    qvec: Sequence[float],
    k: int,
    vec_col: str,
    sim_col: str,
    tie_cols: Sequence[str],
) -> DataFrame:
    """mapInArrow fast path: per Arrow batch, ONE BLAS matvec over the
    zero-copy (n, d) view, then a local argpartition cut to ≤ k rows.

    Each task therefore emits at most (batches × k) rows — the final
    TakeOrderedAndProject merges k-row heads, never the corpus. The
    vectors themselves never materialize as Python objects.
    """
    import pyarrow as pa

    qn = np.asarray(normalize_query(qvec), dtype=np.float64)
    keep = [c for c in df.columns if c != vec_col]
    out_schema = ", ".join(
        [f"{name} {dtype}" for name, dtype in df.dtypes if name != vec_col]
        + [f"{sim_col} double"]
    )

    def _score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            mat = arrow_list_to_matrix(rb.column(vec_col))
            if mat.shape[0] == 0:
                continue
            sims = mat.astype(np.float64, copy=False) @ qn
            n = len(sims)
            if n > k:
                idx = np.argpartition(-sims, k)[:k]
            else:
                idx = np.arange(n)
            arrays = [rb.column(c).take(pa.array(idx)) for c in keep]
            arrays.append(pa.array(sims[idx]))
            yield pa.RecordBatch.from_arrays(arrays, names=[*keep, sim_col])

    cut = df.mapInArrow(_score, schema=out_schema)
    order = [F.desc(sim_col), *[F.col(c) for c in tie_cols]]
    return cut.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_col: str,
    k: int,
    tie_cols: Sequence[str] = (),
    rank_col: str = "rk",
) -> DataFrame:
    """Per-group top-k via row_number window — the building block for
    grouped retrieval. Shuffles once on ``group_cols``; with AQE skew
    handling a hot group splits across tasks."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc(order_col), *[F.col(c) for c in tie_cols]
    )
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
    )


def knn_join(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    corpus_vec_col: str = "embedding",
    sim_col: str = "similarity",
    tie_cols: Sequence[str] = (),
    method: str = "sql",
) -> DataFrame:
    """Batch kNN: every query gets its exact top-k over the corpus.

    ``method='sql'``: the query side is broadcast (small by
    construction — SURVEY §7.3-2); the corpus is scanned once, never
    shuffled for the join itself; the per-query cut is a row_number
    window (Spark 4 plans a Partial WindowGroupLimit, so tasks ship
    ≤ k rows per query). ``method='arrow'``: one GEMM per Arrow batch
    against the whole broadcast query matrix + per-query local
    argpartition — the amortized fast path for many queries.
    """
    if method == "arrow":
        return _arrow_knn_join(
            queries_df, corpus_df, k, query_id_col, query_vec_col,
            corpus_vec_col, sim_col, tie_cols,
        )
    # reference semantics: the query side is L2-normalized, the stored
    # vector used raw (SURVEY §1.5-1); normalizing the small broadcast
    # side is O(B·d)
    queries_df = queries_df.withColumn(
        query_vec_col, l2_normalize(F.col(query_vec_col))
    )
    joined = corpus_df.crossJoin(F.broadcast(queries_df))
    scored = joined.withColumn(
        sim_col, dot(F.col(corpus_vec_col), F.col(query_vec_col))
    )
    return topk_per_group(
        scored, [query_id_col], sim_col, k, tie_cols=tie_cols
    ).drop(query_vec_col)


def _arrow_knn_join(
    queries_df: DataFrame,
    corpus_df: DataFrame,
    k: int,
    query_id_col: str,
    query_vec_col: str,
    corpus_vec_col: str,
    sim_col: str,
    tie_cols: Sequence[str],
) -> DataFrame:
    """GEMM batch kNN: queries collected to an (B, d) matrix on the
    driver (they're a query *parameter*, same as a single query vector),
    shipped to tasks via closure; each Arrow batch does one
    (n, d)·(d, B) GEMM and cuts to ≤ k rows *per query* locally, so a
    task emits ≤ batches × B × k rows and the corpus never shuffles.
    The final per-query cut is the same bounded-window row_number.
    """
    import pyarrow as pa

    qrows = queries_df.select(query_id_col, query_vec_col).collect()
    qids = np.array([r[0] for r in qrows])
    qmat = np.vstack(
        [np.asarray(normalize_query(r[1]), dtype=np.float64) for r in qrows]
    )  # (B, d)

    keep = [c for c in corpus_df.columns if c != corpus_vec_col]
    out_schema = ", ".join(
        [f"{n} {t}" for n, t in corpus_df.dtypes if n != corpus_vec_col]
        + [f"{query_id_col} long", f"{sim_col} double"]
    )

    def _score(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            mat = arrow_list_to_matrix(rb.column(corpus_vec_col))
            n = mat.shape[0]
            if n == 0:
                continue
            sims = mat.astype(np.float64, copy=False) @ qmat.T  # (n, B)
            kk = min(k, n)
            # per-query local top-k: one argpartition over each column
            idx = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, B)
            rows = idx.ravel(order="F")
            qcol = np.repeat(qids, kk)
            scol = np.take_along_axis(sims, idx, axis=0).ravel(order="F")
            take = pa.array(rows)
            arrays = [rb.column(c).take(take) for c in keep]
            arrays.append(pa.array(qcol))
            arrays.append(pa.array(scol))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[*keep, query_id_col, sim_col]
            )

    cut = corpus_df.mapInArrow(_score, schema=out_schema)
    return topk_per_group(cut, [query_id_col], sim_col, k, tie_cols=tie_cols)
