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

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.vector import (
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
    if method == "numpy":
        sim = numpy_dot_udf(qvec)(F.col(vec_col))
    else:
        sim = dot(F.col(vec_col), normalize_query(qvec))
    out = df.withColumn(sim_col, sim)
    order: list[Column] = [F.desc(sim_col), *[F.col(c) for c in tie_cols]]
    # orderBy+limit → TakeOrderedAndProject (per-partition heap, no shuffle)
    return out.orderBy(*order).limit(k)


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
) -> DataFrame:
    """Batch kNN: every query gets its exact top-k over the corpus.

    The query side is broadcast (small by construction — SURVEY §7.3-2);
    the corpus is scanned once, never shuffled for the join itself. The
    per-query cut is a row_number window partitioned by query_id.
    """
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
