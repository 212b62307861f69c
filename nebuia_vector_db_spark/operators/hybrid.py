"""Hybrid retrieval: keyword (tf-idf) relevance fused with vector
cosine similarity over the same corpus — the query mode a user of the
reference (documents carry BOTH text and chunk embeddings,
main.go:30-35) reaches for when pure vector recall misses exact-term
matches. The reference itself only does the vector half; this is the
extension that makes its data model searchable both ways at once.

Determinism discipline (same as queries.py::_dsum): each component
score is quantized to integer micro-units — ``floor(x·1e6 + 0.5)`` is
exact IEEE arithmetic — and the FUSION IS LONG ADDITION, so the
ranking is pure integer comparison: identical in any engine, any
partition order. The registry query ``hybrid_search`` hash-verifies
the full pipeline (weights → query dot → norms → fusion → top-k)
against an ANSI-SQL replay.

Scale shape: the keyword side shuffles on token (posting lists) and
doc id — never all-pairs; the vector side is a map-side projection;
the fusion join is keyed on the doc id and the top-k is a
TakeOrderedAndProject (bounded per-partition heaps).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.vector import (
    dot,
    l2_norm,
    normalize_query,
)
from nebuia_vector_db_spark.operators.textvec import tfidf_weight_relation

_UNITS = 1_000_000


def _q6(c: Column) -> Column:
    return F.floor(c * _UNITS + F.lit(0.5))


def rrf_search(
    docs: DataFrame,
    emb: DataFrame,
    terms: Sequence[str],
    qvec: Sequence[float],
    k: int = 10,
    rrf_k: int = 60,
    n_cand: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """Reciprocal-rank fusion of the two retrievers' TOP-``n_cand``
    LISTS: ``score = Σ_signals 1/(rrf_k + rank)``, a doc absent from a
    signal's list contributing 0 for it — the standard fusion when the
    two score scales aren't comparable (tf-idf magnitudes vs cosine).

    Scale shape: each signal's list is cut with ``orderBy().limit()``
    — Spark plans TakeOrderedAndProject (per-partition bounded heaps,
    NO global sort of the corpus) — and ranks are then assigned by a
    window over the ≤ ``n_cand``-row candidate relation, whose single
    partition is bounded by construction (a query parameter, not the
    data). Ranks derive from integer-quantized scores with doc-id
    tie-breaks, so the fused ordering is engine-independent."""
    terms = sorted({t.lower() for t in terms})
    if not terms:
        raise ValueError("rrf_search needs at least one query term")
    from pyspark.sql import Window

    w = tfidf_weight_relation(docs, text_col, id_col)
    norms = w.groupBy("_id").agg(
        F.sum(_q6(F.col("w") * F.col("w"))).alias("q2")
    )
    qdots = (
        w.where(F.col("tok").isin(list(terms)))
        .groupBy("_id")
        .agg(F.sum(_q6(F.col("w"))).alias("qd"))
    )
    kw_cos = (F.col("qd") / _UNITS) / (
        F.sqrt(F.col("q2") / _UNITS) * F.sqrt(F.lit(float(len(terms))))
    )
    kw = norms.join(qdots, "_id", "left").select(
        F.col("_id").alias(id_col),
        F.coalesce(_q6(kw_cos), F.lit(0)).cast("long").alias("sk"),
    )
    qn = normalize_query(qvec)
    vec = emb.select(
        F.col(vec_id_col).alias(id_col),
        _q6(dot(emb_col, qn) / l2_norm(emb_col)).cast("long").alias("sv"),
    )
    # top-N lists: TakeOrderedAndProject cuts, then ranks within the
    # bounded candidate relations (≤ n_cand rows each by construction)
    vec_top = vec.orderBy(F.desc("sv"), id_col).limit(n_cand)
    kw_top = kw.orderBy(F.desc("sk"), id_col).limit(n_cand)
    vec_ranked = vec_top.withColumn(
        "rank_vec",
        F.row_number().over(Window.orderBy(F.desc("sv"), id_col)).cast("long"),
    ).select(id_col, "rank_vec")
    kw_ranked = kw_top.withColumn(
        "rank_kw",
        F.row_number().over(Window.orderBy(F.desc("sk"), id_col)).cast("long"),
    ).select(id_col, "rank_kw")
    fused = vec_ranked.join(kw_ranked, id_col, "full_outer")
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(r)), F.lit(0.0)
    )
    return (
        fused.withColumn("rrf_score", contrib("rank_vec") + contrib("rank_kw"))
        .orderBy(F.desc("rrf_score"), id_col)
        .limit(k)
        .select(id_col, "rank_vec", "rank_kw", "rrf_score")
    )


def hybrid_search(
    docs: DataFrame,
    emb: DataFrame,
    terms: Sequence[str],
    qvec: Sequence[float],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    emb_col: str = "embedding",
    index=None,
) -> DataFrame:
    """Top-k docs by ``score = (kw_cos + vec_cos) / 2`` where

    - ``kw_cos``: cosine between the doc's tf-idf weight vector and the
      binary query-term vector — Σ_{t∈terms} w(doc,t) / (‖w(doc)‖·√|terms|);
      docs sharing no query term score 0.
    - ``vec_cos``: true cosine between the doc's embedding (joined on
      ``vec_id = doc_id``) and the L2-normalized query vector.

    Both components are quantized to micro-units before the fusion sum
    (see module docstring), and ties break on the doc id.

    ``index``: a persisted :class:`~nebuia_vector_db_spark.operators.
    textvec.TextIndex` — skips the per-query weight/norm build (the
    ingest-time index path, like IVF/PQ on the vector side).
    """
    terms = sorted({t.lower() for t in terms})
    if not terms:
        raise ValueError("hybrid_search needs at least one query term")
    if index is not None:
        w, norms = index.weights, index.norms
    else:
        w = tfidf_weight_relation(docs, text_col, id_col)
        norms = w.groupBy("_id").agg(
            F.sum(_q6(F.col("w") * F.col("w"))).alias("q2")
        )
    qdots = (
        w.where(F.col("tok").isin(list(terms)))
        .groupBy("_id")
        .agg(F.sum(_q6(F.col("w"))).alias("qd"))
    )
    kw_cos = (F.col("qd") / _UNITS) / (
        F.sqrt(F.col("q2") / _UNITS) * F.sqrt(F.lit(float(len(terms))))
    )
    kw = (
        norms.join(qdots, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(kw_cos, F.lit(0.0)).alias("kw_cos"),
        )
    )
    qn = normalize_query(qvec)
    vec = emb.select(
        F.col(vec_id_col).alias(id_col),
        (dot(emb_col, qn) / l2_norm(emb_col)).alias("vec_cos"),
    )
    fused = vec.join(kw, id_col).select(
        id_col,
        _q6(F.col("vec_cos")).cast("long").alias("sv"),
        _q6(F.col("kw_cos")).cast("long").alias("sk"),
    )
    return (
        fused.withColumn("score_units", F.col("sv") + F.col("sk"))
        .orderBy(F.desc("score_units"), id_col)
        .limit(k)
        .select(
            id_col,
            (F.col("sv") / float(_UNITS)).alias("vec_cos"),
            (F.col("sk") / float(_UNITS)).alias("kw_cos"),
            (F.col("score_units") / float(2 * _UNITS)).alias("score"),
        )
    )


def rrf_search_bm25(
    docs: DataFrame,
    emb: DataFrame,
    terms: Sequence[str],
    qvec: Sequence[float],
    k: int = 10,
    rrf_k: int = 60,
    n_cand: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """RRF fusion with Okapi BM25 as the keyword signal — the
    OpenSearch/Elasticsearch-default hybrid shape (BM25 hits + kNN
    hits fused by rank). Same fusion semantics and scale shape as
    :func:`rrf_search` (TakeOrdered candidate cuts, windows only over
    the ≤ n_cand bounded relations, integer-quantized scores with
    doc-id tie-breaks); only the keyword scorer differs — BM25's
    saturating tf and length normalization versus the tf-idf cosine.
    Docs matching no query term are absent from the keyword list and
    contribute 0 for that signal, the standard RRF convention."""
    from nebuia_vector_db_spark.operators.textvec import bm25_topk

    terms = sorted({t.lower() for t in terms})
    if not terms:
        raise ValueError("rrf_search_bm25 needs at least one query term")
    from pyspark.sql import Window

    kw_top = bm25_topk(
        docs, list(terms), k=n_cand, text_col=text_col, id_col=id_col
    )
    qn = normalize_query(qvec)
    vec_top = (
        emb.select(
            F.col(vec_id_col).alias(id_col),
            _q6(dot(emb_col, qn) / l2_norm(emb_col)).cast("long").alias("sv"),
        )
        .orderBy(F.desc("sv"), id_col)
        .limit(n_cand)
    )
    vec_ranked = vec_top.withColumn(
        "rank_vec",
        F.row_number().over(Window.orderBy(F.desc("sv"), id_col)).cast("long"),
    ).select(id_col, "rank_vec")
    kw_ranked = kw_top.withColumn(
        "rank_kw",
        F.row_number()
        .over(Window.orderBy(F.desc("score_micro"), id_col))
        .cast("long"),
    ).select(id_col, "rank_kw")
    fused = vec_ranked.join(kw_ranked, id_col, "full_outer")
    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(float(rrf_k)) + F.col(r)), F.lit(0.0)
    )
    return (
        fused.withColumn("rrf_score", contrib("rank_vec") + contrib("rank_kw"))
        .orderBy(F.desc("rrf_score"), id_col)
        .limit(k)
        .select(id_col, "rank_vec", "rank_kw", "rrf_score")
    )
