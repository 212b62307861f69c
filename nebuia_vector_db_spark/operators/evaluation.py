"""Retrieval evaluation metrics as exact distributed aggregates:
recall@k, precision@k, hit-rate and MRR over a (run, qrels) pair.

Every retrieval change — a new ANN tier, a quantization level, a
hybrid fusion weight — is judged by these numbers, so the engine that
produces runs should also score them at corpus scale: a 100 TB
deployment evaluates millions of queries against click/qrel logs, and
that is a pair of joins + a grouped aggregate, not a driver loop.

Integer-exactness: the repo's oracle discipline (lm.py micro-units)
applied to IR metrics. All inputs are integers (ranks, relevance
counts), and each metric is emitted as BIGINT micro-units with a
single terminal floor division:

- ``recall_micro  = (1e6 · hits_at_k)  div n_rel``
- ``precision_micro = (1e6 · hits_at_k) div k``
- ``rr_micro = 1e6 div first_rel_rank`` (0 when nothing relevant is
  retrieved — the standard MRR convention)

so per-query rows are bit-reproducible and SQL-replayable; the
corpus-level means are left to the caller (one further agg) because
HOW to aggregate (macro vs micro average, tie policies) is an
experiment-design choice, not a kernel one. nDCG is deliberately
absent: its log2 discount makes cross-engine bit-equality depend on
libm rounding, the one thing the micro-unit discipline exists to
avoid — rank-weighted gain with a rational discount (1/rank) is MRR.

Scale posture: qrels are grouped once (n_rel per query); the run is
filtered to rank ≤ k BEFORE the relevance join (k-bounded per query);
both joins are equi-joins on (query, doc) / query — broadcastable
when the query set is an eval batch, shuffle-partitioned when it is a
click log. No windows, no driver collection.

Reference scope note: the reference engine (main.go) returns top-k
results and never scores them — extension tier (SURVEY §2.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def evaluate_run(
    run: DataFrame,
    qrels: DataFrame,
    k: int,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query IR metrics for a ranked ``run`` against binary
    ``qrels``.

    ``run``: (query, doc, rank) with rank 1-based and unique per
    (query, doc) — the shape every ``topk_per_group``/``knn_join``
    output already has. ``qrels``: (query, doc) rows naming the
    relevant documents (duplicates are tolerated and deduped;
    graded relevance collapses to rel > 0, the binary-metric
    convention).

    Returns one row per query PRESENT IN QRELS: (query, n_rel,
    hits_at_k, recall_micro, precision_micro, rr_micro). Queries in
    the run with no qrels row are dropped (unjudged — scoring them 0
    would poison a macro average); queries with qrels but absent from
    the run score 0 across the board.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q = F.col(query_col)
    rel = (
        qrels.select(query_col, doc_col)
        .dropDuplicates([query_col, doc_col])
    )
    n_rel = rel.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_rel")
    )
    topk = run.where(F.col(rank_col) <= k).select(
        query_col, doc_col, rank_col
    )
    hits = (
        topk.join(rel, [query_col, doc_col])
        .groupBy(query_col)
        .agg(
            F.count(F.lit(1)).alias("hits_at_k"),
            F.min(rank_col).cast("long").alias("_first_rel_rank"),
        )
    )
    out = n_rel.join(hits, query_col, "left").select(
        q,
        F.col("n_rel").cast("long").alias("n_rel"),
        F.coalesce(F.col("hits_at_k"), F.lit(0)).cast("long").alias(
            "hits_at_k"
        ),
        F.expr(
            f"({MICRO}L * coalesce(hits_at_k, 0L)) div n_rel"
        ).alias("recall_micro"),
        F.expr(
            f"({MICRO}L * coalesce(hits_at_k, 0L)) div {int(k)}L"
        ).alias("precision_micro"),
        F.coalesce(
            F.expr(f"{MICRO}L div _first_rel_rank"), F.lit(0).cast("long")
        ).alias("rr_micro"),
    )
    return out


def summarize_eval(per_query: DataFrame, query_col: str = "query_id") -> DataFrame:
    """Corpus-level summary of :func:`evaluate_run`'s output — BOTH
    averaging conventions, because they answer different questions
    and conflating them is the classic IR-reporting mistake:

    - **macro** (mean of per-query micro metrics): every query votes
      equally — the retrieval-quality number papers report (MAP/MRR
      are macro by definition);
    - **micro** (pooled ``Σ hits / Σ n_rel``): every RELEVANT DOC
      votes equally — dominated by queries with many relevant docs,
      the right view for corpus-coverage questions.

    One row: (n_queries, macro_recall_micro, macro_precision_micro,
    mrr_micro, micro_recall_micro). Still integer micro-units: sums
    are exact BIGINTs and each mean is one terminal floor division,
    so the summary is as SQL-replayable as the per-query rows.
    """
    return per_query.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.expr("sum(recall_micro) div count(1)").alias(
            "macro_recall_micro"
        ),
        F.expr("sum(precision_micro) div count(1)").alias(
            "macro_precision_micro"
        ),
        F.expr("sum(rr_micro) div count(1)").alias("mrr_micro"),
        F.expr(
            f"({MICRO}L * sum(hits_at_k)) div sum(n_rel)"
        ).alias("micro_recall_micro"),
    )
