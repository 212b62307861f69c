"""operators/evaluation.py — exact IR metrics.

The eval_retrieval_knn oracle row hash-certifies the composed
pipeline; these tests pin the metric semantics on hand-built
run/qrels pairs where every number is checkable by eye.
"""

import pytest

from nebuia_vector_db_spark.operators.evaluation import evaluate_run


def _dfs(spark, run_rows, qrel_rows):
    run = spark.createDataFrame(
        run_rows, "query_id long, doc_id long, rank long"
    )
    qrels = spark.createDataFrame(qrel_rows, "query_id long, doc_id long")
    return run, qrels


def test_metrics_hand_checked(spark):
    run, qrels = _dfs(
        spark,
        # q1: rel docs 10,11 at ranks 1 and 4; rank-5 doc 12 irrelevant
        [(1, 10, 1), (1, 99, 2), (1, 98, 3), (1, 11, 4), (1, 12, 5)],
        [(1, 10), (1, 11), (1, 77)],  # 77 never retrieved
    )
    row = evaluate_run(run, qrels, k=5).collect()[0]
    assert row.n_rel == 3 and row.hits_at_k == 2
    assert row.recall_micro == (1_000_000 * 2) // 3  # 666666
    assert row.precision_micro == (1_000_000 * 2) // 5  # 400000
    assert row.rr_micro == 1_000_000  # first relevant at rank 1


def test_rank_cut_applies_before_join(spark):
    # relevant doc at rank 7 must not count at k=5
    run, qrels = _dfs(spark, [(1, 10, 7)], [(1, 10)])
    row = evaluate_run(run, qrels, k=5).collect()[0]
    assert (row.hits_at_k, row.recall_micro, row.rr_micro) == (0, 0, 0)
    # and counts at k=10 with the MRR convention 1e6 div 7
    row = evaluate_run(run, qrels, k=10).collect()[0]
    assert row.hits_at_k == 1 and row.rr_micro == 1_000_000 // 7


def test_query_missing_from_run_scores_zero(spark):
    run, qrels = _dfs(spark, [(1, 10, 1)], [(1, 10), (2, 20)])
    rows = {r.query_id: r for r in evaluate_run(run, qrels, k=5).collect()}
    assert set(rows) == {1, 2}
    assert rows[2].n_rel == 1 and rows[2].hits_at_k == 0
    assert rows[2].recall_micro == 0 and rows[2].rr_micro == 0


def test_unjudged_run_queries_dropped_and_qrels_deduped(spark):
    run, qrels = _dfs(
        spark,
        [(1, 10, 1), (9, 90, 1)],          # query 9 has no qrels
        [(1, 10), (1, 10), (1, 10)],        # duplicated qrel rows
    )
    rows = evaluate_run(run, qrels, k=5).collect()
    assert [r.query_id for r in rows] == [1]
    assert rows[0].n_rel == 1 and rows[0].recall_micro == 1_000_000


def test_summarize_macro_vs_micro(spark):
    """Macro weighs queries equally; micro weighs relevant docs —
    the hand-built pair below separates them."""
    from nebuia_vector_db_spark.operators.evaluation import summarize_eval

    run, qrels = _dfs(
        spark,
        # q1: 1 rel doc, retrieved (recall 1.0, rr 1.0)
        # q2: 4 rel docs, 1 retrieved at rank 2 (recall 0.25, rr 0.5)
        [(1, 10, 1), (2, 20, 1), (2, 21, 2)],
        [(1, 10), (2, 21), (2, 22), (2, 23), (2, 24)],
    )
    per_q = evaluate_run(run, qrels, k=5)
    row = summarize_eval(per_q).collect()[0]
    assert row.n_queries == 2
    assert row.macro_recall_micro == (1_000_000 + 250_000) // 2  # 625000
    assert row.micro_recall_micro == (1_000_000 * 2) // 5  # 400000
    assert row.mrr_micro == (1_000_000 + 500_000) // 2  # 750000


def test_k_validation(spark):
    run, qrels = _dfs(spark, [(1, 10, 1)], [(1, 10)])
    with pytest.raises(ValueError):
        evaluate_run(run, qrels, k=0)
