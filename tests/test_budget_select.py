"""Budget-constrained selection (operators/pipeline.py::budget_select,
round 12): exact equivalence with the naive global prefix on brute
force, boundary/tie behavior, degenerate budgets, and the all-fits
shortcut. The pipe_budget_select registry row additionally
hash-certifies the bracket machinery against a DuckDB window-cumsum
replay."""

from __future__ import annotations

from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.pipeline import budget_select


def _brute(rows, budget):
    kept, cum = [], 0
    for did, sc, tk in sorted(rows, key=lambda r: (-r[1], r[0])):
        if cum + tk > budget:
            break
        kept.append(did)
        cum += tk
    return sorted(kept)


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, score_micro long, n_tokens long"
    )


def test_equals_naive_prefix_on_real_scores(spark, sf_oracle):
    from nebuia_vector_db_spark.functions import text as text_fns

    docs = spark.read.parquet(f"{sf_oracle}/documents.parquet")
    toked = text_fns.with_tokens(docs)
    scored = toked.select(
        "doc_id",
        F.size("_toks").cast("long").alias("n_tokens"),
        F.floor(
            text_fns.quality_score("text") * F.lit(1_000_000) + F.lit(0.5)
        ).cast("long").alias("score_micro"),
    )
    rows = [
        (r["doc_id"], r["score_micro"], r["n_tokens"])
        for r in scored.collect()
    ]
    for budget in (0, 500, 8000, 20_000):
        got = sorted(
            r["doc_id"]
            for r in budget_select(scored, budget_tokens=budget).collect()
        )
        assert got == _brute(rows, budget), budget
    # all-fits shortcut
    total = sum(t for _, _, t in rows)
    assert budget_select(scored, budget_tokens=total).count() == len(rows)


def test_tie_mass_and_boundary_partial_exclusion(spark):
    """Heavy ties at the boundary score: the id tie-break decides which
    tie members fit, and a document that would overflow the budget is
    excluded even if later smaller docs would fit (prefix semantics,
    not knapsack)."""
    rows = (
        [(i, 100, 10) for i in range(20)]          # tie block
        + [(100, 200, 25), (101, 150, 7)]           # strictly better
        + [(200, 50, 1)]                            # below boundary
    )
    df = _mk(spark, rows)
    got = sorted(
        r["doc_id"] for r in budget_select(df, budget_tokens=75).collect()
    )
    # 25 + 7 = 32, then tie ids 0,1,2,3 add 40 -> 72; id 4 would hit 82
    assert got == _brute(rows, 75) == [0, 1, 2, 3, 100, 101]
    # degenerate: ALL rows share one score -> whole-relation band
    flat = _mk(spark, [(i, 7, 10) for i in range(50)])
    got2 = sorted(
        r["doc_id"] for r in budget_select(flat, budget_tokens=95).collect()
    )
    assert got2 == list(range(9))
    # zero budget
    assert budget_select(df, budget_tokens=0).count() == 0
