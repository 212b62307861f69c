"""Physical-plan inspection — the feedback loop for scale discipline.

The reference has no plans to inspect (SURVEY.md §4 — handlers
interpret requests directly); on Spark the physical plan IS the
performance contract, so we make it assertable:

- filters reached the parquet scan (``PushedFilters``),
- column pruning reached the scan (``ReadSchema``),
- small dims actually broadcast (``BroadcastHashJoin``),
- how many shuffles a plan pays (``Exchange`` count),
- whole-stage codegen coverage.

Tests pin these for the headline queries so a regression that silently
de-optimizes a plan (e.g. a UDF blocking pushdown, a join falling back
to sort-merge) fails CI — at sf0.01 the timing wouldn't notice, but at
100 TB it's the difference between pruning and a full scan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def _executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filters(df: DataFrame, *needles: str) -> bool:
    """True iff the plan shows non-empty PushedFilters mentioning every
    needle (column names, typically)."""
    text = explain_str(df)
    m = re.findall(r"PushedFilters: \[([^\]]+)\]", text)
    joined = " ".join(m)
    if not joined.strip():
        return False
    return all(n in joined for n in needles)

def scan_read_schema(df: DataFrame) -> list[str]:
    """Top-level fields each file scan reads (column-pruning check);
    one entry per scan, e.g. ``['struct<vec_id:bigint,embedding:...>']``."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", explain_str(df))


def has_broadcast_join(df: DataFrame) -> bool:
    """True if any join broadcasts a side (hash for equi-joins,
    nested-loop for the crossJoin(broadcast(...)) kNN pattern)."""
    plan = _executed_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges the (pre-AQE) plan pays. Broadcast
    exchanges don't count — they ship a small side, not the data."""
    plan = _executed_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def wholestage_codegen_count(df: DataFrame) -> int:
    """Subtrees fused by whole-stage codegen (AQE's executedPlan hides
    the markers pre-execution, so ask the codegen explain directly)."""
    m = re.search(
        r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, "codegen")
    )
    return int(m.group(1)) if m else 0


def plan_asserts(
    df: DataFrame,
    pushed: tuple[str, ...] = (),
    broadcast: bool | None = None,
    max_shuffles: int | None = None,
    contains: tuple[str, ...] = (),
) -> None:
    """Assert a bundle of plan properties; raises AssertionError with
    the full plan text on failure (used by tests/test_plans.py)."""
    problems = []
    if pushed and not has_pushed_filters(df, *pushed):
        problems.append(f"filters {pushed} not pushed to scan")
    if broadcast is True and not has_broadcast_join(df):
        problems.append("expected a BroadcastHashJoin")
    if broadcast is False and has_broadcast_join(df):
        problems.append("unexpected BroadcastHashJoin")
    if max_shuffles is not None:
        n = shuffle_count(df)
        if n > max_shuffles:
            problems.append(f"{n} shuffles > allowed {max_shuffles}")
    plan = _executed_plan(df)
    for c in contains:
        if c not in plan:
            problems.append(f"plan missing {c!r}")
    if problems:
        raise AssertionError(
            "; ".join(problems) + "\n--- plan ---\n" + explain_str(df)
        )
