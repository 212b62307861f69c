"""Invariant tests for the events analytics family (funnel, cohort
retention, gap-filled hourly resample) — the structural properties a
hash-differential can't express (monotonicity, density, conservation).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nebuia_vector_db_spark.queries import (
    load_table,
    q_events_funnel,
    q_events_hourly,
    q_events_retention,
)


def test_funnel_counts_are_monotone_non_increasing(spark, sf_smoke):
    rows = {
        r["stage"]: r["n_users"]
        for r in q_events_funnel(spark, sf_smoke).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1] >= rows[2] >= rows[3]
    assert rows[1] > 0  # the fixture has viewers


def test_funnel_respects_event_order(spark, sf_smoke):
    """Stage-2 membership must require a click strictly AFTER the
    user's first view — replay one qualifying user end-to-end."""
    ev = load_table(spark, sf_smoke, "events")
    firsts = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    ordered_clickers = (
        ev.where(F.col("event_type") == "click")
        .join(firsts, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .select("user_id")
        .distinct()
        .count()
    )
    got = {
        r["stage"]: r["n_users"]
        for r in q_events_funnel(spark, sf_smoke).collect()
    }
    assert got[2] == ordered_clickers


def test_retention_offset_zero_covers_every_cohort_user(spark, sf_smoke):
    """Every user is active in their own cohort week by definition, so
    the offset-0 cells must sum to the distinct-user count and every
    cohort must have an offset-0 row."""
    ev = load_table(spark, sf_smoke, "events")
    n_users = ev.select("user_id").distinct().count()
    ret = q_events_retention(spark, sf_smoke).collect()
    zero = [r for r in ret if r["week_offset"] == 0]
    assert sum(r["n_users"] for r in zero) == n_users
    cohorts = {r["cohort_week_epoch"] for r in ret}
    assert {r["cohort_week_epoch"] for r in zero} == cohorts
    assert all(r["week_offset"] >= 0 for r in ret)


def test_hourly_gap_fill_is_dense_and_conserves_counts(spark, sf_smoke):
    out = q_events_hourly(spark, sf_smoke)
    ev = load_table(spark, sf_smoke, "events")
    # dense: exactly (hours in span) x (types), no holes
    agg = out.agg(
        F.countDistinct("hour_epoch").alias("nh"),
        F.countDistinct("event_type").alias("nt"),
        F.count("*").alias("n"),
        F.sum("n").alias("total"),
    ).first()
    assert agg["n"] == agg["nh"] * agg["nt"]
    # conservation: zero-filling must not invent or drop events
    assert agg["total"] == ev.count()
    # the spine really fills gaps: some zero rows exist at smoke scale
    assert out.where(F.col("n") == 0).count() > 0
