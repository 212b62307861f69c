"""Skew/co-location utilities (operators/skew.py): salted join equals
plain join; bucketed tables join without a shuffle exchange."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.skew import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from nebuia_vector_db_spark.sources.registry import load_table


def test_salted_join_equals_plain_join(spark, sf_oracle):
    orders = load_table(spark, sf_oracle, "orders")
    cust = load_table(spark, sf_oracle, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = (
        orders.join(cust, ["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s"))
    )
    salted = (
        salted_join(orders, cust, ["o_custkey"], n_salts=8)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s"))
    )
    key = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert key(plain) == key(salted)


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_oracle):
    # managed tables land in the session's spark-warehouse; DROP TABLE
    # below removes the files (warehouse.dir is a static conf)
    li = load_table(spark, sf_oracle, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_oracle, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "t_li_b", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"])
    write_bucketed(
        orders, "t_ord_b", ["l_orderkey"], n_buckets=8, sort_cols=["l_orderkey"]
    )
    yield "t_li_b", "t_ord_b"
    spark.sql("DROP TABLE IF EXISTS t_li_b")
    spark.sql("DROP TABLE IF EXISTS t_ord_b")


def test_bucketed_join_no_shuffle_exchange(spark, bucketed_tables):
    """With broadcast disabled (forcing a sort-merge join — the shape
    a TB-scale fact⋈fact join takes), co-bucketed tables join with NO
    shuffle exchange on either side."""
    left, right = bucketed_tables
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, left, right, ["l_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located
        n = joined.count()
        assert (
            n
            == spark.table(left).join(spark.table(right), "l_orderkey").count()
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
