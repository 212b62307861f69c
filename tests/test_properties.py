"""Property-based invariants (SURVEY.md §5-4, hypothesis): for random
vectors/dims/k the engine must return sorted exact top-k that matches a
NumPy recomputation, and the multi-collection path must equal the
filtered unified table."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nebuia_vector_db_spark.operators.topk import topk_search


def _corpus_df(spark, mat):
    return spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=40),
    dim=st.integers(min_value=1, max_value=16),
    k=st.integers(min_value=1, max_value=50),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_topk_invariants(spark, n, dim, k, seed):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    q = rng.normal(size=dim)
    rows = topk_search(
        _corpus_df(spark, mat), q.tolist(), k, tie_cols=["vec_id"]
    ).collect()

    # |results| == min(k, n)
    assert len(rows) == min(k, n)
    # sorted desc (D-1) with deterministic ties (D-2)
    sims = [r["similarity"] for r in rows]
    assert sims == sorted(sims, reverse=True)
    # every similarity equals the NumPy recomputation within 1e-9
    qn = q / (np.linalg.norm(q) or 1.0)
    expect = mat @ qn
    for r in rows:
        assert abs(r["similarity"] - expect[r["vec_id"]]) < 1e-9
    # the k-th result dominates everything not returned
    returned = {r["vec_id"] for r in rows}
    if len(rows) == k and n > k:
        kth = min(sims)
        rest_max = max(expect[i] for i in range(n) if i not in returned)
        assert kth >= rest_max - 1e-9


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_union_of_collections_equals_filtered_table(spark, seed):
    from pyspark.sql import functions as F

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(30, 8))
    df = spark.createDataFrame(
        [(i, row.tolist(), int(i % 3)) for i, row in enumerate(mat)],
        "vec_id long, embedding array<double>, coll int",
    )
    q = rng.normal(size=8).tolist()
    unified = topk_search(
        df.where(F.col("coll").isin(0, 1)), q, 7, tie_cols=["vec_id"]
    ).collect()
    parts = df.where(F.col("coll") == 0).unionAll(df.where(F.col("coll") == 1))
    unioned = topk_search(parts, q, 7, tie_cols=["vec_id"]).collect()
    assert [(r["vec_id"], round(r["similarity"], 9)) for r in unified] == [
        (r["vec_id"], round(r["similarity"], 9)) for r in unioned
    ]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n=st.integers(min_value=1, max_value=30),
    dim=st.integers(min_value=1, max_value=130),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_bq_pack_and_score_invariants(spark, n, dim, seed):
    """For random n/dim (incl. multi-word and partial-tail dims) the
    packed-word ±1 score must equal the NumPy sign-dot exactly, obey
    |s| <= dim, and satisfy the parity invariant s ≡ dim (mod 2)."""
    from nebuia_vector_db_spark.operators.bq import (
        bq_encode,
        bq_similarity_bits,
        encode_query_bits,
    )

    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, dim))
    q = rng.normal(size=dim)
    qwords = encode_query_bits(q)
    rows = (
        bq_encode(_corpus_df(spark, mat), dim=dim)
        .withColumn("sim_bits", bq_similarity_bits(qwords, dim))
        .orderBy("vec_id")
        .collect()
    )
    qs = np.where(q > 0, 1, -1)
    for r in rows:
        ref = int(np.where(mat[r["vec_id"]] > 0, 1, -1) @ qs)
        assert r["sim_bits"] == ref
        assert abs(r["sim_bits"]) <= dim
        assert (r["sim_bits"] - dim) % 2 == 0


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_tpch_q21_window_rewrite_matches_exists_replay(
    spark, tmp_path_factory, seed
):
    """The q21 windowed rewrite (≥2 distinct suppliers, exactly one
    distinct LATE supplier) must equal the textbook correlated
    EXISTS / NOT-EXISTS semantics on random order/line/supplier data —
    covering edge cases the fixed fixture can't reach (all-late
    orders, single-supplier orders, no 'F' orders at all)."""
    import pandas as pd

    from nebuia_vector_db_spark import queries as Q

    rng = np.random.default_rng(seed)
    n_supp, n_ord, n_li = 6, 25, 120
    supp = pd.DataFrame(
        {
            "s_suppkey": np.arange(n_supp),
            "s_name": [f"S{i:03d}" for i in range(n_supp)],
            "s_nationkey": np.zeros(n_supp, dtype=np.int64),
            "s_acctbal": np.zeros(n_supp),
        }
    )
    base = pd.Timestamp("1995-01-01")
    odate = [
        base + pd.Timedelta(days=int(d))
        for d in rng.integers(0, 1000, n_ord)
    ]
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n_ord),
            "o_orderdate": odate,
            "o_orderstatus": rng.choice(["F", "O", "P"], n_ord),
        }
    )
    ok = rng.integers(0, n_ord, n_li)
    li = pd.DataFrame(
        {
            "l_orderkey": ok,
            "l_suppkey": rng.integers(0, n_supp, n_li),
            # day-aligned so Spark's datediff (date-truncating) and the
            # pandas replay agree exactly
            "l_shipdate": [
                odate[k] + pd.Timedelta(days=int(d))
                for k, d in zip(ok, rng.integers(0, 800, n_li))
            ],
        }
    )
    d = tmp_path_factory.mktemp("q21prop")
    supp.to_parquet(d / "supplier.parquet", coerce_timestamps="us")
    orders.to_parquet(d / "orders.parquet", coerce_timestamps="us")
    li.to_parquet(d / "lineitem.parquet", coerce_timestamps="us")

    got = {
        (r["s_name"], r["numwait"])
        for r in Q.q_tpch_q21(spark, str(d)).collect()
    }

    # brute-force correlated EXISTS / NOT-EXISTS replay
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
    j = j[j.o_orderstatus == "F"].copy()
    j["late"] = (j.l_shipdate - j.o_orderdate).dt.days > 365
    counts: dict[int, int] = {}
    for _, r in j[j.late].iterrows():
        grp = j[j.l_orderkey == r.l_orderkey]
        others = grp[grp.l_suppkey != r.l_suppkey]
        if len(others) and not others.late.any():
            counts[r.l_suppkey] = counts.get(r.l_suppkey, 0) + 1
    expect = {(f"S{k:03d}", v) for k, v in counts.items()}
    assert got == expect
