"""As-of join (operators/asof.py) edge semantics: no-match nulls,
equal-timestamp match, tolerance, multi-key isolation."""

from __future__ import annotations

import datetime as dt

from nebuia_vector_db_spark.operators.asof import asof_join


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_basic_backward_match_and_no_match(spark):
    left = _mk(
        spark,
        [(1, _ts(9)), (1, _ts(12)), (2, _ts(10))],
        "k long, ts timestamp",
    )
    right = _mk(
        spark,
        [(1, _ts(10), 100.0), (1, _ts(11), 200.0), (2, _ts(11), 300.0)],
        "k long, ts timestamp, v double",
    )
    out = {
        (r["k"], r["ts"]): (r["v_matched"], r["ts_matched"])
        for r in asof_join(left, right, on=["k"], value_cols=["v"]).collect()
    }
    assert out[(1, _ts(9))] == (None, None)  # nothing at-or-before
    assert out[(1, _ts(12))] == (200.0, _ts(11))  # latest of the two
    assert out[(2, _ts(10))] == (None, None)  # right is later


def test_equal_timestamp_matches(spark):
    left = _mk(spark, [(1, _ts(10))], "k long, ts timestamp")
    right = _mk(spark, [(1, _ts(10), 5.0)], "k long, ts timestamp, v double")
    [row] = asof_join(left, right, on=["k"], value_cols=["v"]).collect()
    assert row["v_matched"] == 5.0


def test_tolerance_voids_stale_matches(spark):
    left = _mk(spark, [(1, _ts(12))], "k long, ts timestamp")
    right = _mk(spark, [(1, _ts(9), 1.0)], "k long, ts timestamp, v double")
    [fresh] = asof_join(
        left, right, on=["k"], value_cols=["v"], tolerance_us=4 * 3600 * 1_000_000
    ).collect()
    assert fresh["v_matched"] == 1.0
    [stale] = asof_join(
        left, right, on=["k"], value_cols=["v"], tolerance_us=3600 * 1_000_000
    ).collect()
    assert stale["v_matched"] is None


def test_keys_do_not_leak(spark):
    left = _mk(spark, [(1, _ts(12)), (2, _ts(12))], "k long, ts timestamp")
    right = _mk(spark, [(1, _ts(10), 7.0)], "k long, ts timestamp, v double")
    out = {
        r["k"]: r["v_matched"]
        for r in asof_join(left, right, on=["k"], value_cols=["v"]).collect()
    }
    assert out == {1: 7.0, 2: None}


def test_row_count_preserved(spark):
    left = _mk(
        spark, [(1, _ts(h)) for h in range(1, 13)], "k long, ts timestamp"
    )
    right = _mk(
        spark,
        [(1, _ts(h), float(h)) for h in (3, 6, 9)],
        "k long, ts timestamp, v double",
    )
    out = asof_join(left, right, on=["k"], value_cols=["v"])
    assert out.count() == 12
