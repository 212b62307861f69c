"""CMS-shortlisted exact heavy hitters (operators/heavyhitters.py,
round 11): exact equality with brute force at any width (including
the degenerate width-1 sketch where everything collides), the
no-false-negative guarantee under forced collisions, the bounded
sketch cardinality, and the map-side shortlist plan shape. The
`text_heavy_ngrams` registry row additionally hash-certifies the
full pipeline against a plain GROUP-BY/HAVING DuckDB oracle."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.heavyhitters import (
    heavy_ngrams_exact,
)

_DOCS = [
    "the cat sat on the mat " * 12,
    "the dog sat on the log " * 9,
    "a completely different sentence appears exactly once",
    "the cat sat quietly",
    "",
    "single",
]


def _brute(docs, n, threshold):
    c: Counter = Counter()
    for text in docs:
        toks = [t for t in text.lower().split(" ") if t != ""]
        for i in range(len(toks) - n + 1):
            c["\x1f".join(toks[i : i + n])] += 1
    return {g: k for g, k in c.items() if k >= threshold}


def _df(spark):
    return spark.createDataFrame([(t,) for t in _DOCS], "text string")


def test_exact_equality_across_widths(spark):
    """The sketch is an accelerator: the answer must be bit-identical
    to brute force at a roomy width, a collision-heavy width, and
    the degenerate width=1 (every gram in one bucket — the plan
    degrades to naive counting but stays correct)."""
    docs = _df(spark)
    for n, threshold in ((2, 5), (3, 9)):
        want = _brute(_DOCS, n, threshold)
        for width in (4096, 8, 1):
            got = {
                r["gram"]: r["n_occurrences"]
                for r in heavy_ngrams_exact(
                    docs, n=n, threshold=threshold, width=width
                ).collect()
            }
            assert got == want, (n, threshold, width)


def test_sketch_cardinality_is_bounded(spark):
    """The sketch relation the corpus-wide shuffle carries has at
    most depth × width rows no matter the input."""
    from nebuia_vector_db_spark.operators.heavyhitters import _ngrams

    docs = _df(spark)
    toks = F.filter(
        F.split(F.lower(F.col("text")), " "), lambda t: t != ""
    )
    grams = docs.select(F.explode(_ngrams(toks, 2)).alias("gram"))
    width, depth = 8, 4
    cms = (
        grams.select(
            F.posexplode(
                F.array(
                    *[
                        F.pmod(
                            F.xxhash64(F.lit(j), "gram"), F.lit(width)
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("j", "bucket")
        )
        .groupBy("j", "bucket")
        .count()
    )
    assert cms.count() <= width * depth


def test_shortlist_is_broadcast_semi_joins(spark):
    """Plan shape: the candidate filter is depth broadcast LEFT-SEMI
    joins (map-side — no shuffle of the occurrence stream before the
    candidate-only exact groupBy), and no cartesian product."""
    from nebuia_vector_db_spark.plans.inspect import explain_str

    plan = explain_str(
        heavy_ngrams_exact(_df(spark), n=2, threshold=5, width=64)
    )
    assert plan.count("BroadcastHashJoin LeftSemi") == 4, plan
    assert "CartesianProduct" not in plan


def test_empty_and_short_docs(spark):
    docs = spark.createDataFrame([("",), ("one",)], "text string")
    assert heavy_ngrams_exact(docs, n=2, threshold=1).count() == 0
