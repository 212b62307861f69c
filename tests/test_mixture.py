"""Mixture-weighted epoch sampling (operators/pipeline.py::
sample_by_mixture, round 12 — VERDICT r11 stretch #7): exact quotas,
determinism under repartition, the skew-safe pre-cut's invisibility,
and the DoReMi → epoch composition. The `pipe_mixture_epoch` registry
row additionally hash-certifies quotas + md5 cutoffs vs DuckDB."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.pipeline import sample_by_mixture


def _docs(spark, sf):
    return spark.read.parquet(f"{sf}/documents.parquet")


WEIGHTS = {"en": 0.5, "zh": 0.05, "es": 0.15, "de": 0.15, "fr": 0.15}


def test_exact_quotas_and_cap(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    counts = {
        r[0]: r[1] for r in docs.groupBy("lang").count().collect()
    }
    out = sample_by_mixture(docs, WEIGHTS, epoch_size=400, seed=1)
    got = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    for d, w in WEIGHTS.items():
        assert got.get(d, 0) == min(
            int(math.floor(400 * w + 0.5)), counts.get(d, 0)
        ), d
    # sf0.001 'en' has fewer docs than its 200 quota — the cap path
    assert counts["en"] < 200 and got["en"] == counts["en"]


def test_member_set_is_md5_top_quota_and_repartition_stable(spark, sf_smoke):
    """The selected ids per domain are exactly the quota smallest by
    (md5 order key, id) — i.e. the pre-cut candidate machinery never
    changes the answer — and the epoch is identical at any
    parallelism."""
    docs = _docs(spark, sf_smoke)
    out = sample_by_mixture(docs, {"fr": 0.1}, epoch_size=200, seed=7)
    got = sorted(r["doc_id"] for r in out.collect())
    rows = (
        docs.where(F.col("lang") == "fr")
        .select(
            "doc_id",
            F.md5(F.concat(F.lit("7:"), F.col("doc_id").cast("string"))).alias("ok"),
        )
        .collect()
    )
    want = sorted(
        r["doc_id"]
        for r in sorted(rows, key=lambda r: (r["ok"], r["doc_id"]))[:20]
    )
    assert got == want
    again = sorted(
        r["doc_id"]
        for r in sample_by_mixture(
            docs.repartition(13), {"fr": 0.1}, epoch_size=200, seed=7
        ).collect()
    )
    assert again == got
    # tight pre-cut forced to widen: same answer through the retry
    narrow = sorted(
        r["doc_id"]
        for r in sample_by_mixture(
            docs, {"fr": 0.1}, epoch_size=200, seed=7, _safety=0.25
        ).collect()
    )
    assert narrow == got


def test_seed_changes_epoch_and_zero_cases(spark, sf_smoke):
    docs = _docs(spark, sf_smoke)
    e1 = {r["doc_id"] for r in sample_by_mixture(docs, {"en": 0.2}, 100, seed=1).collect()}
    e2 = {r["doc_id"] for r in sample_by_mixture(docs, {"en": 0.2}, 100, seed=2).collect()}
    assert e1 != e2 and len(e1) == len(e2) == 20
    assert sample_by_mixture(docs, {"xx": 1.0}, 100).count() == 0
    with pytest.raises(ValueError):
        sample_by_mixture(docs, {"en": 1.0}, 0)


def test_doremi_to_epoch_composition(spark):
    """Close the loop: optimized DoReMi weights drive the epoch — the
    materialized domain proportions equal the weight vector's quotas
    (the paper's step 3: train on the reweighted mixture)."""
    from nebuia_vector_db_spark.operators.doremi import (
        doremi_weights,
        release_cached_relations,
    )

    rows = (
        [("web", "the cat sat on the mat and the cat ran wide")] * 40
        + [("code", "def f x return x plus one end def g y")] * 30
        + [("law", "whereas the party of the first part herein")] * 30
    )
    docs = spark.createDataFrame(
        [(i, d, t) for i, (d, t) in enumerate(rows)],
        "doc_id long, lang string, text string",
    )
    wdf = doremi_weights(docs, domain_col="lang", n_rounds=3)
    weights = {
        r["domain"]: r["weight_micro"] / 1_000_000.0
        for r in wdf.collect()
    }
    release_cached_relations()
    epoch = sample_by_mixture(docs, weights, epoch_size=50, seed=3)
    got = {r[0]: r[1] for r in epoch.groupBy("lang").count().collect()}
    n_by_dom = {d: sum(1 for x in rows if x[0] == d) for d in weights}
    for d, w in weights.items():
        assert got.get(d, 0) == min(
            int(math.floor(50 * w + 0.5)), n_by_dom[d]
        ), d


def test_with_replacement_replicates_small_domains(spark, sf_smoke):
    """quota > |domain| replicates deterministically: quota // n full
    passes + the (quota % n) md5-smallest once more; copies of one doc
    sit |domain| apart in the read order; without-replacement would
    have capped."""
    docs = _docs(spark, sf_smoke)
    n_zh = docs.where(F.col("lang") == "zh").count()
    out = sample_by_mixture(
        docs, {"zh": 0.5}, epoch_size=400, seed=1, with_replacement=True
    ).cache()
    quota = 200
    assert out.count() == quota  # NOT capped at n_zh
    per_doc = {
        r["doc_id"]: r["cnt"]
        for r in out.groupBy("doc_id").agg(F.count("*").alias("cnt")).collect()
    }
    full, rem = quota // n_zh, quota % n_zh
    assert set(per_doc.values()) <= {full, full + 1}
    assert sum(1 for v in per_doc.values() if v == full + 1) == rem
    # epoch_rank is a permutation of 1..quota and copies cycle
    ranks = sorted(r["epoch_rank"] for r in out.collect())
    assert ranks == list(range(1, quota + 1))
    rows = out.where(F.col("copy_id") == 2).collect()
    assert all(r["epoch_rank"] > n_zh for r in rows)
    out.unpersist()
    # a domain whose quota fits is identical in both modes
    a = sorted(
        (r["doc_id"], r["epoch_rank"])
        for r in sample_by_mixture(
            docs, {"en": 0.2}, 100, seed=5, with_replacement=True
        ).collect()
    )
    b = sorted(
        (r["doc_id"], r["epoch_rank"])
        for r in sample_by_mixture(docs, {"en": 0.2}, 100, seed=5).collect()
    )
    assert a == b


def test_sqrt_mixture_quotas_and_tail_upweighting(spark):
    """sample_by_sqrt_mixture derives quotas from the corpus itself:
    w_micro = floor(sqrt(n_d)*1e6), S = sum(w_micro), quota =
    round-half-up(epoch*w/S) capped at |d| — pinned against a pure-
    Python recompute — and the tail domain's epoch share strictly
    exceeds its corpus share (the rebalancing the exponent exists
    for) while the head's share shrinks."""
    import math

    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.operators.pipeline import (
        sample_by_sqrt_mixture,
    )

    rows = [(i, "head" if i < 900 else "tail") for i in range(1000)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sample_by_sqrt_mixture(docs, epoch_size=100)
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    counts = {"head": 900, "tail": 100}
    wm = {d: math.floor(math.sqrt(float(n)) * 1_000_000) for d, n in counts.items()}
    s = sum(wm.values())
    want = {
        d: min((2 * 100 * w + s) // (2 * s), counts[d])
        for d, w in wm.items()
    }
    assert got == want
    assert got["tail"] / 100 > 0.10   # upweighted vs 10% corpus share
    assert got["head"] / 100 < 0.90   # head flattened
    # ranks are the md5-order cut, 1..quota per domain
    ranks = {
        r["lang"]: sorted(x["epoch_rank"] for x in out.where(
            F.col("lang") == r["lang"]).collect())
        for r in out.select("lang").distinct().collect()
    }
    for d, q in want.items():
        assert ranks[d] == list(range(1, q + 1))
