"""MLlib text vectorization (operators/textvec.py): TF-IDF features,
LSH cosine pairs vs exact recomputation, MinHash Jaccard pairs vs
exact token-set Jaccard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators.textvec import (
    minhash_jaccard_pairs_mllib,
    tfidf_cosine_pairs,
    tfidf_features,
)
from nebuia_vector_db_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents").limit(120).cache()


def test_tfidf_shapes_and_idf_weighting(docs):
    feats = tfidf_features(docs)
    rows = feats.collect()
    assert len(rows) == 120
    v = rows[0]["tfidf"]
    assert v.size == 1 << 14
    assert all(x >= 0 for x in v.values)


def test_lsh_cosine_pairs_subset_of_exact_and_values_match(docs):
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(docs, threshold=0.5).collect()
    }
    # exact recomputation driver-side from the same tfidf vectors
    feats = {r["doc_id"]: r["tfidf"].toArray() for r in tfidf_features(docs).collect()}
    ids = sorted(feats)
    exact = {}
    mat = np.vstack([feats[i] for i in ids])
    norm = np.linalg.norm(mat, axis=1)
    cos = (mat @ mat.T) / np.outer(norm, norm)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if cos[a, b] >= 0.5:
                exact[(ids[a], ids[b])] = cos[a, b]
    # LSH may miss pairs (approximate) but must not invent them, and
    # every reported cosine must equal the exact value
    assert set(got) <= set(exact)
    for k, v in got.items():
        assert abs(v - exact[k]) < 1e-6
    if exact:  # fixture has near-dups → recall shouldn't be zero
        assert len(got) > 0


def test_minhash_mllib_pairs_no_false_positives_vs_exact_token_jaccard(docs):
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_jaccard_pairs_mllib(docs, threshold=0.4).collect()
    }
    toks = {
        r["doc_id"]: set(r["t"])
        for r in docs.select(
            "doc_id", F.split(F.lower("text"), "\\s+").alias("t")
        ).collect()
    }
    for (a, b), j in got.items():
        sa, sb = toks[a], toks[b]
        exact_j = len(sa & sb) / len(sa | sb)
        # MLlib computes jaccard over hashed token sets: equal up to
        # rare hash collisions at 16k features
        assert abs(j - exact_j) < 0.05
        assert exact_j >= 0.3  # no wildly-wrong pair survives


def test_exact_tfidf_cosine_planted_pair(spark):
    from nebuia_vector_db_spark.operators.textvec import (
        exact_tfidf_cosine_pairs,
    )

    rows = [
        (0, "alpha beta gamma delta epsilon zeta"),
        (1, "alpha beta gamma delta epsilon zeta"),  # identical
        (2, "alpha beta gamma delta epsilon eta"),  # near
        (3, "totally different words here now ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["cosine"]
        for r in exact_tfidf_cosine_pairs(docs, threshold=0.5).collect()
    }
    assert abs(got[(0, 1)] - 1.0) < 1e-9  # identical docs → cosine 1
    assert (0, 2) in got and got[(0, 2)] < got[(0, 1)]
    assert all(3 not in p for p in got)


def test_minhash_verified_equals_exact_jaccard(spark):
    """minhash_jaccard_pairs_verified must emit exactly the pairs whose
    exact distinct-token jaccard clears the threshold (candidates come
    from MLlib LSH, membership from exact verification)."""
    from nebuia_vector_db_spark.operators.textvec import (
        minhash_jaccard_pairs_verified,
    )

    rows = [
        (0, "a b c d e f g h i j"),
        (1, "a b c d e f g h i k"),  # jaccard 9/11 ≈ 0.818
        (2, "a b c d e f g h i j"),  # exact dup of 0
        (3, "z y x w v u t s r q"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in minhash_jaccard_pairs_verified(docs, threshold=0.8).collect()
    }
    assert set(got) == {(0, 1), (0, 2), (1, 2)}
    assert abs(got[(0, 2)] - 1.0) < 1e-9
    assert abs(got[(0, 1)] - 9 / 11) < 1e-9


def test_hybrid_matches_vector_only_when_terms_absent(spark, sf_smoke):
    """With query terms that appear in no document the keyword side is
    0 everywhere, so the hybrid ranking must equal the pure vector
    cosine ranking over the same joined corpus."""
    from nebuia_vector_db_spark.functions.vector import (
        dot,
        l2_norm,
        normalize_query,
    )
    from nebuia_vector_db_spark.operators.hybrid import hybrid_search
    from nebuia_vector_db_spark.queries import FIXED_Q, load_table

    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    got = hybrid_search(docs, emb, ["zzzznotaword"], FIXED_Q, k=5).collect()
    assert all(r["kw_cos"] == 0.0 for r in got)

    qn = normalize_query(FIXED_Q)
    want = (
        emb.join(docs.select("doc_id"), emb.vec_id == docs.doc_id)
        .select(
            "doc_id",
            (dot("embedding", qn) / l2_norm("embedding")).alias("c"),
        )
        .orderBy(F.desc("c"), "doc_id")
        .limit(5)
        .collect()
    )
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


def test_hybrid_keyword_component_requires_term_presence(spark, sf_smoke):
    from nebuia_vector_db_spark.operators.hybrid import hybrid_search
    from nebuia_vector_db_spark.queries import FIXED_Q, load_table

    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    terms = ["vector", "join"]
    got = hybrid_search(docs, emb, terms, FIXED_Q, k=10).collect()
    texts = {
        r["doc_id"]: r["text"].lower().split()
        for r in docs.select("doc_id", "text").collect()
    }
    for r in got:
        has_term = any(t in texts[r["doc_id"]] for t in terms)
        assert (r["kw_cos"] > 0.0) == has_term
        # fusion bookkeeping: score is the exact mean of the quantized parts
        assert abs(r["score"] * 2 - (r["vec_cos"] + r["kw_cos"])) < 1e-12


def test_text_index_persist_round_trip_serves_hybrid(spark, sf_smoke, tmp_path):
    """save_text_index → load_text_index → hybrid_search(index=...)
    must return exactly the inline-computed result (the persisted
    weights/norms are the same relation, so scores are bit-identical)."""
    from nebuia_vector_db_spark.operators.hybrid import hybrid_search
    from nebuia_vector_db_spark.operators.textvec import (
        load_text_index,
        save_text_index,
    )
    from nebuia_vector_db_spark.queries import FIXED_Q, load_table

    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    terms = ["vector", "join", "scan"]

    save_text_index(docs, str(tmp_path / "tidx"))
    idx = load_text_index(spark, str(tmp_path / "tidx"))

    inline = hybrid_search(docs, emb, terms, FIXED_Q, k=10).collect()
    indexed = hybrid_search(
        docs, emb, terms, FIXED_Q, k=10, index=idx
    ).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in indexed]


def test_bm25_matches_python_recomputation(spark, sf_smoke):
    """bm25_topk vs a from-scratch float recompute: same ranking and
    micro-unit scores (the quantization contract the oracle relies
    on)."""
    import math
    from collections import Counter

    from nebuia_vector_db_spark.operators.textvec import bm25_topk
    from nebuia_vector_db_spark.queries import load_table

    docs = load_table(spark, sf_smoke, "documents")
    terms = ["vector", "join", "scan"]
    rows = docs.select("doc_id", "text").collect()
    toks = {
        r["doc_id"]: [w for w in r["text"].lower().split(" ") if w]
        for r in rows
    }
    n = len(toks)
    sum_dl = sum(len(t) for t in toks.values())
    dfreq = Counter(
        term for t in toks.values() for term in set(t) if term in terms
    )
    want = {}
    for d, t in toks.items():
        tf = Counter(w for w in t if w in terms)
        if not tf:
            continue
        s = 0
        for term, f in tf.items():
            idf = math.log(
                ((n - dfreq[term]) + 0.5) / (dfreq[term] + 0.5) + 1.0
            )
            denom = f + (
                1.2 * ((1.0 - 0.75) + (0.75 * ((len(t) * n) / sum_dl)))
            )
            s += math.floor(idf * ((f * (1.2 + 1.0)) / denom) * 1e6 + 0.5)
        want[d] = (len(tf), s)
    top = sorted(want, key=lambda d: (-want[d][1], d))[:15]

    got = bm25_topk(docs, terms, k=15).collect()
    assert [r["doc_id"] for r in got] == top
    for r in got:
        assert (r["n_terms_hit"], r["score_micro"]) == want[r["doc_id"]]


def test_bm25_length_normalization_prefers_shorter_doc(spark):
    """Same tf, shorter doc => higher BM25 (the b-term working)."""
    from nebuia_vector_db_spark.operators.textvec import bm25_topk

    df = spark.createDataFrame(
        [
            (1, "apple banana"),
            (2, "apple banana pad pad pad pad pad pad pad pad"),
        ],
        "doc_id long, text string",
    )
    got = bm25_topk(df, ["apple"], k=2).collect()
    assert [r["doc_id"] for r in got] == [1, 2]
    assert got[0]["score_micro"] > got[1]["score_micro"]


def test_bm25_rrf_fusion_semantics(spark, sf_smoke):
    """BM25+kNN RRF: score decomposition and absent-signal zeros."""
    from nebuia_vector_db_spark.operators.hybrid import rrf_search_bm25
    from nebuia_vector_db_spark.queries import FIXED_Q, load_table

    docs = load_table(spark, sf_smoke, "documents")
    emb = load_table(spark, sf_smoke, "embeddings")
    got = rrf_search_bm25(
        docs, emb, ["vector", "join"], FIXED_Q, k=10, n_cand=50
    ).collect()
    assert len(got) == 10
    for r in got:
        want = 0.0
        if r["rank_vec"] is not None:
            want += 1.0 / (60.0 + r["rank_vec"])
        if r["rank_kw"] is not None:
            want += 1.0 / (60.0 + r["rank_kw"])
        assert abs(r["rrf_score"] - want) < 1e-15
    # descending fused order with doc_id tie-break
    keys = [(-r["rrf_score"], r["doc_id"]) for r in got]
    assert keys == sorted(keys)
