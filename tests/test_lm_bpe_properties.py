"""Hypothesis property tests for the round-9 corpus operators: on
randomly generated mini-corpora (tiny alphabets force heavy pair/
bigram collisions, the regime where tie-breaks and backoff edges
live), the distributed implementations must equal the from-scratch
pure-Python references from tests/test_bpe.py / tests/test_lm.py."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from nebuia_vector_db_spark.operators import bpe, lm
from tests.test_bpe import _ref_train

MICRO = lm.LOG_MICRO

# word-soup docs over a 3-letter alphabet: maximal merge collisions
_word = st.text(alphabet="abc", min_size=1, max_size=4)
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=10)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_bpe_train_equals_reference_on_random_corpora(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text: string")
    got = bpe.train_bpe(df, n_merges=4)
    assert got == _ref_train(texts, n_merges=4)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus, n_train=st.integers(min_value=1, max_value=5))
def test_perplexity_equals_reference_on_random_corpora(
    spark, texts, n_train
):
    rows = [(i, t, "en" if i < n_train else "xx") for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    train = [t for i, t, lang in rows if lang == "en"]
    uni, big = Counter(), Counter()
    for t in train:
        toks = [w for w in t.lower().split(" ") if w]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
    t_total, v = sum(uni.values()), len(uni)
    if t_total == 0:
        return  # operator rejects empty training corpora (unit-tested)

    from pyspark.sql import functions as F

    model = lm.train_bigram_lm(df.where(F.col("lang") == "en"))
    assert (model.total_tokens, model.vocab_size) == (t_total, v)
    got = {r["doc_id"]: r for r in lm.perplexity(df, model).collect()}
    for i, t, _ in rows:
        toks = [w for w in t.lower().split(" ") if w]
        if len(toks) < 2:
            assert i not in got
            continue
        nll = 0
        for w1, w2 in zip(toks, toks[1:]):
            if (w1, w2) in big:
                p = big[(w1, w2)] / uni[w1]
            else:
                p = 0.4 * ((uni.get(w2, 0) + 1) / (t_total + v))
            nll -= math.floor(math.log(p) * MICRO + 0.5)
        assert got[i]["nll_micro"] == nll
        assert got[i]["n_trans"] == len(toks) - 1


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus, terms=st.lists(_word, min_size=1, max_size=3))
def test_bm25_equals_reference_on_random_corpora(spark, texts, terms):
    from nebuia_vector_db_spark.operators.textvec import bm25_topk

    rows = [(i, t) for i, t in enumerate(texts)]
    toks = {
        i: [w for w in t.lower().split(" ") if w] for i, t in rows
    }
    sum_dl = sum(len(t) for t in toks.values())
    if sum_dl == 0:
        return  # operator rejects the empty corpus (unit-tested)
    n = len(toks)
    terms = sorted(set(terms))
    dfreq = Counter(
        w for t in toks.values() for w in set(t) if w in terms
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
    top = sorted(want, key=lambda d: (-want[d][1], d))[:5]

    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(df, terms, k=5).collect()
    assert [r["doc_id"] for r in got] == top
    for r in got:
        assert (r["n_terms_hit"], r["score_micro"]) == want[r["doc_id"]]


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus, n_train=st.integers(min_value=1, max_value=5))
def test_perplexity3_equals_reference_on_random_corpora(
    spark, texts, n_train
):
    rows = [(i, t, "en" if i < n_train else "xx") for i, t in enumerate(texts)]
    train = [t for i, t, lang in rows if lang == "en"]
    uni, big, tri = Counter(), Counter(), Counter()
    for t in train:
        toks = [w for w in t.lower().split(" ") if w]
        uni.update(toks)
        big.update(zip(toks, toks[1:]))
        tri.update(zip(toks, toks[1:], toks[2:]))
    t_total, v = sum(uni.values()), len(uni)
    if t_total == 0:
        return

    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    model = lm.train_trigram_lm(df.where(F.col("lang") == "en"))
    got = {r["doc_id"]: r for r in lm.perplexity3(df, model).collect()}
    for i, t, _ in rows:
        toks = [w for w in t.lower().split(" ") if w]
        if len(toks) < 3:
            assert i not in got
            continue
        nll = 0
        for w1, w2, w3 in zip(toks, toks[1:], toks[2:]):
            if (w1, w2, w3) in tri:
                p = tri[(w1, w2, w3)] / big[(w1, w2)]
            elif (w2, w3) in big:
                p = 0.4 * (big[(w2, w3)] / uni[w2])
            else:
                p = 0.4 * (0.4 * ((uni.get(w3, 0) + 1) / (t_total + v)))
            nll -= math.floor(math.log(p) * MICRO + 0.5)
        assert got[i]["nll_micro"] == nll
        assert got[i]["n_trans"] == len(toks) - 2


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus, n_train=st.integers(min_value=1, max_value=5))
def test_dsir_bigram_features_equal_reference_on_random_corpora(
    spark, texts, n_train
):
    from nebuia_vector_db_spark.operators.lm import FEATURE_SEP

    rows = [(i, t, "en" if i < n_train else "xx") for i, t in enumerate(texts)]
    raw, tgt = Counter(), Counter()
    feats_by_doc = {}
    for i, t, lang in rows:
        toks = [w for w in t.lower().split(" ") if w]
        fs = toks + [
            FEATURE_SEP.join(p) for p in zip(toks, toks[1:])
        ]
        feats_by_doc[i] = fs
        raw.update(fs)
        if lang == "en":
            tgt.update(fs)
    t_r, v, t_t = sum(raw.values()), len(raw), sum(tgt.values())
    if t_r == 0:
        return
    lw = {
        w: math.floor(
            math.log(
                ((tgt.get(w, 0) + 1) / (raw[w] + 1)) * ((t_r + v) / (t_t + v))
            )
            * MICRO
            + 0.5
        )
        for w in raw
    }

    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = lm.dsir_select(df, F.col("lang") == "en", top_n=3).collect()
    want = {
        i: (len(fs), sum(lw[w] for w in fs))
        for i, fs in feats_by_doc.items()
        if fs
    }
    assert {r["doc_id"] for r in got} == set(want)
    for r in got:
        assert (r["n_feats"], r["weight_micro"]) == want[r["doc_id"]]
