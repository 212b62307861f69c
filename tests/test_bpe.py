"""Distributed BPE training/encoding (operators/bpe.py) vs a
from-scratch pure-Python Sennrich reference: merge tables must match
exactly (counts, order, tie-breaks), encode must replay the merges,
and the training loop must stay distributed (word relation, argmax
collect only)."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators import bpe
from nebuia_vector_db_spark.sources.registry import load_table

EOW = bpe.END_OF_WORD


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents").limit(80).cache()


# ---------------------------------------------------------- reference
def _ref_word_counts(texts):
    c = Counter()
    for t in texts:
        c.update(w for w in t.lower().split(" ") if w)
    return c


def _ref_train(texts, n_merges, min_pair_count=2):
    wc = _ref_word_counts(texts)
    words = {w: list(w) + [EOW] for w in wc}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        if not pc:
            break
        # max count, ties broken (left, right) lexicographic ascending
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((rank, a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges


def _ref_encode(text, merges):
    ranks = {(a, b): r for r, a, b, _ in merges}
    out = []
    for w in text.lower().split(" "):
        if not w:
            continue
        syms = list(w) + [EOW]
        while len(syms) >= 2:
            cand = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not cand:
                break
            _, i = min(cand)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        out.extend(syms)
    return out


# -------------------------------------------------------------- tests
def test_merge_table_matches_reference_exactly(spark, docs):
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _ref_train(texts, n_merges=30)
    got = bpe.train_bpe(docs, n_merges=30)
    assert got == want
    # merges actually learned something beyond single chars
    assert any(len(m[1]) > 1 or len(m[2]) > 1 for m in got)


def test_merge_expr_left_to_right_non_overlapping(spark):
    df = spark.createDataFrame(
        [(["a", "a", "b"],), (["a", "b", "a", "b"],), (["a"],),
         (["a", "a", "a"],)],
        "syms: array<string>",
    )
    out = [
        r["m"]
        for r in df.select(
            bpe._merge_expr(F.col("syms"), "a", "b").alias("m")
        ).collect()
    ]
    assert out == [["a", "ab"], ["ab", "ab"], ["a"], ["a", "a", "a"]]
    out2 = [
        r["m"]
        for r in df.select(
            bpe._merge_expr(F.col("syms"), "a", "a").alias("m")
        ).collect()
    ]
    # "a a a" -> [aa, a]: L2R non-overlap, merged symbol not re-matched
    assert out2 == [["aa", "b"], ["a", "b", "a", "b"], ["a"], ["aa", "a"]]


def test_early_stop_on_min_pair_count(spark):
    df = spark.createDataFrame([("x y z w",)], "text: string")
    # every pair occurs once -> no merge reaches min_pair_count=2
    assert bpe.train_bpe(df, n_merges=10) == []


def test_max_words_truncation_deterministic(spark, docs):
    full = bpe.train_bpe(docs, n_merges=10)
    trunc = bpe.train_bpe(docs, n_merges=10, max_words=50)
    # same algorithm, possibly different counts — but both deterministic
    assert trunc == bpe.train_bpe(docs, n_merges=10, max_words=50)
    assert len(trunc) <= 10 and len(full) <= 10


def test_encode_matches_reference_and_roundtrips_text(spark, docs):
    texts = [r["text"] for r in docs.select("text").limit(20).collect()]
    merges = bpe.train_bpe(docs, n_merges=25)
    enc = bpe.encode_bpe(docs.limit(20), merges).select(
        "text", "bpe_tokens"
    ).collect()
    for r in enc:
        assert list(r["bpe_tokens"]) == _ref_encode(r["text"], merges)
        # lossless: concatenating pieces re-spells the normalized text
        joined = "".join(r["bpe_tokens"]).replace(EOW, " ").strip()
        want = " ".join(w for w in r["text"].lower().split(" ") if w)
        assert joined == want


def test_word_counts_single_shuffle_plan(spark, sf_smoke):
    # plan pinned on the un-limited table: the docs fixture's limit()
    # injects its own GlobalLimit/SinglePartition exchange
    full = load_table(spark, sf_smoke, "documents")
    plan = (
        bpe.word_counts(full)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1  # one hash-partitioned groupBy
    assert "SinglePartition" not in plan
    assert "partial_count" in plan  # map-side combine before the shuffle


def test_merge_table_persist_round_trip(spark, docs, tmp_path):
    merges = bpe.train_bpe(docs, n_merges=12)
    bpe.save_merges(spark, merges, str(tmp_path / "bpe"))
    loaded = bpe.load_merges(spark, str(tmp_path / "bpe"))
    assert loaded == merges
    # the loaded artifact drives the encoder identically
    a = bpe.encode_bpe(docs.limit(5), merges).select("bpe_tokens").collect()
    b = bpe.encode_bpe(docs.limit(5), loaded).select("bpe_tokens").collect()
    assert [r["bpe_tokens"] for r in a] == [r["bpe_tokens"] for r in b]
