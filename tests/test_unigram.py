"""Unigram-LM tokenizer (operators/unigram.py) vs a from-scratch
pure-Python reference: seeding, the soft-EM E-step contract, the full
training pipeline, and the Viterbi encoder. Mirrors tests/test_bpe.py
for the sibling trainer."""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from nebuia_vector_db_spark.operators import unigram
from nebuia_vector_db_spark.sources.registry import load_table

MPL = 6  # max piece length used throughout the tests


@pytest.fixture(scope="module")
def docs(spark, sf_smoke):
    return load_table(spark, sf_smoke, "documents").limit(60).cache()


def _py_word_counts(rows, max_words=None):
    wc = Counter()
    for r in rows:
        for w in (r["text"] or "").lower().split(" "):
            if w:
                wc[w] += 1
    items = sorted(wc.items(), key=lambda t: (-t[1], t[0]))
    if max_words is not None:
        items = items[:max_words]
    return dict(items)


def _py_seed(wc, seed_size, mpl):
    counts = Counter()
    for w, c in wc.items():
        for i in range(len(w)):
            for n in range(1, min(mpl, len(w) - i) + 1):
                counts[w[i : i + n]] += c
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) >= 2),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    return {**chars, **dict(multi)}


def _py_marginals(word, p, mpl):
    """Literal replay of the documented forward-backward contract."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        s = 0.0
        for j in range(max(0, i - mpl), i):
            piece = word[j:i]
            if piece in p and alpha[j] > 0.0:
                s += alpha[j] * p[piece]
        alpha[i] = s
    if alpha[n] <= 0.0:
        return {}
    beta = [0.0] * (n + 1)
    beta[n] = 1.0
    for i in range(n - 1, -1, -1):
        s = 0.0
        for j in range(i + 1, min(n, i + mpl) + 1):
            piece = word[i:j]
            if piece in p and beta[j] > 0.0:
                s += p[piece] * beta[j]
        beta[i] = s
    out = {}
    for i in range(n):
        for j in range(i + 1, min(n, i + mpl) + 1):
            piece = word[i:j]
            if piece in p and alpha[i] > 0.0 and beta[j] > 0.0:
                out[piece] = out.get(piece, 0.0) + (
                    alpha[i] * p[piece] * beta[j] / alpha[n]
                )
    return out


def _py_train(rows, vocab_size, seed_size, n_em, mpl, max_words):
    wc = _py_word_counts(rows, max_words)
    seed = _py_seed(wc, seed_size, mpl)
    total0 = sum(seed.values())
    logp = {p: math.log(c / total0) for p, c in seed.items()}
    chars = {p for p in seed if len(p) == 1}
    counts: dict[str, int] = {}
    for _ in range(n_em):
        pr = {k: math.exp(v) for k, v in logp.items()}
        counts = {}
        for w, c in wc.items():
            for piece, ec in _py_marginals(w, pr, mpl).items():
                q = math.floor(ec * unigram.EM_UNITS + 0.5)
                if q:
                    counts[piece] = counts.get(piece, 0) + q * c
        total = sum(counts.values())
        if total == 0:
            break
        logp = {
            p: math.log(max(counts.get(p, 0), 1) / total) for p in logp
        }
    multi = sorted(
        ((counts.get(p, 0), p) for p in logp if len(p) > 1),
        key=lambda t: (-t[0], t[1]),
    )
    keep = chars | {
        p for _, p in multi[: max(vocab_size - len(chars), 0)]
    }
    kept_total = sum(max(counts.get(p, 0), 1) for p in keep)
    final = [
        (
            p,
            int(
                math.floor(
                    math.log(max(counts.get(p, 0), 1) / kept_total)
                    * unigram.EM_UNITS
                    + 0.5
                )
            ),
        )
        for p in keep
    ]
    final.sort(key=lambda t: (-t[1], t[0]))
    return final


def test_seed_vocab_matches_reference(spark, docs):
    wc_df = unigram.word_counts(docs)
    got = {
        r["piece"]: r["seed_count"]
        for r in unigram.seed_vocab(wc_df, seed_size=200, max_piece_len=MPL)
        .collect()
    }
    rows = docs.select("text").collect()
    want = _py_seed(_py_word_counts(rows), 200, MPL)
    assert got == want


def test_marginals_cover_every_position_exactly_once():
    """Lattice invariant: expected counts weighted by piece length sum
    to the word length (each character is covered by exactly one
    piece in every segmentation)."""
    p = {"a": 0.3, "b": 0.2, "ab": 0.1, "ba": 0.05, "abab": 0.01}
    m = unigram.word_marginals("ababab", p, MPL)
    covered = sum(ec * len(piece) for piece, ec in m.items())
    assert abs(covered - 6.0) < 1e-9


def test_train_matches_python_reference_exactly(spark, docs):
    got = unigram.train_unigram(
        docs, vocab_size=150, seed_size=200, n_em=2,
        max_piece_len=MPL, max_words=5000,
    )
    rows = docs.select("text").collect()
    want = _py_train(rows, 150, 200, 2, MPL, 5000)
    assert got == want
    # determinism: a second distributed run is bit-identical
    again = unigram.train_unigram(
        docs, vocab_size=150, seed_size=200, n_em=2,
        max_piece_len=MPL, max_words=5000,
    )
    assert again == got


def test_encode_covers_text_and_matches_viterbi(spark, docs):
    vocab = unigram.train_unigram(
        docs, vocab_size=150, seed_size=200, n_em=1,
        max_piece_len=MPL, max_words=5000,
    )
    logp = {p: lp / unigram.EM_UNITS for p, lp in vocab}
    out = unigram.encode_unigram(
        docs.limit(10), vocab, max_piece_len=MPL
    ).select("text", "unigram_tokens").collect()
    for r in out:
        words = [w for w in (r["text"] or "").lower().split(" ") if w]
        want = [
            p for w in words
            for p in unigram.viterbi_segment(w, logp, MPL)
        ]
        assert r["unigram_tokens"] == want
        # lossless coverage: pieces concatenate back to the words
        assert "".join(r["unigram_tokens"]) == "".join(words)


def test_viterbi_unknown_char_fallback():
    logp = {"a": -1.0, "b": -2.0, "ab": -2.5}
    assert unigram.viterbi_segment("aXb", logp, MPL) == ["a", "X", "b"]
    # ties prefer the longer piece: p(ab) == p(a)+p(b) exactly
    tie = {"a": -1.0, "b": -1.5, "ab": -2.5}
    assert unigram.viterbi_segment("ab", tie, MPL) == ["ab"]


def test_vocab_artifact_round_trip(spark, docs, tmp_path):
    vocab = unigram.train_unigram(
        docs, vocab_size=80, seed_size=100, n_em=1,
        max_piece_len=MPL, max_words=2000,
    )
    path = str(tmp_path / "uni_vocab")
    unigram.save_vocab(spark, vocab, path)
    assert unigram.load_vocab(spark, path) == vocab


def test_registry_row_shape(spark, sf_smoke):
    from nebuia_vector_db_spark.queries import REGISTRY

    fn, sql = REGISTRY["text_unigram_train"]
    assert sql is None  # sanctioned rows-only (iterative EM)
    df = fn(spark, sf_smoke)
    assert df.columns == ["rank", "piece", "logprob_micro"]
    rows = df.limit(5).collect()
    assert rows and rows[0]["rank"] == 0
