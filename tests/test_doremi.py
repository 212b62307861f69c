"""DoReMi domain reweighting (operators/doremi.py, round 11 —
VERDICT r10 task #7): bit-exact equality against a from-scratch
pure-Python Group-DRO implementation (the sanctioned rows-only
certification for iterative fits, like test_unigram.py), plus the
DRO behavior contracts — the domain furthest above its achievable
floor under the mixture is upweighted, a lone domain gets all the
mass, weights stay a distribution."""

from __future__ import annotations

import math
from collections import Counter

from nebuia_vector_db_spark.operators.doremi import (
    W_MICRO,
    doremi_weights,
    release_cached_relations,
)
from nebuia_vector_db_spark.operators.lm import LOG_MICRO


# ---------------------------------------------------------------- ref
def _ref_doremi(rows, n_rounds=5, eta=1.0, smoothing=1e-3):
    """From-scratch reference: rows = [(domain, text)]."""
    uni: Counter = Counter()
    big: Counter = Counter()
    for dom, text in rows:
        toks = [t for t in text.lower().split(" ") if t != ""]
        for w in toks:
            uni[(dom, w)] += 1
        for a, b in zip(toks, toks[1:]):
            big[(dom, a, b)] += 1
    # unigram domains (superset): zero-transition domains stay in the
    # weight vector with zero excess — mirrors doremi.py (ADVICE r11)
    domains = sorted({d for d, _ in uni})
    big_domains = {d for d, _, _ in big}
    k = len(domains)
    if k == 0:
        return []

    def q(p):
        return -math.floor(math.log(p) * LOG_MICRO + 0.5)

    # specialist floor
    ref = {}
    for d in big_domains:
        L = n = 0
        for (dd, a, b), c2 in big.items():
            if dd == d:
                L += c2 * q(big[(dd, a, b)] / uni[(dd, a)])
                n += c2
        ref[d] = (L, n)

    def mixture_losses(wm):
        c1w: Counter = Counter()
        c2w: Counter = Counter()
        for (d, w), c in uni.items():
            c1w[w] += c * wm[d]
        for (d, a, b), c in big.items():
            c2w[(a, b)] += c * wm[d]
        out = {}
        for d in big_domains:
            L = n = 0
            for (dd, a, b), c2 in big.items():
                if dd == d:
                    L += c2 * q(c2w[(a, b)] / c1w[a])
                    n += c2
            out[d] = (L, n)
        return out

    logw = {d: 0.0 for d in domains}
    alpha = {d: 1.0 / k for d in domains}
    history = []
    for _ in range(n_rounds):
        wm = {
            d: max(1, int(math.floor(alpha[d] * W_MICRO + 0.5)))
            for d in domains
        }
        cur = mixture_losses(wm)
        for d in domains:
            if d not in big_domains:
                continue  # zero-transition: zero excess
            L_p, n = cur[d]
            L_r, _ = ref[d]
            logw[d] += eta * (max(0, L_p - L_r) / n / LOG_MICRO)
        m = max(logw.values())
        exps = {d: math.exp(logw[d] - m) for d in domains}
        z = sum(exps.values())
        alpha = {
            d: (1.0 - smoothing) * (exps[d] / z) + smoothing / k
            for d in domains
        }
        history.append(dict(alpha))
    avg = {d: sum(h[d] for h in history) / len(history) for d in domains}
    return [
        (
            d,
            int(math.floor(avg[d] * W_MICRO + 0.5)),
            int(math.floor(alpha[d] * W_MICRO + 0.5)),
        )
        for d in domains
    ]


_CORPUS = (
    # 'web': large, repetitive, well-modeled by the mixture
    [("web", "the cat sat on the mat and the cat ran")] * 6
    + [("web", "the dog sat on the mat and the dog ran")] * 5
    # 'code': distinct vocabulary, medium size
    + [("code", "def f x return x plus one end def g y return y")] * 3
    + [("code", "for i in range n print i end for")] * 2
    # 'law': tiny and fully disjoint — worst served by the mixture
    + [("law", "whereas the party of the first part herein aforesaid")]
    + [("law", "notwithstanding herein aforesaid obligations persist")]
)


def _rows_to_df(spark, rows):
    return spark.createDataFrame(rows, "lang string, text string")


def test_matches_pure_python_reference(spark):
    got = sorted(
        tuple(r)
        for r in doremi_weights(
            _rows_to_df(spark, _CORPUS), domain_col="lang", n_rounds=4
        ).collect()
    )
    want = sorted(_ref_doremi(_CORPUS, n_rounds=4))
    release_cached_relations()
    assert got == want


def test_dro_behavior_contracts(spark):
    out = {
        r["domain"]: (r["weight_micro"], r["final_weight_micro"])
        for r in doremi_weights(
            _rows_to_df(spark, _CORPUS), domain_col="lang", n_rounds=4
        ).collect()
    }
    release_cached_relations()
    # a distribution (within quantization of the three floors)
    for col in (0, 1):
        assert abs(sum(v[col] for v in out.values()) - W_MICRO) <= 3
    # every domain keeps positive mass (the smoothing floor)
    assert all(v[0] > 0 for v in out.values())
    # the disjoint-vocabulary minority is the furthest above its
    # specialist floor under any mixture → DRO must upweight it most
    assert out["law"][0] == max(v[0] for v in out.values())
    # the dominant, internally-repetitive domain ends below uniform
    assert out["web"][0] < W_MICRO // 3


def test_single_domain_gets_all_mass(spark):
    rows = [("only", "a b a b a")] * 3
    got = doremi_weights(
        _rows_to_df(spark, rows), domain_col="lang", n_rounds=2
    ).collect()
    release_cached_relations()
    assert len(got) == 1
    assert got[0]["weight_micro"] == W_MICRO


def test_empty_and_degenerate_corpus(spark):
    empty = _rows_to_df(spark, [])
    assert doremi_weights(empty, domain_col="lang").count() == 0
    # a single-token domain has unigrams but NO bigrams: it must still
    # get a weight row (zero excess → smoothing-floor share), not be
    # silently dropped; a zero-token domain truly has no evidence
    shorty = _rows_to_df(spark, [("d1", "one"), ("d2", "")])
    rows = doremi_weights(shorty, domain_col="lang").collect()
    assert [r["domain"] for r in rows] == ["d1"]
    assert rows[0]["weight_micro"] == W_MICRO
    release_cached_relations()


def test_single_token_domain_keeps_smoothing_floor(spark):
    """ADVICE r11: a domain whose docs are all single-token must
    appear with the smoothing-mass floor, matching the reference."""
    rows = _CORPUS + [("tags", "x"), ("tags", "y"), ("tags", "x")]
    got = sorted(
        tuple(r)
        for r in doremi_weights(
            _rows_to_df(spark, rows), domain_col="lang", n_rounds=3
        ).collect()
    )
    want = sorted(_ref_doremi(rows, n_rounds=3))
    release_cached_relations()
    assert got == want
    by_dom = {d: w for d, w, _ in got}
    assert "tags" in by_dom and by_dom["tags"] > 0
