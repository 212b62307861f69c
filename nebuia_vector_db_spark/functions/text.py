"""Text-analysis expression builders (all JVM-side, codegen-friendly).

Token model: whitespace-split (the oracle mirrors ``string_split``);
shingles are n-token windows joined with a 0x1f separator. Everything
here returns Column expressions — no Python UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SHINGLE_SEP = "\x1f"

# small deterministic stopword list shared with the SQL oracles
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


def tokens(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.split(text, " ")


def with_tokens(df, text_col: str = "text", tokens_col: str = "_toks"):
    """Materialize the token array ONCE behind a projection barrier.

    Without the barrier, Catalyst's CollapseProject inlines the
    ``split()`` into every ``element_at`` of a downstream shingle
    lambda — re-tokenizing the document O(n_shingles) times (measured
    8× slower at sf0.1). The nondeterministic ``rand()`` column blocks
    the collapse; callers drop it implicitly by selecting past it.
    """
    return df.withColumn(tokens_col, tokens(text_col)).withColumn(
        "_prj_barrier", F.rand(seed=0)
    )


def shingles_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles from a *materialized* token-array
    column (see with_tokens). One codegen'd expression, no explode."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    # guard: sequence(1, stop) DESCENDS when stop < 1, which would
    # index past the array — docs shorter than n tokens get no shingles
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    built = F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(
                SHINGLE_SEP, *[F.element_at(toks, i + j) for j in range(n)]
            ),
        )
    )
    return F.when(F.size(toks) >= n, built).otherwise(
        F.array().cast("array<string>")
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct n-token shingles as array<string> (expression form —
    for hot paths over many rows prefer with_tokens +
    shingles_from_tokens, which tokenizes once per document)."""
    return shingles_from_tokens(tokens(text), n)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def stopword_ratio(text: Column | str) -> Column:
    toks = tokens(text)
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return n_stop.cast("double") / F.size(toks)


def alpha_ratio(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.length(F.regexp_replace(text, "[^a-z]", "")).cast(
        "double"
    ) / F.length(text)


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    return total.cast("double") / F.size(toks)


def repetition_ratio_from_tokens(toks: Column | str, n: int = 3) -> Column:
    """Fraction of repeated n-grams: 1 − distinct/total over the doc's
    n-token shingles (0.0 for docs shorter than n tokens). High values
    flag boilerplate/looped generations — a standard LLM-corpus quality
    filter alongside stopword/alpha ratios.

    Takes a *materialized* token-array column (see with_tokens): passing
    a raw ``split()`` expression here lets CollapseProject inline the
    tokenizer into every ``element_at`` of the shingle lambda —
    measured 14× slower on the quality query at sf0.1."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            SHINGLE_SEP, *[F.element_at(toks, i + j) for j in range(n)]
        ),
    )
    total = F.size(toks) - (n - 1)
    dup = (total - F.size(F.array_distinct(grams))).cast("double") / total
    return F.when(F.size(toks) >= n, dup).otherwise(F.lit(0.0))


def repetition_ratio(text: Column | str, n: int = 3) -> Column:
    """Expression form of :func:`repetition_ratio_from_tokens` — for
    hot paths over many rows tokenize once via with_tokens and use the
    _from_tokens variant instead."""
    return repetition_ratio_from_tokens(tokens(text), n)


def quality_score(text: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length saturation +
    stopword balance + alphabetic purity. Mirrored exactly by the SQL
    oracle (sequential arithmetic only)."""
    n = token_count(text).cast("double")
    return (
        F.lit(0.5) * F.least(n / F.lit(50.0), F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - stopword_ratio(text))
        + F.lit(0.25) * alpha_ratio(text)
    )


# language-ID heuristic: script/diacritic detection, first match wins.
# (The fixture corpus is ASCII word soup, so this predicts 'en' there —
# the rule set is still exercised end-to-end and mirrored in SQL.)
_LANG_RULES = [
    ("zh", "[一-鿿]"),
    ("es", "[áéíóúñ¿¡]"),
    ("de", "[äöüß]"),
    ("fr", "[àâçèêëîïôùûœ]"),
]


def lang_id(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    expr = F.lit("en")
    for lang, pattern in reversed(_LANG_RULES):
        expr = F.when(text.rlike(pattern), F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the lowercased,
    whitespace-collapsed text — identical in any engine with md5."""
    text = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(text), "\\s+", " "))


# BPE-ish subword model: greedy pieces of up to 4 letters, digits as
# single tokens, any other non-space char as one token. A stand-in with
# the same *shape* as a real BPE count (subword-regex over the text) —
# deterministic and mirrored by the oracle's regexp_extract_all.
BPE_PIECE_RE = "[A-Za-z]{1,4}|[0-9]|[^A-Za-z0-9\\s]"


def bpe_token_count(text: Column | str) -> Column:
    """Estimated LLM-token count: number of BPE-ish piece matches
    (≈ chars/4 for prose — the usual back-of-envelope)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(BPE_PIECE_RE), 0))


def boilerplate_stats(
    postings,
    min_df: int = 5,
    id_col: str = "_id",
):
    """Per-document boilerplate exposure from a shingle posting list
    (operators/dedup.py::shingle_postings — distinct shingles per doc).

    A shingle is *boilerplate* when its document frequency reaches
    ``min_df`` (headers, footers, nav chrome, license blurbs — the
    CCNet/RefinedWeb-style signal). Returns per doc the distinct
    shingle count, how many are boilerplate, and the ratio — the
    filter knob a training pipeline thresholds on.

    Two shuffles at any scale: one groupBy on shingle for the df
    counts, then (join back on the same shingle key — co-partitioned,
    AQE coalesces) one groupBy on the doc id. Never all-pairs; the
    postings relation is shared with the dedup tiers so the corpus is
    tokenized once per session (queries.py::_shared_postings).
    """
    dfreq = postings.groupBy("shingle").agg(F.count("*").alias("_df"))
    return (
        postings.join(dfreq, "shingle")
        .groupBy(F.col(id_col).alias("doc_id"))
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(
                F.when(F.col("_df") >= min_df, 1).otherwise(0)
            ).alias("n_boiler"),
        )
        .withColumn(
            "boiler_ratio_raw",
            F.col("n_boiler") / F.col("n_shingles"),
        )
    )
