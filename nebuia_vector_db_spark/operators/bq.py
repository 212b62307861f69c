"""Binary quantization (BQ) — 1-bit sign codes at 32× compression.

The bottom rung of the ANN storage ladder the engine already exposes
(float32 → SQ8 int8 (operators/sq.py, 4×) → PQ/OPQ (operators/pq.py,
16-32× trained) → BQ, 64× vs float64 / 32× vs float32, training-free):
each dimension keeps only its sign bit, 64 bits pack into one int64
word, and the ±1 dot product collapses to popcount arithmetic:

    dot_pm1(a, b) = d - 2 * hamming(a, b)
                  = d - 2 * Σ_w bit_count(word_a[w] XOR word_b[w])

For the reference's 64-d embeddings (main.go:277-292 stores raw JSON
floats) one vector becomes ONE long — a 100 TB float32 embedding
column scans as ~3 TB of longs, and the scoring loop is XOR+POPCNT,
which Tungsten codegen compiles to the hardware instructions. Sign
cosine is Charikar's SimHash LSH estimator (STOC 2002): the expected
angle error makes raw BQ a shortlist generator, so `bq_topk_rerank`
re-scores the Hamming shortlist with exact cosine — the standard
two-stage design (shortlist on compressed codes, re-rank the
survivors on the raw column).

Everything is built-in JVM expressions — one codegen'd projection for
encode (`zip_with` + `shiftleft` + bitwise-OR fold), one for the
XOR/popcount score, then TakeOrderedAndProject; no shuffle, no
Python, no training. The sign rule is exactly ``x > 0`` (zero maps to
bit 0) in Spark, in the driver-side query encoder, and in the DuckDB
oracle, so `vs_bq_topk` is a full value-hash differential check.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WORD_BITS = 64


def encode_query_bits(qvec: Sequence[float]) -> list[int]:
    """Driver-side sign-pack of the query vector (a request parameter,
    ≙ the reference's request-body vector): word w bit j (LSB-first)
    = 1 iff qvec[w*64+j] > 0. Returns signed-int64 words (bit 63 set
    ⇒ negative), matching Spark's LongType wrap semantics."""
    words: list[int] = []
    for w in range(0, len(qvec), WORD_BITS):
        seg = qvec[w : w + WORD_BITS]
        word = 0
        for j, x in enumerate(seg):
            if x > 0:
                word |= 1 << j
        if word >= 1 << 63:  # to signed int64
            word -= 1 << 64
        words.append(word)
    return words


def _word_expr(vec_col: str, w: int) -> Column:
    """One packed word: slice dims [w*64, w*64+63], OR together
    ``shiftleft(1L, j)`` for every positive dim. SQL-text expression
    because pyspark's `shiftleft` only takes a literal shift; the SQL
    form accepts a column and stays inside whole-stage codegen."""
    return F.expr(
        f"aggregate("
        f"  zip_with("
        f"    slice(cast({vec_col} as array<double>), {w * WORD_BITS + 1},"
        f"          {WORD_BITS}),"
        f"    sequence(0, size(slice(cast({vec_col} as array<double>),"
        f"                           {w * WORD_BITS + 1}, {WORD_BITS})) - 1),"
        f"    (x, j) -> IF(x > 0D, shiftleft(1L, j), 0L)),"
        f"  0L, (a, b) -> a | b)"
    )


def bq_encode(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``bq_w0..bq_w{n-1}`` packed sign words (long), one per
    64 dims — map-side only, one projection, no shuffle. Flat long
    columns (not array<long>) so the scorer is plain integer XOR with
    no per-row array allocation, and parquet stores them as native
    INT64 pages with min/max stats."""
    if dim <= 0:
        raise ValueError("dim must be positive")
    nwords = math.ceil(dim / WORD_BITS)
    out = df
    for w in range(nwords):
        out = out.withColumn(f"bq_w{w}", _word_expr(vec_col, w))
    return out


def bq_similarity_bits(qwords: Sequence[int], dim: int) -> Column:
    """±1 dot product from packed words:
    ``dim - 2 * Σ_w bit_count(bq_w{w} XOR q_w)`` — an int column in
    [-dim, dim], monotone in sign-cosine. Pure integer codegen."""
    nwords = math.ceil(dim / WORD_BITS)
    if len(qwords) != nwords:
        raise ValueError(
            f"query has {len(qwords)} words, corpus dim {dim} needs {nwords}"
        )
    ham: Column = F.lit(0)
    for w, qw in enumerate(qwords):
        ham = ham + F.bit_count(
            F.col(f"bq_w{w}").bitwiseXOR(F.lit(int(qw)).cast("long"))
        )
    return (F.lit(dim) - F.lit(2) * ham).cast("int")


def bq_topk(
    df: DataFrame,
    qvec: Sequence[float],
    topk: int,
    vec_col: str = "embedding",
    tie_cols: Sequence[str] = ("vec_id",),
) -> DataFrame:
    """Top-k by packed-sign similarity (encode inline here; a real
    deployment writes the words once at ingest and the scan never
    touches the float column). Plan: scan → one projection (pack +
    XOR/popcount) → TakeOrderedAndProject — 0 shuffles."""
    dim = len(qvec)
    qwords = encode_query_bits(qvec)
    enc = bq_encode(df, dim=dim, vec_col=vec_col)
    scored = enc.withColumn("sim_bits", bq_similarity_bits(qwords, dim))
    return scored.orderBy(
        F.desc("sim_bits"), *[F.col(c) for c in tie_cols]
    ).limit(topk)


def bq_topk_rerank(
    df: DataFrame,
    qvec: Sequence[float],
    topk: int,
    rerank_k: int = 100,
    vec_col: str = "embedding",
    tie_cols: Sequence[str] = ("vec_id",),
) -> DataFrame:
    """Two-stage search: Hamming shortlist of ``rerank_k`` on the
    packed words, exact normalized-dot re-rank of the survivors on
    the raw column. At scale the shortlist pass reads 8 bytes/vector
    and the re-rank touches only ``rerank_k`` rows — the float column
    is fetched for a constant number of rows regardless of corpus
    size. Both stages are TakeOrderedAndProject (shortlist is a
    global top-N merge, re-rank sorts ≤ rerank_k driver-merged rows).

    Sizing ``rerank_k``: a d-bit code must cover the AMBIGUITY SET —
    the rows whose codes the estimator cannot separate from the true
    neighbors. On clustered data that set is the query's cluster
    (members share the center's sign pattern; bench B15 measured the
    worst true-top-10 Hamming rank at 4670 of 600k), so ``rerank_k``
    ≈ 1% of the corpus makes the two-stage search exact there, while
    ``rerank_k=100`` recalls almost nothing. Rule of thumb: set it to
    the expected cluster/tie mass, not a small constant."""
    from nebuia_vector_db_spark.functions.vector import (
        dot,
        normalize_query,
    )

    if rerank_k < topk:
        raise ValueError("rerank_k must be >= topk")
    short = bq_topk(
        df, qvec, rerank_k, vec_col=vec_col, tie_cols=tie_cols
    )
    qn = normalize_query(qvec)
    exact = short.withColumn("similarity", dot(vec_col, qn))
    return exact.orderBy(
        F.desc("similarity"), *[F.col(c) for c in tie_cols]
    ).limit(topk)
