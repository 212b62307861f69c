"""Distributed unigram-LM tokenizer training + encoding (Kudo 2018,
"Subword Regularization: Improving Neural Network Translation Models
with Multiple Subword Candidates" — the SentencePiece unigram model),
the sibling of operators/bpe.py (VERDICT r9 task #7).

The reference engine (main.go:25-75) has no tokenizer; this completes
the LLM-pipeline vocabulary tier: BPE learns a merge table bottom-up,
the unigram model starts from a LARGE seed vocabulary and prunes it
under an EM-fitted piece distribution — the tokenizer family used by
T5/ALBERT/XLNet and SentencePiece's default.

Faithful subset and its honesty line: seed vocabulary = the most
frequent substrings (the paper's suffix-array seeding, expressed as a
bounded substring explode); fitting = full SOFT EM with per-word
forward-backward marginals (not hard Viterbi-EM); pruning = drop the
lowest-expected-count pieces down to ``vocab_size`` while keeping
every single character (the paper prunes by likelihood loss — the
expected-count criterion is its first-order surrogate and is stated
as such, the same scope discipline as multimodal/h264.py).

Distributed shape (the 100 TB posture, mirroring bpe.py):

- **One corpus-scale shuffle, total** — the word-count collapse
  (bpe.word_counts, map-side combined). Everything else runs over
  the distinct-word relation (~10^8 rows at 100 TB, not 10^13).
- **Seeding**: one substring explode over the word relation (each
  word emits O(len·max_piece_len) pieces weighted by wc, map-side
  combined groupBy) + a TakeOrdered(seed_size) cut — no global sort.
- **Per EM iteration**: ONE Arrow-batched mapInPandas pass over the
  word relation computing per-word piece marginals against the
  BROADCAST vocab, one map-side-combined groupBy(piece) integer sum,
  and a driver-side M-step over the bounded vocab (the model is the
  artifact, like streaming/quality.py's LM).
- **Encoding**: per-word Viterbi against the broadcast vocab in an
  Arrow-batched pandas UDF with an LRU word cache (Zipf makes the
  hit rate extreme), identical to bpe.encode_bpe's shape.

Determinism discipline: expected counts are quantized per (word,
piece) to 1e-6 micro-units and multiplied by the INTEGER word
frequency before the distributed sum, so aggregation order cannot
change the totals (queries.py::_dsum's recipe); the per-word
forward-backward itself fixes its summation order (start position
ascending) so a from-scratch reference replays it bit-for-bit
(tests/test_unigram.py). All tie-breaks are total orders: seeding on
(count desc, piece asc), pruning on (expected count desc, piece asc),
Viterbi on (score, segment-start desc) with exact float comparison.

The registry row ``text_unigram_train`` is rows-only-checked by the
driver (iterative EM is the sanctioned non-SQL-expressible case, like
``text_bpe_train``); the pure-Python-reference tests certify the
seed, the EM totals, the pruned vocabulary and the encoder instead.
"""

from __future__ import annotations

import math
from functools import lru_cache

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from nebuia_vector_db_spark.operators.bpe import word_counts

EM_UNITS = 1_000_000  # expected-count quantization (micro-units)


# ------------------------------------------------------------- seeding
def seed_vocab(
    words: DataFrame, seed_size: int, max_piece_len: int = 8
) -> DataFrame:
    """(piece, seed_count): the ``seed_size`` most frequent substrings
    of length 2..max_piece_len by summed word frequency, UNION all
    single characters (which are never pruned — they guarantee every
    word stays encodable). One explode + map-side-combined groupBy +
    TakeOrdered; ties break (count desc, piece asc)."""
    pieces = words.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(
                        F.lit(1), F.length("word")
                    ),  # start (1-based)
                    lambda i: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.least(
                                F.lit(max_piece_len),
                                F.length("word") - i + 1,
                            ),
                        ),
                        lambda n: F.substring(F.col("word"), i, n),
                    ),
                )
            )
        ).alias("piece"),
        F.col("wc"),
    ).groupBy("piece").agg(F.sum("wc").alias("seed_count"))
    chars = pieces.where(F.length("piece") == 1)
    multi = (
        pieces.where(F.length("piece") >= 2)
        .orderBy(F.col("seed_count").desc(), "piece")
        .limit(seed_size)
    )
    return chars.unionAll(multi)


# ------------------------------------------- per-word lattice (shared)
def word_marginals(
    word: str, p: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Soft-EM E-step for ONE word: expected count of each vocabulary
    piece under the unigram segmentation posterior, via
    forward-backward over the position lattice. ``p`` maps piece →
    PROBABILITY (exp of the model logprob, converted once per batch,
    not per word).

    THE CONTRACT REPLAYED BY THE REFERENCE TESTS: alpha[i] (prob of
    prefix ending at i) sums candidate start positions j ASCENDING;
    beta symmetrically sums end positions ascending; the marginal of
    an edge (j, i, piece) is alpha[j]·p·beta[i]/alpha[n]. All math in
    probability domain (documents' whitespace words are short enough
    that doubles cannot underflow)."""
    n = len(word)
    alpha = [0.0] * (n + 1)
    alpha[0] = 1.0
    for i in range(1, n + 1):
        s = 0.0
        for j in range(max(0, i - max_piece_len), i):
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
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            piece = word[i:j]
            if piece in p and beta[j] > 0.0:
                s += p[piece] * beta[j]
        beta[i] = s
    z = alpha[n]
    out: dict[str, float] = {}
    for i in range(n):
        for j in range(i + 1, min(n, i + max_piece_len) + 1):
            piece = word[i:j]
            if piece in p and alpha[i] > 0.0 and beta[j] > 0.0:
                out[piece] = out.get(piece, 0.0) + (
                    alpha[i] * p[piece] * beta[j] / z
                )
    return out


def viterbi_segment(
    word: str,
    logp: dict[str, float],
    max_piece_len: int,
    floor: float | None = None,
) -> list[str]:
    """Best segmentation by total logprob; ties prefer the LONGER
    candidate piece at each position (deterministic, and matches the
    'fewest pieces' intuition). Unknown characters fall back to
    single-char pieces with a floor logprob so encoding is total."""
    n = len(word)
    if floor is None:
        floor = min(logp.values(), default=0.0) - 20.0
    best = [(-math.inf, -1)] * (n + 1)
    best[0] = (0.0, -1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            if best[j][0] == -math.inf:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                lp = floor if i - j == 1 else None
            if lp is None:
                continue
            score = best[j][0] + lp
            # strict >: earlier j = longer piece wins ties (j ascends)
            if score > best[i][0]:
                best[i] = (score, j)
    out: list[str] = []
    i = n
    while i > 0:
        j = best[i][1]
        out.append(word[j:i])
        i = j
    return out[::-1]


# ------------------------------------------------------------ training
def train_unigram(
    docs: DataFrame,
    vocab_size: int,
    seed_size: int = 2000,
    n_em: int = 2,  # >= 1 (the E-step counts feed the pruning)
    max_piece_len: int = 8,
    text_col: str = "text",
    max_words: int | None = 50_000,
) -> list[tuple[str, int]]:
    """Train the unigram vocabulary; returns [(piece, logprob_micro)]
    sorted by (logprob_micro desc, piece) — the persistable artifact
    (driver-bounded: ≤ seed_size + alphabet rows at every step).

    Per EM round: broadcast {piece: logprob} → one mapInPandas pass
    over the word relation emitting micro-unit-quantized expected
    counts × word frequency → integer groupBy sum → driver M-step
    (logprob = ln(count/total) over the bounded vocab). After EM,
    prune to ``vocab_size`` keeping all single chars."""
    if n_em < 1:
        raise ValueError("train_unigram needs n_em >= 1")
    spark = docs.sparkSession
    words = word_counts(docs, text_col, max_words=max_words)
    words = words.localCheckpoint()
    seed = seed_vocab(words, seed_size, max_piece_len).collect()
    total0 = sum(r["seed_count"] for r in seed)
    logp = {
        r["piece"]: math.log(r["seed_count"] / total0) for r in seed
    }
    chars = {r["piece"] for r in seed if len(r["piece"]) == 1}

    out_schema = "piece string, ec long"

    for _ in range(n_em):
        b_logp = spark.sparkContext.broadcast(logp)
        mpl = max_piece_len

        def _estep(batches):
            pr = {k: math.exp(v) for k, v in b_logp.value.items()}
            for pdf in batches:
                acc: dict[str, int] = {}
                for word, wc in zip(pdf["word"], pdf["wc"]):
                    for piece, ec in word_marginals(
                        word, pr, mpl
                    ).items():
                        q = math.floor(ec * EM_UNITS + 0.5)
                        if q:
                            acc[piece] = acc.get(piece, 0) + q * int(wc)
                yield pd.DataFrame(
                    {"piece": list(acc), "ec": list(acc.values())}
                )

        counts = {
            r["piece"]: r["ec"]
            for r in words.mapInPandas(_estep, out_schema)
            .groupBy("piece")
            .agg(F.sum("ec").alias("ec"))
            .collect()
        }
        # M-step over the bounded vocab: keep chars alive even at 0
        total = sum(counts.values())
        if total == 0:
            b_logp.unpersist()  # degenerate-corpus break must not leak
            break
        logp = {
            piece: math.log(max(counts.get(piece, 0), 1) / total)
            for piece in logp
        }
        b_logp.unpersist()

    # prune: all single chars + top multi-char pieces by expected
    # count (ties piece asc); counts from the LAST E-step
    multi = sorted(
        ((counts.get(p, 0), p) for p in logp if len(p) > 1),
        key=lambda t: (-t[0], t[1]),
    )
    keep = chars | {p for _, p in multi[: max(vocab_size - len(chars), 0)]}
    kept_total = sum(max(counts.get(p, 0), 1) for p in keep)
    final = [
        (
            p,
            int(
                math.floor(
                    math.log(max(counts.get(p, 0), 1) / kept_total)
                    * EM_UNITS
                    + 0.5
                )
            ),
        )
        for p in keep
    ]
    final.sort(key=lambda t: (-t[1], t[0]))
    return final


# ------------------------------------------------------------ artifact
def vocab_df(spark: SparkSession, vocab: list[tuple[str, int]]) -> DataFrame:
    return spark.createDataFrame(
        [(i, p, lp) for i, (p, lp) in enumerate(vocab)],
        "rank int, piece string, logprob_micro long",
    )


def save_vocab(
    spark: SparkSession, vocab: list[tuple[str, int]], path: str
) -> None:
    vocab_df(spark, vocab).coalesce(1).write.mode("overwrite").parquet(path)


def load_vocab(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    rows = spark.read.parquet(path).orderBy("rank").collect()
    return [(r["piece"], r["logprob_micro"]) for r in rows]


# ------------------------------------------------------------ encoding
def encode_unigram(
    docs: DataFrame,
    vocab: list[tuple[str, int]],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi tokenization with a trained vocabulary: Arrow-batched
    pandas UDF, broadcast-sized logprob dict, LRU word cache — the
    encode_bpe shape. Adds ``out_col`` (array<string>)."""
    logp = {p: lp / EM_UNITS for p, lp in vocab}
    floor = min(logp.values(), default=0.0) - 20.0

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(texts: pd.Series) -> pd.Series:
        @lru_cache(maxsize=65536)
        def enc_word(w: str) -> tuple[str, ...]:
            return tuple(viterbi_segment(w, logp, max_piece_len, floor))

        return texts.map(
            lambda t: [
                p
                for w in (t or "").lower().split(" ")
                if w
                for p in enc_word(w)
            ]
        )

    return docs.withColumn(out_col, _enc(F.col(text_col)))
