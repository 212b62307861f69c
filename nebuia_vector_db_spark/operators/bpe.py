"""Distributed BPE tokenizer training + encoding (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units";
encode follows the GPT-2 rank-priority variant, Radford et al. 2019).

The reference engine (main.go:25-75) has no tokenizer; this is the
LLM-pipeline extension's vocabulary-training tier — the real form of
what functions/text.py::bpe_token_count approximates with a regex.

Distributed shape (the 100 TB posture):

- **One corpus-scale shuffle, total.** BPE statistics only depend on
  the (word, frequency) relation, so the first step collapses the
  corpus with a map-side-combined ``groupBy(word).count()``. Every
  merge iteration after that runs over the distinct-word relation —
  orders of magnitude smaller than the corpus (a 100 TB web corpus
  has ~10^8 distinct words, not 10^13 tokens).
- **Per merge iteration**: one pair-count aggregation over the word
  relation (explode adjacent symbol pairs weighted by word frequency
  — map-side combine again) + a TakeOrdered(1) argmax, then a
  JVM-side higher-order-function fold rewrites the symbol arrays
  (no Python in the loop). The word relation is localCheckpoint()ed
  each round to keep the plan tree flat across iterations.
- **``max_words``** frequency-truncates the word relation before
  training — the SentencePiece/production move (training on the top
  words changes counts negligibly and bounds iteration cost); the
  truncation is a deterministic top-N by (count desc, word asc).
- **Encoding** broadcasts the merge ranks and applies the standard
  rank-priority loop per word inside an Arrow-batched pandas UDF with
  an LRU word cache (word→pieces is a pure function, and Zipf's law
  makes the cache hit rate extreme).

Training is deterministic end to end: ties in pair counts break on
(left, right) lexicographically, the word truncation on (count desc,
word). The registry row ``text_bpe_train`` is rows-only-checked by
the driver (iterative argmax + resegmentation is not expressible in
one SQL statement); tests/test_bpe.py certifies the merge table and
the encoder against a from-scratch pure-Python reference instead.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

END_OF_WORD = "</w>"


def word_counts(
    docs: DataFrame, text_col: str = "text", max_words: int | None = None
) -> DataFrame:
    """(word, wc): lowercased whitespace vocabulary with frequencies —
    the ONE corpus-scale aggregation in BPE training. ``max_words``
    keeps the top-N by (wc desc, word asc); at any corpus size this
    is a TakeOrdered, not a global sort."""
    w = (
        docs.select(
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), " "),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )
    if max_words is not None:
        w = w.orderBy(F.col("wc").desc(), "word").limit(max_words)
    return w


def _initial_symbols(word: Column) -> Column:
    """word -> [c1, c2, ..., cn, '</w>'] (the Sennrich end-of-word
    marker as its own symbol, so merges can learn suffixes). Java's
    split("", -1) keeps a trailing zero-width match, so empties are
    filtered explicitly."""
    return F.concat(
        F.filter(F.split(word, ""), lambda c: c != ""),
        F.array(F.lit(END_OF_WORD)),
    )


def _merge_expr(syms: Column, left: str, right: str) -> Column:
    """Replace adjacent (left, right) with left+right, one
    left-to-right non-overlapping pass — the Sennrich merge step as a
    JVM-side fold (no Python). Accumulator carries (out, pending):
    pending is the symbol that may still start a match."""
    merged = left + right
    zero = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("pend"),
    )

    def step(acc, s):
        is_match = acc["pend"].eqNullSafe(F.lit(left)) & (s == F.lit(right))
        out = F.when(
            is_match, F.concat(acc["out"], F.array(F.lit(merged)))
        ).otherwise(
            F.when(
                acc["pend"].isNull(), acc["out"]
            ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))
        )
        pend = F.when(is_match, F.lit(None).cast("string")).otherwise(s)
        return F.struct(out.alias("out"), pend.alias("pend"))

    def finish(acc):
        return F.when(
            acc["pend"].isNull(), acc["out"]
        ).otherwise(F.concat(acc["out"], F.array(acc["pend"])))

    return F.aggregate(syms, zero, step, finish)


def train_bpe(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
    max_words: int | None = None,
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(rank, left, right,
    pair_count)] in merge order. Stops early when no pair reaches
    ``min_pair_count`` (merging singleton pairs just memorizes
    words). The loop state (the word relation) stays distributed;
    only the single argmax row is collected per iteration."""
    words = word_counts(docs, text_col, max_words).withColumn(
        "syms", _initial_symbols(F.col("word"))
    )
    words = words.select("wc", "syms").localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        # guard: sequence(1, stop) DESCENDS when stop < 1 (the repo's
        # recurring trap — see functions/text.py) and fully-merged
        # words have a single symbol, so they contribute no pairs
        pair_arr = F.when(
            F.size("syms") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("syms") - 1),
                lambda i: F.struct(
                    F.element_at("syms", i).alias("left"),
                    F.element_at("syms", i + 1).alias("right"),
                ),
            ),
        ).otherwise(
            F.array().cast("array<struct<left:string,right:string>>")
        )
        pairs = words.select("wc", F.explode(pair_arr).alias("pair"))
        best = (
            pairs.groupBy("pair.left", "pair.right")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "left", "right")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_pair_count:
            break
        left, right, cnt = best[0]["left"], best[0]["right"], int(best[0]["cnt"])
        merges.append((rank, left, right, cnt))
        words = words.select(
            "wc", _merge_expr(F.col("syms"), left, right).alias("syms")
        ).localCheckpoint()
    return merges


def merges_df(spark, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    """Merge table as a DataFrame (the persistable model artifact)."""
    return spark.createDataFrame(
        merges, schema="rank LONG, left STRING, right STRING, pair_count LONG"
    )


def save_merges(
    spark, merges: list[tuple[int, str, str, int]], path: str
) -> None:
    """Persist the merge table as parquet — train once, tokenize any
    corpus/session against the artifact (the same deployment shape as
    textvec.save_text_index and streaming/quality.py's LM artifact)."""
    merges_df(spark, merges).write.mode("overwrite").parquet(path)


def load_merges(spark, path: str) -> list[tuple[int, str, str, int]]:
    """Load a persisted merge table, in merge order."""
    rows = (
        spark.read.schema(
            "rank LONG, left STRING, right STRING, pair_count LONG"
        )
        .parquet(path)
        .orderBy("rank")
        .collect()
    )
    return [
        (int(r["rank"]), r["left"], r["right"], int(r["pair_count"]))
        for r in rows
    ]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """GPT-2-style encode: repeatedly merge the LOWEST-rank adjacent
    pair until none applies. For merge tables produced by train_bpe
    this equals replaying the merges in order (rank order is merge
    order)."""
    syms = list(word) + [END_OF_WORD]
    while len(syms) >= 2:
        best_rank, best_i = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode_bpe(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize with a trained merge table: Arrow-batched pandas UDF,
    broadcast-sized ranks dict, LRU cache over the (Zipf-skewed)
    word→pieces function. Adds ``out_col`` (array<string>)."""
    ranks = {(m[1], m[2]): m[0] for m in merges}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _enc(texts: pd.Series) -> pd.Series:
        @lru_cache(maxsize=65536)
        def enc_word(w: str) -> tuple[str, ...]:
            return tuple(_encode_word(w, ranks))

        return texts.map(
            lambda t: [
                p
                for w in (t or "").lower().split(" ")
                if w
                for p in enc_word(w)
            ]
        )

    return docs.withColumn(out_col, _enc(F.col(text_col)))
