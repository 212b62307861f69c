"""MLlib text vectorization + approximate similarity joins
(SURVEY.md §2.3: Tokenizer/HashingTF/IDF, approxSimilarityJoin).

These wrap Spark MLlib's distributed implementations — the
"use the platform" counterpart to the hand-rolled LSH in dedup.py
(both are kept: dedup.py's banding is exact-verified and
oracle-checkable; MLlib's approxSimilarityJoin is the one-liner a
production pipeline reaches for first).

Scale notes: HashingTF is stateless map-side hashing (no vocabulary
shuffle, fixed ``n_features`` — the property that makes it work at
100 TB where CountVectorizer's vocab build would be its own job);
IDF is one treeAggregate; approxSimilarityJoin joins on LSH bucket
keys, never crossing the full corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tfidf_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 14,
) -> DataFrame:
    """(id, tfidf: SparseVector) via RegexTokenizer → HashingTF → IDF."""
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_tok", pattern="\\s+", toLowercase=True
    )
    tf = HashingTF(inputCol="_tok", outputCol="_tf", numFeatures=n_features)
    tfd = tf.transform(tok.transform(docs.select(id_col, text_col)))
    idf = IDF(inputCol="_tf", outputCol="tfidf").fit(tfd)
    return idf.transform(tfd).select(id_col, "tfidf")


def tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 14,
    bucket_length: float = 0.5,
) -> DataFrame:
    """TF-IDF near-dup pairs via BucketedRandomProjectionLSH on
    L2-normalized vectors: Euclidean distance on unit vectors maps to
    cosine as cos = 1 − d²/2, so a cosine threshold t becomes a
    distance cut √(2(1−t)). Candidates come from LSH buckets; returned
    cosine is exact (recomputed from the distance)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer

    feats = tfidf_features(docs, text_col, id_col, n_features)
    unit = Normalizer(inputCol="tfidf", outputCol="unit", p=2.0).transform(feats)
    lsh = BucketedRandomProjectionLSH(
        inputCol="unit", outputCol="_hashes", bucketLength=bucket_length, seed=42
    ).fit(unit)
    dist_cut = float((2.0 * (1.0 - threshold)) ** 0.5)
    joined = lsh.approxSimilarityJoin(unit, unit, dist_cut, distCol="_d")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            (1.0 - F.col("_d") * F.col("_d") / 2.0).alias("cosine"),
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.col("cosine") >= threshold)
    )


def minhash_jaccard_pairs_mllib(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_features: int = 1 << 14,
    num_hash_tables: int = 8,
) -> DataFrame:
    """Jaccard near-dup pairs via MLlib MinHashLSH over binary
    HashingTF vectors (set-of-hashed-tokens). Distance is 1 − Jaccard
    of the hashed-token sets — the MLlib twin of
    dedup.minhash_lsh_pairs (which works on n-token shingles and
    re-verifies with exact Jaccard)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_tok", pattern="\\s+", toLowercase=True
    )
    tf = HashingTF(
        inputCol="_tok", outputCol="_set", numFeatures=n_features, binary=True
    )
    sets = tf.transform(tok.transform(docs.select(id_col, text_col)))
    lsh = MinHashLSH(
        inputCol="_set", outputCol="_hashes", numHashTables=num_hash_tables, seed=42
    ).fit(sets)
    joined = lsh.approxSimilarityJoin(sets, sets, 1.0 - threshold, distCol="_d")
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("doc_a"),
            F.col(f"datasetB.{id_col}").alias("doc_b"),
            (1.0 - F.col("_d")).alias("jaccard"),
        )
        .where(F.col("doc_a") < F.col("doc_b"))
        .where(F.col("jaccard") >= threshold)
    )
