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

from nebuia_vector_db_spark.operators._cache import (
    cached_relation_registry,
)

# Cached weight relations handed out by tfidf_weight_relation. The
# cache is load-bearing (the relation feeds norms + both join sides;
# uncached it re-runs tokenize→tf→df per consumer — measured 16
# shuffles vs 6), but repeated hybrid/exact-pair queries in one long
# session would otherwise accumulate executor storage memory with no
# way to release it. Call release_cached_relations() between query
# batches (bench.py does) to drop them all.
_CACHED_RELATIONS, release_cached_relations = cached_relation_registry()


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


def tfidf_weight_relation(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_posting_len: int | None = None,
) -> DataFrame:
    """The (_id, tok, w) tf-idf weight relation shared by the exact
    cosine pair join and hybrid search. Model: tokens = non-empty
    whitespace splits of lower(text); tf = occurrence count; idf =
    (N+1)/(df+1) — rational, so every weight is exactly-rounded IEEE
    arithmetic and bit-identical in any engine.

    Cached: the relation feeds multiple consumers (norms + join sides
    / query dots); without persisting, Spark re-runs the whole
    tokenize→tf→df chain per consumer (measured 16 shuffles vs 6)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    tf = (
        docs.select(F.col(id_col).alias("_id"), F.explode(toks).alias("tok"))
        .groupBy("_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    n_docs = docs.count()  # scalar query parameter, one cheap agg
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("dfc"))
    if max_posting_len is not None:
        dfreq = dfreq.where(F.col("dfc") <= max_posting_len)
    rel = (
        tf.join(dfreq, "tok")
        .select(
            "_id",
            "tok",
            (
                F.col("cnt").cast("double")
                * (F.lit(float(n_docs + 1)) / (F.col("dfc") + 1))
            ).alias("w"),
        )
        .cache()
    )
    _CACHED_RELATIONS.append(rel)
    return rel


class TextIndex:
    """Persisted tf-idf text index: the ``(_id, tok, w)`` weight
    relation plus per-doc squared norms — what hybrid search needs at
    query time, built once at ingest instead of per query. On a
    cluster, write ``weights`` bucketed by ``tok`` (``write.bucketBy``)
    so posting-list equi-joins are exchange-free; plain parquet here
    (local FS has no metastore requirement)."""

    def __init__(self, weights: DataFrame, norms: DataFrame):
        self.weights = weights
        self.norms = norms

    def release(self) -> None:
        """Unpersist the weight/norm relations if cached (no-op for
        parquet-loaded indexes)."""
        for df in (self.weights, self.norms):
            try:
                df.unpersist()
            except Exception:
                pass


def save_text_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_posting_len: int | None = None,
) -> TextIndex:
    """Build and persist the tf-idf index (weights + norms) for
    :func:`nebuia_vector_db_spark.operators.hybrid.hybrid_search`'s
    ``index=`` fast path. Returns the in-session index too."""
    w = tfidf_weight_relation(docs, text_col, id_col, max_posting_len)
    q = lambda c: F.floor(c * 1_000_000 + F.lit(0.5))  # noqa: E731
    norms = w.groupBy("_id").agg(
        F.sum(q(F.col("w") * F.col("w"))).alias("q2")
    )
    w.write.mode("overwrite").parquet(f"{path}/weights")
    norms.write.mode("overwrite").parquet(f"{path}/norms")
    return TextIndex(w, norms)


def load_text_index(spark, path: str) -> TextIndex:
    return TextIndex(
        spark.read.parquet(f"{path}/weights"),
        spark.read.parquet(f"{path}/norms"),
    )


def exact_tfidf_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_posting_len: int | None = None,
) -> DataFrame:
    """EXACT tf-idf cosine pairs via an inverted-index equi-join — the
    oracle-checkable counterpart of :func:`tfidf_cosine_pairs` (which
    prunes candidates with BRP-LSH but hides murmur3/HashingTF inside
    MLlib, so no SQL engine can replay it).

    Model: tokens = non-empty whitespace splits of lower(text);
    tf = occurrence count; idf = (N+1)/(df+1) — a *rational* idf, so
    every weight is built from exactly-rounded IEEE ops (int division,
    multiply) and is bit-identical in any engine; ln()-based idf would
    inherit each engine's 1-ulp log rounding. Dot products and norms
    are quantized to integer micro-units per term and summed as longs
    (associative ⇒ partition-order-independent), the same discipline as
    queries.py::_dsum.

    Scale: shuffles on token (posting lists), never all-pairs;
    ``max_posting_len`` drops ubiquitous tokens (boilerplate) the way
    the jaccard path drops stop-shingles.
    """
    w = tfidf_weight_relation(docs, text_col, id_col, max_posting_len)
    # integer micro-unit quantization: floor(x·1e6 + 0.5) is exact IEEE
    # arithmetic, long sums are associative — deterministic everywhere
    q = lambda c: F.floor(c * 1_000_000 + F.lit(0.5))  # noqa: E731
    norms = w.groupBy("_id").agg(F.sum(q(F.col("w") * F.col("w"))).alias("q2"))
    dots = (
        w.alias("a")
        .join(
            w.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(F.col("a._id").alias("doc_a"), F.col("b._id").alias("doc_b"))
        .agg(F.sum(q(F.col("a.w") * F.col("b.w"))).alias("qd"))
    )
    na = norms.select(F.col("_id").alias("doc_a"), F.col("q2").alias("qa"))
    nb = norms.select(F.col("_id").alias("doc_b"), F.col("q2").alias("qb"))
    cos = (F.col("qd") / 1e6) / (
        F.sqrt(F.col("qa") / 1e6) * F.sqrt(F.col("qb") / 1e6)
    )
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("doc_a", "doc_b", "cosine")
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Okapi BM25 ranking (Robertson & Walker 1994; the Lucene-default
    idf = ln(((N - df + 0.5) / (df + 0.5)) + 1), always positive) —
    the standard keyword scorer next to the tf-idf cosine tiers.

    Exactness discipline (same as exact_tfidf_cosine_pairs): every
    input is an integer count; dl/avgdl is computed as the single
    exact-rounded division (dl * N) / sum_dl rather than via a
    pre-divided avgdl; each (doc, term) contribution is one chain of
    IEEE exact-rounded ops + one 1-ulp ln, quantized to 1e-6
    micro-units and summed as integers — so the DuckDB oracle (all
    constants CAST AS DOUBLE to stay off DECIMAL arithmetic) hashes
    bit-identically.

    Scale: tokens are filtered to the query terms BEFORE any shuffle
    (the postings relation is |terms|-bounded per doc), df is a tiny
    per-term aggregate joined back by broadcast, and the final top-k
    is a TakeOrderedAndProject — no global sort, no single-task
    funnel. Returns (doc_id, n_terms_hit, score_micro), ties broken
    by id."""
    from nebuia_vector_db_spark.operators.lm import doc_tokens

    toked = doc_tokens(docs, text_col, id_col).select(
        id_col, F.size("_toks").alias("dl"), F.col("_toks")
    )
    scal = toked.agg(
        F.count("*").alias("n"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n_docs, sum_dl = int(scal["n"]), int(scal["sum_dl"] or 0)
    if sum_dl == 0:
        raise ValueError("empty corpus")
    tf = (
        toked.select(id_col, "dl", F.explode("_toks").alias("term"))
        .where(F.col("term").isin(*query_terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        ((F.lit(n_docs) - F.col("df")) + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    denom = F.col("tf") + (
        F.lit(float(k1))
        * (
            (F.lit(1.0) - F.lit(float(b)))
            + (
                F.lit(float(b))
                * ((F.col("dl") * F.lit(n_docs)) / F.lit(sum_dl))
            )
        )
    )
    contrib = idf * ((F.col("tf") * (F.lit(float(k1)) + F.lit(1.0))) / denom)
    scored = tf.join(F.broadcast(dfreq), "term").select(
        id_col,
        F.floor(contrib * F.lit(1000000.0) + F.lit(0.5)).alias("_c"),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").alias("n_terms_hit"),
            F.sum("_c").alias("score_micro"),
        )
        .orderBy(F.col("score_micro").desc(), id_col)
        .limit(k)
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


def minhash_jaccard_pairs_verified(
    docs: DataFrame,
    threshold: float = 0.9,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hash_tables: int = 32,
    candidate_margin: float = 0.1,
) -> DataFrame:
    """MLlib MinHashLSH candidates + EXACT jaccard verification — the
    oracle-checkable wrapper around :func:`minhash_jaccard_pairs_mllib`.

    The LSH join runs with a loosened cut (threshold − margin) over the
    *hashed* token sets (HashingTF collisions can nudge a boundary
    pair's hashed-set jaccard below its true value); each candidate is
    then re-scored with the exact distinct-token jaccard (integer
    intersect/union — bit-identical in any engine), so precision is
    exactly 1 against the token-set definition. With OR-construction
    across ``num_hash_tables`` seeded tables, a qualifying pair escapes
    candidacy with probability ≤ (1−j+margin')^T ≈ 1e-10 at j ≥ 0.8,
    T = 32 — and the seeded planes make the outcome deterministic for
    a given corpus, which is what lets the differential oracle gate
    hash-match the exact all-pairs SQL.
    """
    cand = minhash_jaccard_pairs_mllib(
        docs,
        threshold=max(0.0, threshold - candidate_margin),
        text_col=text_col,
        id_col=id_col,
        num_hash_tables=num_hash_tables,
    ).select("doc_a", "doc_b")
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), " "), lambda t: t != "")
    )
    sets = docs.select(F.col(id_col).alias("_sid"), toks.alias("_s"))
    jacc = F.col("_i").cast("double") / F.col("_u")
    return (
        cand.join(
            sets.select(F.col("_sid").alias("doc_a"), F.col("_s").alias("_sa")),
            "doc_a",
        )
        .join(
            sets.select(F.col("_sid").alias("doc_b"), F.col("_s").alias("_sb")),
            "doc_b",
        )
        .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn("_u", F.size("_sa") + F.size("_sb") - F.col("_i"))
        .withColumn("jaccard", jacc)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )
