"""Query registry: every SURVEY.md §2 operator as a (Spark fn, oracle
SQL) pair.

Each entry's Spark callable takes ``(spark, sf_dir)`` and returns a
DataFrame; the oracle is the equivalent ANSI SQL DuckDB runs on the
same parquet (driver contract, ``__spark_entry__.py``). Column names
AND value rounding match on both sides so the driver's
order-insensitive value hash agrees.

Precision discipline: every float the oracle will hash is computed
with *sequential* summation on both engines (Spark ``aggregate`` HOF
and DuckDB ``list_dot_product`` both sum left-to-right, so doubles are
bit-identical) and then rounded to 6 decimals as a belt-and-braces
guard.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.vector import (
    dot,
    l2_norm,
    normalize_query,
)
from nebuia_vector_db_spark.operators.topk import knn_join, topk_per_group
from nebuia_vector_db_spark.sources.registry import load_table

SIM6 = "similarity"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


def _qvec(spark: SparkSession, sf_dir: str, vec_id: int) -> list[float]:
    """Fetch one query vector driver-side (a query *parameter*, not a
    dataset operation — ≙ the reference's request body vector)."""
    row = (
        _emb(spark, sf_dir)
        .where(F.col("vec_id") == vec_id)
        .select("embedding")
        .head()
    )
    return [float(x) for x in row[0]]


FIXED_Q = [0.125] * 64  # FIXTURES.md: fixed literal query vector

# DuckDB SQL fragment: normalized query vector from vec_id=:id
_ORACLE_QN = """
WITH qraw AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = {vid}
),
qn AS (
  SELECT list_transform(qe, x -> x / sqrt(list_dot_product(qe, qe))) AS v FROM qraw
)
"""


# --------------------------------------------------------------------------
# vs_topk — flagship: exact brute-force top-10 (O-2,O-6,O-7,O-9)
def q_vs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qn = normalize_query(_qvec(spark, sf_dir, 0))
    return (
        _emb(spark, sf_dir)
        .withColumn("sim_raw", dot(F.col("embedding"), qn))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(10)
        .select(
            "vec_id",
            "label",
            F.round("sim_raw", 6).alias(SIM6),
        )
    )


ORACLE_VS_TOPK = (
    _ORACLE_QN.format(vid=0)
    + """
SELECT e.vec_id, e.label,
       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qn.v), 6) AS similarity
FROM embeddings e, qn
ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), qn.v) DESC, e.vec_id
LIMIT 10
"""
)


# --------------------------------------------------------------------------
# vs_topk_fixedq — same, fixed literal query (no data-derived q)
def q_vs_topk_fixedq(spark: SparkSession, sf_dir: str) -> DataFrame:
    qn = normalize_query(FIXED_Q)
    return (
        _emb(spark, sf_dir)
        .withColumn("sim_raw", dot(F.col("embedding"), qn))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(10)
        .select("vec_id", "label", F.round("sim_raw", 6).alias(SIM6))
    )


# [0.125]*64 has exactly unit L2 norm (64 · 0.125² = 1.0, exact in
# binary), so the normalized query is the literal itself.
_FIXED_Q_SQL = "[" + ", ".join(["0.125"] * 64) + "]"

ORACLE_VS_TOPK_FIXEDQ = f"""
WITH qn AS (SELECT CAST({_FIXED_Q_SQL} AS DOUBLE[]) AS v)
SELECT e.vec_id, e.label,
       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qn.v), 6) AS similarity
FROM embeddings e, qn
ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), qn.v) DESC, e.vec_id
LIMIT 10
"""


# --------------------------------------------------------------------------
# vs_multi_search — O-10: multi-collection (label ≙ collection) union +
# global top-k (SURVEY §1.5-6 equivalence)
def q_vs_multi_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    qn = normalize_query(_qvec(spark, sf_dir, 1))
    return (
        _emb(spark, sf_dir)
        .where(F.col("label").isin(1, 2, 3))  # partition-prunable predicate
        .withColumn("sim_raw", dot(F.col("embedding"), qn))
        .orderBy(F.desc("sim_raw"), "vec_id")
        .limit(10)
        .select("vec_id", "label", F.round("sim_raw", 6).alias(SIM6))
    )


ORACLE_VS_MULTI = (
    _ORACLE_QN.format(vid=1)
    + """
SELECT e.vec_id, e.label,
       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qn.v), 6) AS similarity
FROM embeddings e, qn
WHERE e.label IN (1, 2, 3)
ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), qn.v) DESC, e.vec_id
LIMIT 10
"""
)


# --------------------------------------------------------------------------
# vs_topk_per_label — grouped retrieval via row_number window
def q_vs_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    qn = normalize_query(_qvec(spark, sf_dir, 7))
    scored = _emb(spark, sf_dir).withColumn(
        "sim_raw", dot(F.col("embedding"), qn)
    )
    return topk_per_group(
        scored, ["label"], "sim_raw", 3, tie_cols=["vec_id"]
    ).select(
        "vec_id",
        "label",
        F.round("sim_raw", 6).alias(SIM6),
        F.col("rk").cast("long").alias("rk"),
    )


ORACLE_VS_TOPK_PER_LABEL = (
    _ORACLE_QN.format(vid=7)
    + """
, scored AS (
  SELECT e.vec_id, e.label,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), qn.v) AS s
  FROM embeddings e, qn
)
SELECT vec_id, label, round(s, 6) AS similarity,
       row_number() OVER (PARTITION BY label ORDER BY s DESC, vec_id) AS rk
FROM scored
QUALIFY rk <= 3
"""
)


# --------------------------------------------------------------------------
# vs_knn_join — batch kNN: broadcast query set, per-query top-5
def q_vs_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = (
        emb.where(F.col("vec_id").isin(0, 1, 7))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").cast("array<double>").alias("query_vec"),
        )
    )
    out = knn_join(
        queries,
        emb,
        k=5,
        tie_cols=["vec_id"],
    )
    return out.select(
        "query_id",
        "vec_id",
        F.round("similarity", 6).alias(SIM6),
        F.col("rk").cast("long").alias("rk"),
    )


ORACLE_VS_KNN_JOIN = """
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                                       CAST(embedding AS DOUBLE[])))) AS qv
  FROM embeddings WHERE vec_id IN (0, 1, 7)
),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) AS s
  FROM embeddings e CROSS JOIN q
)
SELECT query_id, vec_id, round(s, 6) AS similarity,
       row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rk
FROM scored
QUALIFY rk <= 5
"""


# --------------------------------------------------------------------------
# vs_nested_search — the reference's nested-document path (O-5 explode,
# 1-based position): build documents_nested from embeddings (4 chunks
# per doc), then search chunk-level.
def q_vs_nested_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    qn = normalize_query(_qvec(spark, sf_dir, 0))
    emb = _emb(spark, sf_dir)
    nested = (
        emb.withColumn("doc_id", (F.col("vec_id") / 4).cast("long"))
        .groupBy("doc_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("vec_id", "embedding"))
            ).alias("chunks")
        )
    )
    exploded = nested.select(
        "doc_id", F.posexplode("chunks").alias("pos0", "chunk")
    ).select(
        "doc_id",
        (F.col("pos0") + 1).cast("long").alias("position"),
        F.col("chunk.embedding").alias("embedding"),
    )
    return (
        exploded.withColumn("sim_raw", dot(F.col("embedding"), qn))
        .orderBy(F.desc("sim_raw"), "doc_id", "position")
        .limit(10)
        .select("doc_id", "position", F.round("sim_raw", 6).alias(SIM6))
    )


ORACLE_VS_NESTED = (
    _ORACLE_QN.format(vid=0)
    + """
SELECT e.vec_id // 4 AS doc_id,
       (e.vec_id % 4) + 1 AS position,
       round(list_dot_product(CAST(e.embedding AS DOUBLE[]), qn.v), 6) AS similarity
FROM embeddings e, qn
ORDER BY list_dot_product(CAST(e.embedding AS DOUBLE[]), qn.v) DESC, doc_id, position
LIMIT 10
"""
)


# --------------------------------------------------------------------------
# vs_neardup_cos — exact embedding near-dup pairs (extension §2.3).
# O(N²) exact baseline kept oracle-checkable; the LSH-pruned scale
# path is operators/dedup.py::embedding_neardup_lsh (rows-only).
def q_vs_neardup_cos(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    # hoist per-row norms out of the O(N²) pair loop: each side carries
    # its norm once instead of recomputing per pair
    a = emb.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("ea"),
        l2_norm("embedding").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("eb"),
        l2_norm("embedding").alias("nb"),
    )
    pairs = a.join(F.broadcast(b), F.col("vec_a") < F.col("vec_b"))
    scored = pairs.withColumn(
        "cos_raw", dot("ea", F.col("eb")) / (F.col("na") * F.col("nb"))
    )
    return (
        scored.where(F.col("cos_raw") >= 0.4)
        .select(
            "vec_a", "vec_b", F.round("cos_raw", 6).alias("cosine")
        )
        .orderBy("vec_a", "vec_b")
    )


ORACLE_VS_NEARDUP = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_dot_product(a.v, b.v)
             / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))), 6) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_dot_product(a.v, b.v)
      / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) >= 0.4
ORDER BY vec_a, vec_b
"""


# --------------------------------------------------------------------------
# Registry
# --------------------------------------------------------------------------
# name -> (spark_fn, oracle_sql | None). None ⇒ non-SQL-expressible;
# the driver records a rows-only check.
REGISTRY: dict[
    str, tuple[Callable[[SparkSession, str], DataFrame], str | None]
] = {
    "vs_topk": (q_vs_topk, ORACLE_VS_TOPK),
    "vs_topk_fixedq": (q_vs_topk_fixedq, ORACLE_VS_TOPK_FIXEDQ),
    "vs_multi_search": (q_vs_multi_search, ORACLE_VS_MULTI),
    "vs_topk_per_label": (q_vs_topk_per_label, ORACLE_VS_TOPK_PER_LABEL),
    "vs_knn_join": (q_vs_knn_join, ORACLE_VS_KNN_JOIN),
    "vs_nested_search": (q_vs_nested_search, ORACLE_VS_NESTED),
    "vs_neardup_cos": (q_vs_neardup_cos, ORACLE_VS_NEARDUP),
}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
