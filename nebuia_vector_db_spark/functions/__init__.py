"""Scalar/vector/text function library (JVM-side expressions first).

Everything here returns Column expressions built from
``pyspark.sql.functions`` higher-order functions so the hot path stays
inside whole-stage codegen; the only Python-side kernels are the
Arrow-batched pandas_udf fast paths, clearly marked.
"""

from nebuia_vector_db_spark.functions.vector import (
    cosine_sim,
    dot,
    l2_norm,
    l2_normalize,
    normalize_query,
    numpy_dot_udf,
)

__all__ = [
    "cosine_sim",
    "dot",
    "l2_norm",
    "l2_normalize",
    "normalize_query",
    "numpy_dot_udf",
]
