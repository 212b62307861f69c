"""User-extensible function surface: UDTF + grouped pandas UDAF.

The reference has no user-extensible functions at all (SURVEY §2.2 —
`main.go` exposes only fixed handlers), and this engine's own kernels
are Arrow-batched pandas UDFs. This module adds the missing
USER-FACING tier so an operator author has a worked example of each
extension point:

- :class:`ChunkTextUDTF` — a Python UDTF (``pyspark.sql.functions.
  udtf``): one input row → many output rows, usable in SQL via
  ``LATERAL``. The table-function shape (text → overlapping chunks)
  mirrors ``operators/pipeline.py::chunk_documents`` but as the
  user-pluggable API rather than a built-in composition.
- :func:`mean_vector_udaf` — a grouped-aggregate pandas UDF
  (``GROUPED_AGG``): per-group dense-vector mean over an
  ``array<double>`` column, Arrow-batched, usable with ``groupBy``
  and ``Window``.

Scale notes: a UDTF runs row-at-a-time in Python — fine for
low-fan-out generators like chunking, wrong for per-element math
(use Arrow kernels). The grouped-agg UDF receives each group's
column as a pandas Series backed by Arrow; partial aggregation does
NOT apply (Spark ships whole groups), so keep group cardinality high
and group size bounded — for the skewed-giant-group case prefer the
algebraic two-level form (explode + posexplode groupBy) that DOES
map-side combine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# NOTE: the @udtf / @pandas_udf decorators parse their returnType
# against the ACTIVE session, so applying them at import time fails
# in a session-less process. Everything here wraps lazily instead —
# the shape a library must use.

_CHUNK_SCHEMA = "chunk_id int, chunk_text string"


class ChunkTextUDTF:
    """Split ``text`` into word chunks of ``size`` with ``overlap``
    words carried between consecutive chunks (1 row in → N out).

    SQL: ``SELECT d.doc_id, c.* FROM documents d,
    LATERAL chunk_text(d.text, 64, 8) c``.
    """

    def eval(self, text: str, size: int = 64, overlap: int = 8):
        if text is None or size <= 0:
            return
        step = max(1, size - max(0, overlap))
        words = [w for w in text.split(" ") if w]
        if not words:
            return
        cid = 0
        for start in range(0, len(words), step):
            piece = words[start : start + size]
            yield cid, " ".join(piece)
            cid += 1
            if start + size >= len(words):
                break


def chunk_text_udtf():
    """The UDTF object (lazily decorated; needs an active session)."""
    from pyspark.sql.functions import udtf

    return udtf(ChunkTextUDTF, returnType=_CHUNK_SCHEMA)


def register_udtfs(spark) -> None:
    """Make the UDTF callable from SQL as ``chunk_text``."""
    spark.udtf.register("chunk_text", chunk_text_udtf())


def _mean_vector(vecs: pd.Series) -> list:  # pragma: no cover - workers
    """Grouped-aggregate kernel: element-wise mean of an
    ``array<double>`` column within each group (the centroid of the
    group's vectors). NULL and empty rows are skipped; an all-null
    group yields NULL."""
    import numpy as np

    arrs = [np.asarray(v, dtype=np.float64) for v in vecs if v is not None]
    arrs = [a for a in arrs if a.size]
    if not arrs:
        return None
    return np.mean(np.stack(arrs), axis=0).tolist()


def mean_vector_udaf():
    """The grouped-agg pandas UDF (lazily decorated)."""
    from pyspark.sql.functions import pandas_udf

    return pandas_udf("array<double>")(_mean_vector)


def label_centroids_udaf(
    emb: DataFrame, label_col: str = "label", vec_col: str = "embedding"
) -> DataFrame:
    """Per-label centroids via the grouped-agg UDAF — the
    user-extensible twin of queries.py::q_emb_label_centroids (which
    uses the algebraic posexplode + avg form that enables map-side
    partial aggregation; this form ships whole groups to Python)."""
    return emb.groupBy(label_col).agg(
        mean_vector_udaf()(F.col(vec_col).cast("array<double>")).alias(
            "centroid"
        )
    )
