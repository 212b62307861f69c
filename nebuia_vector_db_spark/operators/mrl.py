"""Matryoshka prefix-dimension search tier (Kusupati et al. 2022,
"Matryoshka Representation Learning"; round 11) — the FIFTH
compression level in the ANN ladder (IVF cells / PQ 16 B / SQ8 int8
/ BQ 1 bit/dim / **MRL prefix dims**): MRL-trained embeddings pack
coarse-to-fine information front-loaded, so the FIRST ``prefix_dim``
coordinates alone rank candidates well and the standard
funnel-retrieval deployment is a prefix-dot shortlist followed by an
exact full-dimension re-rank — the paper's "adaptive retrieval"
(§4.3), and exactly the two-stage shape this repo's BQ tier already
uses, at a different point on the accuracy/IO curve (prefix 16 of 64
floats = 4× fewer bytes scanned; BQ is 32× but needs re-rank depth
sized to its ambiguity set).

Scale shape (100 TB): materialize the prefix as its OWN column
(:func:`attach_prefix`, written once at ingest) and the shortlist
pass — which projects only keys + the coarse score — becomes a
column-pruned scan reading prefix_dim/dim of the vector bytes (the
PQ codes-scan argument, ReadSchema-pinned in tests). The re-rank
fetches raw vectors via a broadcast left-semi join by id, the same
shape as pq.py's exact re-rank: raw vectors survive the filter only
for ``shortlist`` rows. Both cuts plan TakeOrderedAndProject
(bounded per-partition heaps). The pipeline is float-dot + rank
arithmetic on the same discipline as every vs_* row (the SQL HOF
dot is bit-identical to DuckDB's list_dot_product), so the registry
row ``vs_mrl_rerank`` hash-certifies shortlist AND re-rank
end-to-end.

Honesty note: the fixture embeddings are synthetic, not MRL-trained,
so prefix dims carry no special information density here — the row
certifies the OPERATOR's semantics (deterministic shortlist rule +
exact re-rank); recall-vs-prefix curves only mean something on
MRL-trained vectors. With ``shortlist >= |corpus|`` the result is
exactly the brute-force top-k (test-pinned), the same full-probe ≡
exact contract as the IVF/BQ tiers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.vector import dot, normalize_query


def attach_prefix(
    emb: DataFrame,
    prefix_dim: int = 16,
    vec_col: str = "embedding",
    prefix_col: str = "prefix",
) -> DataFrame:
    """Materialize the first ``prefix_dim`` coordinates as their own
    column — written once at ingest so the shortlist scan prunes to
    prefix bytes only (store the table with BOTH columns; the
    re-rank fetches the full vector for shortlist rows alone)."""
    return emb.withColumn(
        prefix_col, F.slice(F.col(vec_col), 1, prefix_dim)
    )


def mrl_topk_rerank(
    df: DataFrame,
    qvec: Sequence[float],
    topk: int,
    prefix_dim: int = 16,
    shortlist: int = 50,
    vec_col: str = "embedding",
    prefix_col: str | None = None,
    tie_cols: Sequence[str] = ("vec_id",),
) -> DataFrame:
    """Two-stage Matryoshka search: shortlist of ``shortlist`` by the
    dot of the PREFIX coordinates against the same prefix of the
    L2-normalized query (the paper scores truncated embeddings
    against the truncated query — the query is normalized at FULL
    dimension once, not re-normalized per prefix, so scores at
    different prefixes stay on one scale), then exact normalized-dot
    re-rank of the survivors on the full column.

    The shortlist stage projects ONLY ``tie_cols`` + the coarse
    score, so with a materialized ``prefix_col`` its scan is
    column-pruned to prefix + key bytes (plan-pinned in tests); the
    re-rank fetches raw vectors through a broadcast LEFT-SEMI join
    by ``tie_cols`` — raw vectors survive only for the ``shortlist``
    rows, the pq.py re-rank pattern. ``tie_cols`` must therefore be
    a UNIQUE key of ``df`` (default vec_id). A materialized prefix
    whose length differs from ``prefix_dim`` fails at EXECUTION on
    the first offending row (zip_with would otherwise NULL-pad and
    silently rank garbage): the guard is a per-row CASE inside the
    coarse expression — every row is validated, construction stays
    job-free, and a ragged column (first row fine, later rows stale)
    cannot slip through a sampled probe."""
    if shortlist < topk:
        raise ValueError("shortlist must be >= topk")
    qn = [float(x) for x in normalize_query(qvec)]
    if prefix_col is not None:
        pref_expr = F.when(
            F.size(prefix_col) == F.lit(prefix_dim), F.col(prefix_col)
        ).otherwise(
            F.raise_error(
                F.format_string(
                    "materialized %s has %s dims but prefix_dim="
                    + str(prefix_dim)
                    + " — mismatched slices would NULL-pad the coarse "
                    "dot and rank garbage",
                    F.lit(prefix_col),
                    F.size(prefix_col).cast("string"),
                )
            )
        )
    else:
        pref_expr = F.slice(F.col(vec_col), 1, prefix_dim)
    coarse = dot(pref_expr, qn[:prefix_dim])
    ties = [F.col(c) for c in tie_cols]
    short_keys = (
        df.select(*tie_cols, coarse.alias("_coarse"))
        .orderBy(F.desc("_coarse"), *ties)
        .limit(shortlist)
        .select(*tie_cols)
    )
    exact = df.join(
        F.broadcast(short_keys), list(tie_cols), "left_semi"
    ).withColumn("similarity", dot(vec_col, qn))
    return exact.orderBy(F.desc("similarity"), *ties).limit(topk)
