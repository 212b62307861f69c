"""Streaming vector scoring — the reference's ingest+search loop as
one continuous pipeline.

The reference couples a write path (storeDocument, main.go:294-349)
with a poll-style read path (searchDocuments, main.go:351-367); the
streaming twin scores embeddings AS THEY ARRIVE against a registered
query set and emits matches — semantic routing / alerting. All
stateless per-row (map-side): similarity is the same codegen'd HOF
dot the batch engine uses, queries ride along as a broadcast-sized
literal array — valid in append mode with no state store, so it runs
identically on an unbounded stream and on Trigger.AvailableNow.

Per-query top-k over an infinite stream is ill-defined without a
window; `topk_stream_foreach_batch` gives the standard practical
shape — per-micro-batch exact top-k (TakeOrdered inside foreachBatch)
appended to a sink the caller compacts — mirroring the batch
operators/topk.py semantics batch-by-batch.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nebuia_vector_db_spark.functions.vector import dot, normalize_query


def semantic_filter_stream(
    stream: DataFrame,
    queries: dict[str, Sequence[float]],
    threshold: float,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append-mode semantic router: each arriving vector is scored
    against every registered query (a handful — they unroll into the
    projection as literals); rows clearing ``threshold`` are emitted
    tagged with the matching query name and similarity. One codegen'd
    projection + filter — no shuffle, no state, unbounded-safe."""
    scored = stream
    structs = [
        F.struct(
            F.lit(name).alias("query_name"),
            dot(F.col(vec_col), normalize_query(qv)).alias("similarity"),
        )
        for name, qv in queries.items()
    ]
    scored = scored.withColumn("_m", F.explode(F.array(*structs)))
    return (
        scored.where(F.col("_m.similarity") >= threshold)
        .withColumn("query_name", F.col("_m.query_name"))
        .withColumn("similarity", F.col("_m.similarity"))
        .drop("_m")
    )


def topk_stream_foreach_batch(
    stream: DataFrame,
    qvec: Sequence[float],
    topk: int,
    sink: Callable[[DataFrame, int], None],
    vec_col: str = "embedding",
    tie_cols: Sequence[str] = (),
):
    """Per-micro-batch exact top-k: each batch is scored and cut with
    the same TakeOrderedAndProject plan as the batch engine, then
    handed to ``sink(df, batch_id)`` (append to a results table the
    caller compacts with a global top-k — k rows per batch, so the
    compaction input stays tiny). Returns the started query."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        qn = normalize_query(qvec)
        scored = batch_df.withColumn(
            "similarity", dot(F.col(vec_col), qn)
        )
        top = scored.orderBy(
            F.desc("similarity"), *[F.col(c) for c in tie_cols]
        ).limit(topk)
        sink(top, batch_id)

    return (
        stream.writeStream.foreachBatch(_process)
        .trigger(availableNow=True)
        .start()
    )


def ivf_ingest_stream(
    vec_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    app_id: str | None = None,
):
    """Streaming vector ingest into a snapshot-backed IVF index,
    exactly-once: each micro-batch is routed to the index's FROZEN
    centroids (map-side broadcast-GEMM argmin, operators/ann.py) and
    appended as ONE atomic snapshot commit carrying this writer's
    batch-id watermark (per-``app_id`` lane, ≙ Delta txnAppId — see
    sinks.snapshot_sink; several independent streams can feed one
    index). A redelivered batch acks without writing; a reader
    mid-search keeps a complete index version; a racing maintenance
    job retries through the CAS.

    The index at ``index_path`` must already exist
    (``save_ivf_index_snapshot``); the stream needs the index's
    vector column. This is the 100 TB daily-ingest shape: routing is
    shuffle-free, the append touches no existing file, and centroid
    drift is handled by the documented monitor-and-retrain loop
    (operators/ann.py::append_to_ivf_index)."""
    import numpy as np

    from nebuia_vector_db_spark.operators.ann import assign_to_cells
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    app = app_id if app_id is not None else checkpoint

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        tbl = SnapshotTable(spark, index_path)
        from nebuia_vector_db_spark.sources.snapshot import (
            CommitConflictError,
        )

        cents = tbl.meta("centroids")
        vec_col = tbl.meta("vec_col") or "embedding"
        assigned = None
        for _ in range(6):  # conflict => re-read marks (see sinks.py);
            # marks come from the exact snapshot the commit CAS-es
            # against (expected_parent) so an interleaved commit can
            # never be overwritten with a stale watermark map
            parent = tbl.current_version()
            marks = dict(
                tbl.meta("stream_watermarks", version=parent) or {}
            )
            last = marks.get(app)
            if last is not None and batch_id <= last:
                return  # replay of a committed batch
            if assigned is None:
                assigned = assign_to_cells(
                    batch, np.array(cents, dtype=np.float64), vec_col
                )
            marks[app] = max(batch_id, last if last is not None else -1)
            try:
                tbl.append(
                    assigned,
                    extra_meta={"stream_watermarks": marks},
                    expected_parent=parent,
                )
                return
            except CommitConflictError:
                continue
        raise CommitConflictError(f"could not commit batch {batch_id}")

    return (
        vec_stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
