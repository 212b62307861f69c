"""Streaming upsert sink: foreachBatch CDC merge into a keyed parquet
snapshot.

Structured Streaming's built-in file sink is append-only — exactly the
reference's store semantics (fire-and-forget append, main.go:294-348).
A change-data stream (entity updated many times) needs the OTHER write
mode: each micro-batch merged latest-wins into a keyed table. The
standard Spark pattern is ``foreachBatch`` + a merge; on Delta/Iceberg
the merge is ``MERGE INTO``, on plain parquet it is the same
``upsert_latest`` aggregation used by the batch maintenance path
(operators/maintenance.py) with a staged, verified directory swap.

Scale notes:
- per micro-batch the work is one shuffle on the key over
  |snapshot| + |batch| rows; on a real deployment the snapshot side
  would be a partitioned table so only touched partitions rewrite
  (dynamic partition overwrite) — the local form rewrites the whole
  (small) snapshot and documents the partitioned upgrade path;
- within a micro-batch, later-versioned rows win via the same
  deterministic max_by order as the batch operator, so replaying a
  batch (at-least-once delivery) is idempotent — the merge is the
  exactly-once-effect trick for non-transactional sinks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from nebuia_vector_db_spark.operators.maintenance import upsert_latest


def upsert_sink(
    stream: DataFrame,
    path: str,
    key_cols: list[str],
    version_col: str,
    checkpoint: str,
    tie_cols: list[str] | None = None,
):
    """Start a foreachBatch query merging ``stream`` latest-wins into
    the parquet snapshot at ``path``. Returns the StreamingQuery."""

    def _merge(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if batch.isEmpty():
            return
        # collapse within-batch duplicates first (cheap: batch-sized)
        fresh = upsert_latest(
            batch.limit(0), batch, key_cols, version_col, tie_cols
        )
        if os.path.isdir(path):
            cur = spark.read.parquet(path)
            merged = upsert_latest(
                cur, fresh.select(*cur.columns), key_cols, version_col, tie_cols
            )
        else:
            merged = fresh
        tmp = path.rstrip("/") + f"._upsert_tmp_{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        staged = spark.read.parquet(tmp)
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        p = jvm.org.apache.hadoop.fs.Path(path)
        fs = p.getFileSystem(conf)
        old = jvm.org.apache.hadoop.fs.Path(
            path.rstrip("/") + f"._upsert_old_{batch_id}"
        )
        # count() materializes tmp fully before the swap window opens
        assert staged.count() >= 0
        if fs.exists(p):
            fs.rename(p, old)
        fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), p)
        fs.delete(old, True)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def transactional_append(
    spark,
    path: str,
    batch: DataFrame,
    batch_id: int,
    app: str,
    retries: int = 6,
) -> None:
    """One exactly-once micro-batch append (the per-batch body of
    :func:`snapshot_sink`, exposed so tests can drive adversarial
    interleavings directly). The watermark map is read from the EXACT
    snapshot the commit CAS-es against (``expected_parent``): a
    commit landing between the read and the append raises
    CommitConflictError — forcing a re-read — instead of letting a
    stale marks dict wholesale-overwrite a racing app's freshly
    advanced lane (which would un-deduplicate its replays)."""
    from nebuia_vector_db_spark.sources.snapshot import (
        CommitConflictError,
        SnapshotTable,
    )

    tbl = SnapshotTable(spark, path)
    if not tbl.versions():
        try:
            SnapshotTable.create(
                spark, path, batch,
                extra_meta={"stream_watermarks": {app: batch_id}},
            )
            return
        except (FileExistsError, CommitConflictError):
            pass  # another app created the table first; append
    for _ in range(retries):  # conflict => RE-READ marks (a racing
        # app may have advanced its own lane; stale marks would
        # regress it and let its replays duplicate)
        parent = tbl.current_version()
        marks = dict(tbl.meta("stream_watermarks", version=parent) or {})
        last = marks.get(app)
        if last is not None and batch_id <= last:
            return  # replay of a committed batch: ack, no write
        marks[app] = max(batch_id, last if last is not None else -1)
        try:
            tbl.append(
                batch,
                extra_meta={"stream_watermarks": marks},
                expected_parent=parent,
            )
            return
        except CommitConflictError:
            continue
    raise CommitConflictError(f"could not commit batch {batch_id}")


def snapshot_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    app_id: str | None = None,
):
    """Exactly-once append sink into a :class:`SnapshotTable`.

    Structured Streaming's foreachBatch is AT-LEAST-ONCE: after a
    crash between "sink wrote" and "checkpoint advanced", the same
    ``batch_id`` is redelivered. The transactional fix (Delta's
    ``txnAppId``/``txnVersion`` pattern) is to record the batch id IN
    the sink's own commit, atomically with the data: each snapshot
    carries a per-APP watermark map ``stream_watermarks[app_id] =
    max batch id``, and a replayed batch whose id is <= its app's
    watermark is acknowledged without writing. Because the watermark
    travels inside the snapshot json whose exclusive create IS the
    commit, data-write and id-write cannot diverge — appends become
    idempotent, i.e. exactly-once in effect.

    ``app_id`` defaults to the checkpoint path — each streaming query
    gets its own watermark lane, so SEVERAL independent streams can
    feed one table without their (per-query, both-starting-at-0)
    batch-id sequences colliding (≙ Delta's txnAppId).

    O(1) per batch beyond the append itself: batch ids are monotonic
    per app, so only the latest snapshot's map is consulted (it
    propagates through every commit and survives vacuum, which always
    retains the newest snapshot)."""
    from nebuia_vector_db_spark.sources.snapshot import SnapshotTable

    app = app_id if app_id is not None else checkpoint

    def _append(batch: DataFrame, batch_id: int) -> None:
        transactional_append(batch.sparkSession, path, batch, batch_id, app)

    return (
        stream.writeStream.foreachBatch(_append)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
