"""Structured Streaming surface over the ``events`` fixture.

The reference has NO streaming (SURVEY.md §2.2 — synchronous
request/response plus fire-and-forget goroutines only); this is the
mandated extension surface (SURVEY.md §7.1 P4). Design:

- **Source**: file stream over the same parquet the batch path reads —
  on a cluster this is the drop-in for a Kafka/Kinesis source; the
  transformations below are source-agnostic.
- **Watermark**: bounds state. Without it a windowed agg's state grows
  forever; with ``withWatermark("ts", delay)`` Spark drops state for
  windows older than max(event time) − delay and late rows beyond it.
- **Tumbling window agg**: the streaming twin of the batch
  ``q_events_hourly`` query (queries.py) — same output schema, so a
  user can backfill with batch and tail with the stream.
- **Session windows**: ``F.session_window`` — gap-based sessionization
  as a built-in stateful op (no applyInPandasWithState needed for the
  common case).

Tests drive these with ``Trigger.AvailableNow`` into a memory sink —
the documented pattern for deterministic streaming unit tests (process
all available input, then stop).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over events.parquet (one file = one
    micro-batch's worth with AvailableNow; maxFilesPerTrigger tunes
    batch size for a live run).

    ``ts`` physical layout is fixture-dependent (TIMESTAMP(NANOS)
    readable only as long, TIMESTAMP_NTZ, or TIMESTAMP — see
    sources/registry.py); a readStream needs an explicit schema, so
    sniff it from a batch read of the same file and normalize to a
    session-TZ microsecond timestamp the same way."""
    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    phys = spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema
    # the fixture is a single file and the file source watches a
    # directory — stream the parent dir, glob-filtered to events
    stream = (
        spark.readStream.schema(phys)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if isinstance(phys["ts"].dataType, T.LongType):
        return stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return stream.withColumn("ts", F.col("ts").cast("timestamp"))


def hourly_counts_stream(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked tumbling 1-hour counts — streaming twin of the batch
    ``events_hourly`` query (same columns, so batch backfill + stream
    tail compose)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("hour_epoch"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked SLIDING window counts — each event lands in
    window/slide overlapping windows (4 for 1h/15m), the moving-average
    view a tumbling window can't give. State holds one row per open
    (window, type) pair and the watermark closes window/slide of them
    per slide tick. Batch twin: ``queries.py::q_events_sliding``."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_epoch"),
            "event_type",
            "n",
        )
    )


def sessionize_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based sessions per user via the built-in session_window
    stateful operator (state bounded by the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("s.start")).alias("session_start_epoch"),
            F.unix_timestamp(F.col("s.end")).alias("session_end_epoch"),
            "n_events",
            "sum_value",
        )
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> DataFrame:
    """Process ALL currently-available input (Trigger.AvailableNow),
    block until done, return the sink table. Deterministic — the
    streaming-unit-test harness."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)


def dedup_stream(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Stateful streaming dedup: drop re-deliveries of the same
    ``keys`` arriving within the watermark horizon
    (``dropDuplicatesWithinWatermark`` — Spark keeps one state-store
    entry per key and EVICTS it once the watermark passes, so state
    is bounded by the horizon, not the stream; plain
    ``dropDuplicates`` on a stream would retain every key forever).
    The exactly-once hygiene pass every at-least-once ingest needs
    (Kafka replays, retried file loads). First arrival wins; with
    byte-identical duplicates the choice is immaterial and the output
    is deterministic."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, key: str = "user_id"
) -> DataFrame:
    """Stream-static join: arriving events pick up dimension columns
    (user signup date, tier, ...) with no state store — the static
    side is re-read per micro-batch (so slowly-changing dims are
    picked up) and broadcast when small. Stateless, append-safe."""
    return events.join(F.broadcast(dim), key, "left")


def join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    watermark: str = "1 hour",
    max_gap: str = "30 minutes",
    left_ts: str = "ts",
    right_ts: str = "ts_r",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: match rows sharing ``key``
    whose event times are within ``max_gap``. Both sides are
    watermarked so the state store can drop rows once no future match
    can arrive (without the time-range predicate the join state would
    grow forever). The streaming twin of the batch as-of/range joins
    (operators/asof.py, qty_band_join).

    ``how='leftOuter'``: unmatched left rows are emitted with null
    right columns — but only once the watermark passes their match
    window (the engine must prove no match can still arrive), so
    outer results trail the watermark delay by design. Requires the
    time-range condition (Spark's outer stream-stream join
    precondition) — already built in here."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= F.expr(f"{left_ts} + interval {max_gap}"))
    )
    return lw.join(rw, cond, how).drop(rw[key])
