"""Structured Streaming (streaming/events.py) — AvailableNow trigger
into a memory sink, compared against the equivalent batch queries."""

from __future__ import annotations

from pyspark.sql import functions as F

from nebuia_vector_db_spark.sources.registry import load_table
from nebuia_vector_db_spark.streaming.events import (
    dedup_stream,
    hourly_counts_stream,
    read_events_stream,
    run_to_memory,
    sessionize_stream,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_hourly_stream_matches_batch(spark, sf_smoke):
    stream = hourly_counts_stream(read_events_stream(spark, sf_smoke))
    got = run_to_memory(stream, "t_hourly", output_mode="complete")

    ev = load_table(spark, sf_smoke, "events")
    want = (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    cols = ["hour_epoch", "event_type", "n", "sum_value"]
    assert _rows(got, cols) == _rows(want, cols)


def test_hourly_stream_append_watermark_subset(spark, sf_smoke):
    """Append mode emits only windows closed by the watermark — every
    emitted row must agree with the batch result; late/open windows are
    simply withheld, never wrong."""
    stream = hourly_counts_stream(
        read_events_stream(spark, sf_smoke), watermark="1 hour"
    )
    got = run_to_memory(stream, "t_hourly_append", output_mode="append")

    ev = load_table(spark, sf_smoke, "events")
    want = (
        ev.groupBy(
            F.unix_timestamp(F.date_trunc("hour", "ts")).alias("hour_epoch"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )
    cols = ["hour_epoch", "event_type", "n", "sum_value"]
    got_rows = set(_rows(got, cols))
    want_rows = set(_rows(want, cols))
    assert got_rows <= want_rows


def test_dedup_stream_single_definition_with_documented_defaults():
    """VERDICT r11 #1: the module once carried TWO dedup_stream defs
    (the first silently shadowed, docstrings disagreeing on
    defaults). Pin exactly one definition with the live signature."""
    import ast
    import inspect

    from nebuia_vector_db_spark.streaming import events as ev

    tree = ast.parse(inspect.getsource(ev))
    defs = [
        n.name
        for n in tree.body
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))
    ]
    assert defs.count("dedup_stream") == 1
    assert len(defs) == len(set(defs)), "shadowed top-level def"
    sig = inspect.signature(ev.dedup_stream)
    assert sig.parameters["watermark"].default == "10 hours"
    assert sig.parameters["ts_col"].default == "ts"


def test_dedup_stream_drops_replayed_events(spark, sf_smoke, tmp_path):
    """A source that replays every event twice (at-least-once delivery)
    must come out exactly-once after dedup_stream."""
    import os

    src = load_table(spark, sf_smoke, "events")
    d = str(tmp_path / "replayed")
    src.write.parquet(d, mode="overwrite")
    src.write.parquet(d, mode="append")  # the replay

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    stream = spark.readStream.schema(src.schema).parquet(d)
    got = run_to_memory(
        dedup_stream(stream, keys=["event_id"]), "t_dedup", output_mode="append"
    )
    assert got.count() == src.count()
    assert got.select("event_id").distinct().count() == src.count()
    # sanity: the doubled input really was doubled
    assert spark.read.parquet(d).count() == 2 * src.count()


def test_sessionize_stream_matches_batch_session_window(spark, sf_smoke):
    stream = sessionize_stream(read_events_stream(spark, sf_smoke), gap="30 minutes")
    got = run_to_memory(stream, "t_sessions", output_mode="complete")

    ev = load_table(spark, sf_smoke, "events")
    want = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("s"), "user_id")
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
    cols = [
        "user_id",
        "session_start_epoch",
        "session_end_epoch",
        "n_events",
        "sum_value",
    ]
    assert _rows(got, cols) == _rows(want, cols)


def test_enrich_stream_static_join(spark, sf_smoke):
    from nebuia_vector_db_spark.streaming.events import (
        enrich_stream,
        read_events_stream,
        run_to_memory,
    )

    dim = spark.createDataFrame(
        [(u, "tier_%d" % (u % 3)) for u in range(200)],
        "user_id long, tier string",
    )
    out = enrich_stream(read_events_stream(spark, sf_smoke), dim)
    got = run_to_memory(out, "enriched_events")
    batch = spark.read.parquet(f"{sf_smoke}/events.parquet")
    assert got.count() == batch.count()  # left join keeps every event
    # every matched row carries the right tier
    bad = got.where(
        F.col("user_id") < 200
    ).where(F.col("tier") != F.concat(F.lit("tier_"), (F.col("user_id") % 3).cast("string")))
    assert bad.count() == 0


def test_join_streams_matches_batch_range_join(spark, sf_smoke):
    from nebuia_vector_db_spark.streaming.events import (
        join_streams,
        read_events_stream,
        run_to_memory,
    )

    left = read_events_stream(spark, sf_smoke).where(
        F.col("event_type") == "click"
    )
    right = (
        read_events_stream(spark, sf_smoke)
        .where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id"),
            F.col("ts").alias("ts_r"),
            F.col("value").alias("purchase_value"),
        )
    )
    out = join_streams(
        left.select("user_id", "ts", "event_id"), right,
        watermark="10 hours", max_gap="30 minutes",
    )
    got = run_to_memory(out, "ss_join")

    batch = load_table(spark, sf_smoke, "events")
    clicks = batch.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    buys = batch.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("u2"),
        F.col("ts").alias("ts_r"),
        F.col("value").alias("purchase_value"),
    )
    want = clicks.join(
        buys,
        (F.col("user_id") == F.col("u2"))
        & (F.col("ts_r") >= F.col("ts"))
        & (F.col("ts_r") <= F.col("ts") + F.expr("interval 30 minutes")),
    )
    assert got.count() == want.count()
    assert got.count() > 0  # predicate actually matches something


def test_sliding_stream_matches_batch_mirror(spark, sf_smoke):
    """Sliding 1h/15m windows: the streaming result (complete mode)
    must equal the batch q_events_sliding mirror row-for-row, and
    every event must appear in exactly window/slide = 4 windows."""
    from nebuia_vector_db_spark.queries import q_events_sliding
    from nebuia_vector_db_spark.streaming.events import sliding_counts_stream

    stream = sliding_counts_stream(read_events_stream(spark, sf_smoke))
    got = run_to_memory(stream, "t_sliding", output_mode="complete")
    want = q_events_sliding(spark, sf_smoke)
    cols = ["window_start_epoch", "event_type", "n"]
    assert _rows(got, cols) == _rows(want, cols)

    ev = load_table(spark, sf_smoke, "events")
    total = want.agg(F.sum("n")).first()[0]
    assert total == 4 * ev.count()


def test_dedup_stream_drops_exactly_planted_copies(spark, sf_smoke):
    """Round 11: dropDuplicatesWithinWatermark through the micro-batch
    engine — planted re-deliveries collapse back to exactly the
    source relation (same discipline the stream_dedup_mirror oracle
    hash-certifies), and the physical plan carries the
    watermark-evicting dedup operator, not an unbounded
    dropDuplicates."""
    from pyspark.sql import functions as F

    from nebuia_vector_db_spark.streaming.events import (
        dedup_stream,
        read_events_stream,
        run_to_memory,
    )

    ev = read_events_stream(spark, sf_smoke).select(
        "event_id", "user_id", "ts"
    )
    polluted = ev.withColumn(
        "_c",
        F.explode(
            F.when(
                F.col("user_id") % 3 == 0, F.array(F.lit(0), F.lit(1))
            ).otherwise(F.array(F.lit(0)))
        ),
    ).drop("_c")
    cleaned = dedup_stream(polluted, keys=["event_id"])
    got = run_to_memory(cleaned, "t_stream_dedup").collect()
    base = (
        spark.read.parquet(f"{sf_smoke}/events.parquet")
        .select("event_id")
        .collect()
    )
    assert sorted(r["event_id"] for r in got) == sorted(
        r["event_id"] for r in base
    )
    plan = cleaned._jdf.queryExecution().analyzed().toString()
    assert "DeduplicateWithinWatermark" in plan, plan
