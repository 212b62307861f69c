"""Fixture/table registry over the driver-generated parquet dirs.

≙ the reference's "catalog is the MinIO listing" (SURVEY.md §1.3,
main.go:186-189) — except ours is a real schema'd catalog: parquet
footers give types, Catalyst gets partition/row-group pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _fan_out_scan(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Round-robin repartition a scan whose FILE LAYOUT under-
    parallelizes the cluster (optimization guide §2.5 "input skew":
    one huge unsplittable file → repartition immediately after the
    read). The fixture tables are single-row-group parquet, so every
    scan is ONE task regardless of core count — heavy per-row work
    (tokenize/shingle HOFs, Python codec kernels) then runs on 1 of N
    cores.

    Scale-adaptive, not a local[32] constant: the target is the
    cluster's ``defaultParallelism`` and the trigger is the ESTIMATED
    scan-task count from input bytes (`maxPartitionBytes` splits) —
    at production scale a table spans enough files/row groups that the
    estimate exceeds the target and this is a no-op. Non-posix paths
    (hdfs://, s3://) skip the sizing probe and are left untouched."""
    try:
        total = 0
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for f in files:
                    total += os.path.getsize(os.path.join(root, f))
        else:
            total = os.path.getsize(path)
    except OSError:
        return df
    target = spark.sparkContext.defaultParallelism
    est_tasks = max(1, total // _max_partition_bytes(spark))
    if est_tasks * 2 >= target:
        return df
    return df.repartition(target)


def _max_partition_bytes(spark: SparkSession) -> int:
    """The session's actual scan split size (ADVICE r15: the 128 MB
    literal misestimates the task count on clusters that tune
    ``spark.sql.files.maxPartitionBytes``). Values arrive as ints or
    as size strings ('128m', '1g')."""
    raw = str(
        spark.conf.get("spark.sql.files.maxPartitionBytes", str(128 << 20))
    ).strip().lower()
    if raw.endswith("b"):
        raw = raw[:-1]  # '128mb' → '128m' (JavaUtils suffix grammar)
    scale = {"k": 1 << 10, "m": 1 << 20, "g": 1 << 30, "t": 1 << 40}.get(
        raw[-1:], 1
    )
    if scale != 1:
        raw = raw[:-1]
    try:
        return max(1, int(float(raw) * scale))
    except ValueError:
        return 128 << 20


def load_table(
    spark: SparkSession, sf_dir: str, name: str, fan_out: bool = False
) -> DataFrame:
    """Read one fixture table. Plain ``spark.read.parquet`` so filter
    pushdown / column pruning reach the scan untouched.

    ``events.ts`` arrives in fixture-dependent physical layouts —
    TIMESTAMP(NANOS) (which Spark's vectorized reader only accepts as
    long), TIMESTAMP_NTZ, or plain TIMESTAMP — so normalize by the
    observed type to a session-TZ (UTC) microsecond timestamp:
    nanos-as-long is rebuilt with ``timestamp_micros`` (truncation
    matches DuckDB's own ns→µs conversion) and NTZ is cast (identical
    values under the UTC session zone DuckDB also assumes).
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        else:
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return _fan_out_scan(spark, df, path) if fan_out else df
    df = spark.read.parquet(path)
    if fan_out:
        df = _fan_out_scan(spark, df, path)
    if name in ("orders", "lineitem"):
        # same drift-insurance as events.ts: queries assume midnight
        # TIMESTAMP semantics for the TPC-H date columns; if a fixture
        # regeneration narrows them to DATE, widen back (no-op today)
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        for f in df.schema.fields:
            if f.name.endswith("date") and isinstance(f.dataType, T.DateType):
                df = df.withColumn(f.name, F.col(f.name).cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view → full SQL surface
    for free (the reference has no SQL; SURVEY.md §2.2)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
