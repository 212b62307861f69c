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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table. Plain ``spark.read.parquet`` so filter
    pushdown / column pruning reach the scan untouched."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view → full SQL surface
    for free (the reference has no SQL; SURVEY.md §2.2)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
