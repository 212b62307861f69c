"""Skew- and co-location-aware join utilities.

The reference has no joins at all (SURVEY.md §2.2); these are the
scale tools our extension joins lean on when AQE's automatic handling
isn't enough:

- ``salted_join``: explicit salting for a pathologically hot key —
  replicate the small side ``n_salts`` ways, scatter the big side with
  a random salt, join on (key, salt). Turns one straggler task into
  ``n_salts`` even ones. AQE's skew-join split handles *sort-merge*
  skew automatically; salting is for when the skew is in a hash
  aggregate upstream or AQE's thresholds don't trigger.
- ``write_bucketed`` / co-located joins: pre-bucket both fact tables
  on the join key so repeated joins are exchange-free (verified by
  tests/test_skew.py asserting no Exchange in the plan). At 100 TB,
  bucketing the `documents`/`chunks` tables on doc_id makes every
  enrichment join a local zipper.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s key distribution is skewed: the big
    side gets a uniform random salt in [0, n_salts); the small side is
    replicated once per salt via a broadcast range join. Result equals
    ``big.join(small, on, how)`` row-for-row."""
    on = list(on)
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias(_SALT)
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        _SALT, (F.rand(seed=42) * n_salts).cast("int")
    )
    return big_salted.join(small_rep, [*on, _SALT], how).drop(_SALT)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 8,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table —
    the co-location contract joins can rely on."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two co-bucketed tables on their bucket key. With matching
    bucket specs Spark plans a SortMergeJoin with NO Exchange on
    either side (bucket pruning of the shuffle)."""
    return spark.table(left_table).join(spark.table(right_table), list(on))
