"""Z-order (Morton) clustering — multi-dimensional data-skipping layout.

Why this exists: min/max file skipping (parquet footers,
``sources/snapshot.py``, Delta/Iceberg stats) only prunes on columns
the physical sort correlates with. A 100 TB table linearly sorted on
``user_id`` answers ``user_id = ?`` by touching one file but scans
ALL files for ``ts BETWEEN ...``. Interleaving the bits of several
quantized columns into one Morton key and range-partitioning + sorting
on it gives every clustered column locality at once — each data file
covers a small hyper-rectangle, so footer stats prune on ANY of the
clustered dimensions. This is exactly Delta's ``OPTIMIZE ZORDER BY``
(reference engine has nothing comparable — its layout is one JSON
object per document, main.go:294-348; extension surface).

Everything is codegen'd integer arithmetic (quantize = subtract /
multiply / integer-divide; interleave = unrolled shift/AND/OR), so the
key computation is whole-stage-codegen JVM work, exactly replayable in
ANSI SQL (registry row ``zorder_cluster``), and the only distributed
cost of ``cluster_by_zorder`` is the one range-exchange + local sort
any re-layout must pay. Column min/max for quantization come from ONE
tiny agg job (2·k scalars to the driver — metadata, not data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: list[Column | str],
    mins: list[int],
    maxs: list[int],
    bits: int = 8,
) -> Column:
    """Morton key for up to 4 integer columns at ``bits`` levels each.

    Quantization is pure integer math — ``q = (x - mn) * (2^bits - 1)
    DIV max(mx - mn, 1)`` — and the interleave is an unrolled
    shift/AND/OR expression tree, so the whole key is one codegen'd
    projection (no UDF, no shuffle). ``bits * len(cols)`` must fit a
    signed 64-bit key (≤ 62).
    """
    n = len(cols)
    if not 1 <= n <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    if bits * n > 62:
        raise ValueError("bits * len(cols) must be <= 62")
    levels = (1 << bits) - 1
    key = F.lit(0).cast("long")
    for ci, (c, mn, mx) in enumerate(zip(cols, mins, maxs)):
        col = F.col(c) if isinstance(c, str) else c
        span = max(int(mx) - int(mn), 1)
        q = ((col.cast("long") - F.lit(int(mn))) * F.lit(levels)) / F.lit(span)
        q = F.floor(q).cast("long")
        # clamp stragglers (values outside the provided min/max)
        q = F.greatest(F.lit(0).cast("long"), F.least(q, F.lit(levels).cast("long")))
        for b in range(bits):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(bit, b * n + ci))
    return key


def column_ranges(
    df: DataFrame, cols: list[str]
) -> tuple[list[int], list[int]]:
    """One agg job -> (mins, maxs) for the clustered columns. 2·k
    scalars cross the driver boundary — planning metadata, not data."""
    row = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).head()
    return (
        [int(row[f"mn_{c}"]) for c in cols],
        [int(row[f"mx_{c}"]) for c in cols],
    )


def cluster_by_zorder(
    df: DataFrame,
    cols: list[str],
    n_partitions: int,
    bits: int = 8,
    key_col: str = "_zkey",
) -> DataFrame:
    """Re-layout ``df`` so every output partition covers a compact
    hyper-rectangle of ``cols``: range-partition on the Morton key,
    then sort within partitions so parquet ROW GROUPS inherit the
    locality too. Downstream, write each partition to a file and
    min/max skipping works on all clustered dimensions (see
    tests/test_zorder.py for the measured pruning win vs linear sort,
    and SnapshotTable integration for planning-time pruning).

    Cost model at 100 TB: one range exchange (AQE-balanced — the key
    is near-uniform because quantization tracks the value
    distribution's span) + local sort; identical to what a linear
    ``ORDER BY`` re-layout pays, but buying skipping on k dimensions
    instead of one."""
    mins, maxs = column_ranges(df, cols)
    keyed = df.withColumn(key_col, zorder_key(cols, mins, maxs, bits))
    return (
        keyed.repartitionByRange(n_partitions, key_col)
        .sortWithinPartitions(key_col)
        .drop(key_col)
    )
