"""As-of (point-in-time) join — an operator the reference lacks and
Spark has no builtin for; composed from union + window per the
mandated custom-operator strategy (composition of DataFrame ops first,
Pandas UDF only if semantics demand — here they don't).

Semantics (matching DuckDB/pandas ``ASOF LEFT JOIN ... ON l.k = r.k
AND l.ts >= r.ts``): for every left row, attach the right row with the
greatest ``right_ts <= left_ts`` within the same key; ties at equal ts
match. Optional ``tolerance`` voids matches older than the limit.

Why union+window and not a range join: a theta-join on
``r.ts <= l.ts`` explodes to O(|L|·|R|) per key before the argmax cut.
The union approach interleaves both sides in ONE shuffle partitioned
by key, sorts by ts, and carries the latest right row forward with
``last(..., ignorenulls=True)`` — O((|L|+|R|) log) per key, the same
merge discipline a native as-of join uses, and skew-safe under AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "_asof_side"  # 0 = right (sorts first at ts ties), 1 = left


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    suffix: str = "_matched",
    tolerance_us: int | None = None,
) -> DataFrame:
    """Backward as-of left join. Returns every ``left`` row plus
    ``<value_col><suffix>`` columns (and ``<right_ts><suffix>``) from
    the latest right row at-or-before the left timestamp.
    """
    on = list(on)
    value_cols = [c for c in value_cols if c != right_ts]

    lhs = left.withColumn(_SIDE, F.lit(1)).withColumn("_asof_ts", F.col(left_ts))

    rhs = (
        right.select(
            *on,
            F.col(right_ts).alias("_asof_ts"),
            *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        )
        .withColumn(f"{right_ts}{suffix}", F.col("_asof_ts"))
        .withColumn(_SIDE, F.lit(0))
    )

    # missing columns on either side null-fill with the other side's type
    unioned = lhs.unionByName(rhs, allowMissingColumns=True)

    # one shuffle on the key; right rows sort before left at ts ties so
    # an equal-timestamp right row is visible to the left row
    w = (
        Window.partitionBy(*on)
        .orderBy("_asof_ts", _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned
    for c in [*[f"{c}{suffix}" for c in value_cols], f"{right_ts}{suffix}"]:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = carried.where(F.col(_SIDE) == 1).drop(_SIDE, "_asof_ts")
    if tolerance_us is not None:
        fresh = (
            F.unix_micros(F.col(left_ts))
            - F.unix_micros(F.col(f"{right_ts}{suffix}"))
        ) <= tolerance_us
        for c in [*[f"{c}{suffix}" for c in value_cols], f"{right_ts}{suffix}"]:
            out = out.withColumn(
                c, F.when(fresh, F.col(c)).otherwise(F.lit(None))
            )
    return out
