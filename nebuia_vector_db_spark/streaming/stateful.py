"""Custom stateful streaming operator: per-user running aggregates via
``applyInPandasWithState`` (the escape hatch when built-in windowed
aggs can't express the state machine — SURVEY.md §2.2 'streaming').

The operator keeps (count, sum, last_seen_us) per user across
micro-batches and emits the updated row for every user seen in the
batch — the building block for online per-entity counters (rate
limiting, usage metering, feature freshness).

Scale: state is partitioned by the group key across executors and
checkpointed by the state store; a timeout (`GroupStateTimeout`) would
bound it for evicting idle users — kept NoTimeout here because the
fixture replay is finite.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, s, last_us = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        ts_us = (pdf["ts"].astype("int64") // 1000).max()
        last_us = max(last_us, int(ts_us))
    state.update((n, s, last_us))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s],
            "last_seen_us": [last_us],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """events (streaming, with ``ts timestamp``/``user_id``/``value``)
    → one updated (user_id, n_events, sum_value, last_seen_us) row per
    user per micro-batch, state carried across batches."""
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
