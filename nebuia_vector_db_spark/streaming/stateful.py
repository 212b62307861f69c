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


# --------------------------------------------------------------------------
# Stateful streaming funnel: a per-user STATE MACHINE (not a mere
# counter) — the streaming twin of queries.py::q_events_funnel. State
# holds the first-view / first-ordered-click / first-qualified-purchase
# event times; a stage slot fills only when every earlier slot is
# filled with a strictly earlier timestamp, so the final state equals
# the batch min-aggregate chain when events arrive in per-user event-
# time order (guaranteed within a micro-batch by an explicit sort;
# across batches by a time-ordered source — for an out-of-order feed,
# front it with a watermarked sort or widen the state to candidate
# minima).

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t1_us", T.LongType()),
        T.StructField("t2_us", T.LongType()),
        T.StructField("t3_us", T.LongType()),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("t1", T.LongType()),
        T.StructField("t2", T.LongType()),
        T.StructField("t3", T.LongType()),
    ]
)


def _make_funnel_update(min_k: int):
    def _update_funnel(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        t1, t2, t3 = state.get if state.exists else (0, 0, 0)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values("ts", kind="mergesort")
        # unit-safe µs conversion: Arrow→pandas may yield datetime64[ns]
        # or datetime64[us] depending on pandas version; an int64 view
        # divided by a hard-coded 1000 would silently shift units
        ts_us = batch["ts"].astype("datetime64[us]").astype("int64")
        for t, etype, k in zip(
            ts_us.tolist(), batch["event_type"].tolist(), batch["k"].tolist()
        ):
            if t1 == 0:
                if etype == "view":
                    t1 = t
            elif t2 == 0:
                if etype == "click" and t > t1:
                    t2 = t
            elif t3 == 0:
                if etype == "purchase" and t > t2 and k is not None and k >= min_k:
                    t3 = t
        state.update((t1, t2, t3))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "t1_us": [t1],
                "t2_us": [t2],
                "t3_us": [t3],
            }
        )

    return _update_funnel


def funnel_user_state(events: DataFrame, min_k: int = 50) -> DataFrame:
    """events stream → one (user_id, t1_us, t2_us, t3_us) row per user
    per micro-batch (0 = stage not reached), state carried across
    batches. The JSON qualifier is extracted JVM-side BEFORE the
    Python state kernel, so the Arrow batch carries a typed long."""
    from pyspark.sql import functions as F

    prepared = events.select(
        "user_id",
        "ts",
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_funnel_update(min_k),
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4): typed multi-state processor
# ---------------------------------------------------------------------------
PROFILE_OUTPUT_SCHEMA = (
    "user_id long, n_types long, n_events long, sum_value double, seq long"
)


def _profile_processor_cls():
    """Factory so the module imports even on a Spark without the
    transformWithState API (the class body references it lazily)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class EventProfileProcessor(StatefulProcessor):
        """Per-user profile via the Spark 4 arbitrary-state API —
        the successor to applyInPandasWithState, with TYPED state
        primitives instead of one opaque tuple:

        - ``MapState[event_type -> count]`` (per-type tallies; a
          map update touches ONE key, not a whole serialized blob —
          the at-scale win over GroupState when profiles are wide)
        - ``ValueState (n_events, sum_value, seq)`` running totals;
          ``seq`` is a monotonic emit counter so downstream consumers
          (and the equivalence test) can identify each user's LATEST
          profile row in Update output mode.

        Emits one profile row per user per micro-batch it appears in.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._types = handle.getMapState(
                "type_counts", "t string", "c long"
            )
            self._totals = handle.getValueState(
                "totals", "n long, s double, seq long"
            )

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n = s = 0
            type_counts: dict[str, int] = {}
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
                for t, c in pdf["event_type"].value_counts().items():
                    type_counts[t] = type_counts.get(t, 0) + int(c)
            for t, c in type_counts.items():
                prev = (
                    self._types.getValue((t,))[0]
                    if self._types.containsKey((t,))
                    else 0
                )
                self._types.updateValue((t,), (prev + c,))
            tot = self._totals.get() if self._totals.exists() else (0, 0.0, 0)
            new = (tot[0] + n, tot[1] + s, tot[2] + 1)
            self._totals.update(new)
            n_types = sum(1 for _ in self._types.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_types": [n_types],
                    "n_events": [new[0]],
                    "sum_value": [new[1]],
                    "seq": [new[2]],
                }
            )

        def close(self) -> None:
            pass

    return EventProfileProcessor


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Streaming per-user profile (distinct event types, totals) via
    ``transformWithStateInPandas``. Update mode; the row with the
    highest ``seq`` per user is the current profile. Batch mirror:
    ``groupBy(user_id).agg(countDistinct(event_type), count(*),
    sum(value))`` — equivalence pinned by
    tests/test_stateful_streaming.py."""
    cls = _profile_processor_cls()
    return (
        events.select("user_id", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=cls(),
            outputStructType=PROFILE_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
