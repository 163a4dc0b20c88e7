"""Streaming sessionization (SURVEY §2.11 ST8 — absent from the reference,
whose sessionization is batch-only A1).

Two engine-native forms:

1. ``session_window_aggregate`` — Spark's built-in ``F.session_window`` gap
   windows: fully engine-managed state, watermark-bounded, merge-capable.
   The default choice.
2. ``stateful_session_stats`` — ``applyInPandasWithState``: the template for
   CUSTOM stateful operators (anything session_window can't express — e.g.
   per-session distinct payload sets with custom eviction). State is explicit
   (per user: open-session aggregate), timeouts close idle sessions. This is
   the pattern the engine uses wherever the reference would have reached for
   updateStateByKey with bespoke logic.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("step_length", LongType()),
        StructField("status", StringType()),  # open | closed
    ]
)

SESSION_STATE = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("steps", LongType()),
    ]
)


def session_window_aggregate(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Built-in gap-based session windows over an event-time stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("step_length"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "step_length",
        )
    )


def stateful_session_stats(
    events: DataFrame,
    gap_minutes: int = 30,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState.

    Per user key, state = the open session (start/end/step count). Each batch
    folds its (time-sorted) events into the open session, emitting a 'closed'
    row whenever a gap exceeds the threshold.

    ``idle_timeout_ms``: optional processing-time idle eviction — closes and
    flushes sessions of keys that stop sending. Note a live timeout keeps the
    query scheduling cleanup batches, so synchronous test harnesses
    (processAllAvailable) should leave it None.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, steps = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "step_length": [steps],
                    "status": ["closed"],
                }
            )
            return

        ts_us = (
            pd.concat([p["ts"] for p in pdfs]).sort_values().astype("int64") // 1000
        )
        if state.exists:
            start_us, end_us, steps = state.get
        else:
            start_us = end_us = int(ts_us.iloc[0])
            steps = 0
        closed = []
        for t in ts_us:
            t = int(t)
            if t - end_us > gap_us:
                closed.append((start_us, end_us, steps))
                start_us, steps = t, 0
            end_us = max(end_us, t)
            steps += 1
        state.update((start_us, end_us, steps))
        if idle_timeout_ms is not None:
            state.setTimeoutDuration(idle_timeout_ms)
        out = pd.DataFrame(
            {
                "user_id": [user_id] * (len(closed) + 1),
                "session_start": [
                    pd.Timestamp(s, unit="us") for s, _, _ in closed
                ]
                + [pd.Timestamp(start_us, unit="us")],
                "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed]
                + [pd.Timestamp(end_us, unit="us")],
                "step_length": [n for _, _, n in closed] + [steps],
                "status": ["closed"] * len(closed) + ["open"],
            }
        )
        yield out

    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        fold,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if idle_timeout_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
