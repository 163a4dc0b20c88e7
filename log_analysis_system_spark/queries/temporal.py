"""Temporal operators over the events stream table: batch gap-sessionization
and SCD2-style validity intervals. Both are the batch twins of streaming
constructs (`F.session_window`, `streaming/sessionization.py`) — at 100 TB
the same logical ops run over the lakehouse history instead of the live
stream, so the engine carries oracle-checked batch forms too.

Determinism: window orderings always carry the (ts, event_id) total order —
timestamp ties are broken by the unique key, so both engines assign
identical session indices and interval bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import read_events
from . import query

GAP_MINUTES = 30
_GAP_US = GAP_MINUTES * 60 * 1_000_000


@query(
    "gap_sessions_events",
    oracle=f"""
WITH o AS (
    SELECT user_id, ts, event_id,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT user_id, ts,
           sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS session_idx
    FROM o
)
SELECT user_id, session_idx, min(ts) AS session_start,
       max(ts) AS session_end, count(*) AS n_events
FROM s GROUP BY 1, 2
""",
)
def q_gap_sessions_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization in batch: a {GAP} -minute silence starts a new
    session (the batch twin of ``F.session_window``; the reference only has
    pre-assigned session ids). One user-partitioned sort serves BOTH windows
    (lag flag + running session index), and the closing groupBy clusters on
    (user_id, session_idx) — a superset of the existing hash partitioning —
    so the whole query is a single exchange at any scale."""
    ev = read_events(spark, sf_dir).select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_s = F.when(
        F.lag("ts").over(w).isNull()
        | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > _GAP_US),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_idx = ev.withColumn("new_s", new_s).withColumn(
        "session_idx", F.sum("new_s").over(run)
    )
    return with_idx.groupBy("user_id", "session_idx").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "user_state_intervals",
    oracle="""
WITH changes AS (
    SELECT user_id, event_type, ts,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS prev_type,
           event_id
    FROM events
),
state AS (
    SELECT user_id, event_type, ts, event_id FROM changes
    WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL THEN TRUE ELSE FALSE END AS is_current
FROM state
""",
)
def q_user_state_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2-style validity intervals: collapse each user's event-type run
    into one row valid [first occurrence, next state change) — the
    slowly-changing-dimension build a warehouse does from a CDC feed
    (``latest_per_key`` is the type-1 twin). Two windows over the SAME
    (user_id | ts, event_id) sort: the change filter preserves both the
    partitioning and the order, so Catalyst plans one exchange + one sort
    for the whole query."""
    ev = read_events(spark, sf_dir).select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    state = ev.withColumn("prev_type", F.lag("event_type").over(w)).where(
        F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type"))
    )
    return state.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
