"""Batch-replayable equivalents of the realtime ad-analytics job (SURVEY §2.11
ST3-ST6; reference AdClickRealTimeSpark.java:37-127), expressed over ``events``.

The true Structured Streaming implementations live in
``log_analysis_system_spark.streaming`` and are exercised by streaming tests
(file source + availableNow). These batch forms give each streaming operator a
DuckDB oracle: for the cumulative/windowed aggregations, replaying the full
input through the stream yields exactly the final batch state, so the batch
query IS the semantic spec of the stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import read_events

from ..operators.topn import grouped_topn
from . import query

BLACKLIST_THRESHOLD = 2  # reference literal `> 1` (AdClickRealTimeSpark.java:330)
WINDOW_SECONDS = 3600
SLIDE_SECONDS = 600


@query(
    "stream_blacklist",
    oracle=f"""
SELECT strftime(ts, '%Y-%m-%d') AS date_key, user_id, count(*) AS click_count
FROM events
WHERE event_type = 'click'
GROUP BY 1, 2
HAVING count(*) > {BLACKLIST_THRESHOLD}
""",
)
def q_stream_blacklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 final state: users whose per-day click count exceeds the threshold
    (reference probes MySQL per element inside filter(),
    AdClickRealTimeSpark.java:313-337 — here state lives in the engine)."""
    ev = read_events(spark, sf_dir)
    return (
        ev.where(F.col("event_type") == "click")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("date_key"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("click_count"))
        .where(F.col("click_count") > BLACKLIST_THRESHOLD)
    )


@query(
    "stream_cumulative_stat",
    oracle="""
WITH daily AS (
    SELECT strftime(ts, '%Y-%m-%d') AS date_key, event_type, count(*) AS cnt
    FROM events GROUP BY 1, 2
)
SELECT date_key, event_type, cnt,
       CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY date_key
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt
FROM daily
""",
)
def q_stream_cumulative_stat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 / A11 final state: running totals per key across days (the
    reference's updateStateByKey re-emits full state each batch; the batch
    equivalent is a cumulative window over daily counts)."""
    ev = read_events(spark, sf_dir)
    daily = ev.groupBy(
        F.date_format("ts", "yyyy-MM-dd").alias("date_key"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("date_key")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return daily.select(
        "date_key", "event_type", "cnt", F.sum("cnt").over(w).alias("cum_cnt")
    )


@query(
    "stream_top3_per_day",
    oracle="""
WITH counts AS (
    SELECT strftime(ts, '%Y-%m-%d') AS date_key,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS ad_id,
           count(*) AS click_count
    FROM events WHERE event_type = 'click'
    GROUP BY 1, 2
),
ranked AS (
    SELECT *, CAST(row_number() OVER (
                  PARTITION BY date_key
                  ORDER BY click_count DESC, ad_id) AS BIGINT) AS rnk
    FROM counts
)
SELECT date_key, ad_id, click_count, rnk FROM ranked WHERE rnk <= 3
""",
)
def q_stream_top3_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 / W2: per-day top-3 'ads' (props.k) by click count. Implements the
    documented intent rank<=3 — the reference code ships `WHERE rank>=3`
    (AdClickRealTimeSpark.java:658), a recorded divergence (README.md:1536-1560
    shows rank<=3)."""
    ev = read_events(spark, sf_dir)
    counts = (
        ev.where(F.col("event_type") == "click")
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("date_key"),
            F.get_json_object("props", "$.k").cast("long").alias("ad_id"),
        )
        .agg(F.count(F.lit(1)).alias("click_count"))
    )
    return grouped_topn(
        counts,
        ["date_key"],
        [F.desc("click_count"), F.asc("ad_id")],
        3,
        rank_col="rnk",
    ).withColumn("rnk", F.col("rnk").cast("long"))


@query(
    "stream_sliding_window",
    oracle=f"""
WITH assigned AS (
    SELECT event_type,
           CAST(to_timestamp(
               (epoch_us(ts) // 1000000 // {SLIDE_SECONDS}) * {SLIDE_SECONDS}
               - i * {SLIDE_SECONDS}) AS TIMESTAMP) AS window_start
    FROM (SELECT event_type, ts,
                 unnest(generate_series(0, {WINDOW_SECONDS // SLIDE_SECONDS - 1})) AS i
          FROM events)
)
SELECT window_start, event_type, count(*) AS cnt
FROM assigned GROUP BY 1, 2
""",
)
def q_stream_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST6 / A13: 60-minute window sliding every 10 minutes, per event type —
    the reference's reduceByKeyAndWindow (AdClickRealTimeSpark.java:720-760).
    Batch form uses the same F.window() the streaming query uses; the oracle
    replicates Spark's window assignment (each event belongs to
    window/slide = 6 consecutive windows)."""
    ev = read_events(spark, sf_dir)
    return (
        ev.groupBy(
            F.window("ts", f"{WINDOW_SECONDS} seconds", f"{SLIDE_SECONDS} seconds"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("window_start"), "event_type", "cnt"
        )
    )
