"""Page single-hop conversion funnel (SURVEY §2.10 X1-X2; reference
PageOneStepConvertRateSpark.java:32-335) over sessionized events.

Target flow: view → click → purchase. The reference sorts each session's
actions inside a flatMap and emits adjacent page pairs; here a ``lag`` window
produces the pairs declaratively (one shuffle, in-partition sort) and the rate
chain — rate(split_1) = pv_1 / start_pv, rate(split_i) = pv_i / pv_{i-1} — is
computed fully in-plan via a window over the (tiny) per-split counts, so the
whole query stays one DataFrame expression with a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import read_events

from ..operators.funnel import page_splits
from ..operators.sessionize import sessionize
from . import query
from .session_analysis import GAP_MINUTES, SESS_CTE

TARGET_FLOW = ["view", "click", "purchase"]
_TARGETS = [f"{a}_{b}" for a, b in zip(TARGET_FLOW, TARGET_FLOW[1:])]


@query(
    "funnel",
    oracle=f"""
WITH {SESS_CTE},
splits AS (
    SELECT session_id,
           lag(event_type) OVER (PARTITION BY session_id ORDER BY ts, event_id)
               || '_' || event_type AS split
    FROM sess
),
counts AS (
    SELECT split, count(*) AS split_pv FROM splits
    WHERE split IN ('view_click', 'click_purchase')
    GROUP BY split
),
start_pv AS (SELECT count(*) AS pv FROM sess WHERE event_type = 'view'),
targets AS (
    SELECT * FROM (VALUES ('view_click', 1), ('click_purchase', 2)) t(split, ord)
),
chained AS (
    SELECT t.split, t.ord, COALESCE(c.split_pv, 0) AS split_pv,
           lag(COALESCE(c.split_pv, 0)) OVER (ORDER BY t.ord) AS prev_pv
    FROM targets t LEFT JOIN counts c USING (split)
)
SELECT ch.split, ch.split_pv,
       round(ch.split_pv / COALESCE(ch.prev_pv, s.pv), 4) AS convert_rate
FROM chained ch CROSS JOIN start_pv s
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 + X2: adjacent-pair generation via lag, target-split counts, chained
    conversion rates. Reference pair-gen: PageOneStepConvertRateSpark.java:
    122-217; rate chain :270-308 (driver loop → here an in-plan window over
    the 2-row count table)."""
    ev = read_events(spark, sf_dir)
    sess = sessionize(
        ev, user_col="user_id", ts_col="ts", gap_minutes=GAP_MINUTES,
        tiebreak_col="event_id",
    )
    splits = page_splits(
        sess, session_col="session_id", ts_col="ts", page_col="event_type",
        tiebreak_col="event_id", copartition_col="user_id",
    )
    counts = (
        splits.where(F.col("split").isin(_TARGETS))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("split_pv"))
    )
    # start_pv needs no session column — count from the RAW scan so this
    # branch is a pushed-filter count, not a second sessionize window pass
    # over the full corpus (same count either way).
    start_pv = ev.where(F.col("event_type") == TARGET_FLOW[0]).agg(
        F.count(F.lit(1)).alias("pv")
    )
    targets = spark.createDataFrame(
        [(t, i + 1) for i, t in enumerate(_TARGETS)], "split string, ord int"
    )
    # prev-step lookup as a tiny self-join on ord-1 rather than lag() over an
    # unpartitioned window: same 4-row result, but no single-partition window
    # in any plan (keeps that warning reserved for real regressions).
    filled = targets.join(counts, "split", "left").withColumn(
        "split_pv", F.coalesce(F.col("split_pv"), F.lit(0))
    )
    prev = filled.select(
        F.col("ord").alias("prev_ord"), F.col("split_pv").alias("prev_pv")
    )
    chained = filled.join(
        F.broadcast(prev), F.col("ord") - 1 == F.col("prev_ord"), "left"
    ).drop("prev_ord")
    return chained.crossJoin(start_pv).select(
        "split",
        "split_pv",
        F.round(
            F.col("split_pv") / F.coalesce(F.col("prev_pv"), F.col("pv")), 4
        ).alias("convert_rate"),
    )
