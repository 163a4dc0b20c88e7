"""Funnel / sequence analysis (SURVEY §2.10 X1-X2).

The reference sorts each session's actions inside a flatMap, forms adjacent
page pairs, and countByKey's the pairs that appear in the target flow
(PageOneStepConvertRateSpark.java:122-217), then computes chained conversion
rates on the driver (:270-308).

Spark-first shape: a ``lag`` window over (session, time) produces the adjacent
pairs declaratively — the per-group sort the reference does in Java is the
window's ORDER BY, executed as one shuffle + in-partition sort, no
driver involvement. The rate chain runs on the tiny collected result (the
reference does the same; the result is one row per funnel step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def page_splits(
    df: DataFrame,
    session_col: str = "session_id",
    ts_col: str = "ts",
    page_col: str = "page_id",
    tiebreak_col: str | None = None,
    copartition_col: str | None = None,
) -> DataFrame:
    """Adjacent-step pairs "prev_curr" per session, ordered by event time.

    ``tiebreak_col`` (e.g. the event id) makes ordering total when timestamps
    can collide — at scale, ties are a certainty, and a nondeterministic lag
    makes the whole funnel unstable.

    ``copartition_col``: when the input is already partitioned by a coarser
    key that prefixes the session (the sessionize window's user key), pass it
    as the leading partition column — the existing exchange then satisfies
    this window and the per-session lag costs a sort, not a shuffle.
    """
    parts = ([copartition_col] if copartition_col else []) + [session_col]
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*parts).orderBy(*order)
    prev = F.lag(page_col).over(w)
    return df.withColumn(
        "split",
        F.when(
            prev.isNotNull(),
            F.concat_ws("_", prev.cast("string"), F.col(page_col).cast("string")),
        ),
    )


def funnel_counts(
    splits_df: DataFrame, target_flow: list[str]
) -> DataFrame:
    """Count occurrences of each target split (X1). ``target_flow`` is page ids
    in order, e.g. ['view','click','purchase'] or ['3','5','2','4','6']."""
    targets = [f"{a}_{b}" for a, b in zip(target_flow, target_flow[1:])]
    return (
        splits_df.where(F.col("split").isin(targets))
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("split_pv"))
    )


def conversion_rates(
    spark_counts: dict[str, int], start_pv: int, target_flow: list[str], scale: int = 2
) -> list[tuple[str, float]]:
    """Chained rates (X2): rate(split_1)=pv_1/start_pv; rate(split_i)=pv_i/pv_{i-1}.
    Driver-side over the collected (tiny) counts — matches the reference
    (:287-305), HALF_UP rounding to ``scale`` dp (util/NumberUtils.java:17-20)."""
    from decimal import ROUND_HALF_UP, Decimal

    targets = [f"{a}_{b}" for a, b in zip(target_flow, target_flow[1:])]
    out: list[tuple[str, float]] = []
    last = start_pv
    for t in targets:
        pv = spark_counts.get(t, 0)
        rate = (
            float(
                (Decimal(pv) / Decimal(last)).quantize(
                    Decimal(10) ** -scale, rounding=ROUND_HALF_UP
                )
            )
            if last
            else 0.0
        )
        out.append((t, rate))
        last = pv if pv else last
    return out
