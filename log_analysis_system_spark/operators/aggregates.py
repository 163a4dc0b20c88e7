"""Aggregation operators (SURVEY §2.4 A2-A7).

A3 in the reference is a custom string-packed AccumulatorParam incremented
inside a filter (spark/session/SessionAggrStatAccumulator.java:18-90) — an
idiom that is both unreliable (accumulators in transformations re-fire on
retry) and driver-bound. Here it is one conditional-aggregation pass:
``sum(when(bin_condition, 1))`` per bin — a single map-side-combinable
hash aggregate, no accumulator, exactly-once semantics from the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_ratio_aggregate(
    df: DataFrame, bins: dict[str, Column], scale: int = 2
) -> DataFrame:
    """One-pass histogram + ratios (A3 parity).

    ``bins`` maps output column name -> boolean Column. Output: one row with
    ``session_count`` and one HALF_UP-rounded ratio column per bin
    (ratio finalization: UserVisitSessionAnalyzeSpark.java:1021-1114;
    rounding: util/NumberUtils.java:17-20 — Spark's round() is HALF_UP,
    matching the reference's BigDecimal mode).
    """
    cnt = F.count(F.lit(1))
    aggs = [cnt.alias("session_count")] + [
        F.round(
            F.sum(F.when(cond, 1).otherwise(0)) / cnt, scale
        ).alias(f"{name}_ratio")
        for name, cond in bins.items()
    ]
    return df.agg(*aggs)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, Column],
    n_salts: int = 10,
) -> DataFrame:
    """A9: skew-safe two-stage aggregation — random-salt partial aggregate,
    then final merge after stripping the salt (the reference's random-prefix
    double group-by, AreaTop3ProductSpark.java:319-348 + RandomPrefixUDF).

    Under AQE (`spark.sql.adaptive.skewJoin/coalescePartitions`) this pattern
    is normally unnecessary — keep it for aggregations whose single hot key
    overwhelms even AQE's partition splitting. Only works for algebraic
    aggregates; ``aggs`` maps output name -> partial aggregate expression, and
    the final stage re-aggregates with SUM (so express count as sum of 1s).
    """
    salted = df.withColumn("_salt", (F.rand() * n_salts).cast("int"))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )


def explode_count(
    df: DataFrame, list_col: str, sep: str = ",", out_col: str = "id"
) -> DataFrame:
    """Split a delimited list column, explode, count per element (A5;
    reference UserVisitSessionAnalyzeSpark.java:1398-1506 does this with
    flatMap + reduceByKey). Null/empty lists contribute nothing."""
    return (
        df.where(F.col(list_col).isNotNull())
        .select(F.explode(F.split(F.col(list_col), sep)).alias(out_col))
        .where(F.col(out_col) != "")
        .groupBy(out_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
