"""As-of (point-in-time) join — an operator Spark has no native form of
(the reference has none either; this is engine capability for time-series /
feature-store workloads at scale).

Implementation: the union-timeline trick. Right-side rows (the versioned
table) and left-side probes are unioned into one per-key timeline, sorted by
(time, side, tiebreak) with right rows first at equal timestamps (ASOF's
``<=`` semantics); a running ``last(value, ignorenulls)`` window carries the
most recent right-side values forward; probe rows then hold their as-of match.

Scale: ONE shuffle of both inputs on the key (same as any join), one
in-partition sort — strictly better than the naive range-join (which explodes
to pairs) and equivalent to what dedicated engines do. Skewed keys are
AQE-splittable because the window partitions by key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """For each left row, attach the ``value_cols`` of the latest right row
    with ``right_ts <= left_ts`` for the same key (NULLs if none).

    ``right`` should hold at most one row per (key, right_ts) — dedup first if
    not (ties at exactly equal timestamps are otherwise ambiguous in every
    as-of engine).
    """
    l_tagged = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # probes sort AFTER versions at equal ts
        F.struct(*left.columns).alias("_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_left"),
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    order = [F.col("_ts"), F.col("_side")] + (
        [F.col(f"_v_{tiebreak}")] if tiebreak else []
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    timeline = l_tagged.unionByName(r_tagged)
    carried = timeline.select(
        "_side",
        "_left",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in value_cols
        ],
    )
    probes = carried.where(F.col("_side") == 1)
    return probes.select(
        *[F.col(f"_left.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof_{c}").alias(f"asof_{c}") for c in value_cols],
    )
