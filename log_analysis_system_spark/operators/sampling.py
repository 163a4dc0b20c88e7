"""Stratified sampling (SURVEY §2.9 R1).

The reference extracts ~100 sessions/day, split across hours proportionally to
each hour's share of the day's sessions, by drawing random indices on the
driver and broadcasting them (UserVisitSessionAnalyzeSpark.java:701-1013).
That design is driver-bound and unseeded (order-dependent).

Engine form: fully distributed and deterministic —
1. per-stratum counts (one small aggregate, the A2 histogram),
2. per-stratum quota from the same proportional formula,
3. rank rows inside each stratum by a *deterministic pseudo-random key*
   (md5 of the row id — stable across engines and runs, unlike rand(seed)
   which is engine-specific), keep rank <= quota.

At 100 TB: one shuffle for the window; the quota table is tiny and broadcast.
No driver-side index draws, no collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stratified_sample_exact(
    df: DataFrame,
    stratum_cols: list[str],
    id_col: str,
    quota: Column,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Keep exactly ``quota`` rows per stratum (quota is a Column evaluated
    against the per-stratum count as ``stratum_n``), chosen by md5-rank.

    ``quota`` example — the reference's per-day/per-hour proportional split
    (UserVisitSessionAnalyzeSpark.java:803-807):
        F.least(F.col("stratum_n"), F.round(F.col("stratum_n") / F.col("day_n") * 100))
    """
    counts = df.groupBy(*stratum_cols).agg(F.count(F.lit(1)).alias("stratum_n"))
    quotas = counts.withColumn("stratum_quota", quota.cast("long"))
    w = Window.partitionBy(*stratum_cols).orderBy(
        F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col)
    )
    ranked = df.withColumn(rank_col, F.row_number().over(w))
    return (
        ranked.join(F.broadcast(quotas), stratum_cols)
        .where(F.col(rank_col) <= F.col("stratum_quota"))
        .drop("stratum_n", "stratum_quota")
    )
