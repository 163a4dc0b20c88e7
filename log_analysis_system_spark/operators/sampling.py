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


def global_rank(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rnk",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed 0-based global row-number by ``order_cols`` — the
    scale-safe replacement for ``row_number() OVER (ORDER BY ...)``, which
    moves ALL data to a single partition.

    Plan: range-partition on the sort keys (each partition holds a
    contiguous key range), sort within partitions, derive each row's
    per-partition ordinal from ``monotonically_increasing_id`` (partition id
    in the high bits, the post-sort row counter in the low 33 bits), then
    shift every partition by the total count of the partitions before it.
    The only globally-exchanged structure is the per-partition count vector
    (``num_partitions`` rows — O(parallelism), not O(data)), broadcast back
    as an offset join. Two data shuffles total at any scale, neither of
    which funnels into one task.

    ``order_cols`` must be a total order (add a unique tiebreaker) or ranks
    within ties are partition-placement-dependent.
    """
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    arranged = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .withColumn("__pid", F.shiftright("__mid", 33).cast("long"))
        .withColumn("__local", F.col("__mid").bitwiseAND((1 << 33) - 1))
    )
    arranged = arranged.localCheckpoint(eager=False)
    counts = arranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("__cnt"))
    # Prefix-sum over O(parallelism) rows, never O(data): a broadcast
    # nested-loop self-join (pid' < pid) instead of an unpartitioned window,
    # so WindowExec's single-partition warning stays reserved for real
    # data-sized regressions.
    preceding = counts.select(
        F.col("__pid").alias("__pid2"), F.col("__cnt").alias("__cnt2")
    )
    offsets = (
        counts.join(
            F.broadcast(preceding), F.col("__pid2") < F.col("__pid"), "left"
        )
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__cnt2"), F.lit(0)).alias("__offset"))
    )
    return (
        arranged.join(F.broadcast(offsets), "__pid")
        .withColumn(rank_col, F.col("__offset") + F.col("__local"))
        .drop("__mid", "__pid", "__local", "__offset")
    )
