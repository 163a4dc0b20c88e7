"""Bucketed range join — an operator Spark's planner lacks a fast native
strategy for.

A plain ``a JOIN b ON abs(a.ts - b.ts) <= d`` has no equi-key, so Catalyst
falls back to BroadcastNestedLoopJoin (O(n·m) comparisons and a broadcast of
a whole side) or a cartesian product. The standard distributed formulation
(the same shape as Databricks' range-join optimization and
flint/spark-ts-style as-of libraries) buckets the time axis:

1. bucket width w = 2d. A probe's match interval [ts-d, ts+d] has length
   exactly w, so it overlaps exactly two buckets: floor((ts-d)/w) and
   floor((ts-d)/w)+1 — a fixed 2x fan-out, never a cross join;
2. the probe (left) side is replicated into those two buckets; the build
   (right) side keeps its single bucket floor(ts/w);
3. equi-join on (keys…, bucket) — a normal shuffle/broadcast hash join;
4. residual ``abs(a.ts - b.ts) <= d`` removes in-bucket false hits.

At 100 TB this turns an impossible nested loop into one hash join whose
shuffle keys are (join_key, epoch_bucket) — uniform when time is, and
salt-able when not. No reference counterpart (no range joins there) —
training-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import epoch_us, epoch_us_sql


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    max_diff_s: int,
    keys: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join rows whose timestamps are within ``max_diff_s`` seconds of each
    other (optionally also matching on equi-``keys``).

    Join cardinality stays |left|*2 pre-filter. Columns of both inputs
    survive; ambiguous names must be disambiguated by the caller beforehand.
    Timestamps are assumed post-epoch (integer ``div`` truncation == floor).
    """
    if how != "inner":
        raise ValueError("bucketed range_join supports inner joins")
    keys = keys or []
    d_us = int(max_diff_s) * 1_000_000
    w_us = 2 * d_us
    lo = F.expr(f"({epoch_us_sql(left_ts)} - {d_us}) div {w_us}")
    l_rep = left.withColumn("__bucket", F.explode(F.array(lo, lo + F.lit(1))))
    r_b = right.withColumn("__bucket", F.expr(f"{epoch_us_sql(right_ts)} div {w_us}"))
    residual: Column = (
        F.abs(epoch_us(left_ts) - epoch_us(right_ts)) <= d_us
    )
    return (
        l_rep.join(r_b, keys + ["__bucket"], "inner")
        .where(residual)
        .drop("__bucket")
    )
