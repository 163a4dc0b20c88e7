"""Physical data layout: partitioned writes, bucketed tables, Z-order
clustering, and small-file compaction.

The reference never manages storage layout — its tables are flat ``\\x01``
text scanned whole (reference: src/main/java/com/soto/util/SparkUtils.java:67-93
interpolates the date range into the SQL but the underlying Hive table is
unpartitioned, so every query reads every byte). At 100 TB layout IS the
query optimizer's raw material; this module provides the write-side half of
each read-side optimization the engine already relies on:

- **Hive-style partitioning** → partition pruning: a ``WHERE date = ...``
  touches only matching directories (plan gate: PartitionFilters).
- **Bucketing** → shuffle-free joins/aggregations: two tables bucketed on the
  join key with the same bucket count sort-merge-join with NO Exchange on
  either side — at 1000 executors that deletes the single most expensive
  stage of a fact-fact join.
- **Z-order clustering** → row-group skipping on MULTIPLE correlated filter
  columns: interleaving the bits of the filter columns gives every parquet
  row group a tight min/max envelope on each dimension, so scans with 2-D
  predicates prune files that a single-column sort could not.
- **Compaction** → bounded file counts: streaming/appending pipelines decay
  into thousands of KB-sized files whose open/footer overhead dominates the
  scan; rewrite to target-sized files.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    max_records_per_file: int = 5_000_000,
    mode: str = "overwrite",
) -> None:
    """Write Hive-style partitioned parquet with one shuffle and bounded
    file counts.

    The naive ``df.write.partitionBy(...)`` emits up to
    tasks x |partition values| files (every task holds rows of every
    partition). Repartitioning by the partition columns first routes each
    partition value to one task → one file per partition value (split by
    ``maxRecordsPerFile`` when large). ``sort_cols`` orders rows inside each
    file so parquet row-group min/max stats are tight for range predicates.
    """
    out = df.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    (
        out.write.mode(mode)
        .option("maxRecordsPerFile", str(max_records_per_file))
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) table at ``path``.

    Both sides of a recurring fact-fact join written with the same
    ``bucket_cols`` / ``num_buckets`` join with zero Exchange: Spark proves
    HashPartitioning(bucket_cols, n) on both scans. ``sort_cols`` additionally
    pre-sorts each bucket file so the sort-merge join skips its Sort too.
    Bucket count is a layout contract — pick it for the TARGET scale (e.g.
    100 TB / (1-2 GB per bucket file)), not the current one; every writer of
    the table must agree.
    """
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(table)


def zvalue(cols: list[Column], bits: int = 16) -> Column:
    """Morton (Z-order) key: interleave the low ``bits`` bits of each column.

    Inputs must already be non-negative ints < 2**bits (see
    ``normalize_to_bits``). Pure JVM bit arithmetic — shifts and ORs inside
    whole-stage codegen, no UDF. bits * len(cols) must fit a long (<= 63).
    """
    if bits * len(cols) > 63:
        raise ValueError("z-value would overflow a long")
    acc = F.lit(0).cast("long")
    # Bit i of column c lands at interleaved position i*len(cols) + c.
    for i in range(bits):
        for c_idx, col in enumerate(cols):
            bit = F.shiftright(col.cast("long"), i).bitwiseAND(F.lit(1))
            acc = acc.bitwiseOR(
                F.shiftleft(bit, i * len(cols) + c_idx)
            )
    return acc


def normalize_to_bits(col: Column, lo, hi, bits: int = 16) -> Column:
    """Affine-map a numeric column from [lo, hi] onto [0, 2**bits) (the
    domain ``zvalue`` interleaves). Rank-based normalization would be
    skew-robust but costs a global sort; min/max scaling is one cheap agg."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(span)
    max_code = (1 << bits) - 1
    return F.least(
        F.lit(max_code).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            F.floor(scaled * F.lit(float(1 << bits))).cast("long"),
        ),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    bits: int = 16,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the Z-order curve over ``zorder_cols``.

    One aggregate computes per-column min/max (driver receives a single row —
    O(cols), not O(data)); each row is mapped to its Morton key;
    ``repartitionByRange`` + ``sortWithinPartitions`` on the key place
    Z-adjacent rows in the same file and row group, so parquet min/max stats
    prune multi-dimensional predicates. The key is dropped before writing —
    layout only, schema unchanged.
    """
    stats = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in zorder_cols],
        *[F.max(c).alias(f"hi_{c}") for c in zorder_cols],
    ).collect()[0]
    z = zvalue(
        [
            normalize_to_bits(
                F.col(c), stats[f"lo_{c}"], stats[f"hi_{c}"], bits
            )
            for c in zorder_cols
        ],
        bits,
    )
    out = df.withColumn("__z", z)
    n = num_files or max(df.rdd.getNumPartitions(), 1)
    (
        out.repartitionByRange(n, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_file_mb: int = 128,
) -> int:
    """Rewrite ``src_path`` parquet into ~``target_file_mb`` files at
    ``dst_path``; returns the target file count.

    Sizing reads filesystem metadata only (the file listing Spark already
    holds), never the data. On a cluster this runs per partition directory
    with the same arithmetic; compacting preserves sort order within each
    new file only if the source was globally sorted — re-run
    ``write_zordered`` instead when clustering matters.
    """
    df = spark.read.parquet(src_path)
    total = sum(
        os.path.getsize(f.replace("file:", "")) for f in df.inputFiles()
    )
    n = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df.repartition(n).write.mode("overwrite").parquet(dst_path)
    return n
