"""Layout module: partition pruning, shuffle-free bucketed joins, Z-order
clustering, compaction. These are write-side guarantees the 100 TB read
paths depend on, so each test asserts the PHYSICAL consequence (plan shape
or file stats), not just row equality."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from log_analysis_system_spark.sources.layout import (
    compact,
    normalize_to_bits,
    write_bucketed,
    write_partitioned,
    write_zordered,
    zvalue,
)

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "orders_by_prio")
    write_partitioned(orders, path, ["o_orderpriority"], sort_cols=["o_orderdate"])

    back = spark.read.parquet(path)
    one = back.where(F.col("o_orderpriority") == "1-URGENT")
    # Partition pruning: the predicate lands in PartitionFilters (directory
    # pruning), not PushedFilters (row-group evaluation after listing).
    plan = _plan(one)
    assert "PartitionFilters" in plan
    assert "1-URGENT" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    expected = orders.where(F.col("o_orderpriority") == "1-URGENT").count()
    assert one.count() == expected


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    write_bucketed(
        orders, "t_orders_b", str(tmp_path / "ob"), ["o_orderkey"], 4
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        str(tmp_path / "lb"),
        ["o_orderkey"],
        4,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # Force a non-broadcast join so the test exercises the bucketing
        # (a broadcast join would also be exchange-free, vacuously).
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = (
            spark.table("t_orders_b")
            .join(spark.table("t_lineitem_b"), "o_orderkey")
            .select("o_orderkey", "o_totalprice", "l_quantity")
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # Same result as the plain (shuffling) join.
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_zvalue_interleaves_bits(spark):
    # z(x=0b11, y=0b01) with 2 bits = y1 x1 y0 x0 = 0 1 1 1 = 7
    row = (
        spark.range(1)
        .select(
            zvalue([F.lit(3), F.lit(1)], bits=2).alias("z"),
            zvalue([F.lit(1), F.lit(3)], bits=2).alias("z2"),
        )
        .collect()[0]
    )
    assert row["z"] == 0b0111
    assert row["z2"] == 0b1011
    with pytest.raises(ValueError):
        zvalue([F.lit(1), F.lit(1)], bits=32)


def test_normalize_to_bits_bounds(spark):
    rows = (
        spark.createDataFrame([(0.0,), (50.0,), (100.0,)], "v double")
        .select(normalize_to_bits(F.col("v"), 0.0, 100.0, bits=8).alias("n"))
        .collect()
    )
    vals = sorted(r["n"] for r in rows)
    assert vals[0] == 0
    assert vals[1] == 128
    assert vals[2] == 255  # hi clamps to 2**bits - 1, never overflows


def test_zorder_write_tightens_file_envelopes(spark, tmp_path):
    # Two independent uniform dims: row-ordered files span the full y range;
    # Z-ordered files must cover a much smaller area each.
    df = spark.range(40_000).select(
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"),
    )
    path = str(tmp_path / "zordered")
    write_zordered(df, path, ["x", "y"], bits=8, num_files=16)

    files = [f.replace("file:", "") for f in spark.read.parquet(path).inputFiles()]
    assert len(files) > 4
    area = 0.0
    for f in files:
        md = pq.read_metadata(f)
        t = pq.read_table(f, columns=["x", "y"])
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        area += (max(xs) - min(xs)) * (max(ys) - min(ys))
        assert md.num_rows > 0
    avg_area = area / len(files)
    # Unclustered expectation: every file spans ~the whole 200x200 domain
    # (area 40000). Z-ordering must cut the average envelope sharply.
    assert avg_area < 40_000 * 0.35, avg_area
    # Layout only: the data itself is unchanged.
    assert spark.read.parquet(path).count() == 40_000


def test_compact_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")
    spark.range(10_000).repartition(64).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) == 64
    n = compact(spark, src, dst, target_file_mb=128)
    out = spark.read.parquet(dst)
    assert len(out.inputFiles()) == n == 1
    assert out.count() == 10_000


def test_dynamic_partition_pruning_from_join(spark, tmp_path):
    """DPP: when the pruning predicate is only known at RUNTIME (it comes
    from the dim side of a join, not a literal), Catalyst must still
    prune fact partitions — the scan's PartitionFilters gains a
    dynamicpruning subquery instead of listing every directory. This is
    the 100 TB star-join read path: a selective dim filter cuts the
    fact I/O before any fact row is read."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    path = str(tmp_path / "orders_by_prio_dpp")
    write_partitioned(orders, path, ["o_orderpriority"])

    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [(p, "slow" if p.startswith("5") else "fast")
         for p in ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
                   "5-LOW")],
        schema="prio string, speed string",
    )
    joined = fact.join(
        dim.where(F.col("speed") == "slow"),
        fact.o_orderpriority == dim.prio,
    )
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    expected = orders.where(F.col("o_orderpriority") == "5-LOW").count()
    assert joined.count() == expected
