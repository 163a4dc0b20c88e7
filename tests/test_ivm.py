"""Incremental join-view maintenance: batched deltas must reproduce the
full recompute exactly, and a retraction (sign = -1) batch must undo its
insertion batch bit-for-bit — the Z-set algebra the module claims."""

from __future__ import annotations

from pyspark.sql import functions as F

from log_analysis_system_spark.operators.ivm import (
    append_view_delta,
    revenue_view_delta,
    serve_view,
)
from tests.conftest import SF_DIR


def _tables(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet"),
        spark.read.parquet(f"{SF_DIR}/supplier.parquet"),
        spark.read.parquet(f"{SF_DIR}/nation.parquet"),
    )


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_batched_deltas_equal_full_recompute(spark, tmp_path):
    li, s, n = _tables(spark)
    store = str(tmp_path / "view")
    for i in range(3):
        batch = li.where(F.col("l_orderkey") % 3 == i)
        append_view_delta(revenue_view_delta(batch, s, n), store, i)
    full = _canon(revenue_view_delta(li, s, n))
    assert _canon(serve_view(spark, store)) == full and full

    # replayed batch (crash retry) changes nothing
    append_view_delta(
        revenue_view_delta(li.where(F.col("l_orderkey") % 3 == 1), s, n),
        store,
        1,
    )
    assert _canon(serve_view(spark, store)) == full


def test_retraction_restores_prior_view(spark, tmp_path):
    li, s, n = _tables(spark)
    store = str(tmp_path / "view")
    base = li.where(F.col("l_orderkey") % 3 != 2)
    extra = li.where(F.col("l_orderkey") % 3 == 2)
    append_view_delta(revenue_view_delta(base, s, n), store, 0)
    before = _canon(serve_view(spark, store))

    append_view_delta(revenue_view_delta(extra, s, n), store, 1)
    assert _canon(serve_view(spark, store)) != before  # insertion visible

    append_view_delta(revenue_view_delta(extra, s, n, sign=-1), store, 2)
    assert _canon(serve_view(spark, store)) == before  # exact undo


def test_full_retraction_empties_the_view(spark, tmp_path):
    li, s, n = _tables(spark)
    store = str(tmp_path / "view")
    append_view_delta(revenue_view_delta(li, s, n), store, 0)
    append_view_delta(revenue_view_delta(li, s, n, sign=-1), store, 1)
    assert serve_view(spark, store).count() == 0


def test_malformed_delta_surfaces_instead_of_vanishing(spark, tmp_path):
    """A delta stream that cancels counts but NOT sums (deletes that don't
    mirror prior inserts) must stay visible in the view — zero-multiplicity
    compaction only applies when both accumulators retract to zero."""
    store = str(tmp_path / "view")
    ins = spark.createDataFrame(
        [("GERMANY", 500, 3)], "n_name string, revenue_c long, n_items long"
    )
    bad_del = spark.createDataFrame(
        [("GERMANY", -200, -3)], "n_name string, revenue_c long, n_items long"
    )
    append_view_delta(ins, store, 0)
    append_view_delta(bad_del, store, 1)
    rows = serve_view(spark, store).collect()
    assert [(r["n_name"], r["revenue_c"], r["n_items"]) for r in rows] == [
        ("GERMANY", 300, 0)
    ]
