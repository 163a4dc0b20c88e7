"""DQ operators: injected-violation fixtures (each check must actually fire)
plus the single-pass profile plan gate."""

from __future__ import annotations

import datetime
import tempfile

from pyspark.sql import Row
from pyspark.sql import functions as F

from log_analysis_system_spark.queries import QUERIES, load_all
from tests.conftest import SF_DIR

load_all()


def test_dq_checks_fire_on_injected_violations(spark):
    d0 = datetime.date(2024, 1, 10)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [Row(c_custkey=1, c_mktsegment="X", c_acctbal=0.0)]
        ).write.parquet(f"{d}/customer.parquet")
        spark.createDataFrame(
            [
                Row(o_orderkey=10, o_custkey=1, o_orderdate=d0),
                Row(o_orderkey=10, o_custkey=1, o_orderdate=d0),  # dup PK
                Row(o_orderkey=11, o_custkey=999, o_orderdate=d0),  # orphan
            ]
        ).write.parquet(f"{d}/orders.parquet")
        spark.createDataFrame(
            [
                Row(l_orderkey=10, l_quantity=-2.0,  # nonpositive
                    l_shipdate=d0 - datetime.timedelta(days=3)),  # pre-order
                Row(l_orderkey=11, l_quantity=5.0,
                    l_shipdate=d0 + datetime.timedelta(days=3)),
            ]
        ).write.parquet(f"{d}/lineitem.parquet")
        spark.createDataFrame(
            [
                Row(event_id=1, ts=datetime.datetime(2024, 1, 1),
                    user_id=None, event_type="t", value=1.0, props="{}"),
                Row(event_id=2, ts=datetime.datetime(2024, 1, 1),
                    user_id=7, event_type="t", value=1.0, props="{}"),
            ]
        ).write.parquet(f"{d}/events.parquet")
        got = {
            r.check_name: r.n_violations
            for r in QUERIES["dq_checks"](spark, d).collect()
        }
    assert got == {
        "orphan_orders": 1,
        "nonpositive_quantity": 1,
        "ship_before_order": 2,  # dup orderkey 10 joins twice, both early
        "null_user_events": 1,
        "duplicate_orderkey": 1,
    }


def test_dq_checks_on_driver_data(spark):
    """Every check emits its row. The synthetic generator draws l_shipdate
    independently of o_orderdate, so ship_before_order genuinely fires on
    the driver data (a real finding, and proof the joined check runs);
    the other four constraints hold."""
    got = {
        r.check_name: r.n_violations
        for r in QUERIES["dq_checks"](spark, SF_DIR).collect()
    }
    assert len(got) == 5
    assert got["ship_before_order"] > 0
    for name in ("orphan_orders", "nonpositive_quantity",
                 "null_user_events", "duplicate_orderkey"):
        assert got[name] == 0, name


def test_dq_profile_single_pass(spark):
    """One Expand-based aggregate over a pruned scan — no per-column
    rescans (exactly one FileScan in the plan)."""
    plan = (
        QUERIES["dq_profile_lineitem"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan") == 1
    assert "Expand" in plan


def test_dq_profile_values(spark):
    got = {
        r.col_name: (r.n_rows, r.n_nulls, r.n_distinct)
        for r in QUERIES["dq_profile_lineitem"](spark, SF_DIR).collect()
    }
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    n = li.count()
    for c, (n_rows, n_nulls, n_distinct) in got.items():
        assert n_rows == n
        assert n_nulls == li.where(F.col(c).isNull()).count()
        assert n_distinct == li.select(c).distinct().count()


def test_with_audit_counts_in_single_action(spark):
    """Observation metrics arrive from the SAME action as the result —
    rows seen, nulls, and value sum captured with no extra scan."""
    from log_analysis_system_spark.queries.data_quality import with_audit

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    audited, obs = with_audit(
        ev,
        "ingest_audit",
        {
            "rows_in": F.count(F.lit(1)),
            "null_users": F.count(F.lit(1)) - F.count("user_id"),
            "value_cents": F.sum(F.floor(F.col("value") * 100).cast("long")),
        },
    )
    kept = audited.where(F.col("event_type") != "error").count()
    got = obs.get
    assert got["rows_in"] == ev.count()
    assert kept < got["rows_in"]
    assert got["null_users"] == 0
    assert got["value_cents"] > 0
