"""Scalar-function helpers (F1-F9), task-param IR (S12), and the skew-safe
aggregation pattern (A9)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from log_analysis_system_spark.functions import (
    date_hour_key,
    date_key,
    null_sentinel,
    parse_packed,
    round_half_up,
    time_minute_key,
    trim_comma,
    zero_pad,
)
from log_analysis_system_spark.operators.aggregates import salted_aggregate
from log_analysis_system_spark.params import TaskParams


def test_date_key_formats(spark):
    df = spark.createDataFrame(
        [(datetime(2018, 12, 3, 9, 5, 7),)], "ts timestamp"
    )
    row = df.select(
        date_key(F.col("ts")).alias("d"),
        date_hour_key(F.col("ts")).alias("dh"),
        time_minute_key(F.col("ts")).alias("m"),
    ).collect()[0]
    assert row["d"] == "20181203"
    assert row["dh"] == "2018-12-03_09"
    assert row["m"] == "201812030905"


def test_packed_string_compat(spark):
    """F1: legacy `k=v|k=v` boundary parsing (StringUtils.getFieldFromConcatString)."""
    df = spark.createDataFrame([("age=20|sex=male",)], "packed string")
    row = df.select(parse_packed(F.col("packed")).alias("m")).collect()[0]
    assert row["m"] == {"age": "20", "sex": "male"}


def test_string_helpers(spark):
    df = spark.createDataFrame([(",a,b,", 7)], "s string, n int")
    row = df.select(
        trim_comma(F.col("s")).alias("t"), zero_pad(F.col("n"), 4).alias("p")
    ).collect()[0]
    assert row["t"] == "a,b"
    assert row["p"] == "0007"


def test_round_half_up_matches_reference(spark):
    # NumberUtils.formatDouble(0.125, 2) == 0.13 under HALF_UP
    df = spark.createDataFrame([(0.125,), (0.124,)], "v double")
    got = [r["r"] for r in df.select(round_half_up(F.col("v")).alias("r")).collect()]
    assert got == [0.13, 0.12]


def test_null_sentinel(spark):
    df = spark.createDataFrame([(None,), (5,)], "v int")
    got = [r["s"] for r in df.select(null_sentinel(F.col("v")).alias("s")).collect()]
    assert got == [-1, 5]


def test_task_params_reference_encoding():
    """S12: util/ParamUtils.java:43-48 — every value a 1-element JSON array,
    list params comma-joined inside."""
    doc = (
        '{"startDate":["2018-12-01"],"endDate":["2018-12-03"],'
        '"startAge":["20"],"endAge":["50"],'
        '"professionals":["professional10,professional20"],'
        '"sex":["male"],"keywords":["kw1,kw2"],"categoryIds":["1,2,3"],'
        '"targetPageFlow":["1,2,3,4,5,6,7"]}'
    )
    p = TaskParams.from_json(doc)
    assert p.start_date == "2018-12-01" and p.end_date == "2018-12-03"
    assert p.start_age == 20 and p.end_age == 50
    assert p.professionals == ["professional10", "professional20"]
    assert p.cities == [] and p.sex == "male"
    assert p.keywords == ["kw1", "kw2"]
    assert p.category_ids == [1, 2, 3]
    assert p.target_page_flow == [1, 2, 3, 4, 5, 6, 7]


def test_salted_aggregate_equals_plain(spark):
    """A9: the two-stage salted aggregate must be value-identical to the
    direct groupBy for algebraic aggregates."""
    df = spark.createDataFrame(
        [("a", i % 3) for i in range(100)] + [("b", 1)] * 50, "k string, v long"
    )
    plain = {
        (r["k"]): (r["cnt"], r["sv"])
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sv"))
        .collect()
    }
    salted = {
        (r["k"]): (r["cnt"], r["sv"])
        for r in salted_aggregate(
            df,
            ["k"],
            {"cnt": F.count(F.lit(1)), "sv": F.sum("v")},
            n_salts=7,
        ).collect()
    }
    assert plain == salted
