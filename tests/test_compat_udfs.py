"""Compat surface: the reference's registered SQL function names
(AreaTop3ProductSpark.java:64-73) must resolve in carried-over SQL text.
Scalar names are Arrow-vectorized UDFs; the UDAF group_concat_distinct is a
SQL rewrite to built-ins (a pandas grouped-agg UDF cannot share a GROUP BY
with count(*), which is exactly the reference's call shape)."""

from __future__ import annotations

from log_analysis_system_spark.functions.compat import (
    register_reference_udfs,
    rewrite_reference_sql,
)


def test_reference_area_sql_text_runs(spark):
    """The reference's own SQL shape (AreaTop3ProductSpark.java:350-357):
    group_concat_distinct over concat_long_string inside GROUP BY, next to
    count(*)."""
    register_reference_udfs(spark)
    spark.createDataFrame(
        [
            ("East", 1, 101, "Nanjing"),
            ("East", 1, 102, "Suzhou"),
            ("East", 1, 101, "Nanjing"),  # duplicate city -> dedup'd
            ("South", 2, 201, "Shenzhen"),
        ],
        "area string, product_id long, city_id long, city_name string",
    ).createOrReplaceTempView("tmp_click_product_basic")

    rows = spark.sql(
        rewrite_reference_sql(
            """
            SELECT area, product_id, count(*) AS click_count,
                   group_concat_distinct(
                       concat_long_string(city_id, city_name, ':')) AS city_infos
            FROM tmp_click_product_basic
            GROUP BY area, product_id
            ORDER BY area
            """
        )
    ).collect()
    assert [(r["area"], r["click_count"], r["city_infos"]) for r in rows] == [
        ("East", 3, "101:Nanjing,102:Suzhou"),
        ("South", 1, "201:Shenzhen"),
    ]


def test_rewrite_is_precise():
    # nested parens + quoted paren + case-insensitive + non-call identifier
    sql = (
        "SELECT GROUP_CONCAT_DISTINCT(f(x, ')('), 1)) AS a, "
        "group_concat_distinct_2(y) AS b FROM t"
    )
    out = rewrite_reference_sql(sql)
    assert (
        "concat_ws(',', array_sort(collect_set(f(x, ')('), 1)))" in out
    )
    assert "group_concat_distinct_2(y)" in out  # longer identifier untouched


def test_random_prefix_round_trip(spark):
    register_reference_udfs(spark)
    rows = spark.sql(
        """
        SELECT remove_random_prefix(random_prefix(v, 5)) AS back,
               CAST(split(random_prefix(v, 5), '_')[0] AS INT) AS prefix
        FROM VALUES ('k_eep') AS t(v)
        """
    ).collect()
    # Round-trips even when the payload itself contains '_' (split n=1).
    assert rows[0]["back"] == "k_eep"
    assert 0 <= rows[0]["prefix"] < 5  # bound honored (ref hardcodes 10)


def test_exact_dedup_not_substring_dedup(spark):
    """The reference UDAF's substring-containment dedup would drop '11:a'
    because '1:a' is its substring — the rewrite must keep both."""
    spark.createDataFrame(
        [("g", "1:a"), ("g", "11:a"), ("g", "1:a")], "k string, v string"
    ).createOrReplaceTempView("t_gcd")
    row = spark.sql(
        rewrite_reference_sql(
            "SELECT group_concat_distinct(v) AS out FROM t_gcd GROUP BY k"
        )
    ).collect()[0]
    # sorted lexicographically: '1' (0x31) < ':' (0x3a) puts '11:a' first
    assert row["out"] == "11:a,1:a"


def test_random_prefix_registered_nondeterministic(spark):
    """The salting shim is only correct if the SQL-registered function is
    nondeterministic at analysis time — otherwise Catalyst may collapse or
    re-evaluate it, breaking per-row salt distribution."""
    import pytest
    from pyspark.errors import AnalysisException

    register_reference_udfs(spark)
    # Analysis-level check: a nondeterministic function is rejected inside an
    # aggregate expression — a deterministic registration would analyze fine.
    with pytest.raises(AnalysisException):
        spark.sql(
            "SELECT count(DISTINCT random_prefix('x', 10)) FROM range(10)"
        ).collect()
    # Behavioral check: across many rows the salt varies (project first, then
    # aggregate the materialized column — the legal placement).
    n = spark.sql(
        """
        SELECT count(DISTINCT p) AS n FROM (
            SELECT random_prefix('x', 1000000) AS p FROM range(200)
        )
        """
    ).collect()[0]["n"]
    assert n > 1, "random_prefix produced a constant — registered deterministic?"


def test_explode_packed_udtf_lateral_join(spark):
    from log_analysis_system_spark.functions.compat import (
        register_reference_udtfs,
    )

    register_reference_udtfs(spark)
    rows = spark.sql(
        "SELECT t.key, t.value FROM VALUES ('a=1|b=2|c', 'r1') AS v(packed, id), "
        "LATERAL explode_packed(v.packed, '|', '=') t ORDER BY t.key"
    ).collect()
    assert [(r.key, r.value) for r in rows] == [
        ("a", "1"), ("b", "2"), ("c", None)
    ]
    # matches the codegen str_to_map path on well-formed input
    builtin = spark.sql(
        "SELECT explode(str_to_map('a=1|b=2', '\\\\|', '=')) AS (key, value)"
    ).collect()
    udtf_rows = spark.sql(
        "SELECT t.key, t.value FROM LATERAL explode_packed('a=1|b=2', '|', '=') t"
    ).collect()
    assert sorted(map(tuple, builtin)) == sorted(map(tuple, udtf_rows))
