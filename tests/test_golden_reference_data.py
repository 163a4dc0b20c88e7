"""Golden parity on the reference's OWN checked-in data (SURVEY §5 item 4).

The reference ships \\x01-delimited extracts (`user_visit_action.txt` 11 234
rows, `user_info.txt` 99 rows, `product_info.txt` 100 rows) and a 10-row
`city_info` dimension (city_info.sql:27). These tests read those files IN
PLACE from /root/reference (data fixtures, never code), run the native-schema
jobs, and compare against independently-written DuckDB SQL over the very same
files — end-to-end evidence that the engine reproduces the reference's
semantics on the reference's data, not just on synthetic fixtures.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from log_analysis_system_spark.params import TaskParams
from log_analysis_system_spark.queries.reference_jobs import (
    aggregate_sessions,
    area_top3_products,
    page_convert_rate,
    scan_actions,
    top10_categories,
)
from log_analysis_system_spark.schemas import (
    CITY_INFO,
    PRODUCT_INFO,
    USER_INFO,
    USER_VISIT_ACTION,
)
from log_analysis_system_spark.sources.catalog import read_x01_text

REF = "/root/reference"
UVA = f"{REF}/user_visit_action.txt"

pytestmark = pytest.mark.skipif(
    not os.path.exists(UVA), reason="reference data not present"
)

PARAMS = TaskParams(
    start_date="2018-12-01",
    end_date="2018-12-31",
    target_page_flow=[1, 2, 3, 4, 5, 6, 7],
)

# city_info.sql:27 (the reference's English city dimension).
CITIES = [
    (0, "Beijing", "China North"),
    (1, "Shanghai", "China East"),
    (2, "Nanjing", "China East"),
    (3, "Guangzhou", "China South"),
    (4, "Sanya", "China South"),
    (5, "Wuhan", "China Middle"),
    (6, "Changsha", "China Middle"),
    (7, "Xian", "West North"),
    (8, "Chengdu", "West South"),
    (9, "Haerbin", "East North"),
]

_UVA_COLS = (
    "{'date': 'VARCHAR', 'user_id': 'BIGINT', 'session_id': 'VARCHAR', "
    "'page_id': 'BIGINT', 'action_time': 'VARCHAR', 'search_keyword': 'VARCHAR', "
    "'click_category_id': 'BIGINT', 'click_product_id': 'BIGINT', "
    "'order_category_ids': 'VARCHAR', 'order_product_ids': 'VARCHAR', "
    "'pay_category_ids': 'VARCHAR', 'pay_product_ids': 'VARCHAR', "
    "'city_id': 'BIGINT'}"
)


@pytest.fixture(scope="module")
def ref_duck():
    con = duckdb.connect()
    con.execute(
        f"""
        CREATE VIEW uva AS
        SELECT * FROM read_csv('{UVA}', delim=chr(1), header=false,
                               nullstr='null', columns={_UVA_COLS})
        WHERE date BETWEEN '2018-12-01' AND '2018-12-31'
        """
    )
    yield con
    con.close()


@pytest.fixture(scope="module")
def ref_actions(spark):
    raw = read_x01_text(spark, UVA, USER_VISIT_ACTION, null_value="null")
    return scan_actions(raw, PARAMS)


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else f"{v:.10g}"
    return str(v)


def assert_same(spark_df, duck_rows):
    cols = sorted(spark_df.columns)
    got = sorted(
        tuple(canon(r[c]) for c in cols) for r in spark_df.collect()
    )
    want = sorted(tuple(canon(v) for v in row) for row in duck_rows)
    assert got == want, (
        f"mismatch: spark {len(got)} rows vs duck {len(want)}; "
        f"first diff: {next((a, b) for a, b in zip(got, want) if a != b) if got and want else (got[:1], want[:1])}"
    )


def test_session_aggregate_on_reference_data(spark, ref_duck, ref_actions):
    out = aggregate_sessions(ref_actions).select(
        "session_id", "user_id", "search_keywords", "click_category_ids",
        "step_length", "visit_length",
    )
    rows = ref_duck.execute(
        """
        SELECT session_id,
               min(user_id) AS user_id,
               coalesce(string_agg(DISTINCT search_keyword, ','
                                   ORDER BY search_keyword), '') AS search_keywords,
               coalesce(string_agg(DISTINCT CAST(click_category_id AS VARCHAR), ','
                                   ORDER BY CAST(click_category_id AS VARCHAR)), '')
                   AS click_category_ids,
               count(*) AS step_length,
               epoch(max(strptime(action_time, '%Y-%m-%d %H:%M:%S')))
                 - epoch(min(strptime(action_time, '%Y-%m-%d %H:%M:%S')))
                   AS visit_length,
        FROM uva GROUP BY session_id
        ORDER BY session_id
        """
    ).fetchall()
    # column order must match the sorted-column compare
    assert_same(
        out.select(sorted(out.columns)),
        [
            tuple(r[i] for i in _order(rows_cols, sorted(rows_cols)))
            for r in rows
        ],
    )


rows_cols = [
    "session_id", "user_id", "search_keywords", "click_category_ids",
    "step_length", "visit_length",
]


def _order(src: list[str], dst: list[str]) -> list[int]:
    return [src.index(c) for c in dst]


def test_top10_categories_on_reference_data(spark, ref_duck, ref_actions):
    out = top10_categories(ref_actions)
    rows = ref_duck.execute(
        """
        WITH clicks AS (
            SELECT click_category_id AS category_id, count(*) AS click_count
            FROM uva WHERE click_category_id IS NOT NULL GROUP BY 1
        ),
        orders AS (
            SELECT CAST(x AS BIGINT) AS category_id, count(*) AS order_count
            FROM (SELECT unnest(string_split(order_category_ids, ',')) AS x
                  FROM uva WHERE order_category_ids IS NOT NULL)
            WHERE x <> '' GROUP BY 1
        ),
        pays AS (
            SELECT CAST(x AS BIGINT) AS category_id, count(*) AS pay_count
            FROM (SELECT unnest(string_split(pay_category_ids, ',')) AS x
                  FROM uva WHERE pay_category_ids IS NOT NULL)
            WHERE x <> '' GROUP BY 1
        ),
        ids AS (
            SELECT category_id FROM clicks
            UNION SELECT category_id FROM orders
            UNION SELECT category_id FROM pays
        )
        SELECT i.category_id,
               coalesce(c.click_count, 0) AS click_count,
               coalesce(o.order_count, 0) AS order_count,
               coalesce(p.pay_count, 0) AS pay_count
        FROM ids i
        LEFT JOIN clicks c USING (category_id)
        LEFT JOIN orders o USING (category_id)
        LEFT JOIN pays p USING (category_id)
        ORDER BY click_count DESC, order_count DESC, pay_count DESC,
                 category_id ASC
        LIMIT 10
        """
    ).fetchall()
    cols = ["category_id", "click_count", "order_count", "pay_count"]
    assert_same(
        out.select(sorted(out.columns)),
        [tuple(r[i] for i in _order(cols, sorted(cols))) for r in rows],
    )


def test_page_convert_rate_on_reference_data(spark, ref_duck, ref_actions):
    out = page_convert_rate(ref_actions, PARAMS)
    rows = ref_duck.execute(
        """
        WITH splits AS (
            SELECT CAST(lag(page_id) OVER (
                       PARTITION BY session_id
                       ORDER BY strptime(action_time, '%Y-%m-%d %H:%M:%S'),
                                page_id) AS VARCHAR)
                   || '_' || CAST(page_id AS VARCHAR) AS split
            FROM uva
        ),
        targets AS (
            SELECT * FROM (VALUES ('1_2', 0), ('2_3', 1), ('3_4', 2),
                                  ('4_5', 3), ('5_6', 4), ('6_7', 5)) t(split, ord)
        ),
        counts AS (
            SELECT split, count(*) AS split_pv FROM splits
            WHERE split IN (SELECT split FROM targets) GROUP BY split
        ),
        start_pv AS (SELECT count(*) AS pv FROM uva WHERE page_id = 1),
        chained AS (
            SELECT t.split, coalesce(c.split_pv, 0) AS split_pv,
                   lag(coalesce(c.split_pv, 0)) OVER (ORDER BY t.ord) AS prev_pv
            FROM targets t LEFT JOIN counts c USING (split)
        )
        SELECT ch.split, ch.split_pv,
               round(ch.split_pv / coalesce(ch.prev_pv, s.pv), 2) AS convert_rate
        FROM chained ch CROSS JOIN start_pv s
        """
    ).fetchall()
    cols = ["split", "split_pv", "convert_rate"]
    assert_same(
        out.select(sorted(out.columns)),
        [tuple(r[i] for i in _order(cols, sorted(cols))) for r in rows],
    )


def test_area_top3_on_reference_data(spark, ref_duck, ref_actions):
    city_df = spark.createDataFrame(CITIES, CITY_INFO)
    product_df = read_x01_text(
        spark, f"{REF}/product_info.txt", PRODUCT_INFO, null_value="null"
    )
    out = area_top3_products(ref_actions, city_df, product_df, PARAMS).select(
        "area", "product_id", "click_count", "city_infos", "rnk"
    )
    cities_sql = ", ".join(
        f"({cid}, '{name}', '{area}')" for cid, name, area in CITIES
    )
    rows = ref_duck.execute(
        f"""
        WITH city AS (
            SELECT * FROM (VALUES {cities_sql}) c(city_id, city_name, area)
        ),
        clicks AS (
            SELECT u.city_id, u.click_product_id AS product_id, c.area, c.city_name
            FROM uva u JOIN city c USING (city_id)
            WHERE u.click_product_id IS NOT NULL
        ),
        grouped AS (
            SELECT area, product_id, count(*) AS click_count,
                   string_agg(DISTINCT CAST(city_id AS VARCHAR) || ':' || city_name,
                              ',' ORDER BY CAST(city_id AS VARCHAR) || ':' || city_name)
                       AS city_infos
            FROM clicks GROUP BY area, product_id
        ),
        ranked AS (
            SELECT *, row_number() OVER (PARTITION BY area
                                         ORDER BY click_count DESC, product_id)
                      AS rnk
            FROM grouped
        )
        SELECT area, product_id, click_count, city_infos, rnk
        FROM ranked WHERE rnk <= 3
        """
    ).fetchall()
    cols = ["area", "product_id", "click_count", "city_infos", "rnk"]
    assert_same(
        out.select(sorted(out.columns)),
        [tuple(r[i] for i in _order(cols, sorted(cols))) for r in rows],
    )
