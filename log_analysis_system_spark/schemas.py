"""Fixed schemas of the reference data model (SURVEY §1.2).

Reference declares these via Java StructType (src/main/java/com/soto/test/
MockData.java:91-104,135-142,169-172) or Hive DDL (README.md:1584-1620).
Multi-valued attributes stay comma-separated strings at the storage boundary
(fidelity with the reference's text files); operators split them to arrays
internally. Timestamps are stored as strings ``yyyy-MM-dd HH:mm:ss`` in the
reference; we parse with ``F.to_timestamp`` at the scan edge.
"""

from __future__ import annotations

from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Clickstream fact (MockData.java:91-104; Hive DDL README.md:1584-1599).
USER_VISIT_ACTION = StructType(
    [
        StructField("date", StringType()),  # yyyy-MM-dd
        StructField("user_id", LongType()),
        StructField("session_id", StringType()),
        StructField("page_id", LongType()),
        StructField("action_time", StringType()),  # yyyy-MM-dd HH:mm:ss
        StructField("search_keyword", StringType()),
        StructField("click_category_id", LongType()),
        StructField("click_product_id", LongType()),
        StructField("order_category_ids", StringType()),  # comma-separated longs
        StructField("order_product_ids", StringType()),
        StructField("pay_category_ids", StringType()),
        StructField("pay_product_ids", StringType()),
        StructField("city_id", LongType()),
    ]
)

# User dimension (MockData.java:135-142).
USER_INFO = StructType(
    [
        StructField("user_id", LongType()),
        StructField("username", StringType()),
        StructField("name", StringType()),
        StructField("age", IntegerType()),
        StructField("professional", StringType()),
        StructField("city", StringType()),
        StructField("sex", StringType()),
    ]
)

# Product dimension (MockData.java:169-172); extend_info is a JSON string
# {"product_status": 0|1}.
PRODUCT_INFO = StructType(
    [
        StructField("product_id", LongType()),
        StructField("product_name", StringType()),
        StructField("extend_info", StringType()),
    ]
)

# Geo dimension, JDBC-sourced in the reference (sql.txt:93-101).
CITY_INFO = StructType(
    [
        StructField("city_id", IntegerType()),
        StructField("city_name", StringType()),
        StructField("area", StringType()),
    ]
)

# Realtime ad click record after parsing the space-delimited Kafka value
# (MockRealTimeData.java:39-41; parse AdClickRealTimeSpark.java:434-446).
AD_CLICK_LOG = StructType(
    [
        StructField("timestamp", LongType()),  # ms epoch
        StructField("province", StringType()),
        StructField("city", StringType()),
        StructField("user_id", LongType()),
        StructField("ad_id", LongType()),
    ]
)

# Window-function micro-fixture (src/test/java/com/soto/sales.txt).
SALES = StructType(
    [
        StructField("product", StringType()),
        StructField("category", StringType()),
        StructField("revenue", LongType()),
    ]
)
