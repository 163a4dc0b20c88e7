"""Sink tests (S8-S11): SQLite stands in for MySQL (same DB-API upsert shape);
parquet dynamic-partition overwrite is the keyed-replace test double."""

from __future__ import annotations

import os
import sqlite3

from log_analysis_system_spark.sinks import (
    overwrite_keyed_parquet,
    upsert_foreach_batch,
)


def test_upsert_foreach_batch_increments(spark, tmp_path):
    """S10: the reference's `UPDATE ... SET click_count = click_count + ?`
    (AdUserClickCountDAOImpl.java:18-89) as INSERT..ON CONFLICT."""
    db = str(tmp_path / "state.db")
    with sqlite3.connect(db) as conn:
        conn.execute(
            "CREATE TABLE clicks (user_id INTEGER PRIMARY KEY, cnt INTEGER)"
        )

    sink = upsert_foreach_batch(
        "INSERT INTO clicks (user_id, cnt) VALUES (?, ?) "
        "ON CONFLICT(user_id) DO UPDATE SET cnt = cnt + excluded.cnt",
        ["user_id", "cnt"],
        lambda: sqlite3.connect(db),
    )

    b1 = spark.createDataFrame([(1, 2), (2, 1)], "user_id long, cnt long")
    b2 = spark.createDataFrame([(1, 3), (3, 5)], "user_id long, cnt long")
    sink(b1, 0)
    sink(b2, 1)

    with sqlite3.connect(db) as conn:
        got = dict(conn.execute("SELECT user_id, cnt FROM clicks").fetchall())
    assert got == {1: 5, 2: 1, 3: 5}


def test_overwrite_keyed_parquet_replaces_only_touched_keys(spark, tmp_path):
    """S11: delete-then-insert per key (AdProvinceTop3DAOImpl.java:30-59) as
    dynamic partition overwrite — untouched partitions survive."""
    path = str(tmp_path / "top3")
    day1 = spark.createDataFrame(
        [("2024-01-01", 1, 10), ("2024-01-02", 2, 20)],
        "date_key string, ad_id long, cnt long",
    )
    overwrite_keyed_parquet(day1, path, ["date_key"])

    # replace only 2024-01-02
    day2 = spark.createDataFrame(
        [("2024-01-02", 9, 99)], "date_key string, ad_id long, cnt long"
    )
    overwrite_keyed_parquet(day2, path, ["date_key"])

    # partition values come back type-inferred (date), normalize to str
    got = {
        (str(r["date_key"]), r["ad_id"]): r["cnt"]
        for r in spark.read.parquet(path).collect()
    }
    assert got == {("2024-01-01", 1): 10, ("2024-01-02", 9): 99}
    assert os.path.isdir(os.path.join(path, "date_key=2024-01-01"))


def test_x01_text_roundtrip(spark, tmp_path):
    """S13: Hive-default \\x01-separated text scan with explicit schema."""
    from log_analysis_system_spark.schemas import SALES
    from log_analysis_system_spark.sources import read_x01_text

    p = tmp_path / "sales.txt"
    p.write_text("apple\x01fruit\x01100\nbeef\x01meat\x01250\n")
    df = read_x01_text(spark, str(p), SALES)
    rows = {r["product"]: (r["category"], r["revenue"]) for r in df.collect()}
    assert rows == {"apple": ("fruit", 100), "beef": ("meat", 250)}


def test_jdbc_round_trip_derby(spark, tmp_path):
    """S3/S8 for REAL: Spark's JDBC connector against embedded Derby (the one
    JDBC engine on Spark's own classpath) — write via jdbc_append, read back
    via read_jdbc, both single-connection and partitioned."""
    from log_analysis_system_spark.sinks import jdbc_append
    from log_analysis_system_spark.sources.catalog import read_jdbc

    url = f"jdbc:derby:{tmp_path}/testdb;create=true"
    drv = "org.apache.derby.jdbc.EmbeddedDriver"
    df = spark.createDataFrame(
        [(i, f"name{i}", i * 10) for i in range(20)],
        "id bigint, name string, score bigint",
    )
    jdbc_append(df, url, "people", {"driver": drv})

    back = read_jdbc(spark, url, "people", driver=drv)
    assert back.count() == 20
    got = {r["id"]: (r["name"], r["score"]) for r in back.collect()}
    assert got[7] == ("name7", 70)

    # partitioned parallel read: 4 connections splitting on id
    part = read_jdbc(
        spark, url, "people", driver=drv,
        partition_column="id", num_partitions=4,
        lower_bound=0, upper_bound=20,
    )
    assert part.rdd.getNumPartitions() == 4
    assert sorted(r["id"] for r in part.collect()) == list(range(20))
